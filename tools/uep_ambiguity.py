"""UEP region-table ambiguity analysis (VERDICT r3 item #4, 'document
per-row irreducible disagreement' branch).

No third independent transcription lineage is reachable from this offline
build (dablin consumes ETI after FEC; the demodulator lineages qt-dab /
welle.io / eti-cmdline share one ancestral table, and the two recollections
already recorded in constants/puncture.py came from it). What CAN be done
rigorously offline is to measure how much freedom the hard constraints
actually leave for each budget-solved ('s') row:

  hard identity   sum(Li * 4 * (8 + PIi)) + 12 + padding == size_cu * 64
  hard identity   sum(Li) == bitrate * 3/4          (mother blocks)
  structural prior induced from the 54 externally-corroborated rows
  ('a'/'r'/'p'):  per-protection-level PI ranges (+/- slack), the L1
  bitrate-family value, L4 in the observed set, padding in {0, 4, 8}.

The enumeration itself lives in the PACKAGE since r5
(tpudab.fec.uep_calibrate.candidate_profiles — the online self-calibration
scores this exact set against the received signal); this tool reports its
sizes and writes UEP_AMBIGUITY.json at the repo root.

Run: python tools/uep_ambiguity.py [--slack N]
(slack != 1 bypasses the package's lru cache but uses the same code path)
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpudab.constants.puncture import _UEP_ROWS  # noqa: E402
from tpudab.fec.uep_calibrate import (candidate_profiles,  # noqa: E402
                                      shipped_in_prior)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slack", type=int, default=1,
                    help="widen induced PI/L1 ranges by this much")
    args = ap.parse_args()

    report = []
    for row in _UEP_ROWS:
        br, pl, size, l0, pi0, pad0, conf = row
        if conf != 's':
            continue
        # candidate_profiles puts the shipped row first, then alternatives
        cands = candidate_profiles(br, pl, slack=args.slack)
        shipped = cands[0]
        alts = cands[1:]
        # "shipped is a candidate" = it satisfies the full structural
        # prior the enumeration uses (it is prepended unconditionally, so
        # this membership check carries the diagnostic signal: a shipped
        # row OUTSIDE the induced PI ranges — e.g. 224/PL3+PL4 under
        # --slack 0 — is exactly the suspicion worth surfacing)
        shipped_ok = shipped_in_prior(br, pl, args.slack)
        report.append({
            "bitrate_kbps": br, "protection_level": pl, "size_cu": size,
            "shipped": {"L": list(l0), "PI": list(pi0), "padding": pad0},
            "n_candidates": len(alts) + (1 if shipped_ok else 0),
            "shipped_is_candidate": shipped_ok,
            "alternatives": [{"L": list(c.l), "PI": list(c.pi),
                              "padding": c.padding_bits}
                             for c in alts[:12]],
        })
        print(f"{br:>4} kbps PL{pl}: {len(alts) + 1:>4} budget+structure-"
              f"exact candidates (self-calibrated online, "
              f"fec/uep_calibrate.py)")

    out = {
        "method": "exhaustive enumeration under the bit-budget identity, "
                  "the block-count identity, and PI/L structure induced "
                  f"from the 54 corroborated rows (slack {args.slack}); "
                  "enumeration code: tpudab.fec.uep_calibrate."
                  "candidate_profiles (scored online against the received "
                  "signal by the self-calibration)",
        "slack": args.slack,
        "rows": report,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "UEP_AMBIGUITY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nfull detail -> {path}")


if __name__ == "__main__":
    main()
