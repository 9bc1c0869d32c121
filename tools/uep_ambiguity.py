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

For each 's' row this enumerates ALL candidates satisfying the above and
reports the count, whether the shipped row is among them, and the
alternatives. count == 1 means the row is DETERMINED by arithmetic +
structure (no residual risk beyond the prior itself); count > 1 is the
honest irreducible ambiguity, quantified.

Writes UEP_AMBIGUITY.json at the repo root and prints a summary table.
Run: python tools/uep_ambiguity.py [--slack N]
"""

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpudab.constants.puncture import _UEP_ROWS  # noqa: E402


def induce_priors(rows, slack: int):
    """Per-protection-level PI ranges and L-structure sets from the
    corroborated ('a'/'r'/'p') rows."""
    pi_rng = {}
    l1_by_family = {}
    l4_seen = set()
    pads = set()
    for (br, pl, size, l, pi, pad, conf) in rows:
        if conf == 's':
            continue
        for i in range(4):
            if l[i] == 0:          # unused region: PI meaningless
                continue
            lo, hi = pi_rng.get((pl, i), (99, -99))
            pi_rng[(pl, i)] = (min(lo, pi[i]), max(hi, pi[i]))
        l1_by_family.setdefault(_family(br), set()).add(l[0])
        l4_seen.add(l[3])
        pads.add(pad)
    # widen by slack
    pi_rng = {k: (max(1, lo - slack), min(24, hi + slack))
              for k, (lo, hi) in pi_rng.items()}
    return pi_rng, l1_by_family, sorted(l4_seen), sorted(pads)


def _family(bitrate):
    if bitrate <= 48:
        return "small"
    if bitrate <= 96:
        return "mid"
    return "large"


def enumerate_candidates(row, pi_rng, l1_fam, l4_set, pads, slack):
    br, pl, size, l0, pi0, pad0, conf = row
    blocks = br * 3 // 4
    budget = size * 64 - 12
    cands = []
    l1_opts = sorted(l1_fam.get(_family(br), {l0[0]})
                     | {l0[0] + d for d in range(-slack, slack + 1) if l0[0] + d > 0})
    pi_opts = [range(*(lambda t: (t[0], t[1] + 1))(pi_rng.get((pl, i),
                                                              (1, 24))))
               for i in range(4)]
    for l4 in l4_set:
        for l1 in l1_opts:
            rest = blocks - l1 - l4
            if rest < 2:
                continue
            for l2 in range(1, rest):
                l3 = rest - l2
                if l3 < 1:
                    continue
                for pad in pads:
                    need = budget - pad
                    for p1 in pi_opts[0]:
                        r1 = need - l1 * 4 * (8 + p1)
                        if r1 < 0:
                            continue
                        for p2 in pi_opts[1]:
                            if p2 > p1:
                                continue   # PI non-increasing over regions 1-3
                            r2 = r1 - l2 * 4 * (8 + p2)
                            if r2 < 0:
                                continue
                            for p3 in pi_opts[2]:
                                if p3 > p2:
                                    continue
                                r3 = r2 - l3 * 4 * (8 + p3)
                                if r3 < 0:
                                    continue
                                if l4 == 0:
                                    if r3 == 0:
                                        cands.append(((l1, l2, l3, 0),
                                                      (p1, p2, p3, 0), pad))
                                    continue
                                # tail region: r3 == l4 * 4 * (8 + p4)
                                q, rem = divmod(r3, l4 * 4)
                                p4 = q - 8
                                lo4, hi4 = pi_rng.get((pl, 3), (1, 24))
                                if rem == 0 and lo4 <= p4 <= hi4 \
                                        and p3 <= p4 <= p1:
                                    cands.append(((l1, l2, l3, l4),
                                                  (p1, p2, p3, p4), pad))
    return cands


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slack", type=int, default=1,
                    help="widen induced PI/L1 ranges by this much")
    args = ap.parse_args()

    pi_rng, l1_fam, l4_set, pads = induce_priors(_UEP_ROWS, args.slack)
    report = []
    for row in _UEP_ROWS:
        br, pl, size, l0, pi0, pad0, conf = row
        if conf != 's':
            continue
        cands = enumerate_candidates(row, pi_rng, l1_fam, l4_set, pads,
                                     args.slack)
        shipped = (tuple(l0), tuple(pi0), pad0)
        report.append({
            "bitrate_kbps": br, "protection_level": pl, "size_cu": size,
            "shipped": {"L": list(l0), "PI": list(pi0), "padding": pad0},
            "n_candidates": len(cands),
            "shipped_is_candidate": shipped in cands,
            "alternatives": [{"L": list(L), "PI": list(PI), "padding": pad}
                             for (L, PI, pad) in cands
                             if (L, PI, pad) != shipped][:12],
        })
        print(f"{br:>4} kbps PL{pl}: {len(cands):>3} budget+structure-exact "
              f"candidates; shipped row "
              f"{'IS' if shipped in cands else 'IS NOT'} one of them")

    out = {
        "method": "exhaustive enumeration under the bit-budget identity, "
                  "the block-count identity, and PI/L structure induced "
                  f"from the 54 corroborated rows (slack {args.slack})",
        "slack": args.slack,
        "rows": report,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "UEP_AMBIGUITY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    uniq = sum(1 for r in report if r["n_candidates"] == 1)
    print(f"\n{uniq}/{len(report)} 's' rows uniquely determined under the "
          f"prior; full detail -> {path}")


if __name__ == "__main__":
    main()
