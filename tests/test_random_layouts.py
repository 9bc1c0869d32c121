"""Randomized layout sweep: arbitrary ensemble configurations (subchannel
count, sizes, placements, EEP A/B levels and corroborated UEP rows mixed)
must decode bit-exactly on BOTH the host path and the jitted device step.
Deterministic seeds; complements the targeted per-feature tests with broad
configuration coverage of the profile-grouping / slicing / carry machinery.
"""

import numpy as np
import pytest

from tpudab.constants.puncture import get_uep_profile


def _random_layout(rng):
    """Random non-overlapping subchannel layout within 864 CU."""
    choices = []
    # EEP set A/B: (level, option) with a valid size multiple
    for level, option, cu_n in ((1, 0, 12), (2, 0, 8), (3, 0, 6), (4, 0, 4),
                                (1, 1, 27), (2, 1, 21), (3, 1, 18), (4, 1, 15)):
        for n in (1, 2, 3):
            choices.append(("eep", level, option, cu_n * n))
    # corroborated ('a'/'r') UEP rows — calibration stays out of the way
    for br, pl in ((32, 4), (48, 3), (64, 5), (96, 4), (128, 5), (160, 1)):
        choices.append(("uep", br, pl, get_uep_profile(br, pl).size_cu))

    n_sub = int(rng.integers(1, 5))
    layout = []
    start = 0
    for sid in range(1, n_sub + 1):
        kind = choices[int(rng.integers(0, len(choices)))]
        size = kind[3]
        if start + size > 864:
            break
        prot = ("eep", kind[1], kind[2]) if kind[0] == "eep" \
            else ("uep", kind[1], kind[2])
        layout.append((sid, start, size, prot))
        start += size + int(rng.integers(0, 3))  # optional CU gap
    return layout


def _bitrate(prot, size):
    if prot[0] == "uep":
        return prot[1]
    from tpudab.constants.puncture import eep_bitrate_kbps
    return eep_bitrate_kbps(size, prot[1], prot[2])


@pytest.mark.slow
@pytest.mark.parametrize("seed", [100, 101, 102, 103])
def test_random_layout_host_vs_device_step(seed):
    from tpudab.models.pipeline import decode_iq
    from tpudab.models.receiver import Receiver
    from tpudab.synth import (EnsembleSpec, ServiceSpec, SubchannelSpec,
                              EnsembleSynthesizer)
    from tpudab.synth.modulator import modulate_frame_bits

    rng = np.random.default_rng(seed)
    layout = _random_layout(rng)
    assert layout, "degenerate layout"
    spec = EnsembleSpec(
        ensemble_id=0x7000 + seed, label=f"Rand {seed}",
        services=[ServiceSpec(0x9000 + sid, f"R{sid}", [(0, 0, sid)])
                  for sid, *_ in layout],
        subchannels=[SubchannelSpec(sid, start_cu=st, size_cu=sz,
                                    protection=prot)
                     for sid, st, sz, prot in layout])
    synth = EnsembleSynthesizer(spec, seed=seed)
    pay = {}
    for sid, st, sz, prot in layout:
        nb = _bitrate(prot, sz) * 3
        pay[sid] = rng.integers(0, 256, (40, nb)).astype(np.uint8)
        synth.payload_fn[sid] = (lambda s: lambda m: pay[s][m].tobytes())(sid)
    iq = np.concatenate([modulate_frame_bits(synth.frame_bits(i))
                         for i in range(8)]).astype(np.complex64)

    rx_h, acc_h, _ = decode_iq(iq, batch_frames=4,
                               receiver=Receiver(decode_audio=False))
    rx_d, acc_d, _ = decode_iq(iq, batch_frames=4, use_device_step=True,
                               receiver=Receiver(decode_audio=False))
    for sid, *_ in layout:
        for name, acc in (("host", acc_h), ("device", acc_d)):
            got = np.concatenate([o.raw_frames for o in acc[sid]
                                  if o.raw_frames is not None
                                  and len(o.raw_frames)])
            assert got.shape[0] >= 15, (seed, sid, name)
            np.testing.assert_array_equal(
                got, pay[sid][: got.shape[0]],
                err_msg=f"seed {seed} subch {sid} path {name}")
