"""Multipath sync robustness (VERDICT r3 item #3): the synthesizer's
tapped-delay-line channel + first-path detection in the PRS matched filter.

The decisive scenario: the strongest ray is a LATE echo (still inside the
guard interval). Plain argmax timing locks to the echo, pushing the FFT
window up to the echo delay past the symbol — ISI that plain tracking never
repairs. First-path gating (SyncConfig.impulse_peak_threshold_db /
impulse_peak_distance_probability, reference render_radio_block.cpp:224-225)
picks the earlier direct path and the decode is clean.
"""

import numpy as np
import pytest

from tpudab.synth import (EnsembleSpec, ServiceSpec, SubchannelSpec,
                          EnsembleSynthesizer, ASCTY_DAB_PLUS)
from tpudab.synth.modulator import (Impairments, apply_impairments,
                                    modulate_frame_bits)
from tpudab.ofdm.sync import SyncConfig
from tpudab.ofdm.sync_device import acquire_host

# strongest ray is a late echo (still inside the guard interval: CP = 504
# in mode I, 252 in mode IV), direct path 4 dB weaker plus a small second
# echo — a TU-like two-ray profile. Delays scale with the mode's CP.
DIRECT_GAIN = 0.63


def _echo_profile(mode: int):
    if mode == 1:
        # the original r4 adversarial profile (echo at 400 < CP 504); the
        # scenario is phase-sensitive, so keep it exactly as tuned
        return ((400, 1.0, 2.1), (150, 0.35, 0.7))
    from tpudab.constants.ofdm_params import get_ofdm_params
    cp = get_ofdm_params(mode).nb_cyclic_prefix
    return ((int(cp * 0.79), 1.0, 2.1), (int(cp * 0.30), 0.35, 0.7))


def _capture(n_frames: int, snr_db: float, seed: int = 44, mode: int = 1):
    from tpudab.constants.dab_params import get_dab_params
    spec = EnsembleSpec(
        ensemble_id=0x3D3D, label="Echo Mux",
        services=[ServiceSpec(0xC701, "SvcE", [(0, ASCTY_DAB_PLUS, 7)])],
        subchannels=[SubchannelSpec(7, start_cu=0, size_cu=24,
                                    protection=("eep", 3, 0))])
    synth = EnsembleSynthesizer(spec, mode=mode, seed=seed)
    rng = np.random.default_rng(300 + seed)
    nb_cifs = get_dab_params(mode).nb_cifs
    data = rng.integers(0, 256, (n_frames * nb_cifs + 20, 32 * 3)).astype(np.uint8)
    synth.payload_fn[7] = lambda m: data[m].tobytes()
    iq = np.concatenate([modulate_frame_bits(synth.frame_bits(i), mode)
                         for i in range(n_frames)])
    iq = apply_impairments(
        iq, Impairments(freq_offset_hz=800.0, snr_db=snr_db,
                        amplitude=DIRECT_GAIN, multipath=_echo_profile(mode),
                        seed=9))
    return iq.astype(np.complex64), data


def test_tdl_channel_shape_and_energy():
    """apply_impairments multipath: echoes land at the right delays."""
    x = np.zeros(1000, np.complex64)
    x[0] = 1.0
    y = apply_impairments(x, Impairments(multipath=((10, 0.5, 0.0),
                                                    (700, 2.0, np.pi))))
    assert abs(y[0] - 1.0) < 1e-6
    assert abs(y[10] - 0.5) < 1e-6
    assert abs(y[700] + 2.0) < 1e-6          # phase pi
    assert np.abs(y[[1, 9, 11, 699, 701]]).max() < 1e-6


@pytest.mark.parametrize("mode", [1, 4])
def test_first_path_gating_beats_argmax_on_acquisition(mode):
    """With the dominant ray ~0.8 CP late, plain argmax locks to the echo;
    the gated search lands on the direct path. Mode 4's halved FFT/CP
    geometry is exactly where a hard-coded mode-I assumption in the gating
    window would hide (VERDICT r4 weak #6)."""
    from tpudab.constants.ofdm_params import get_ofdm_params
    p = get_ofdm_params(mode)
    fl = p.nb_frame_length
    echo = _echo_profile(mode)[0][0]
    iq, _ = _capture(4, snr_db=15.0, mode=mode)
    gated = acquire_host(iq[: 4 * fl], mode=mode)
    plain = acquire_host(iq[: 4 * fl], mode=mode, peak_threshold_db=0.0)
    # modulator emits frame-aligned IQ: true frame start = 0 (mod frame)
    err_g = min(gated["frame_start"] % fl, fl - gated["frame_start"] % fl)
    err_p = min(plain["frame_start"] % fl, fl - plain["frame_start"] % fl)
    assert err_p >= echo * 0.75, f"argmax unexpectedly found the first path ({err_p})"
    assert err_g <= 40, f"gated search missed the first path ({err_g})"


@pytest.mark.slow
@pytest.mark.parametrize("mode", [1, 4])
def test_streaming_locks_and_decodes_under_multipath(mode):
    """Streaming lock + payload decode under the two-echo profile at 15 dB
    SNR where plain argmax picks the wrong peak (VERDICT r3 item #3 'Done':
    FIB CRC clean, payload bytes correct) — in mode I AND mode IV's halved
    geometry (VERDICT r4 weak #6)."""
    from tpudab.constants.dab_params import get_dab_params
    from tpudab.host.streaming import StreamingRadio

    nb_cifs = get_dab_params(mode).nb_cifs
    iq, payload = _capture(10, snr_db=15.0, mode=mode)
    pos = {"i": 0}

    def source(n):
        lo = pos["i"]
        pos["i"] = min(lo + n, iq.shape[0])
        return iq[lo:pos["i"]]

    radio = StreamingRadio(source, mode=mode, batch_frames=4,
                           use_device_step=False)
    chunks = []
    radio.run(on_outputs=lambda outs: chunks.extend(
        np.asarray(o.raw_frames) for o in outs.values()
        if o.raw_frames is not None and len(o.raw_frames)))
    got = np.concatenate(chunks)
    assert radio.stats.reacquisitions == 0
    fib_rate = radio.receiver.stats["fib_crc_errors"] / max(
        radio.receiver.stats["fibs"], 1)
    assert fib_rate < 0.05, f"FIB CRC error rate {fib_rate:.2%}"
    assert got.shape[0] >= 10 * nb_cifs - 18
    np.testing.assert_array_equal(got[1:], payload[1: got.shape[0]])
