"""OFDM acquisition: block-parallel search replacing the reference's
sample-serial sync state machine (SURVEY.md sec 2.2, sec 7 'Sync as
data-parallel code').

The reference walks samples through five states (FINDING_NULL_POWER_DIP ->
READING_NULL_AND_PRS -> RUNNING_COARSE_FREQ_SYNC -> RUNNING_FINE_TIME_SYNC ->
READING_SYMBOLS). Here each estimator is a whole-block vectorized search
(argmin/argmax over candidate positions/shifts), composed by `acquire` into a
single jitted program; streaming continuation keeps only a small carry
(tpudab.models.streaming).

Estimators:
- null dip: L1/L2 moving-average power minimum over one frame of candidates
- coarse CFO: differential-spectrum circular correlation against the PRS
  reference (integer carrier bins; timing-phase invariant)
- fine time: PRS matched filter (FFT cross-correlation impulse peak)
- fine CFO: cyclic-prefix autocorrelation phase across all symbols
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from tpudab.constants.ofdm_params import get_ofdm_params, SAMPLING_RATE
from tpudab.constants.prs import get_prs_time, get_prs_spectrum


@dataclasses.dataclass(frozen=True)
class SyncConfig:
    """Tunables mirroring the reference's OFDM_Demod config surface
    (render_radio_block.cpp:215-235): coarse range, update betas, thresholds."""

    max_coarse_bins: int = 100          # +/- carrier bins of coarse CFO search
    fine_time_search: int = 256         # +/- samples around expected PRS start
    null_threshold_ratio: float = 0.5   # null power must be below ratio * mean
    fine_freq_beta: float = 0.9         # EMA for streaming fine-freq updates
    coarse_freq_beta: float = 0.9       # EMA for streaming coarse updates
    window_offset: int = 12             # FFT window advance into CP
    # multipath first-path detection in the PRS matched filter (reference
    # impulse_peak_threshold_db / impulse_peak_distance_probability,
    # render_radio_block.cpp:224-225): pick the EARLIEST correlation peak
    # within threshold_db of the strongest, up to one guard interval ahead,
    # with a distance prior p^(d/CP) discounting far-ahead candidates
    # (p = 1 or threshold = 0 reduces to plain argmax).
    impulse_peak_threshold_db: float = 15.0
    impulse_peak_distance_probability: float = 0.15


def carrier_spacing_hz(mode: int) -> float:
    p = get_ofdm_params(mode)
    return SAMPLING_RATE / p.nb_fft


@functools.partial(jax.jit, static_argnames=("mode",))
def estimate_null_start(buffer, mode: int = 1):
    """Find the start of the null symbol in >= 1 frame + null of samples.

    Returns (null_start, quality) where quality = null power / mean power
    (smaller = stronger dip; reference analog: null_l1_search thresholds).
    """
    p = get_ofdm_params(mode)
    power = jnp.abs(buffer) ** 2
    csum = jnp.concatenate([jnp.zeros(1, power.dtype), jnp.cumsum(power)])
    win = p.nb_null_period
    ma = (csum[win:] - csum[:-win]) / win          # ma[i] = mean over [i, i+win)
    candidates = ma[: p.nb_frame_length]
    null_start = jnp.argmin(candidates)
    quality = candidates[null_start] / jnp.maximum(jnp.mean(power), 1e-20)
    return null_start.astype(jnp.int32), quality


@functools.partial(jax.jit, static_argnames=("mode", "rise_window"))
def estimate_null_end(buffer, null_start, mode: int = 1, rise_window: int = 64):
    """First index >= null_start where short-window power rises above half the
    buffer mean: the end of the null dip == start of the PRS cyclic prefix.

    Robust to how far inside the dip null_start landed (the reference's
    thresh_null_start/thresh_null_end hysteresis analog).
    """
    p = get_ofdm_params(mode)
    power = jnp.abs(buffer) ** 2
    csum = jnp.concatenate([jnp.zeros(1, power.dtype), jnp.cumsum(power)])
    ma = (csum[rise_window:] - csum[:-rise_window]) / rise_window
    thresh = 0.5 * jnp.mean(power)
    idx = jnp.arange(ma.shape[0])
    risen = (ma > thresh) & (idx >= null_start)
    # first rising index; fall back to null_start + null period if none
    null_end = jnp.where(jnp.any(risen), jnp.argmax(risen),
                         null_start + p.nb_null_period)
    return null_end.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("mode", "max_bins"))
def coarse_freq_estimate(prs_window, mode: int = 1, max_bins: int = 100):
    """Integer-bin CFO from a (roughly PRS-aligned) nb_fft sample window.

    Differential-spectrum correlation: D[k] = S[k+1] conj(S[k]) for both the
    received spectrum and the PRS reference, circularly cross-correlated via
    FFT; the peak lag within +/-max_bins is the coarse offset in carriers.

    Returns (offset_bins int32, peak_quality).
    """
    p = get_ofdm_params(mode)
    spec = jnp.fft.fft(prs_window)
    ref = jnp.asarray(get_prs_spectrum(mode))

    d_rx = spec * jnp.conj(jnp.roll(spec, 1))
    d_ref = ref * jnp.conj(jnp.roll(ref, 1))
    # circular cross-correlation over bin lags
    corr = jnp.fft.ifft(jnp.fft.fft(d_rx) * jnp.conj(jnp.fft.fft(d_ref)))
    mag = jnp.abs(corr)
    lags = jnp.concatenate([jnp.arange(0, max_bins + 1),
                            jnp.arange(p.nb_fft - max_bins, p.nb_fft)])
    vals = mag[lags]
    best = jnp.argmax(vals)
    lag = lags[best]
    offset = jnp.where(lag <= max_bins, lag, lag - p.nb_fft)
    quality = vals[best] / jnp.maximum(jnp.mean(mag), 1e-20)
    return offset.astype(jnp.int32), quality


@functools.partial(jax.jit, static_argnames=("mode", "search"))
def fine_time_sync(segment, mode: int = 1, search: int = 256):
    """PRS matched filter over `segment` (CFO-corrected), which is expected to
    contain the PRS starting near sample `search`.

    segment length must be >= 2*search + nb_fft. Returns (prs_start_in_segment,
    peak_to_mean) — the reference's impulse_peak_threshold_db analog is the
    peak-to-mean ratio.
    """
    p = get_ofdm_params(mode)
    ref = jnp.asarray(get_prs_time(mode))
    n = segment.shape[0]
    nfft = 1
    while nfft < n + p.nb_fft:
        nfft *= 2
    f_seg = jnp.fft.fft(segment, nfft)
    f_ref = jnp.fft.fft(ref, nfft)
    corr = jnp.fft.ifft(f_seg * jnp.conj(f_ref))
    mag = jnp.abs(corr[: 2 * search + 1])
    peak = jnp.argmax(mag)
    quality = mag[peak] / jnp.maximum(jnp.mean(mag), 1e-20)
    return peak.astype(jnp.int32), quality


@functools.partial(jax.jit, static_argnames=("mode", "length"))
def prs_search_full(buffer, mode: int = 1, length: int | None = None):
    """Global PRS matched filter: find the PRS body start anywhere in the
    first `length` (default one frame) of samples.

    Block-parallel replacement for the reference's RUNNING_FINE_TIME_SYNC
    state: one big FFT cross-correlation, argmax over all candidate lags.
    `buffer` should be CFO-corrected. Returns (prs_body_start, peak_to_mean).
    """
    p = get_ofdm_params(mode)
    if length is None:
        length = p.nb_frame_length
    ref = jnp.asarray(get_prs_time(mode))
    n = length + p.nb_fft
    nfft = 1
    while nfft < n:
        nfft *= 2
    seg = buffer[:n]
    corr = jnp.fft.ifft(jnp.fft.fft(seg, nfft) * jnp.conj(jnp.fft.fft(ref, nfft)))
    mag = jnp.abs(corr[:length])
    peak = jnp.argmax(mag)
    quality = mag[peak] / jnp.maximum(jnp.mean(mag), 1e-20)
    return peak.astype(jnp.int32), quality


@functools.partial(jax.jit, static_argnames=("mode",))
def fine_freq_autocorr(buffer, mode: int = 1):
    """Alignment-free fractional CFO: lag-Tu autocorrelation over the whole
    buffer (cyclic-prefix pairs dominate the correlation; the rest averages
    out). Unambiguous within +/- carrier_spacing/2.
    """
    p = get_ofdm_params(mode)
    n = (buffer.shape[0] - p.nb_fft) // 8 * 8
    acc = jnp.sum(buffer[:n] * jnp.conj(buffer[p.nb_fft : p.nb_fft + n]))
    angle = jnp.angle(acc)
    return (-angle / (2.0 * jnp.pi) * (SAMPLING_RATE / p.nb_fft)).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("mode",))
def fine_freq_estimate(frame, mode: int = 1):
    """Fractional CFO (Hz) from cyclic-prefix autocorrelation over all symbols.

    frame: (nb_frame_length,) starting at the null symbol, already coarse
    corrected. Unambiguous within +/- carrier_spacing/2.
    """
    p = get_ofdm_params(mode)
    syms = frame[p.nb_null_period:].reshape(p.nb_symbols, p.nb_symbol_period)
    head = syms[:, : p.nb_cyclic_prefix]
    tail = syms[:, p.nb_fft : p.nb_fft + p.nb_cyclic_prefix]
    acc = jnp.sum(head * jnp.conj(tail))
    angle = jnp.angle(acc)
    return (-angle / (2.0 * jnp.pi) * (SAMPLING_RATE / p.nb_fft)).astype(jnp.float32)


def acquire(buffer: np.ndarray, mode: int = 1, cfg: SyncConfig = SyncConfig()):
    """Full acquisition over a buffer of >= 2 frames of IQ.

    Returns a dict with frame_start (int), coarse_bins, fine_hz, net_freq_hz
    and quality diagnostics. Host-facing composition of the jitted estimators
    (each stage feeds the next; a few tiny host syncs per acquisition).
    """
    p = get_ofdm_params(mode)
    buffer = jnp.asarray(buffer)
    assert buffer.shape[0] >= 2 * p.nb_frame_length

    # 1. rough frame position: null-symbol power dip, then dip-end rise
    null_start, null_q = estimate_null_start(buffer, mode)
    null_end = int(estimate_null_end(buffer, null_start, mode))
    null_start = int(null_start)
    approx_prs = null_end + p.nb_cyclic_prefix

    # 2. fractional CFO, alignment-free (lag-Tu autocorrelation)
    fine_hz = float(fine_freq_autocorr(buffer[: 2 * p.nb_frame_length], mode))

    # 3. integer-bin CFO from a roughly PRS-aligned FFT window, AFTER
    # removing the fractional part (avoids the half-carrier ambiguity:
    # a true offset of 1.5 bins must not resolve to coarse=1, fine=-0.5)
    tw = jnp.arange(p.nb_fft, dtype=jnp.float32) / SAMPLING_RATE
    window = jax.lax.dynamic_slice(buffer, (approx_prs,), (p.nb_fft,)) \
        * jnp.exp(-2j * jnp.pi * fine_hz * tw).astype(jnp.complex64)
    coarse_bins, coarse_q = coarse_freq_estimate(window, mode, cfg.max_coarse_bins)
    coarse_hz = float(coarse_bins) * carrier_spacing_hz(mode)
    net_hz = coarse_hz + fine_hz

    # 4. exact timing: global PRS matched filter over one frame of lags
    n_corr = p.nb_frame_length + p.nb_fft
    t = jnp.arange(n_corr, dtype=jnp.float32) / SAMPLING_RATE
    seg_c = buffer[:n_corr] * jnp.exp(-2j * jnp.pi * net_hz * t).astype(jnp.complex64)
    peak, time_q = prs_search_full(seg_c, mode)
    prs_start = int(peak)
    frame_start = prs_start - p.nb_cyclic_prefix - p.nb_null_period
    if frame_start < 0:
        frame_start += p.nb_frame_length

    # 5. refine at the exact PRS position: coarse CFO again (now with a clean
    #    window), redo timing if it changed, then fractional CFO on the
    #    aligned frame
    prs_body = frame_start + p.nb_null_period + p.nb_cyclic_prefix
    if prs_body + p.nb_fft <= buffer.shape[0]:
        window2 = jax.lax.dynamic_slice(buffer, (prs_body,), (p.nb_fft,)) \
            * jnp.exp(-2j * jnp.pi * fine_hz * tw).astype(jnp.complex64)
        coarse2, coarse_q2 = coarse_freq_estimate(window2, mode, cfg.max_coarse_bins)
        if int(coarse2) != int(coarse_bins):
            coarse_bins = coarse2
            coarse_hz = float(coarse_bins) * carrier_spacing_hz(mode)
            net_hz = coarse_hz + fine_hz
            seg_c = buffer[:n_corr] * jnp.exp(-2j * jnp.pi * net_hz * t).astype(jnp.complex64)
            peak, time_q = prs_search_full(seg_c, mode)
            frame_start = int(peak) - p.nb_cyclic_prefix - p.nb_null_period
            if frame_start < 0:
                frame_start += p.nb_frame_length
        coarse_q = max(float(coarse_q), float(coarse_q2))
    if frame_start + p.nb_frame_length <= buffer.shape[0]:
        # small residual after FULL net correction (never re-wrapping)
        frame1 = jax.lax.dynamic_slice(buffer, (frame_start,), (p.nb_frame_length,))
        tf = jnp.arange(p.nb_frame_length, dtype=jnp.float32) / SAMPLING_RATE
        frame1_c = frame1 * jnp.exp(-2j * jnp.pi * net_hz * tf).astype(jnp.complex64)
        fine_hz += float(fine_freq_estimate(frame1_c, mode))
        net_hz = coarse_hz + fine_hz

    return {
        "frame_start": frame_start,
        "coarse_bins": int(coarse_bins),
        "coarse_hz": coarse_hz,
        "fine_hz": fine_hz,
        "net_freq_hz": net_hz,
        "null_quality": float(null_q),
        "coarse_quality": float(coarse_q),
        "time_quality": float(time_q),
    }
