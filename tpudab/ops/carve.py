"""Pallas carve+rotate kernel: IQ frames -> PLL-rotated bf16 FFT windows.

Why a hand kernel: the per-symbol FFT window slice is misaligned — the DAB
symbol stride (nb_fft + nb_cyclic_prefix, e.g. 2552 in mode I) is not a
multiple of the 128-lane tile, so every window starts at a different lane
phase and XLA lowers the strided slice to a relayout copy measured at
~75 GB/s on v5e (4.3 ms for 256 frames, vs the ~1 ms one HBM pass costs).
Here each frame row is staged in VMEM once and the 76 windows are extracted
with static lane-rotate concats at VPU speed, fused with the PLL/NCO
rotation (reference analog: apply_pll, SURVEY.md sec 2.2) and the bf16
downcast the dense-DFT matmul consumes (tpudab.ofdm.demod).

Numerics: phase is computed per element from the absolute sample index in
f32 (exact for indices < 2^24; frames are 196,608 samples) — identical to
the XLA path up to f32 rounding.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpudab.constants.ofdm_params import get_ofdm_params, SAMPLING_RATE

_LANES = 128


def _make_kernel(mode: int, window_offset: int, fb: int):
    p = get_ofdm_params(mode)
    n_sym, n_fft, n_cp = p.nb_symbols, p.nb_fft, p.nb_cyclic_prefix
    start = n_cp - window_offset
    rows_per_win = n_fft // _LANES
    two_pi_over_fs = 2.0 * np.pi / SAMPLING_RATE

    def kernel(ca_ref, sa_ref, ci_ref, si_ref, re_ref, im_ref,
               xr_ref, xi_ref):
        # fb frames per program: every roll/select/rotate below runs on
        # (fb, rows_per_win, 128) blocks — at fb=1 the per-op issue overhead
        # of ~150 tiny (16, 128) VPU ops per frame dominated the kernel
        # (measured 9 ms for a ~1 ms memory-bound job at 256 frames).
        # The per-frame in-window ramp cos/sin (ci/si) and the per-symbol
        # window-start rotators (ca/sa) are precomputed OUTSIDE in XLA
        # (tiny: f*(2048 + 76) points), so the kernel runs zero
        # transcendentals: rotator = angle addition of the two tables.
        vr = re_ref[...]                    # (fb, frame_rows, 128) f32
        vi = im_ref[...]
        cos_i = ci_ref[...]                 # (fb, rows_per_win, 128)
        sin_i = si_ref[...]
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (fb, rows_per_win, _LANES), 2)
        for s in range(n_sym):
            a = p.nb_null_period + (n_fft + n_cp) * s + start
            r0, ph_lane = divmod(a, _LANES)

            def win(v):
                # window = flat[a : a+n_fft] out of the (rows, 128) layout:
                # lane-rotate the two candidate row blocks left by the lane
                # phase and select per lane (Mosaic cannot concat slices with
                # mismatched sublane offsets, but roll+select lowers fine).
                # Slices upcast to f32 first: tpu.dynamic_rotate is 32-bit
                # only (bf16 input frames otherwise fail to compile), and the
                # PLL multiply needs f32 anyway.
                if ph_lane == 0:
                    return v[:, r0:r0 + rows_per_win, :].astype(jnp.float32)
                lo = pltpu.roll(
                    v[:, r0:r0 + rows_per_win, :].astype(jnp.float32),
                    _LANES - ph_lane, 2)
                hi = pltpu.roll(
                    v[:, r0 + 1:r0 + 1 + rows_per_win, :].astype(jnp.float32),
                    _LANES - ph_lane, 2)
                return jnp.where(lane < _LANES - ph_lane, lo, hi)

            wr, wi = win(vr), win(vi)
            # (fb, 1, 128): lane-broadcast precomputed outside — Mosaic
            # supports sublane-only broadcast, not sublane+lane at once
            ca = ca_ref[:, s:s + 1, :]
            sa = sa_ref[:, s:s + 1, :]
            c = ca * cos_i - sa * sin_i
            sn = sa * cos_i + ca * sin_i
            lo = rows_per_win * s
            xr_ref[:, lo:lo + rows_per_win, :] = \
                (wr * c - wi * sn).astype(xr_ref.dtype)
            xi_ref[:, lo:lo + rows_per_win, :] = \
                (wr * sn + wi * c).astype(xi_ref.dtype)

    return kernel, n_sym, rows_per_win


@functools.partial(jax.jit, static_argnames=("mode", "window_offset",
                                             "out_dtype", "interpret"))
def carve_rotate(frames_re, frames_im, freq_hz, mode: int = 1,
                 window_offset: int = 12, out_dtype: str = "bfloat16",
                 interpret: bool = False):
    """Lane-tiled (F, nb_frame_length//128, 128) f32 frames + (F,) freq ->
    (F, n_sym * n_fft//128, 128) rotated FFT windows in out_dtype (split
    re/im). Both shapes are the NATIVE device tiling — callers must not
    reshape the output back to (F, n_sym, n_fft) on device (that is a real
    relayout for sub-32-bit dtypes); split the row axis to
    (F, n_sym, n_fft//128, 128) instead, which is free."""
    p = get_ofdm_params(mode)
    f = frames_re.shape[0]
    assert p.nb_frame_length % _LANES == 0 and p.nb_fft % _LANES == 0
    frame_rows = p.nb_frame_length // _LANES
    assert frames_re.shape[1:] == (frame_rows, _LANES), frames_re.shape
    # bf16 input frames are supported (and preferred on the hot path: SDR
    # IQ is 8-12 bit ADC data, exactly representable in bf16's 8-bit
    # mantissa; halves the kernel's dominant DMA-in traffic). The rotation
    # tables stay f32; in-kernel multiplies promote per element.

    # frames per program: largest power of two dividing f (cap 8 to stay
    # well under VMEM with double buffering: 8 frames = 12.6 MB f32 in)
    fb = next(b for b in (8, 4, 2, 1) if f % b == 0)
    kernel, n_sym, rows_per_win = _make_kernel(mode, window_offset, fb)
    freq = jnp.broadcast_to(jnp.asarray(freq_hz, jnp.float32), (f,))
    re3, im3 = frames_re, frames_im
    dt = jnp.dtype(out_dtype)

    # precompute the rotator tables (XLA, tiny): in-window phase ramp
    # cos/sin per frame, and the per-(frame, symbol) window-start rotator
    n_cp = p.nb_cyclic_prefix
    start = n_cp - window_offset
    scale = (-2.0 * np.pi / SAMPLING_RATE) * freq
    idx = jnp.arange(p.nb_fft, dtype=jnp.float32)
    ph_idx = scale[:, None] * idx[None, :]
    cos_i = jnp.cos(ph_idx).reshape(f, rows_per_win, _LANES)
    sin_i = jnp.sin(ph_idx).reshape(f, rows_per_win, _LANES)
    a_sym = (p.nb_null_period + start
             + (p.nb_fft + n_cp) * np.arange(n_sym)).astype(np.float32)
    ph_a = scale[:, None] * jnp.asarray(a_sym)[None, :]
    ca = jnp.broadcast_to(jnp.cos(ph_a)[:, :, None], (f, n_sym, _LANES))
    sa = jnp.broadcast_to(jnp.sin(ph_a)[:, :, None], (f, n_sym, _LANES))

    out_rows = n_sym * rows_per_win
    blk = lambda shape: pl.BlockSpec(shape, lambda i: (i,) + (0,) * (
        len(shape) - 1), memory_space=pltpu.VMEM)
    xr, xi = pl.pallas_call(
        kernel,
        grid=(f // fb,),
        in_specs=[
            blk((fb, n_sym, _LANES)),
            blk((fb, n_sym, _LANES)),
            blk((fb, rows_per_win, _LANES)),
            blk((fb, rows_per_win, _LANES)),
            blk((fb, frame_rows, _LANES)),
            blk((fb, frame_rows, _LANES)),
        ],
        out_specs=[
            blk((fb, out_rows, _LANES)),
            blk((fb, out_rows, _LANES)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((f, out_rows, _LANES), dt),
            jax.ShapeDtypeStruct((f, out_rows, _LANES), dt),
        ],
        # fb=8 double-buffered blocks need ~34 MB of VMEM; the scoped
        # default is 16 MB (v5e has 128 MB physical)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ca, sa, cos_i, sin_i, re3, im3)
    return xr, xi
