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


def _make_kernel(mode: int, window_offset: int):
    p = get_ofdm_params(mode)
    n_sym, n_fft, n_cp = p.nb_symbols, p.nb_fft, p.nb_cyclic_prefix
    start = n_cp - window_offset
    rows_per_win = n_fft // _LANES
    two_pi_over_fs = 2.0 * np.pi / SAMPLING_RATE

    def kernel(freq_ref, re_ref, im_ref, xr_ref, xi_ref):
        f = freq_ref[pl.program_id(0), 0]
        vr = re_ref[0]                      # (frame_rows, 128) f32
        vi = im_ref[0]
        i_idx = jax.lax.broadcasted_iota(
            jnp.int32, (rows_per_win, _LANES), 0).astype(jnp.float32)
        j_idx = jax.lax.broadcasted_iota(
            jnp.int32, (rows_per_win, _LANES), 1).astype(jnp.float32)
        scale = -two_pi_over_fs * f
        # The in-window phase ramp scale*(128 i + j) is the same for every
        # symbol: evaluate the vector cos/sin ONCE and get each window's
        # rotator by angle addition with two scalar transcendentals
        # (cos/sin are the kernel's dominant VPU cost otherwise).
        ph_idx = scale * (_LANES * i_idx + j_idx)
        cos_i, sin_i = jnp.cos(ph_idx), jnp.sin(ph_idx)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows_per_win, _LANES), 1)
        for s in range(n_sym):
            a = p.nb_null_period + (n_fft + n_cp) * s + start
            r0, ph_lane = divmod(a, _LANES)

            def win(v):
                # window = flat[a : a+n_fft] out of the (rows, 128) layout:
                # lane-rotate the two candidate row blocks left by the lane
                # phase and select per lane (Mosaic cannot concat slices with
                # mismatched sublane offsets, but roll+select lowers fine)
                if ph_lane == 0:
                    return v[r0:r0 + rows_per_win, :]
                lo = pltpu.roll(v[r0:r0 + rows_per_win, :],
                                _LANES - ph_lane, 1)
                hi = pltpu.roll(v[r0 + 1:r0 + 1 + rows_per_win, :],
                                _LANES - ph_lane, 1)
                return jnp.where(lane < _LANES - ph_lane, lo, hi)

            wr, wi = win(vr), win(vi)
            ph_a = scale * float(a)
            ca, sa = jnp.cos(ph_a), jnp.sin(ph_a)
            c = ca * cos_i - sa * sin_i
            sn = sa * cos_i + ca * sin_i
            lo = rows_per_win * s
            xr_ref[0, lo:lo + rows_per_win, :] = \
                (wr * c - wi * sn).astype(xr_ref.dtype)
            xi_ref[0, lo:lo + rows_per_win, :] = \
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

    kernel, n_sym, rows_per_win = _make_kernel(mode, window_offset)
    freq = jnp.broadcast_to(
        jnp.asarray(freq_hz, jnp.float32), (f,)).reshape(f, 1)
    re3, im3 = frames_re, frames_im
    dt = jnp.dtype(out_dtype)

    out_rows = n_sym * rows_per_win
    xr, xi = pl.pallas_call(
        kernel,
        grid=(f,),
        in_specs=[
            pl.BlockSpec(freq.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, frame_rows, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, frame_rows, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, out_rows, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_rows, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((f, out_rows, _LANES), dt),
            jax.ShapeDtypeStruct((f, out_rows, _LANES), dt),
        ],
        interpret=interpret,
    )(freq, re3, im3)
    return xr, xi
