"""Pallas-TPU Viterbi decoder (ACS + traceback) for the K=7 r=1/4 DAB code.

This is the framework's flagship hand kernel (SURVEY.md sec 2.3 row 2:
"#1 native-kernel target: Pallas ACS kernel"), v3.

Why a hand kernel at all: the XLA lax.scan decoder (tpudab.ops.viterbi) is
bound by per-iteration HBM round-trips — the branch-metric matmul output,
the gathered candidates and the (B, 64) path-metric carry all materialize
in HBM every trellis step (~30 MB/step at production batch), ~60 GB per
full decode.  Here the path metrics never leave VMEM; HBM traffic is the
information-theoretic minimum: soft bits in, 2-bit decisions out, packed
traceback bytes out.

Layout (learned from the failed v1/v2 attempts, see git history):
- 64 trellis states on SUBLANES, batch on LANES — every ACS op is a full
  (64, B_t) vreg op; no lane shuffles.
- radix-2 trellis compaction (two input bits per ACS step): the 4-way
  predecessor "gather" pred_j(s'') = (s''>>2) | (j<<4) is, for fixed j, a
  contiguous 16-sublane slice of pm repeated 4x consecutively — exactly
  `pltpu.repeat(pm[16j:16j+16], 4, axis=0)`.  No one-hot matmuls in the
  sequential dependency chain (v2's mistake: per-step MXU latency chains).
- soft bits are pre-arranged (T2, 8, B): one super-step slice soft[t] is an
  8-sublane tile-aligned (8, B_t) read; branch metrics for all 256
  super-transitions are one small MXU matmul (256,8)@(8,B_t) that does NOT
  depend on the path metrics (v2 streamed precomputed (T, B, 128) branch
  metrics from HBM — 512 B/codeword/step of pure bandwidth waste).
- decisions stream out as (T2, 64, B) uint8 (2 bits used), 32 B/cw/step.
- traceback is a second kernel walking chunks in reverse grid order with
  the per-codeword state in SMEM-free (1, B_t) VMEM scratch; the survivor
  selection dec[t, state_b, b] is a sublane-masked reduction.  Output is
  one packed byte per super-step: state & 3 = (u_{2t} << 1) | u_{2t+1}.

Exactness: identical decisions to tpudab.ops.viterbi.viterbi_decode
(ties: pairwise maxima replicate first-index argmax) up to f32 rounding of
the rebase schedule (rebased once per chunk here; rebase subtracts a
per-codeword constant so decisions are unaffected).

Soft-bit convention as in tpudab.ops.viterbi; codewords padded with the
virtual-flush pattern batch freely.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpudab.fec.conv import N_STATES
from tpudab.ops.viterbi import _radix_tables

_NEG = -1e9
_K = 2  # radix-2: two trellis steps per ACS iteration


def _fwd_kernel(signs_ref, soft_ref, dec_ref, pm_ref):
    """Grid (b tiles, T2 chunks), chunk minor. Blocks:
    signs (256, 8) const; soft (chunk, 8, B_t); dec out (chunk//4, 64, B_t)
    u8 — 4 super-steps' 2-bit decisions PACKED per byte, step tb+q in bits
    [6-2q, 8-2q) — so the store + u8 convert amortize over 4 ACS steps and
    decision HBM shrinks 4x; pm scratch (64, B_t) f32 persists across the
    chunk axis.
    """
    chunk = soft_ref.shape[0]
    b_t = soft_ref.shape[2]

    @pl.when(pl.program_id(1) == 0)
    def _():
        row = jax.lax.broadcasted_iota(jnp.int32, (N_STATES, b_t), 0)
        pm_ref[:] = jnp.where(row == 0, 0.0, _NEG).astype(jnp.float32)

    signs = signs_ref[:]  # (256, 8)

    def acs(pm, soft_t):
        bm = jax.lax.dot_general(
            signs, soft_t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (256, B_t)
        # consecutive repeat (np.repeat semantics): row u of c_j is
        # pm[16j + (u >> 2)]  (pltpu.repeat is TILED, not consecutive)
        c0 = jnp.repeat(pm[0:16], 4, axis=0) + bm[0:64]
        c1 = jnp.repeat(pm[16:32], 4, axis=0) + bm[64:128]
        c2 = jnp.repeat(pm[32:48], 4, axis=0) + bm[128:192]
        c3 = jnp.repeat(pm[48:64], 4, axis=0) + bm[192:256]
        d01 = (c1 > c0).astype(jnp.int32)
        m01 = jnp.maximum(c0, c1)
        d23 = (c3 > c2).astype(jnp.int32)
        m23 = jnp.maximum(c2, c3)
        dh = m23 > m01
        new_pm = jnp.maximum(m01, m23)
        return new_pm, jnp.where(dh, d23 | 2, d01)

    def group(i, pm):
        acc = None
        for q in range(4):
            pm, dec = acs(pm, soft_ref[4 * i + q])
            dec = dec << (6 - 2 * q)
            acc = dec if acc is None else acc | dec
        dec_ref[i] = acc.astype(jnp.uint8)
        return pm

    pm = lax.fori_loop(0, chunk // 4, group, pm_ref[:])
    # rebase once per chunk: subtracting a per-codeword constant never
    # changes decisions; spread growth over one chunk is << f32 range
    pm_ref[:] = pm - pm[0:1, :]


def _select_row(dec_b, state):
    """Extract dec_b[state[0, b], b] per lane via a 6-level binary select
    tree on the state bits (63 vreg-selects) — measured ~10% faster than
    the 64-sublane masked reduction it replaces, and exact (r5)."""
    v = dec_b
    for k in range(5, -1, -1):
        half = v.shape[0] // 2
        bit = ((state >> k) & 1) > 0                       # (1, B_t) bool
        v = jnp.where(bit, v[half:], v[:half])
    return v                                                # (1, B_t)


def _tb_kernel_packed(dec_ref, out_ref, state_ref):
    """Traceback over byte-packed decisions, emitting 8 decoded bits
    (4 radix-2 super-steps) per output byte, MSB-first — the natural DAB
    byte order — so the decoder's output IS the packed byte stream (no
    separate device-side bit pack). Grid (b tiles, T2 chunks) with the
    chunk axis REVERSED via the index maps.
    Blocks: dec (chunk//4, 64, B_t) u8 (packed, see _fwd_kernel);
    out (chunk//4, 1, B_t) u8; state scratch (1, B_t) i32."""
    n_groups = dec_ref.shape[0]
    b_t = dec_ref.shape[2]

    @pl.when(pl.program_id(1) == 0)
    def _():
        state_ref[:] = jnp.zeros((1, b_t), jnp.int32)

    def group(i, state):
        gb = n_groups - 1 - i
        dec_b = dec_ref[gb].astype(jnp.int32)              # (64, B_t)
        acc = jnp.zeros((1, b_t), jnp.int32)
        for q in range(3, -1, -1):
            j = (_select_row(dec_b, state) >> (6 - 2 * q)) & 3
            acc = acc | ((state & 3) << (6 - 2 * q))
            state = (state >> _K) | (j << (6 - _K))
        out_ref[gb] = acc.astype(jnp.uint8)
        return state

    state_ref[:] = lax.fori_loop(0, n_groups, group, state_ref[:])


def _tb_kernel(dec_ref, out_ref, state_ref):
    """Per-super-step output variant (used by the bit-level decoder). Grid
    (b tiles, T2 chunks) with the chunk axis REVERSED via the index maps.
    Blocks: dec (chunk//4, 64, B_t) u8 (packed); out (chunk, 1, B_t) u8
    holding (u_{2t}<<1 | u_{2t+1}); state scratch (1, B_t) i32. The output
    keeps a unit middle dim so the per-step store indexes the untiled
    leading dim (dynamic sublane stores are not provably aligned).
    """
    n_groups = dec_ref.shape[0]
    b_t = dec_ref.shape[2]

    @pl.when(pl.program_id(1) == 0)
    def _():
        state_ref[:] = jnp.zeros((1, b_t), jnp.int32)

    def group(i, state):
        gb = n_groups - 1 - i
        dec_b = dec_ref[gb].astype(jnp.int32)              # (64, B_t)
        for q in range(3, -1, -1):
            j = (_select_row(dec_b, state) >> (6 - 2 * q)) & 3
            out_ref[4 * gb + q] = (state & 3).astype(jnp.uint8)
            state = (state >> _K) | (j << (6 - _K))
        return state

    state_ref[:] = lax.fori_loop(0, n_groups, group, state_ref[:])


def _pad_to(x, m, axis, value):
    r = x.shape[axis] % m
    if r == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, m - r)
    return jnp.pad(x, pad, constant_values=value)


def _fwd_decisions(mother_soft, chunk: int, b_tile: int | None,
                   interpret: bool):
    """Shared forward pass: returns byte-packed decisions
    (decs (T2//4, 64, B) u8 — 4 super-steps per byte), plus geometry."""
    assert chunk % 4 == 0
    b0, t0, _ = mother_soft.shape
    if b_tile is None:
        # batch lives on the LANE axis: multiples of 128 only. 1024 lanes/
        # tile measured fastest at production batch (14.1 vs 15.6 ms for
        # 512 at B=6144, T=3462 on v5e) — fewer grid cells, same VPU work.
        b_tile = min(1024, 128 * ((b0 + 127) // 128))
    # pad T so the packed-decision grouping (4 super-steps/byte) is whole
    soft = _pad_to(mother_soft, _K * 4 * chunk, axis=1, value=1.0)  # flush
    soft = _pad_to(soft, b_tile, axis=0, value=0.0)
    b, t, _ = soft.shape
    t2 = t // _K
    n_chunks = t2 // chunk
    n_b = b // b_tile

    signs_np, _ = _radix_tables(_K)           # (8, 256)
    # (B, T, 4) -> (T2, 8, B): lane dim = batch, one tile-aligned sublane
    # slice per super-step. bf16 soft (the production dtype) stays bf16
    # through this relayout — the (B <-> T2*8) transpose is a full HBM
    # pass, so keeping it 16-bit halves its traffic; the in-kernel branch-
    # metric matmul takes bf16 operands natively (f32 accumulate), and the
    # ACS path metrics remain f32. Other dtypes upcast to f32 here.
    sdt = jnp.bfloat16 if soft.dtype == jnp.bfloat16 else jnp.float32
    signs = jnp.asarray(signs_np.T, sdt)      # (256, 8), exact in bf16
    soft_t = jnp.moveaxis(soft.reshape(b, t2, 4 * _K), 0, 2).astype(sdt)

    decs = pl.pallas_call(
        _fwd_kernel,
        grid=(n_b, n_chunks),
        in_specs=[
            pl.BlockSpec((256, 4 * _K), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 4 * _K, b_tile), lambda j, i: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk // 4, N_STATES, b_tile),
                               lambda j, i: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t2 // 4, N_STATES, b), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((N_STATES, b_tile), jnp.float32)],
        interpret=interpret,
    )(signs, soft_t)
    return decs, b0, t2, b, b_tile, n_b, n_chunks


@functools.partial(jax.jit, static_argnames=("n_data_bits", "chunk", "b_tile",
                                             "interpret"))
def viterbi_decode_pallas_bytes(mother_soft, n_data_bits: int,
                                chunk: int = 32, b_tile: int | None = None,
                                interpret: bool = False):
    """Viterbi decode returning MSB-first PACKED BYTES (B, n_data_bits//8).

    The traceback kernel accumulates 8 decoded bits per output byte in
    registers, so the packed byte stream comes straight out of VMEM — the
    production path for the receive step, where a separate device-side
    bit-pack of the (B, n_bits) u8 decisions measured 1.4 ms/step on v5e
    (padded-layout ops on a (..., 8)-minor reshape).
    """
    assert n_data_bits % 8 == 0 and chunk % 4 == 0
    decs, b0, t2, b, b_tile, n_b, n_chunks = _fwd_decisions(
        mother_soft, chunk, b_tile, interpret)

    packed = pl.pallas_call(
        _tb_kernel_packed,
        grid=(n_b, n_chunks),
        in_specs=[
            pl.BlockSpec((chunk // 4, N_STATES, b_tile),
                         lambda j, i: (pl.num_programs(1) - 1 - i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk // 4, 1, b_tile),
                               lambda j, i: (pl.num_programs(1) - 1 - i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t2 // 4, 1, b), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((1, b_tile), jnp.int32)],
        interpret=interpret,
    )(decs)

    by = jnp.moveaxis(packed[:, 0, :], 0, 1)              # (B, T2//4)
    return by[:b0, :n_data_bits // 8]


@functools.partial(jax.jit, static_argnames=("n_data_bits", "chunk", "b_tile",
                                             "interpret"))
def viterbi_decode_pallas(mother_soft, n_data_bits: int, chunk: int = 32,
                          b_tile: int | None = None, interpret: bool = False):
    """Drop-in equivalent of tpudab.ops.viterbi.viterbi_decode.

    mother_soft: (B, T, 4) float32; returns (B, n_data_bits) uint8.

    Measured (TPU v5e, B=6144, T=3462, queued-dispatch timing): 14.4 ms end
    to end (fwd 10.4 + traceback 2.5 + layout glue) = 1475 Mbit/s payload,
    vs 27.4 ms for the XLA lax.scan decoder — and the fwd kernel sits at its
    VPU issue-rate bound (~8 vector ops per 2 trellis steps).
    """
    decs, b0, t2, b, b_tile, n_b, n_chunks = _fwd_decisions(
        mother_soft, chunk, b_tile, interpret)

    packed = pl.pallas_call(
        _tb_kernel,
        grid=(n_b, n_chunks),
        in_specs=[
            pl.BlockSpec((chunk // 4, N_STATES, b_tile),
                         lambda j, i: (pl.num_programs(1) - 1 - i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, 1, b_tile),
                               lambda j, i: (pl.num_programs(1) - 1 - i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t2, 1, b), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((1, b_tile), jnp.int32)],
        interpret=interpret,
    )(decs)

    # unpack: byte at super-step t holds (u_{2t} << 1) | u_{2t+1}
    packed = jnp.moveaxis(packed[:, 0, :], 0, 1)          # (B, T2)
    bits = jnp.stack([(packed >> 1) & 1, packed & 1], axis=-1)
    bits = bits.reshape(b, t2 * _K)
    return bits[:b0, :n_data_bits]


@functools.partial(jax.jit, static_argnames=("n_data_bits", "chunk", "b_tile",
                                             "interpret"))
def viterbi_decode_pallas_bytes_t(soft_t, n_data_bits: int, chunk: int = 16,
                                  b_tile: int | None = None,
                                  interpret: bool = False):
    """Viterbi decode from PRE-TRANSPOSED soft input (T2p, 8, B) — the
    layout tpudab.fec.depuncture.depuncture_t emits — to MSB-first packed
    bytes (B, n_data_bits // 8).

    Skips the (B, T, 4) -> (T2, 8, B) relayout entirely; depuncture_t
    fills the tail pad with the +1.0 virtual-flush pattern so the decode
    is bit-identical to the flush-padded (B, T, 4) path. chunk=16 always
    divides T2p = 16 * n_blocks. Production path for the receive step's
    MSC + FIC decode.
    """
    assert n_data_bits % 8 == 0 and chunk % 4 == 0
    t2, eight, b0 = soft_t.shape
    assert eight == 4 * _K and t2 % chunk == 0
    if b_tile is None:
        b_tile = min(1024, 128 * ((b0 + 127) // 128))
    soft_t = _pad_to(soft_t, b_tile, axis=2, value=0.0)
    b = soft_t.shape[2]
    n_b = b // b_tile
    n_chunks = t2 // chunk

    signs_np, _ = _radix_tables(_K)
    sdt = jnp.bfloat16 if soft_t.dtype == jnp.bfloat16 else jnp.float32
    signs = jnp.asarray(signs_np.T, sdt)
    soft_t = soft_t.astype(sdt)

    decs = pl.pallas_call(
        _fwd_kernel,
        grid=(n_b, n_chunks),
        in_specs=[
            pl.BlockSpec((256, 4 * _K), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 4 * _K, b_tile), lambda j, i: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk // 4, N_STATES, b_tile),
                               lambda j, i: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t2 // 4, N_STATES, b), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((N_STATES, b_tile), jnp.float32)],
        interpret=interpret,
    )(signs, soft_t)

    packed = pl.pallas_call(
        _tb_kernel_packed,
        grid=(n_b, n_chunks),
        in_specs=[
            pl.BlockSpec((chunk // 4, N_STATES, b_tile),
                         lambda j, i: (pl.num_programs(1) - 1 - i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk // 4, 1, b_tile),
                               lambda j, i: (pl.num_programs(1) - 1 - i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t2 // 4, 1, b), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((1, b_tile), jnp.int32)],
        interpret=interpret,
    )(decs)

    by = jnp.moveaxis(packed[:, 0, :], 0, 1)              # (B, T2p//4)
    return by[:b0, :n_data_bits // 8]


def viterbi_decode_bytes_best_t(soft_t, n_data_bits: int):
    """Backend-dispatching transposed-input decode: Pallas on TPU; on CPU
    the input is relaid to (B, T, 4) and decoded by the XLA scan (bit-
    identical for terminated codewords)."""
    if _use_pallas():
        return viterbi_decode_pallas_bytes_t(soft_t, n_data_bits)
    from tpudab.ops.viterbi import viterbi_decode
    from tpudab.utils.bits import jnp_pack_bits
    t2, _, b = soft_t.shape
    soft = jnp.moveaxis(soft_t, 2, 0).reshape(b, t2 * _K, 4)
    soft = soft[:, : n_data_bits + 6]
    return jnp_pack_bits(viterbi_decode(soft.astype(jnp.float32),
                                        n_data_bits))


def _platform() -> str:
    try:
        return jax.devices()[0].platform.lower()
    except Exception:
        return "cpu"


@functools.lru_cache(maxsize=1)
def _use_pallas() -> bool:
    """Pallas kernel on TPU backends only (the kernels use pltpu memory
    spaces and will not lower on GPU); XLA scan decoder elsewhere (CPU
    tests / virtual meshes). Override with TPUDAB_VITERBI=pallas|xla."""
    import os
    force = os.environ.get("TPUDAB_VITERBI", "").lower()
    if force == "pallas":
        return True
    if force == "xla":
        return False
    return _platform() == "tpu"


def viterbi_decode_best(mother_soft, n_data_bits: int):
    """Backend-dispatching Viterbi decode: Pallas ACS kernel on TPU, XLA
    scan decoder on CPU (where Mosaic kernels would need interpret mode)."""
    from tpudab.ops.viterbi import viterbi_decode
    if _use_pallas():
        return viterbi_decode_pallas(mother_soft, n_data_bits)
    return viterbi_decode(mother_soft, n_data_bits)


def viterbi_decode_bytes_best(mother_soft, n_data_bits: int):
    """Backend-dispatching Viterbi decode to MSB-first packed bytes
    (n_data_bits % 8 == 0): in-kernel packing on TPU, scan + pack on CPU."""
    if _use_pallas():
        return viterbi_decode_pallas_bytes(mother_soft, n_data_bits)
    from tpudab.ops.viterbi import viterbi_decode
    from tpudab.utils.bits import jnp_pack_bits
    return jnp_pack_bits(viterbi_decode(mother_soft, n_data_bits))
