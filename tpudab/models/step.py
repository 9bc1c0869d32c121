"""Pure jittable receive step: aligned IQ frames -> decoded FIC + MSC bits.

This is the flagship device program (SURVEY.md sec 7 architecture:
`step(carry, iq_block) -> (carry, outputs)`): PLL + batched FFT demod +
FIC depuncture/Viterbi/descramble + per-subchannel time-deinterleave (ring
carry) + depuncture/Viterbi/descramble — everything on device, bit outputs
packed to bytes on device. The host only parses bytes (FIGs, superframes).

Used by __graft_entry__ (compile check), bench.py (throughput), and
tpudab.parallel (sharded multi-chip variant).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from tpudab.constants.ofdm_params import get_ofdm_params
from tpudab.constants.dab_params import get_dab_params, CIF_BITS, CU_BITS
from tpudab.constants.puncture import FIC_PROFILE, FIC_PROFILE_MODE3
from tpudab.fec.prbs import prbs_bits
from tpudab.fec.depuncture import depuncture
from tpudab.msc.subchannel import SubchannelConfig
from tpudab.msc.interleave import deinterleave_batch, TIME_INTERLEAVE_DEPTH
from tpudab.ofdm.demod import demod_frames_split
from tpudab.ops.viterbi_pallas import viterbi_decode_best as viterbi_decode
from tpudab.utils.bits import jnp_pack_bits


def _descramble_pack(bits, n_bits: int):
    """Device-side energy-dispersal descramble + MSB-first byte pack."""
    prbs = jnp.asarray(prbs_bits(n_bits))
    return jnp_pack_bits(bits ^ prbs)


@dataclasses.dataclass
class ReceiveStep:
    """Builds a jitted step for a fixed subchannel configuration.

    n_ensembles > 1 adds a leading ensemble axis to frames/carry/outputs:
    one chip decodes N independent ensembles per step, multiplying every
    Viterbi/demod batch by N (the single-chip form of BASELINE config 5's
    multi-ensemble batching — per-chip throughput is batch-bound).
    """

    mode: int
    subchannels: Tuple[SubchannelConfig, ...]
    window_offset: int = 12
    n_ensembles: int = 1
    # Soft-bit dtype for the FEC chain (deinterleave ring, depuncture).
    # bfloat16 halves the HBM traffic of the chain's memory-bound stages
    # (deinterleave 6.4 -> 2.2 ms at production batch on v5e); Viterbi
    # decisions are scale-invariant and the ~2^-9 rounding sits ~30 dB
    # below channel noise at operating SNR. Set "float32" for bit-exact
    # parity with the per-stage oracles.
    soft_dtype: str = "bfloat16"

    def __post_init__(self):
        self.params = get_ofdm_params(self.mode)
        self.dab = get_dab_params(self.mode)
        self._fn = jax.jit(self._step)

    # -------- carry --------

    def init_carry(self) -> Dict[str, jnp.ndarray]:
        e = self.n_ensembles
        shape = lambda n: (TIME_INTERLEAVE_DEPTH - 1, n) if e == 1 \
            else (e, TIME_INTERLEAVE_DEPTH - 1, n)
        dt = jnp.dtype(self.soft_dtype)
        return {
            f"deint_{cfg.subch_id}": jnp.zeros(shape(cfg.slice_bits), dt)
            for cfg in self.subchannels
        }

    # -------- the step --------

    def _step(self, carry, frames_re, frames_im, freq_hz):
        """frames_re/_im: (F, frame_len) — or (E, F, frame_len) when
        n_ensembles > 1 — float32 aligned; freq_hz scalar or (E,).

        Split re/im keeps the device program complex-free (FFT = MXU matmuls
        via tpudab.ops.matfft). Returns (carry, outputs) with outputs:
          fic_bytes: ([E,] F * n_groups, group_bytes) uint8 (pre-CRC-check)
          subch: {id: ([E,] C, frame_bytes) uint8} decoded logical frames
                 (logical index alignment handled by the host wrapper)
        """
        p, dab = self.params, self.dab
        e = self.n_ensembles
        if e > 1:
            f = frames_re.shape[1]
            flat_re = frames_re.reshape(e * f, p.nb_frame_length)
            flat_im = frames_im.reshape(e * f, p.nb_frame_length)
            freq_rep = jnp.repeat(jnp.broadcast_to(
                jnp.asarray(freq_hz, jnp.float32), (e,)), f)
        else:
            f = frames_re.shape[0]
            flat_re, flat_im, freq_rep = frames_re, frames_im, freq_hz
        soft, stats = demod_frames_split(flat_re, flat_im, freq_rep,
                                         self.mode, self.window_offset)
        soft = soft.astype(jnp.dtype(self.soft_dtype))

        # ---- FIC ----
        fic_profile = FIC_PROFILE_MODE3 if self.mode == 3 else FIC_PROFILE
        g = dab.nb_fib_groups
        groups = soft[:, : dab.nb_fic_bits].reshape(-1, dab.nb_fic_bits_per_group)
        n_bits = fic_profile.data_bits
        mother = depuncture(groups, fic_profile).reshape(-1, n_bits + 6, 4)
        fic_bits = viterbi_decode(mother, n_bits)
        fic_bytes = _descramble_pack(fic_bits, n_bits)
        if e > 1:
            fic_bytes = fic_bytes.reshape(e, f * g, -1)

        # ---- MSC ----
        # Subchannels with identical coding geometry (profile + size) batch
        # into ONE Viterbi call — across subchannels AND ensembles: per-chip
        # throughput scales with batch, not with per-trellis speed
        # (SURVEY.md sec 7 'Hard parts': lane-pack subchannels).
        c = f * dab.nb_cifs
        cifs = soft[:, dab.nb_fic_bits:].reshape(e, c, CIF_BITS) if e > 1 \
            else soft[:, dab.nb_fic_bits:].reshape(c, CIF_BITS)
        new_carry = dict(carry)
        subch_out = {}
        groups: Dict[tuple, list] = {}
        for cfg in self.subchannels:
            key = (cfg.profile, cfg.slice_bits, cfg.padding_bits)
            groups.setdefault(key, []).append(cfg)
        for (profile, slice_bits, padding_bits), cfgs in groups.items():
            logicals = []
            for cfg in cfgs:
                lo = cfg.start_cu * CU_BITS
                sl = jax.lax.slice_in_dim(cifs, lo, lo + cfg.slice_bits, axis=-1)
                hist = carry[f"deint_{cfg.subch_id}"]
                buf = jnp.concatenate([hist, sl], axis=-2)
                logicals.append(deinterleave_batch(buf, c))
                new_carry[f"deint_{cfg.subch_id}"] = \
                    buf[..., -(TIME_INTERLEAVE_DEPTH - 1):, :]
            # (n_sub * [E *] C, slice)
            logical = jnp.concatenate(
                [l.reshape(-1, slice_bits) for l in logicals], axis=0)
            body = logical[:, : slice_bits - padding_bits] \
                if padding_bits else logical
            n_bits = profile.data_bits
            mother = depuncture(body, profile).reshape(-1, n_bits + 6, 4)
            bits = viterbi_decode(mother, n_bits)
            by = _descramble_pack(bits, n_bits)
            by = by.reshape((len(cfgs), e, c, -1) if e > 1
                            else (len(cfgs), c, -1))
            for i, cfg in enumerate(cfgs):
                subch_out[cfg.subch_id] = by[i]

        outputs = {"fic_bytes": fic_bytes, "subch": subch_out,
                   "mean_power": stats["mean_power"]}
        return new_carry, outputs

    def __call__(self, carry, frames_re, frames_im, freq_hz):
        return self._fn(carry, frames_re, frames_im, freq_hz)

    def call_complex(self, carry, frames, freq_hz):
        """Convenience wrapper for complex64 host buffers."""
        frames = np.asarray(frames)
        return self._fn(carry, jnp.asarray(frames.real),
                        jnp.asarray(frames.imag), freq_hz)

    def example_args(self, n_frames: int = 4, seed: int = 0):
        rng = np.random.default_rng(seed)
        shape = (n_frames, self.params.nb_frame_length)
        if self.n_ensembles > 1:
            shape = (self.n_ensembles,) + shape
        re = rng.standard_normal(shape).astype(np.float32)
        im = rng.standard_normal(shape).astype(np.float32)
        return (self.init_carry(), jnp.asarray(re), jnp.asarray(im),
                jnp.float32(0.0))
