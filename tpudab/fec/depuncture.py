"""Puncturing (synthesizer) and depuncturing (receiver) as static gathers.

The receiver-side depuncture expands a punctured soft-bit stream back to the
4*(I+6) mother-code positions, inserting 0.0 (erasure) at punctured slots.
On device this is a single static scatter (jnp .at[].set with a baked index
array) — the TPU-native analog of the reference's scalar depuncture loops
(SURVEY.md sec 2.3 'Depuncturing').
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from tpudab.constants.puncture import PunctureProfile


@functools.lru_cache(maxsize=None)
def _keep_indices(profile: PunctureProfile) -> np.ndarray:
    mask = profile.mask()
    return np.nonzero(mask)[0].astype(np.int32)


def puncture(mother_bits: np.ndarray, profile: PunctureProfile) -> np.ndarray:
    """Keep only unpunctured mother bits (synthesizer side, NumPy)."""
    idx = _keep_indices(profile)
    return np.asarray(mother_bits)[..., idx]


def depuncture(soft_bits, profile: PunctureProfile):
    """Punctured soft bits (..., punctured_bits) -> (..., 4*(I+6)) with erasures.

    Works on jnp or np arrays; jit-safe (indices are trace-time constants).
    """
    idx = _keep_indices(profile)
    n_mother = profile.mask().shape[0]
    soft_bits = jnp.asarray(soft_bits)
    out_shape = soft_bits.shape[:-1] + (n_mother,)
    out = jnp.zeros(out_shape, dtype=soft_bits.dtype)
    return out.at[..., idx].set(soft_bits)


def depuncture_np(soft_bits: np.ndarray, profile: PunctureProfile) -> np.ndarray:
    idx = _keep_indices(profile)
    n_mother = profile.mask().shape[0]
    out = np.zeros(soft_bits.shape[:-1] + (n_mother,), dtype=np.float32)
    out[..., idx] = soft_bits
    return out
