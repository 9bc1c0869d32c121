"""Bit packing/unpacking helpers (NumPy host-side and jnp device-side).

Convention: MSB-first within bytes everywhere (DAB serializes MSB first).
Soft bits are float32 with sign semantics: positive => bit 0, negative =>
bit 1 (matching QPSK mapping a = 1 - 2b).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def unpack_bits(data: np.ndarray) -> np.ndarray:
    """uint8 bytes -> 0/1 bit array (MSB first), last axis expands x8."""
    data = np.asarray(data, dtype=np.uint8)
    return np.unpackbits(data, axis=-1)


def pack_bits(bits: np.ndarray) -> np.ndarray:
    """0/1 bit array (MSB first, length multiple of 8) -> uint8 bytes."""
    bits = np.asarray(bits).astype(np.uint8)
    return np.packbits(bits, axis=-1)


def jnp_pack_bits(bits):
    """Device-side MSB-first pack of 0/1 int bits into uint8 (last axis % 8 == 0)."""
    b = bits.reshape(bits.shape[:-1] + (bits.shape[-1] // 8, 8)).astype(jnp.uint8)
    weights = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], dtype=jnp.uint8)
    return (b * weights).sum(axis=-1).astype(jnp.uint8)


def jnp_unpack_bits(data):
    """Device-side MSB-first unpack of uint8 into 0/1 uint8 bits."""
    shifts = jnp.array([7, 6, 5, 4, 3, 2, 1, 0], dtype=jnp.uint8)
    bits = (data[..., None] >> shifts) & 1
    return bits.reshape(data.shape[:-1] + (data.shape[-1] * 8,))


def hard_decision(soft) -> np.ndarray:
    """Soft float bits -> 0/1 hard bits (sign<0 => 1)."""
    return (np.asarray(soft) < 0).astype(np.uint8)


def bits_to_soft(bits, amplitude: float = 1.0) -> np.ndarray:
    """0/1 bits -> ideal soft values (+A for 0, -A for 1)."""
    return (amplitude * (1.0 - 2.0 * np.asarray(bits, dtype=np.float32))).astype(np.float32)
