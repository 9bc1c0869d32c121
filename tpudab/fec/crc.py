"""CRC engines: CRC-16/CCITT (FIBs, MOT, dynamic labels) and DAB+ Firecode.

EN 300 401 sec 5.2.1 (FIB CRC), TS 102 563 sec 5.2 (firecode).
Reference parity: SURVEY.md sec 2.3 'CRC engines' [recon]. Table-driven NumPy,
vectorized across messages (host-side after device bit decode).
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def _crc16_table(poly: int) -> np.ndarray:
    table = np.zeros(256, dtype=np.uint16)
    for byte in range(256):
        crc = byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if (crc & 0x8000) else (crc << 1)
            crc &= 0xFFFF
        table[byte] = crc
    return table


def _crc16(data: np.ndarray, poly: int, init: int) -> np.ndarray:
    """CRC-16 over the last axis of a uint8 array; returns uint16 per message."""
    data = np.asarray(data, dtype=np.uint8)
    if data.ndim == 1:
        data = data[None]
        squeeze = True
    else:
        squeeze = False
    table = _crc16_table(poly)
    crc = np.full(data.shape[0], init, dtype=np.uint16)
    for i in range(data.shape[-1]):
        crc = ((crc << 8) & 0xFFFF) ^ table[((crc >> 8) ^ data[:, i]) & 0xFF]
    return crc[0] if squeeze else crc


def crc16_ccitt(data: np.ndarray) -> np.ndarray:
    """CRC-16 poly 0x1021, init 0xFFFF, complemented output (ITU-T X.25 style
    as used by DAB FIBs/MOT/dynamic labels: transmitted CRC = ~CRC)."""
    return (~_crc16(data, 0x1021, 0xFFFF)) & 0xFFFF


def check_fib_crc(fibs: np.ndarray) -> np.ndarray:
    """fibs: (..., 32) uint8 FIBs -> bool array, True where CRC matches.

    FIB = 30 data bytes + 2 CRC bytes (big-endian).
    """
    fibs = np.asarray(fibs, dtype=np.uint8)
    flat = fibs.reshape(-1, fibs.shape[-1])
    calc = crc16_ccitt(flat[:, :-2])
    sent = (flat[:, -2].astype(np.uint16) << 8) | flat[:, -1]
    return (calc == sent).reshape(fibs.shape[:-1])


def crc16_append(data: np.ndarray) -> np.ndarray:
    """Append the 2-byte complemented CRC (synthesizer side)."""
    data = np.asarray(data, dtype=np.uint8)
    crc = int(crc16_ccitt(data))
    return np.concatenate([data, np.array([crc >> 8, crc & 0xFF], dtype=np.uint8)])


# DAB+ firecode: CRC-16 with poly x^16+x^14+x^13+x^12+x^11+x^5+x^3+x^2+x+1
# (0x782F), init 0x0000, over bytes 2..10 of the audio super frame header;
# transmitted in bytes 0..1 (not complemented). TS 102 563 sec 5.2.
FIRECODE_POLY = 0x782F


def firecode_compute(data: np.ndarray) -> np.ndarray:
    return _crc16(data, FIRECODE_POLY, 0x0000)


def firecode_check(superframe_head: np.ndarray) -> np.ndarray:
    """superframe_head: (..., >=11) uint8; True where firecode matches."""
    head = np.asarray(superframe_head, dtype=np.uint8)
    flat = head.reshape(-1, head.shape[-1])
    calc = firecode_compute(flat[:, 2:11])
    sent = (flat[:, 0].astype(np.uint16) << 8) | flat[:, 1]
    return (calc == sent).reshape(head.shape[:-1])
