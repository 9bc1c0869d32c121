"""Mesh construction helpers for the ensemble x time 2D mesh."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh


def default_mesh_shape(n_devices: int) -> Tuple[int, int]:
    """Factor n_devices into (ensemble, time).

    Prefer more ensemble parallelism (zero-communication) and keep a time
    axis of at least 2 when possible so the halo path is exercised.
    """
    if n_devices == 1:
        return (1, 1)
    time = 2
    while n_devices % time:
        time += 1
    return (n_devices // time, time)


def make_mesh(n_devices: Optional[int] = None,
              shape: Optional[Tuple[int, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if shape is None:
        shape = default_mesh_shape(n_devices)
    assert shape[0] * shape[1] == n_devices, (shape, n_devices)
    arr = np.array(devs[:n_devices]).reshape(shape)
    return Mesh(arr, ("ensemble", "time"))
