"""Checkpoint/resume for streaming state (SURVEY.md sec 5.4).

The reference is stateless across restarts (DB rebuilt from FIC in seconds);
here the streaming pipeline IS resumable: the device carry (deinterleaver
rings), sync state and the service database serialize to one .npz + JSON
blob, so a long capture can be processed in separate sessions with bit-exact
continuation.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp


def _base(path: str) -> str:
    return path[:-4] if path.endswith(".npz") else path


def save_carry(path: str, carry: Dict[str, jnp.ndarray],
               extra: Optional[dict] = None) -> None:
    arrays = {k: np.asarray(v) for k, v in carry.items()}
    np.savez_compressed(_base(path) + ".npz", **arrays)
    if extra is not None:
        with open(_base(path) + ".json", "w") as f:
            json.dump(extra, f)


def load_carry(path: str):
    data = np.load(_base(path) + ".npz")
    carry = {k: jnp.asarray(data[k]) for k in data.files}
    extra = None
    jpath = _base(path) + ".json"
    if os.path.exists(jpath):
        with open(jpath) as f:
            extra = json.load(f)
    return carry, extra


def pipeline_checkpoint(pipeline, path: str) -> None:
    """Save an OfflinePipeline's resumable state (device-step mode)."""
    extra = {
        "net_freq_hz": pipeline.stats.net_freq_hz,
        "total_frames": pipeline.stats.total_frames,
        "first_logical": dict(pipeline._step_first_logical),
    }
    carry = pipeline._step_carry or {}
    save_carry(path, carry, extra)


def pipeline_restore(pipeline, path: str) -> None:
    carry, extra = load_carry(path)
    if carry:
        pipeline._step_carry = carry
    if extra:
        pipeline.stats.net_freq_hz = extra.get("net_freq_hz", 0.0)
        pipeline._step_first_logical = {
            int(k): v for k, v in extra.get("first_logical", {}).items()}
