"""Checkpoint/resume for streaming state (SURVEY.md sec 5.4).

The reference is stateless across restarts (DB rebuilt from FIC in seconds);
here the streaming pipeline IS resumable: the device carry (deinterleaver
rings), sync state and the service database serialize to one .npz + JSON
blob, so a long capture can be processed in separate sessions with bit-exact
continuation.
"""

from __future__ import annotations

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


def _config_to_json(cfg) -> dict:
    return {"subch_id": cfg.subch_id, "start_cu": cfg.start_cu,
            "size_cu": cfg.size_cu, "runs": [list(r) for r in cfg.profile.runs],
            "padding_bits": cfg.padding_bits}


def _config_from_json(d):
    from tpudab.constants.puncture import PunctureProfile
    from tpudab.msc.subchannel import SubchannelConfig
    return SubchannelConfig(
        subch_id=int(d["subch_id"]), start_cu=int(d["start_cu"]),
        size_cu=int(d["size_cu"]),
        profile=PunctureProfile(runs=tuple((int(a), int(b))
                                           for a, b in d["runs"])),
        padding_bits=int(d["padding_bits"]))


def pipeline_checkpoint(pipeline, path: str) -> None:
    """Save an OfflinePipeline's resumable state (device-step mode):
    deinterleaver carry, tracked frequency, logical-frame counters, stream
    position, and the discovered subchannel geometry — enough for a fresh
    process to continue decoding `iq[next_pos:]` bit-exactly with no
    15-frame warm-up loss (CLI: decode --checkpoint / --resume)."""
    extra = {
        "net_freq_hz": pipeline.stats.net_freq_hz,
        "total_frames": pipeline.stats.total_frames,
        "next_pos": pipeline.stats.next_pos,
        "first_logical": dict(pipeline._step_first_logical),
        "subchannels": [_config_to_json(c) for c in
                        (pipeline._step.subchannels if pipeline._step
                         is not None else ())],
    }
    carry = pipeline._step_carry or {}
    save_carry(path, carry, extra)


def pipeline_restore(pipeline, path: str) -> None:
    """Restore state saved by pipeline_checkpoint into a fresh pipeline.

    Rebuilds the jitted ReceiveStep from the stored subchannel geometry so
    the FIRST batch after resume already runs the device step with the
    restored deinterleaver carry (the FIC database itself re-fills from the
    broadcast within a frame, as in the reference's stateless restart —
    SURVEY.md sec 5.4)."""
    carry, extra = load_carry(path)
    if carry:
        pipeline._step_carry = carry
    if extra:
        pipeline.stats.net_freq_hz = extra.get("net_freq_hz", 0.0)
        pipeline._step_first_logical = {
            int(k): v for k, v in extra.get("first_logical", {}).items()}
        configs = tuple(_config_from_json(d)
                        for d in extra.get("subchannels", ()))
        if configs:
            from tpudab.models.step import ReceiveStep
            pipeline._step = ReceiveStep(
                mode=pipeline.mode, subchannels=configs,
                window_offset=pipeline.sync_cfg.window_offset)
        pipeline._resumed = True
