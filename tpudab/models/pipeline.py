"""Offline decode pipeline: IQ buffer/file -> acquisition -> batched OFDM
demod -> Receiver (FIC/MSC/audio).

Reference parity: the Radio_Block orchestration
(/root/reference/src/radio_block.cpp) — but the reference's thread+ring-buffer
pipeline becomes: acquire once over the buffered block, demodulate frames in
large batches on device, feed the host Receiver. Resynchronization (reference
sec 5.3 failure analog) re-runs acquisition when FIB CRC failures spike.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from tpudab.constants.ofdm_params import get_ofdm_params
from tpudab.ofdm.sync import SyncConfig
from tpudab.ofdm.sync_device import acquire_host
from tpudab.ofdm.demod import demod_frames_split
from tpudab.models.receiver import Receiver
from tpudab.models.step_driver import StepDriver


@dataclasses.dataclass
class PipelineStats:
    total_frames: int = 0
    total_frames_desync: int = 0   # reference: GetTotalFramesDesync
    reacquisitions: int = 0
    net_freq_hz: float = 0.0
    frame_start: int = 0
    next_pos: int = 0   # sample index where the next run would continue


class OfflinePipeline:
    """Decode a (long) IQ capture in frame batches.

    use_device_step=True switches to the jitted ReceiveStep once the FIC
    database has discovered the subchannel layout: demod + FIC Viterbi + all
    MSC decoding run as ONE device program per batch (the bench.py path),
    with the python-side deinterleaver history handed off into the step
    carry so the logical-frame sequence continues seamlessly.
    """

    def __init__(self, mode: int = 1, batch_frames: int = 8,
                 sync_cfg: SyncConfig = SyncConfig(),
                 receiver: Optional[Receiver] = None,
                 use_device_step: bool = False):
        self.mode = mode
        self.params = get_ofdm_params(mode)
        self.batch_frames = batch_frames
        self.sync_cfg = sync_cfg
        self.receiver = receiver or Receiver(mode)
        self.use_device_step = use_device_step
        self.stats = PipelineStats()
        self._driver = StepDriver(mode, sync_cfg.window_offset)
        self._resumed = False  # set by models.checkpoint.pipeline_restore

    # checkpoint.py and external callers address the step state by these
    # names; the state itself lives in the shared StepDriver (also used by
    # host.streaming.StreamingRadio)
    @property
    def _step(self):
        return self._driver.step

    @_step.setter
    def _step(self, v):
        self._driver.step = v

    @property
    def _step_carry(self):
        return self._driver.carry

    @_step_carry.setter
    def _step_carry(self, v):
        self._driver.carry = v

    @property
    def _step_first_logical(self) -> Dict[int, int]:
        return self._driver.first_logical

    @_step_first_logical.setter
    def _step_first_logical(self, v):
        self._driver.first_logical = dict(v)

    def run(self, iq: np.ndarray, collect=None):
        """Decode the whole buffer; returns accumulated channel outputs.

        collect: optional callback(outputs: {subch_id: AudioChannelOutput})
        called per batch.
        """
        p = self.params
        n = iq.shape[0]
        if self._resumed:
            # restored state: the buffer is the remainder of a capture that
            # was checkpointed at a frame boundary — no acquisition, the
            # tracked net frequency carries over
            self._resumed = False
            start = 0
        else:
            if n < 2 * p.nb_frame_length:
                raise ValueError("need at least 2 frames of IQ for acquisition")
            res = acquire_host(
                iq[: 4 * p.nb_frame_length], self.mode,
                self.sync_cfg.max_coarse_bins,
                self.sync_cfg.impulse_peak_threshold_db,
                self.sync_cfg.impulse_peak_distance_probability)
            self.stats.net_freq_hz = res["net_freq_hz"]
            self.stats.frame_start = res["frame_start"]
            start = res["frame_start"]

        accumulated: Dict[int, list] = {}
        pos = start
        fib_err_prev = 0
        while pos + p.nb_frame_length <= n:
            nf = min(self.batch_frames, (n - pos) // p.nb_frame_length)
            if nf == 0:
                break
            frames = iq[pos : pos + nf * p.nb_frame_length].reshape(nf, p.nb_frame_length)
            # lane-tiled (F, len//128, 128) form: free on host, avoids a
            # device relayout at the jit boundary (see demod_frames_split)
            tiled = (nf, p.nb_frame_length // 128, 128)
            re = np.ascontiguousarray(frames.real, dtype=np.float32).reshape(tiled)
            im = np.ascontiguousarray(frames.imag, dtype=np.float32).reshape(tiled)
            if self.use_device_step:
                self._driver.maybe_build(self.receiver,
                                         self.stats.total_frames)
            if self._step is not None:
                outputs, _ = self._driver.process(
                    self.receiver, re, im, self.stats.net_freq_hz)
            else:
                soft, _ = demod_frames_split(
                    re, im, self.stats.net_freq_hz, self.mode,
                    self.sync_cfg.window_offset)
                outputs = self.receiver.process_frame_bits(np.asarray(soft))
            self.stats.total_frames += nf
            pos += nf * p.nb_frame_length

            # resync check: all FIBs of the batch failing CRC == desync
            errs = self.receiver.stats["fib_crc_errors"] - fib_err_prev
            fib_err_prev = self.receiver.stats["fib_crc_errors"]
            batch_fibs = nf * self.receiver.dab.nb_fibs
            if errs == batch_fibs and pos + 2 * p.nb_frame_length <= n:
                self.stats.total_frames_desync += nf
                self.stats.reacquisitions += 1
                res = acquire_host(
                    iq[pos : pos + 4 * p.nb_frame_length], self.mode,
                    self.sync_cfg.max_coarse_bins,
                    self.sync_cfg.impulse_peak_threshold_db,
                    self.sync_cfg.impulse_peak_distance_probability)
                pos += res["frame_start"]
                self.stats.net_freq_hz = res["net_freq_hz"]

            if collect is not None:
                collect(outputs)
            for sid, out in outputs.items():
                accumulated.setdefault(sid, []).append(out)
            self.stats.next_pos = pos
        # end-of-stream: frames still held by a pending UEP calibration
        # (capture ended inside the calibration window) are flushed now
        final = self.receiver.finalize()
        if collect is not None and final:
            collect(final)
        for sid, out in final.items():
            accumulated.setdefault(sid, []).append(out)
        return accumulated


def decode_iq(iq: np.ndarray, mode: int = 1, **kw):
    """One-call offline decode; returns (receiver, accumulated outputs)."""
    pipe = OfflinePipeline(mode=mode, **kw)
    acc = pipe.run(iq)
    return pipe.receiver, acc, pipe.stats
