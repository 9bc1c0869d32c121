"""Wall-clock real-time streaming (VERDICT r3 weak #7): the full
synth -> paced source -> StreamingRadio -> decode -> mix -> PlaybackSink
loop at 1x real time must sustain playback with zero underruns after
start-up — the reference's entire operating point
(/root/reference/src/dab_module.cpp:60-82: the audio thread pulls 100 ms
blocks and must never starve while the radio keeps up with the SDR).
"""

import io
import threading
import time

import numpy as np
import pytest

from tpudab.synth import (EnsembleSpec, ServiceSpec, SubchannelSpec,
                          EnsembleSynthesizer, ASCTY_DAB)
from tpudab.synth.modulator import modulate_frame_bits
from tpudab.constants.ofdm_params import SAMPLING_RATE


class PacedSource:
    """Delivers IQ at 1x wall-clock: sample i becomes available at
    t0 + i / fs, like a real SDR dongle; read blocks until the requested
    span has 'arrived' (or the capture ends)."""

    def __init__(self, iq: np.ndarray, fs: float = SAMPLING_RATE):
        self.iq = iq
        self.fs = fs
        self.pos = 0
        self.t0 = time.monotonic()

    def __call__(self, n: int) -> np.ndarray:
        end = min(self.pos + n, self.iq.shape[0])
        ready_at = self.t0 + end / self.fs
        delay = ready_at - time.monotonic()
        if delay > 0:
            time.sleep(delay)
        out = self.iq[self.pos:end]
        self.pos = end
        return out


class FakeDevice(io.BytesIO):
    def close(self):  # keep bytes readable after sink.stop()
        pass


@pytest.mark.slow
def test_realtime_stream_no_underruns():
    from tpudab.audio.codecs import mp2_decode_available
    if not mp2_decode_available():
        pytest.skip("MP2 codec shim unavailable")
    from tpudab.host.cli import _mp2_tone_stream
    from tpudab.host.streaming import StreamingRadio
    from tpudab.audio.pipeline import AudioPipeline
    from tpudab.audio.sink import PlaybackSink

    seconds = 20.0
    n_frames = int(seconds / 0.096) + 1           # 209 frames, ~20.1 s
    n_logical = n_frames * 4 + 20
    rate = 128
    spec = EnsembleSpec(
        ensemble_id=0x2020, label="RT Mux",
        services=[ServiceSpec(0xC801, "RT Tone", [(0, ASCTY_DAB, 9)])],
        subchannels=[SubchannelSpec(9, start_cu=0, size_cu=96,
                                    protection=("uep", rate, 3))])
    synth = EnsembleSynthesizer(spec, seed=77)
    mp2 = _mp2_tone_stream(rate, n_logical)
    synth.payload_fn[9] = lambda m: mp2[m].tobytes()
    iq = np.concatenate([modulate_frame_bits(synth.frame_bits(i))
                         for i in range(n_frames)]).astype(np.complex64)

    audio = AudioPipeline(48_000)
    radio = StreamingRadio(PacedSource(iq), batch_frames=4,
                           audio_pipeline=audio, use_device_step=False,
                           drift_resample=False)
    dev = FakeDevice()
    sink = PlaybackSink(audio, device_factory=lambda r: dev)
    state = {}

    def on_outputs(outputs):
        # start the sink once ~0.3 s of decoded audio is primed (the
        # reference starts its audio stream when the channel goes live;
        # starting on the very first PCM block would underrun immediately
        # on the next 100 ms poll)
        if "started" not in state and any(
                s.buffered >= int(0.3 * 48_000)
                for s in audio._sources.values()):
            sink.start()
            state["started"] = time.monotonic()
            state["under0"] = sink.underruns

    t_start = time.monotonic()
    radio.run(on_outputs=on_outputs)
    elapsed = time.monotonic() - t_start
    played = time.monotonic() - state["started"]
    # snapshot BEFORE stop: once the capture ends the sink legitimately
    # drains and starves — only underruns DURING the stream count
    under_final = sink.underruns
    sink.stop()

    # 1x pacing really happened: the run took about the capture length
    assert elapsed >= seconds * 0.95, f"source was not paced ({elapsed:.1f}s)"
    # the radio kept up: no desync, every frame decoded
    assert radio.stats.reacquisitions == 0
    assert radio.stats.total_frames >= n_frames - 1
    # the sink never starved after start-up
    assert under_final == state["under0"], (
        f"{under_final - state['under0']} underruns over {played:.1f}s")
    # continuous PCM: the fake device received ~played seconds of stereo
    # s16 at 48 kHz (one 100 ms block granularity slack each side)
    got_s = len(dev.getvalue()) / (48_000 * 2 * 2)
    assert got_s >= played - 0.6, f"PCM gap: {got_s:.2f}s vs {played:.2f}s"
    assert sink.blocks_written >= int((played - 0.5) / 0.1)
