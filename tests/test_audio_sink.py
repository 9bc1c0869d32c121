"""Live audio sink + channel controls (VERDICT round-1 #4).

PlaybackSink is driven with a fake device; per-channel play/decode toggles
and the key controller are exercised through the Receiver API."""

import io
import threading
import time

import numpy as np

from tpudab.audio.pipeline import AudioPipeline
from tpudab.audio.sink import PlaybackSink


class FakeDevice(io.BytesIO):
    def __init__(self):
        super().__init__()
        self.writes = 0
        self.data = bytearray()

    def write(self, data):
        self.writes += 1
        self.data.extend(data)
        return super().write(data)


def test_playback_sink_fake_device():
    """Sink pulls 100 ms blocks, paces against real time, sleeps when no
    source has data (reference issue-#9 behavior), and stops cleanly."""
    pipe = AudioPipeline(8_000)
    dev = FakeDevice()
    sink = PlaybackSink(pipe, rate=8_000, block_seconds=0.02,
                        device_factory=lambda rate: dev)
    sink.start()
    time.sleep(0.06)
    assert dev.writes == 0 and sink.underruns >= 1  # no data -> no blocks

    src = pipe.add_source(1)
    t = np.arange(8_000) / 8_000
    pcm = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    src.write(np.stack([pcm, pcm], axis=1), 8_000)
    time.sleep(0.25)
    sink.stop()
    assert dev.writes >= 3
    # s16le stereo blocks of block_seconds
    assert np.frombuffer(bytes(dev.data), dtype="<i2").astype(np.int32).max() > 1000
    block_bytes = int(8_000 * 0.02) * 2 * 2
    assert len(dev.data) % block_bytes == 0


def test_playback_sink_rate_change():
    pipe = AudioPipeline(48_000)
    devs = []

    def factory(rate):
        d = FakeDevice()
        d.rate = rate
        devs.append(d)
        return d

    sink = PlaybackSink(pipe, rate=48_000, device_factory=factory)
    sink.start()
    sink.set_rate(32_000)
    assert pipe.sink_rate == 32_000
    assert devs[-1].rate == 32_000
    sink.stop()


def test_per_source_gain_and_mute():
    pipe = AudioPipeline(8_000)
    s1 = pipe.add_source(1)
    s2 = pipe.add_source(2)
    one = np.full((100, 2), 0.5, np.float32)
    s1.write(one, 8_000)
    s2.write(one, 8_000)
    pipe.set_source_gain(2, 0.0)
    out = pipe.mix(50)
    np.testing.assert_allclose(out, 0.5, atol=1e-6)  # only source 1 audible
    s1.write(one, 8_000)
    pipe.muted = True
    assert np.all(pipe.mix(50) == 0.0)


def test_channel_controls_and_key_controller():
    """Per-channel decode toggles change Receiver behavior; the key
    controller maps keys onto them (Basic_Audio_Channel control parity)."""
    from tpudab.models.receiver import Receiver
    from tpudab.host.controls import KeyController

    r = Receiver()

    class _Ch:  # stand-in channel
        pass

    for cid in (3, 5):
        ch = _Ch()
        ch.is_play_audio = ch.is_decode_audio = ch.is_decode_data = True
        r.channels[cid] = ch

    r.set_is_decode_audio(3, False)
    assert r.channels[3].is_decode_audio is False
    r.stop_all()
    assert not r.channels[5].is_play_audio
    r.run_all()
    assert r.channels[5].is_play_audio

    audio = AudioPipeline()
    keys = list("p")  # toggle play on selected (channel 3, first sorted)
    kc = KeyController(r, audio, read_key=lambda: keys.pop(0) if keys else None)
    assert kc.poll()
    assert r.channels[3].is_play_audio is False
    keys.extend(["\t", "d"])   # select next channel, toggle decode
    kc.poll()
    assert r.channels[5].is_decode_audio is False
    keys.extend(["m", "+", "q"])
    assert not kc.poll()       # q requests quit
    assert audio.muted and audio.global_gain > 1.0
    line = kc.status_line()
    assert "sub3" in line and "sub5" in line and "MUTED" in line


def test_decode_gating_in_receiver():
    """is_decode_audio=False suppresses superframe/MP2 decode while raw
    frames still flow (SetIsDecodeAudio parity)."""
    from tpudab.models.receiver import Receiver

    r = Receiver()
    calls = {"n": 0}

    class _Ch:
        is_play_audio = True
        is_decode_audio = False
        is_decode_data = True

        def process_frames(self, frames):
            calls["n"] += 1
            return ["x"]

    from tpudab.models.receiver import AudioChannelOutput
    out = AudioChannelOutput(subch_id=1, is_dab_plus=True)
    r._decode_channel(_Ch(), True, np.zeros((2, 8), np.uint8), out)
    assert calls["n"] == 0 and out.superframes == []
    ch = _Ch()
    ch.is_decode_audio = True
    r._decode_channel(ch, True, np.zeros((2, 8), np.uint8), out)
    assert calls["n"] == 1
