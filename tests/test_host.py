"""Host runtime: native ring buffer, IQ reader, streaming radio loop,
dashboard rendering."""

import threading

import numpy as np
import pytest

from tpudab.host.native_lib import RingBuffer, IQReader


def test_ring_buffer_roundtrip():
    ring = RingBuffer(1 << 16)
    data = bytes(range(256)) * 10
    assert ring.write(data) == len(data)
    assert ring.read(len(data)) == data


def test_ring_buffer_blocking_and_close():
    ring = RingBuffer(1024)
    got = []

    def reader():
        got.append(ring.read(2048))  # blocks until writer + close

    t = threading.Thread(target=reader)
    t.start()
    ring.write(b"x" * 1500)
    ring.close()
    t.join(timeout=5)
    assert not t.is_alive()
    assert got[0] == b"x" * 1500  # short read on close


def test_iq_reader_formats(tmp_path):
    x = (np.arange(64) - 32).astype(np.int8)
    p = tmp_path / "iq.s8"
    x.tofile(p)
    rd = IQReader(str(p), fmt="s8", ring_capacity=1 << 12)
    out = rd.ring.read_complex64(32)
    rd.join()
    expect = (x.astype(np.float32) / 128.0)
    np.testing.assert_allclose(out.view(np.float32), expect, rtol=1e-6)


def test_streaming_radio_end_to_end():
    from tpudab.synth import (EnsembleSpec, ServiceSpec, SubchannelSpec,
                              EnsembleSynthesizer, ASCTY_DAB)
    from tpudab.synth.modulator import (modulate_frame_bits, Impairments,
                                        apply_impairments)
    from tpudab.audio.codecs import MP2Encoder
    from tpudab.host.streaming import StreamingRadio
    from tpudab.host.dashboard import render_text
    from tpudab.audio.pipeline import AudioPipeline

    bitrate = 128
    spec = EnsembleSpec(
        ensemble_id=0xABCD, label="Stream Mux",
        services=[ServiceSpec(0xC900, "Stream Svc", [(0, ASCTY_DAB, 1)])],
        subchannels=[SubchannelSpec(1, start_cu=0, size_cu=96,
                                    protection=("uep", bitrate, 3))])
    synth = EnsembleSynthesizer(spec, seed=3)
    enc = MP2Encoder(48000, 2, bitrate)
    t = np.arange(enc.frame_size)
    tone = (9000 * np.sin(2 * np.pi * 600 * t / 48000)).astype(np.int16)
    pcm = np.stack([tone, tone], axis=1)
    n_frames = 10
    need = (n_frames * 4 + 16) * bitrate * 3
    packets = b""
    while len(packets) < need:
        packets += enc.encode(pcm)
    stream = np.frombuffer(packets[:need], np.uint8).reshape(-1, bitrate * 3)
    synth.payload_fn[1] = lambda m: stream[m].tobytes()
    iq = np.concatenate([modulate_frame_bits(synth.frame_bits(i))
                         for i in range(n_frames)])
    iq = apply_impairments(iq, Impairments(freq_offset_hz=4000.0, snr_db=20,
                                           delay_samples=777, seed=4))

    pos = [0]

    def source(n):
        lo = pos[0]
        pos[0] = min(lo + n, iq.shape[0])
        return iq[lo:pos[0]]

    audio = AudioPipeline(48000)
    radio = StreamingRadio(source, batch_frames=3, audio_pipeline=audio)
    radio.run()

    assert radio.stats.total_frames >= 8
    assert radio.stats.reacquisitions == 0
    assert abs(radio.stats.net_freq_hz - 4000.0) < 50
    db = radio.receiver.db
    assert db.ensemble.label == "Stream Mux"
    assert db.services[0xC900].label == "Stream Svc"

    mixed = audio.mix(4800)
    assert np.abs(mixed).max() > 0.05  # audible audio made it through

    text = render_text(radio.receiver, radio.stats, audio)
    assert "Stream Mux" in text
    assert "Stream Svc" in text
    assert "UEP" in text
    assert "state=" in text and "FIC:" in text


def test_carry_checkpoint_roundtrip(tmp_path):
    """Streaming carry saves/loads bit-exactly (resume support)."""
    import jax.numpy as jnp
    from tpudab.models.checkpoint import save_carry, load_carry
    carry = {"deint_1": jnp.arange(15.0 * 64).reshape(15, 64),
             "deint_2": jnp.ones((15, 128), jnp.float32) * 0.5}
    p = str(tmp_path / "ck.npz")
    save_carry(p, carry, {"net_freq_hz": 1234.5})
    got, extra = load_carry(p)
    assert extra["net_freq_hz"] == 1234.5
    for k in carry:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(carry[k]))
