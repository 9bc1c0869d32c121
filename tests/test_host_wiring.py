"""Host-module wiring (VERDICT r2 item #3): the JSON config system, the
stage profiler, and checkpoint/resume must be reachable from the product
surface and behave end-to-end — no dead modules.

- ConfigManager: CLI --config loads it; KeyController autosaves changes
  (reference ConfigManager autosave, /root/reference/src/main.cpp:16-20).
- StageTimer: StreamingRadio populates it; the dashboard renders it
  (SURVEY.md sec 5.1).
- pipeline_checkpoint/restore: a capture split across two pipeline
  *instances* (fresh process state) decodes bit-identically to one shot.
"""

import json
import os

import numpy as np
import pytest

from tpudab.synth import (EnsembleSpec, ServiceSpec, SubchannelSpec,
                          EnsembleSynthesizer, ASCTY_DAB_PLUS)
from tpudab.synth.modulator import modulate_frame_bits


def _capture(n_frames: int, seed: int = 21):
    spec = EnsembleSpec(
        ensemble_id=0x5A5A, label="Wiring Mux",
        services=[ServiceSpec(0xC501, "SvcW", [(0, ASCTY_DAB_PLUS, 3)])],
        subchannels=[SubchannelSpec(3, start_cu=0, size_cu=24,
                                    protection=("eep", 3, 0))])
    synth = EnsembleSynthesizer(spec, seed=seed)
    rng = np.random.default_rng(100 + seed)
    data = rng.integers(0, 256, (n_frames * 4, 32 * 3)).astype(np.uint8)
    synth.payload_fn[3] = lambda m: data[m].tobytes()
    iq = np.concatenate([modulate_frame_bits(synth.frame_bits(i))
                         for i in range(n_frames)])
    return iq, data


# ---------------------------------------------------------------------------
# config system
# ---------------------------------------------------------------------------

def test_config_manager_roundtrip_and_autosave(tmp_path):
    from tpudab.host.config import ConfigManager, RadioConfig

    path = str(tmp_path / "radio.json")
    mgr = ConfigManager(path)
    assert mgr.config == RadioConfig()          # defaults when file absent
    mgr.set(global_gain=2.5, desync_threshold=0.5, batch_frames=2)
    data = json.load(open(path))
    assert data["global_gain"] == 2.5 and data["desync_threshold"] == 0.5

    again = ConfigManager(path)
    assert again.config.global_gain == 2.5
    assert again.config.batch_frames == 2
    sc = again.config.sync_config()
    assert sc.fine_freq_beta == again.config.fine_freq_beta

    with pytest.raises(AttributeError):
        mgr.set(not_a_key=1)


def test_key_controller_live_tunables_autosave(tmp_path):
    """The reference edits OFDM_Demod::GetConfig() live from the UI
    (render_radio_block.cpp:213-235); KeyController must adjust the running
    radio's tunables and autosave them through ConfigManager."""
    from tpudab.host.config import ConfigManager
    from tpudab.host.controls import KeyController

    class FakeRadio:
        desync_threshold = 0.35
        fine_freq_beta = 0.9
        is_coarse_freq_correction = True

    class FakeAudio:
        global_gain = 1.0
        muted = False

    class FakeReceiver:
        channels = {}

    keys = list("]c+F")
    mgr = ConfigManager(str(tmp_path / "radio.json"))
    radio, audio = FakeRadio(), FakeAudio()
    kc = KeyController(FakeReceiver(), audio,
                       read_key=lambda: keys.pop(0) if keys else None,
                       radio=radio, config_manager=mgr)
    assert kc.poll()
    assert radio.desync_threshold == pytest.approx(0.40)
    assert radio.is_coarse_freq_correction is False
    assert audio.global_gain == pytest.approx(1.25)
    assert radio.fine_freq_beta == pytest.approx(0.95)
    saved = json.load(open(mgr.path))
    assert saved["desync_threshold"] == pytest.approx(0.40)
    assert saved["is_coarse_freq_correction"] is False
    assert saved["global_gain"] == pytest.approx(1.25)
    assert saved["fine_freq_beta"] == pytest.approx(0.95)
    assert "coarse" in kc.status_line()


def test_cli_decode_with_config(tmp_path):
    """decode --config uses the file's mode/batch/sync tunables."""
    from tpudab.host import cli
    from tpudab.host.config import ConfigManager

    iq, _ = _capture(4)
    inter = np.empty(iq.shape[0] * 2, dtype=np.float32)
    inter[0::2], inter[1::2] = iq.real, iq.imag
    cap = str(tmp_path / "cap.f32")
    inter.tofile(cap)
    cfg = str(tmp_path / "radio.json")
    ConfigManager(cfg).set(batch_frames=2)
    assert cli.main(["decode", cap, "--config", cfg]) == 0


# ---------------------------------------------------------------------------
# stage profiler
# ---------------------------------------------------------------------------

def test_streaming_populates_stage_timer_and_dashboard_renders_it():
    from tpudab.host.streaming import StreamingRadio
    from tpudab.host.dashboard import render_text

    iq, _ = _capture(4)
    pos = {"i": 0}

    def source(n):
        lo = pos["i"]
        pos["i"] = min(lo + n, iq.shape[0])
        return iq[lo:pos["i"]]

    radio = StreamingRadio(source, batch_frames=2)
    radio.run()
    summary = radio.timers.summary()
    for stage in ("read", "demod", "decode", "track"):
        assert stage in summary and summary[stage]["calls"] >= 1, summary
    assert summary["demod"]["items_per_s"] > 0   # samples/s throughput
    text = render_text(radio.receiver, radio.stats, timers=radio.timers)
    assert "stages:" in text and "demod=" in text
    assert radio.timers.report()                  # human report non-empty


# ---------------------------------------------------------------------------
# checkpoint / resume
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_pipeline_checkpoint_resume_bit_exact(tmp_path):
    """Split a capture across two OfflinePipeline instances via
    pipeline_checkpoint/restore: concatenated subchannel byte output must be
    bit-identical to the one-shot run (device-step path, deinterleaver carry
    crosses the process boundary with no 15-frame warm-up loss)."""
    from tpudab.models.pipeline import OfflinePipeline
    from tpudab.models.checkpoint import pipeline_checkpoint, pipeline_restore

    iq, payload = _capture(12)
    ckpt = str(tmp_path / "state")

    def run_collect(pipe, buf):
        chunks = []
        pipe.run(buf, collect=lambda outs: chunks.extend(
            o.raw_frames for o in outs.values() if o.raw_frames is not None
            and len(o.raw_frames)))
        return np.concatenate(chunks) if chunks else np.zeros((0, 96), np.uint8)

    one = OfflinePipeline(batch_frames=4, use_device_step=True)
    want = run_collect(one, iq)
    assert want.shape[0] >= 12 * 4 - 16
    np.testing.assert_array_equal(want[1:], payload[1: want.shape[0]])

    # first half
    a = OfflinePipeline(batch_frames=4, use_device_step=True)
    got_a = run_collect(a, iq[: 6 * 196608])
    pipeline_checkpoint(a, ckpt)
    assert os.path.exists(ckpt + ".npz")

    # second half in a FRESH pipeline (new process analog)
    b = OfflinePipeline(batch_frames=4, use_device_step=True)
    pipeline_restore(b, ckpt)
    assert b._step is not None          # step rebuilt before first batch
    got_b = run_collect(b, iq[a.stats.next_pos:])
    got = np.concatenate([got_a, got_b])
    np.testing.assert_array_equal(got, want)


def test_cli_decode_checkpoint_resume(tmp_path):
    """CLI surface: decode --checkpoint then decode --resume on the
    remainder runs clean."""
    from tpudab.host import cli

    iq, _ = _capture(8)
    half = 4 * 196608
    for name, seg in (("a.f32", iq[:half]), ("b.f32", iq[half:])):
        inter = np.empty(seg.shape[0] * 2, dtype=np.float32)
        inter[0::2], inter[1::2] = seg.real, seg.imag
        inter.tofile(str(tmp_path / name))
    ck = str(tmp_path / "ck")
    assert cli.main(["decode", str(tmp_path / "a.f32"), "--device-step",
                     "--checkpoint", ck]) == 0
    assert cli.main(["decode", str(tmp_path / "b.f32"), "--device-step",
                     "--resume", ck]) == 0


# ---------------------------------------------------------------------------
# dashboard parity: linked FM/DRM tables + per-service detail (VERDICT r2
# item #7; reference render_radio_block.cpp:490-752)
# ---------------------------------------------------------------------------

def test_dashboard_renders_fm_drm_linkage_and_detail():
    from tpudab.synth.ensemble import FMLinkSpec, DRMLinkSpec
    from tpudab.models.receiver import Receiver
    from tpudab.host.dashboard import render_text
    from tpudab.host.controls import KeyController
    from tpudab.utils.bits import bits_to_soft

    spec = EnsembleSpec(
        ensemble_id=0x5B5B, label="Link Mux",
        services=[ServiceSpec(0xC601, "Linked", [(0, ASCTY_DAB_PLUS, 4)])],
        subchannels=[SubchannelSpec(4, start_cu=0, size_cu=24,
                                    protection=("eep", 3, 0))])
    spec.fm_links = [FMLinkSpec(service_id=0xC601, rds_pi=0xC479,
                                frequencies_hz=[95_800_000])]
    spec.drm_links = [DRMLinkSpec(service_id=0xC601, drm_id=0x00A7,
                                  frequencies_hz=[6_095_000])]
    synth = EnsembleSynthesizer(spec, seed=13)
    rx = Receiver()
    for i in range(2):
        rx.process_frame_bits(bits_to_soft(synth.frame_bits(i))[None])
    assert 0xC479 in rx.db.fm_services

    kc = KeyController(rx, None, read_key=lambda: None)
    text = render_text(rx, controls=kc)
    assert "linked services:" in text
    assert "FM  RDS PI 0xC479" in text and "95.8MHz" in text
    assert "DRM id 0x00A7" in text and "6095kHz" in text
    assert "LSN" in text
    # per-service detail for the selected channel
    assert "subchannel 4: start_cu=0 size_cu=24 prot=EEP 3-A" in text


def test_cli_decode_bits_s8_roundtrip(tmp_path, capsys):
    """decode-bits: a raw viterbi_bit_t (s8, positive = bit 1) soft-bit
    file decodes without the OFDM front end — upstream basic_radio_app
    parity (SURVEY.md sec 4)."""
    from tpudab.host import cli
    from tpudab.synth import (EnsembleSpec, ServiceSpec, SubchannelSpec,
                              EnsembleSynthesizer, ASCTY_DAB_PLUS)

    spec = EnsembleSpec(
        ensemble_id=0xB175, label="Bits Mux",
        services=[ServiceSpec(0xC950, "BitSvc", [(0, ASCTY_DAB_PLUS, 2)])],
        subchannels=[SubchannelSpec(2, start_cu=0, size_cu=24,
                                    protection=("eep", 3, 0))])
    synth = EnsembleSynthesizer(spec, seed=70)
    rng = np.random.default_rng(71)
    payload = rng.integers(0, 256, (40, 32 * 3)).astype(np.uint8)
    synth.payload_fn[2] = lambda m: payload[m].tobytes()

    # upstream convention: viterbi_bit_t soft decision, positive = bit 1
    bits = np.stack([synth.frame_bits(i) for i in range(6)])
    s8 = np.where(bits > 0, 100, -100).astype(np.int8)
    p = tmp_path / "frames.bits"
    s8.tofile(p)

    rc = cli.main(["decode-bits", str(p), "--bits-format", "s8",
                   "--out-dir", str(tmp_path / "out")])
    assert rc == 0
    text = capsys.readouterr().out
    assert "Bits Mux" in text and "BitSvc" in text
    assert "0 CRC errors" in text
    assert "decoded 6 frames" in text
