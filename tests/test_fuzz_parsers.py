"""Adversarial robustness: the host byte parsers must never raise on
arbitrary input. A real broadcast at low SNR feeds the parsers CRC-passing
garbage at the CRC's 2^-16 false-accept rate, and packet/MOT/PAD payloads
are attacker-controlled in principle — the reference survives because its
C++ parsers bounds-check; tpudab's must too (deterministic fuzz, no
hypothesis dependency)."""

import numpy as np
import pytest


def test_fig_parser_never_raises():
    from tpudab.fic.fig_parser import parse_fib

    rng = np.random.default_rng(1)
    for _ in range(2000):
        fib = rng.integers(0, 256, 32).astype(np.uint8)
        events = parse_fib(fib)          # must not raise
        assert isinstance(events, list)
    # structured adversarial cases: every FIG type/length with random body
    for fig_type in range(8):
        for length in range(0, 30):
            body = bytes([(fig_type << 5) | length]) + bytes(
                rng.integers(0, 256, 31).astype(np.uint8).tolist())
            parse_fib(np.frombuffer(body[:32], dtype=np.uint8))


def test_database_updater_and_dashboard_survive_garbage_figs():
    """Random CRC-passing FIBs flow parse_fib -> DatabaseUpdater ->
    render_text: the whole observability chain must survive arbitrary
    field values (huge ids, nonsense types, broken labels)."""
    from tpudab.database.updater import DatabaseUpdater
    from tpudab.fic.fig_parser import parse_fib
    from tpudab.host.dashboard import render_text
    from tpudab.models.receiver import Receiver

    rng = np.random.default_rng(7)
    rx = Receiver()
    upd = rx.updater
    for _ in range(1500):
        fib = rng.integers(0, 256, 32).astype(np.uint8)
        upd.process_events(parse_fib(fib))
    assert upd.stats.total >= 0
    text = render_text(rx)               # must not raise on any DB state
    assert isinstance(text, str) and len(text) > 0


def test_superframe_parser_never_raises():
    """Random superframes (firecode rejects) and adversarial ones with a
    VALID firecode over garbage headers (AU starts out of range, reversed,
    past the audio end) must parse without raising."""
    from tpudab.audio.superframe import parse_superframe
    from tpudab.fec.crc import firecode_compute

    rng = np.random.default_rng(2)
    for _ in range(200):
        sf = rng.integers(0, 256, 480).astype(np.uint8)
        parse_superframe(sf, 32, apply_rs=False)
    for _ in range(500):
        sf = rng.integers(0, 256, 480).astype(np.uint8)
        fc = int(firecode_compute(sf[2:11]))     # forge a passing firecode
        sf[0], sf[1] = fc >> 8, fc & 0xFF
        res = parse_superframe(sf, 32, apply_rs=False)
        assert res.firecode_ok
        for au, ok in zip(res.access_units, res.au_crc_ok):
            assert isinstance(ok, bool)


def test_mot_and_packet_parsers_never_raise():
    from tpudab.data.packet import PacketChannel
    from tpudab.mot.slideshow import SlideshowManager

    rng = np.random.default_rng(3)
    mgr = SlideshowManager()
    ch = PacketChannel(address=None, on_data_group=mgr.push_data_group)
    # random packet-stream bytes through datagroup + MOT assembly
    for _ in range(50):
        ch.process_bytes(rng.integers(0, 256, 4096).astype(np.uint8).tobytes())
    # random data groups straight into the MOT/slideshow chain
    for _ in range(500):
        n = int(rng.integers(1, 300))
        mgr.push_data_group(rng.integers(0, 256, n).astype(np.uint8).tobytes())


def test_xpad_processor_never_raises():
    from tpudab.pad.xpad import XPADProcessor, extract_pad_from_dabplus_au

    rng = np.random.default_rng(4)
    proc = XPADProcessor(on_mot_data_group=lambda g: None)
    for _ in range(1000):
        fpad = bytes(rng.integers(0, 256, 2).astype(np.uint8).tolist())
        xlen = int(rng.integers(0, 64))
        xpad = bytes(rng.integers(0, 256, xlen).astype(np.uint8).tolist())
        proc.push(fpad, xpad)
    for _ in range(500):
        n = int(rng.integers(0, 128))
        au = bytes(rng.integers(0, 256, n).astype(np.uint8).tolist())
        extract_pad_from_dabplus_au(au)  # must not raise


def _one_shot_server(payload: bytes):
    """Accept one connection, send payload, close. Returns (host, port)."""
    import socket
    import threading

    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]

    def run():
        try:
            conn, _ = srv.accept()
            if payload:
                conn.sendall(payload)
            conn.close()
        except OSError:
            pass
        finally:
            srv.close()

    threading.Thread(target=run, daemon=True).start()
    return "127.0.0.1", port


def test_tcp_source_rejects_bad_magic():
    """A server that is not rtl_tcp (wrong magic) must fail cleanly with
    ConnectionError — never hang or crash the native reader."""
    import struct

    from tpudab.host.rtl_tcp import TcpSource

    host, port = _one_shot_server(b"HTTP" + struct.pack(">II", 0, 0))
    with pytest.raises(ConnectionError):
        TcpSource(host, port)


def test_tcp_source_rejects_truncated_header():
    from tpudab.host.rtl_tcp import TcpSource

    host, port = _one_shot_server(b"RT")  # dies mid-header
    with pytest.raises(ConnectionError):
        TcpSource(host, port)


def test_tcp_source_clean_eof_unblocks_reader():
    """Valid header then immediate disconnect: the source must report done
    and the ring read must return (no deadlock)."""
    import struct
    import time

    from tpudab.host.rtl_tcp import TcpSource

    host, port = _one_shot_server(
        b"RTL0" + struct.pack(">II", 5, 29) + bytes(64))
    src = TcpSource(host, port)
    try:
        deadline = time.time() + 10
        while not src.done and time.time() < deadline:
            time.sleep(0.02)
        assert src.done, "reader never noticed the EOF"
        x = src.ring.read_complex64(1 << 16)
        assert x.shape[0] <= 32          # only the 64 header-follow bytes
    finally:
        src.close()


def test_mp2_channel_never_raises_on_garbage():
    from tpudab.audio.mp2 import DABChannel

    rng = np.random.default_rng(5)
    ch = DABChannel(128)
    for _ in range(20):
        frames = rng.integers(0, 256, (4, 128 * 3)).astype(np.uint8)
        ch.process_frames(frames)


def test_dabplus_channel_never_raises_on_garbage():
    from tpudab.audio.superframe import DABPlusChannel

    rng = np.random.default_rng(6)
    ch = DABPlusChannel(32)
    for _ in range(20):
        frames = rng.integers(0, 256, (5, 96)).astype(np.uint8)
        ch.process_frames(frames)
