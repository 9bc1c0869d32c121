"""Terminal slideshow rendering (VERDICT r4 item 6): kitty / sixel /
half-block encoders on a synthetic PNG, plus the dashboard 'i' toggle.

Reference analog: slides rendered via stb_image + OpenGL textures
(/root/reference/src/render_radio_block.cpp:309-384, texture.cpp:15-17);
tpudab's display surface is the terminal.
"""

import base64
import io

import numpy as np
import pytest

from tpudab.host.termimage import (decode_image, detect_mode,
                                   render_halfblock, render_kitty,
                                   render_sixel, render_slide)


def _png(w=8, h=6):
    """Synthetic PNG: left half red, right half blue."""
    from PIL import Image
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[:, : w // 2] = (200, 10, 10)
    rgb[:, w // 2 :] = (10, 10, 200)
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="PNG")
    return buf.getvalue(), rgb


def test_decode_image_roundtrip():
    data, rgb = _png()
    got = decode_image(data)
    np.testing.assert_array_equal(got, rgb)
    assert decode_image(b"not an image") is None


def test_halfblock_encoding():
    _, rgb = _png(8, 6)
    art = render_halfblock(rgb, max_cols=8, max_rows=3)
    lines = art.split("\n")
    assert len(lines) == 3                       # 6 rows -> 3 half-block rows
    assert "▀" in art
    assert "\x1b[38;2;200;10;10m" in art         # red fg (top pixel)
    assert "\x1b[48;2;10;10;200m" in art         # blue bg (bottom pixel)
    assert art.count("▀") == 24             # 8 cols x 3 rows
    for line in lines:
        assert line.endswith("\x1b[0m")


def test_kitty_transmits_original_png():
    data, _ = _png()
    art = render_kitty(data, "png")
    assert art.startswith("\x1b_G")
    assert art.endswith("\x1b\\")
    assert "a=T,f=100" in art
    # the transmitted payload IS the original PNG (full fidelity)
    payload = "".join(chunk.split(";", 1)[1].rsplit("\x1b", 1)[0]
                      for chunk in art.split("\x1b_G")[1:])
    assert base64.standard_b64decode(payload) == data


def test_sixel_structure():
    _, rgb = _png(12, 12)
    art = render_sixel(rgb, max_cols=4, max_rows=2)
    assert art.startswith("\x1bPq")
    assert art.endswith("\x1b\\")
    assert "#0;2;0;0;0" in art                   # palette register 0
    assert "-" in art                            # at least one sixel band


def test_render_slide_dispatch(monkeypatch):
    data, _ = _png()
    monkeypatch.setenv("TPUDAB_TERMIMG", "half")
    assert detect_mode() == "half"
    assert "▀" in render_slide(data)
    monkeypatch.setenv("TPUDAB_TERMIMG", "kitty")
    assert render_slide(data).startswith("\x1b_G")
    monkeypatch.setenv("TPUDAB_TERMIMG", "sixel")
    assert render_slide(data).startswith("\x1bPq")
    monkeypatch.setenv("TPUDAB_TERMIMG", "off")
    assert render_slide(data) == ""
    # corrupt bytes never raise
    monkeypatch.setenv("TPUDAB_TERMIMG", "half")
    assert render_slide(b"garbage") == ""


def test_dashboard_renders_slide_behind_toggle(monkeypatch):
    """End to end: a decoded MOT slideshow shows up as an inline image in
    the dashboard text once 'i' toggles slides on."""
    from tpudab.host.controls import KeyController
    from tpudab.host.dashboard import render_text
    from tpudab.mot.slideshow import SlideshowManager
    from tpudab.mot.mot import MOTObject, build_mot_object_groups, ContentType
    from tpudab.models.receiver import Receiver

    monkeypatch.setenv("TPUDAB_TERMIMG", "half")
    data, _ = _png(16, 8)

    class Ch:
        slideshow = SlideshowManager()
        is_play_audio = is_decode_audio = is_decode_data = True

    ch = Ch()
    obj = MOTObject(transport_id=7, content_type=ContentType.IMAGE,
                    content_subtype=3, body=data, content_name="art.png")
    for g in build_mot_object_groups(obj, segment_size=128):
        ch.slideshow.push_data_group(g)
    assert len(ch.slideshow.slides) == 1

    rx = Receiver()
    rx.channels[1] = ch
    ctl = KeyController(receiver=rx, audio=None, read_key=lambda: None)

    before = render_text(rx, controls=ctl)
    assert "▀" not in before                # toggle off: no image
    ctl.handle("i")
    assert ctl.show_slides
    after = render_text(rx, controls=ctl)
    assert "slide: art.png" in after
    assert "▀" in after and "\x1b[38;2;" in after
