"""Image IO: png/hdr round-trips and tone-map parity."""

import numpy as np

from lumillyrender_tpu.io.image import (
    read_hdr,
    read_png,
    to_color,
    write_hdr,
    write_png,
)


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.random((37, 53, 3)) * 255).astype(np.uint8)
    p = tmp_path / "x.png"
    write_png(p, img)
    back = read_png(p)
    assert np.array_equal(img, back)


def test_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = (rng.random((16, 32, 3)) ** 2 * 100).astype(np.float32)
    p = tmp_path / "x.hdr"
    write_hdr(p, img)
    back = read_hdr(p)
    # RGBE has ~1% mantissa precision (8-bit shared-exponent).
    rel = np.abs(back - img) / np.maximum(img.max(axis=-1, keepdims=True), 1e-6)
    assert rel.max() < 0.01


def test_hdr_zero_and_big(tmp_path):
    img = np.zeros((4, 8, 3), np.float32)
    img[0, 0] = [1e4, 0.5, 0]
    img[1, 1] = [0, 0, 1e-6]
    p = tmp_path / "e.hdr"
    write_hdr(p, img)
    back = read_hdr(p)
    assert back[0, 0, 0] > 9e3
    assert np.all(back[2:] == 0)


def test_to_color_parity():
    """`to_color` truncates like Rust's `as u8` (`main.rs:171-173`)."""
    x = np.array([-0.5, 0.0, 0.25, 1.0, 2.0], np.float32)
    out = to_color(x, 2.2)
    assert out[0] == 0
    assert out[3] == 255
    assert out[4] == 255  # clamped
    expect = int((0.25 ** (1 / 2.2)) * 255.0)  # truncation, not rounding
    assert out[2] == expect
