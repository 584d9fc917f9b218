"""Image IO: PNG writer and Radiance HDR (RGBE) reader/writer.

Parity: reference `src/img.rs` (png/hdr save via the `image` crate) and
`src/sky.rs:42-55` (hdr decode for IBL). Pure Python/numpy — no external
image dependencies.
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

import numpy as np


def to_color(x: np.ndarray, gamma: float) -> np.ndarray:
    """Tone map: clamp to [0,1], gamma, scale to u8 (`main.rs:171-173`).

    The reference casts with `as u8` (truncation), not rounding.
    """
    y = np.clip(np.asarray(x, dtype=np.float32), 0.0, 1.0) ** (1.0 / gamma) * 255.0
    return y.astype(np.uint8)


def write_png(path: str | Path, rgb_u8: np.ndarray) -> None:
    """Write an (H, W, 3) uint8 array as an RGB PNG."""
    img = np.asarray(rgb_u8)
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    h, w, _ = img.shape

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    Path(path).write_bytes(data)


def read_png(path: str | Path) -> np.ndarray:
    """Minimal PNG reader for our own files (RGB8/RGBA8, no interlace)."""
    data = Path(path).read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    idat = b""
    w = h = channels = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            assert depth == 8 and interlace == 0 and color in (2, 6)
            channels = 3 if color == 2 else 4
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride = w * channels
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], np.uint8).copy()
        if f == 0:
            pass
        elif f == 2:  # up
            line = (line.astype(np.int16) + prev).astype(np.uint8)
        elif f in (1, 3, 4):  # sub / avg / paeth need sequential scan
            line = line.astype(np.int32)
            cur = np.zeros(stride, np.int32)
            pv = prev.astype(np.int32)
            for i in range(stride):
                a = cur[i - channels] if i >= channels else 0
                b = pv[i]
                c = pv[i - channels] if i >= channels else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (line[i] + pred) & 0xFF
            line = cur.astype(np.uint8)
        else:
            raise ValueError(f"unsupported PNG filter {f}")
        out[y] = line
        prev = line
    return out.reshape(h, w, channels)[..., :3]


# ---------------------------------------------------------------------------
# Radiance HDR (RGBE)
# ---------------------------------------------------------------------------


def _rgbe_to_float(rgbe: np.ndarray) -> np.ndarray:
    """(..., 4) uint8 -> (..., 3) float32 (standard ldexp decode)."""
    rgbe = rgbe.astype(np.int32)
    exp = rgbe[..., 3:4] - (128 + 8)
    scale = np.where(rgbe[..., 3:4] > 0, np.ldexp(1.0, exp), 0.0).astype(np.float32)
    return rgbe[..., :3].astype(np.float32) * scale


def _float_to_rgbe(rgb: np.ndarray) -> np.ndarray:
    rgb = np.maximum(np.asarray(rgb, dtype=np.float32), 0.0)
    maxc = rgb.max(axis=-1)
    mant, exp = np.frexp(maxc)
    scale = np.where(maxc > 1e-32, np.ldexp(1.0, -exp) * 256.0, 0.0)
    out = np.zeros(rgb.shape[:-1] + (4,), np.uint8)
    vals = np.clip(rgb * scale[..., None], 0, 255).astype(np.uint8)
    mask = maxc > 1e-32
    out[..., :3] = np.where(mask[..., None], vals, 0)
    out[..., 3] = np.where(mask, exp + 128, 0)
    return out


def read_hdr(path: str | Path) -> np.ndarray:
    """Read a Radiance .hdr file -> (H, W, 3) float32 (linear radiance)."""
    data = Path(path).read_bytes()
    # Header: lines until blank, then resolution line.
    pos = 0

    def read_line() -> str:
        nonlocal pos
        end = data.index(b"\n", pos)
        line = data[pos:end].decode("ascii", errors="replace")
        pos = end + 1
        return line

    magic = read_line()
    if not magic.startswith("#?"):
        raise ValueError("not a Radiance HDR file")
    while True:
        line = read_line()
        if line.strip() == "":
            break
    res = read_line().split()
    if len(res) != 4 or res[0] != "-Y" or res[2] != "+X":
        raise ValueError(f"unsupported HDR orientation: {' '.join(res)}")
    h, w = int(res[1]), int(res[3])

    out = np.empty((h, w, 4), np.uint8)
    buf = data[pos:]
    bp = 0
    for y in range(h):
        if bp + 4 <= len(buf) and buf[bp] == 2 and buf[bp + 1] == 2 and (
            (buf[bp + 2] << 8) | buf[bp + 3]
        ) == w and w >= 8 and w < 32768:
            # New-style RLE scanline: 4 component planes.
            bp += 4
            for c in range(4):
                x = 0
                while x < w:
                    count = buf[bp]
                    bp += 1
                    if count > 128:  # run
                        out[y, x : x + count - 128, c] = buf[bp]
                        bp += 1
                        x += count - 128
                    else:  # literal
                        out[y, x : x + count, c] = np.frombuffer(
                            buf[bp : bp + count], np.uint8
                        )
                        bp += count
                        x += count
        else:
            # Flat scanline (possibly with old-style RLE 1,1,1 markers).
            x = 0
            while x < w:
                px = np.frombuffer(buf[bp : bp + 4], np.uint8)
                bp += 4
                if px[0] == 1 and px[1] == 1 and px[2] == 1 and x > 0:
                    run = int(px[3])
                    out[y, x : x + run] = out[y, x - 1]
                    x += run
                else:
                    out[y, x] = px
                    x += 1
    return _rgbe_to_float(out)


def write_hdr(path: str | Path, rgb: np.ndarray) -> None:
    """Write (H, W, 3) float32 as a flat (non-RLE) Radiance .hdr file."""
    rgb = np.asarray(rgb, dtype=np.float32)
    h, w, _ = rgb.shape
    header = f"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n-Y {h} +X {w}\n".encode()
    body = _float_to_rgbe(rgb).tobytes()
    Path(path).write_bytes(header + body)
