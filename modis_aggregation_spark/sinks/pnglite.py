"""Minimal pure-Python PNG writer/reader (stdlib zlib + struct).

Closes the reference's PNG product surface (the ``resources/data/
sample_output_data/*.png`` comparison plots) without PIL/matplotlib:
``write_png`` emits 8-bit grayscale/RGB/RGBA with filter type 0 and a
single zlib IDAT; ``read_png`` parses that subset back (plus PNGs using
per-scanline filters 0-4, for round-trip honesty against other
producers). Format per the public PNG specification (RFC 2083 / W3C).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}  # channels -> PNG color type


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """``img``: uint8 array (H, W) grayscale, (H, W, 3) RGB or
    (H, W, 4) RGBA → PNG bytes."""
    img = np.ascontiguousarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_png wants uint8")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    # filter byte 0 (None) before every scanline
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    out = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw, 9))
    return out + _chunk(b"IEND", b"")


def write_png(path: str, img: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(encode_png(img))


def _unfilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += 1 + stride
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(ch, stride):
                cur[x] = (cur[x] + cur[x - ch]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise NotImplementedError(f"filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def read_png(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return decode_png(f.read())


def decode_png(buf: bytes) -> np.ndarray:
    if buf[:8] != _SIG:
        raise ValueError("not a PNG")
    pos, idat, meta = 8, b"", None
    while pos < len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        body = buf[pos + 8 : pos + 8 + length]
        crc = struct.unpack_from(">I", buf, pos + 8 + length)[0]
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", body)
            if depth != 8 or comp or filt or inter:
                raise NotImplementedError("8-bit non-interlaced only")
            ch = {0: 1, 2: 3, 6: 4}.get(ctype)
            if ch is None:
                raise NotImplementedError(f"color type {ctype}")
            meta = (h, w, ch)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if meta is None:
        raise ValueError("PNG has no IHDR chunk")
    h, w, ch = meta
    arr = _unfilter(zlib.decompress(idat), h, w, ch).reshape(h, w, ch)
    return arr[:, :, 0] if ch == 1 else arr


def colorize(values: np.ndarray, vmin: float, vmax: float) -> np.ndarray:
    """Map a float grid to RGBA: a perceptual-ish blue→green→yellow ramp
    (procedural, no colormap tables); NaN → fully transparent."""
    v = np.asarray(values, dtype=np.float64)
    t = np.clip((v - vmin) / (vmax - vmin) if vmax > vmin else v * 0, 0.0, 1.0)
    t = np.nan_to_num(t, nan=0.0)  # color is moot where alpha is 0
    r = np.clip(1.5 * t - 0.25, 0, 1)
    g = np.clip(1.2 * t + 0.1, 0, 1) * (0.4 + 0.6 * t)
    b = np.clip(0.9 - 0.9 * t, 0, 1)
    rgba = np.stack(
        [
            (r * 255).astype(np.uint8),
            (g * 255).astype(np.uint8),
            (b * 255).astype(np.uint8),
            np.where(np.isnan(v), 0, 255).astype(np.uint8),
        ],
        axis=-1,
    )
    return rgba
