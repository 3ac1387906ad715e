"""Minimal pure-Python GIF reader/writer (stdlib struct only).

Why this exists: ``operators/multimodal.py`` needs a REAL animated-media
codec so frame sampling (the video-pipeline stand-in of the builder's
brief) can run on physical container bytes instead of the deterministic
fake. GIF is the one animated format whose decode is EXACT — LZW is
lossless and palette lookup is integer — so a pure-Python decoder can be
value-oracled bit-for-bit (unlike JPEG/MPEG whose IDCT rounding varies
by implementation). Format per the public GIF89a specification
(https://www.w3.org/Graphics/GIF/spec-gif89a.txt).

Supported on READ: GIF87a/89a, global + local color tables, interlaced
images, Graphic Control Extensions (frame delay, transparency, disposal
methods 0/1 "leave" and 2 "restore to background"), multi-frame
animations composited to full RGB frames. Disposal 3 ("restore to
previous") raises — honest gate, no silently wrong compositing.

Supported on WRITE: full-frame animations from palette-indexed arrays
(or RGB arrays with ≤256 distinct colors), optional interlace, per-frame
delay; disposal 1, no transparency. Round-trip verified, and the emitted
stream is cross-validated against the JVM's javax.imageio (an
independent decoder) in tests.

No code is derived from PIL/giflib or the reference — written from the
public spec.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ==========================================================================
# LZW (GIF variant: variable code width, clear/EOI codes, LSB-first bits)
# ==========================================================================


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    # bit reader, LSB first
    bitpos = 0
    nbits = len(data) * 8

    def read(width: int) -> int:
        nonlocal bitpos
        v = 0
        for i in range(width):
            if bitpos >= nbits:
                return -1
            byte = data[bitpos >> 3]
            v |= ((byte >> (bitpos & 7)) & 1) << i
            bitpos += 1
        return v

    table: list[list[int]] = []

    def reset():
        nonlocal table, width, prev
        table = [[i] for i in range(clear)] + [[], []]
        width = min_code_size + 1
        prev = None

    width = min_code_size + 1
    prev: list[int] | None = None
    reset()
    while True:
        code = read(width)
        if code < 0 or code == eoi:
            break
        if code == clear:
            reset()
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]
        else:
            raise ValueError(f"corrupt LZW stream (code {code})")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, width: int):
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    buf = b""
    for idx in indices.tolist():
        cand = buf + bytes([idx])
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        buf = bytes([idx])
    if buf:
        emit(table[buf], width)
    emit(eoi, width)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# ==========================================================================
# writer
# ==========================================================================


def encode_gif(
    frames,
    palette: np.ndarray | None = None,
    delay_cs: int = 10,
    interlace: bool = False,
) -> bytes:
    """Animated GIF bytes from full frames.

    ``frames``: list of uint8 arrays — either (H, W) palette INDICES with
    ``palette`` given as an (N≤256, 3) uint8 table, or (H, W, 3) RGB
    (a shared palette is built from the distinct colors; >256 raises).
    Every frame is written full-size with disposal 1 (leave in place), so
    composition equals the frame itself.
    """
    frames = [np.ascontiguousarray(f) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    if palette is None:
        if frames[0].ndim != 3:
            raise ValueError("RGB frames or an explicit palette required")
        colors = np.unique(
            np.concatenate([f.reshape(-1, 3) for f in frames]), axis=0
        )
        if len(colors) > 256:
            raise ValueError(
                f"{len(colors)} distinct colors; GIF palettes cap at 256 — "
                "quantize first or pass indices + palette"
            )
        palette = colors.astype(np.uint8)
        lut = {tuple(c): i for i, c in enumerate(palette.tolist())}
        frames = [
            np.array(
                [[lut[tuple(px)] for px in row] for row in f.tolist()],
                dtype=np.uint8,
            )
            for f in frames
        ]
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("all frames must share one shape")
    # palette size: power of two ≥ max(2, n)
    depth = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    table = np.zeros((1 << depth, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0)
    out += table.tobytes()
    if len(frames) > 1:
        # Netscape looping extension (loop forever)
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(2, depth)
    for f in frames:
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 1 << 2, delay_cs, 0) + b"\x00"
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        idx = f
        if interlace:
            order = [
                y for start, step in _INTERLACE_PASSES for y in range(start, h, step)
            ]
            idx = f[order]
        out.append(min_code)
        out += _sub_blocks(_lzw_encode(idx.ravel(), min_code))
    out += b"\x3b"
    return bytes(out)


def write_gif(path: str, frames, **kw) -> None:
    with open(path, "wb") as fh:
        fh.write(encode_gif(frames, **kw))


# ==========================================================================
# reader
# ==========================================================================


def decode_gif(buf: bytes):
    """Decode a GIF into ``(frames, delays_cs)`` — composited full
    (H, W, 3) uint8 RGB frames honoring disposal 0/1/2 and transparency
    (disposal 3 raises)."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, bg, _aspect = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None:
        canvas[:, :] = gct[bg] if bg < len(gct) else 0
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    disposal = 0
    delay = 0

    def skip_subblocks(p: int) -> int:
        while buf[p]:
            p += 1 + buf[p]
        return p + 1

    while pos < len(buf):
        block = buf[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = buf[pos + 1]
            if label == 0xF9:  # graphic control
                size = buf[pos + 2]
                gflags, delay, tcolor = struct.unpack_from("<BHB", buf, pos + 3)
                disposal = (gflags >> 2) & 7
                transparent = tcolor if gflags & 1 else None
                pos = skip_subblocks(pos + 3 + size)
            else:
                pos = skip_subblocks(pos + 2)
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", buf, pos + 1)
        pos += 10
        if ix + iw > w or iy + ih > h:
            raise ValueError(
                f"malformed GIF: image descriptor {iw}x{ih}@({ix},{iy}) "
                f"exceeds the {w}x{h} logical screen"
            )
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            pal = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF image with no color table")
        min_code = buf[pos]
        pos += 1
        data = bytearray()
        while buf[pos]:
            ln = buf[pos]
            data += buf[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.array(_lzw_decode(bytes(data), min_code), dtype=np.int32)
        if idx.size < iw * ih:
            raise ValueError("truncated GIF image data")
        idx = idx[: iw * ih].reshape(ih, iw)
        if iflags & 0x40:  # interlaced: rows arrive pass-by-pass
            deinter = np.zeros_like(idx)
            src = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, ih, step):
                    deinter[y] = idx[src]
                    src += 1
            idx = deinter
        if disposal == 3:
            raise NotImplementedError(
                "GIF disposal method 3 (restore to previous) is not "
                "implemented — no ground-truth renderer here to validate "
                "the frame stack against"
            )
        region = canvas[iy : iy + ih, ix : ix + iw]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError(
                f"malformed GIF: LZW index {int(idx.max())} exceeds the "
                f"{len(pal)}-entry color table"
            )
        rgb = pal[idx]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:  # restore region to background
            bgc = gct[bg] if (gct is not None and bg < len(gct)) else 0
            canvas[iy : iy + ih, ix : ix + iw] = bgc
        # disposal 0/1: leave composited.  A Graphic Control Extension
        # governs only the single following image (GIF89a spec §23) —
        # reset all three GCE-carried fields, including delay, so a
        # frame with no GCE gets delay 0 rather than inheriting.
        transparent = None
        disposal = 0
        delay = 0
    if not frames:
        raise ValueError("GIF has no image frames")
    return frames, delays


def read_gif(path: str):
    with open(path, "rb") as fh:
        return decode_gif(fh.read())
