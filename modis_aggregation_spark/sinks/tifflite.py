"""Pure-Python baseline TIFF codec (stdlib struct + numpy).

TIFF is the archival/scan/satellite staple of real image corpora (the
PNG/GIF/JPEG codecs cover the web staples).  This module implements
the BASELINE profile of the public Adobe TIFF 6.0 specification:

* ``decode_tiff`` — both byte orders (II/MM), strip-organized chunky
  (PlanarConfiguration=1) images, 8-bit samples, grayscale
  (PhotometricInterpretation 0/1, WhiteIsZero inverted on output) and
  RGB (alpha via ExtraSamples dropped), compressions: none (1),
  LZW (5, the TIFF variant: MSB-first codes, 9→12-bit widths with the
  EARLY code-width change at table sizes 510/1022/2046 — the
  convention every real writer uses, famously one entry earlier than
  the spec's sample code), and PackBits (32773); Predictor 2
  (per-channel horizontal differencing) undone after decompression.
* ``encode_tiff`` — single-IFD little-endian writer for uint8
  grayscale / RGB: strip layout with configurable RowsPerStrip,
  ``compression`` in {"none", "packbits", "lzw"}, optional
  ``predictor=2``.  ``decode_tiff`` round-trips it bit-exactly
  (everything here is lossless).

Not implemented (honest gates, loud raises): tiled organization,
planar configuration 2, bit depths other than 8, palette color,
CCITT/JPEG/deflate-in-TIFF compressions, multi-IFD (only the FIRST
image is decoded by design, like giflite's first frame).

Reference parity note: the reference pipeline has no TIFF surface; the
codec serves the LLM-pipeline multimodal operators
(``decode_images(decoder="tiff")``, x113).  No TIFF library exists in
this container, so conventions are pinned by hand-derived spec vectors
in tests/test_tifflite.py (IFD layout, PackBits control bytes, LZW
clear/EOI codes and the early width change, predictor arithmetic)
plus parameter-sweep round trips — the flaclite/sziplite standard.
"""

from __future__ import annotations

import struct

import numpy as np

COMP_NONE = 1
COMP_LZW = 5
COMP_PACKBITS = 32773

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


# ------------------------------------------------------------ PackBits


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        c = data[i]
        i += 1
        if c == 128:  # noop
            continue
        if c < 128:  # literal run of c+1 bytes
            if i + c + 1 > n:
                raise ValueError("TIFF PackBits: literal run past end")
            out += data[i : i + c + 1]
            i += c + 1
        else:  # repeat next byte 257-c times
            if i >= n:
                raise ValueError("TIFF PackBits: repeat run past end")
            out += bytes([data[i]]) * (257 - c)
            i += 1
    if len(out) != expected:
        raise ValueError(
            f"TIFF PackBits: decoded {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find a run of >= 3 equal bytes
        j = i
        while j + 1 < n and data[j + 1] == data[j] and j - i < 127:
            j += 1
        runlen = j - i + 1
        if runlen >= 3:
            out.append(257 - runlen)
            out.append(data[i])
            i = j + 1
            continue
        # literal until the next >=3 run (or 128 bytes)
        k = i
        while k < n and k - i < 128:
            if k + 2 < n and data[k + 1] == data[k] and data[k + 2] == data[k]:
                break
            k += 1
        out.append(k - i - 1)
        out += data[i:k]
        i = k
    return bytes(out)


# ------------------------------------------------------------ TIFF LZW


def lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW: MSB-first bit packing, Clear=256, EOI=257,
    first dynamic code 258, code width 9..12 increasing EARLY (when the
    next entry WOULD reach 2^width - 1: at sizes 510/1022/2046)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    acc = nbits = 0
    pos = 0
    n = len(data)

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("TIFF LZW: stream ended without EOI")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        acc &= (1 << nbits) - 1
        if code == EOI:
            break
        if code == CLEAR:
            reset()
            continue
        if prev is None:
            if code >= 256:
                raise ValueError("TIFF LZW: first code after clear not literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF LZW: code beyond table")
        out += entry
        prev = entry
        # EARLY change (pinned against the JDK's TIFF reader/writer in
        # tests): the decoder widens when its next-entry index reaches
        # 2^width - 1 (511/1023/2047) — one entry before its table
        # fills, because the decoder runs one assignment behind the
        # encoder (the first code after a clear adds nothing)
        if len(table) >= (1 << width) - 1 and width < 12:
            width += 1
    if len(out) != expected:
        raise ValueError(
            f"TIFF LZW: decoded {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
            acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        # width bump one assignment AFTER the decoder's (it runs one
        # entry ahead); pinned against the JDK's TIFF reader in tests
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code > 4093:  # table full: clear and restart
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# ------------------------------------------------------------- decoder


def _read_ifd_value(buf, bo, etype, count, raw):
    size = _TYPE_SIZES.get(etype)
    if size is None:
        return None
    total = size * count
    if total <= 4:
        data = raw[:total]
    else:
        (off,) = struct.unpack(bo + "I", raw)
        data = buf[off : off + total]
    if etype in (1, 2):
        return list(data)
    if etype == 3:
        return list(struct.unpack(bo + f"{count}H", data))
    if etype == 4:
        return list(struct.unpack(bo + f"{count}I", data))
    if etype == 5:
        vals = struct.unpack(bo + f"{2 * count}I", data)
        return [(vals[2 * i], vals[2 * i + 1]) for i in range(count)]
    return None


def decode_tiff(buf: bytes) -> np.ndarray:
    """Decode the FIRST image of a TIFF stream → uint8 (H, W) grayscale
    or (H, W, 3) RGB (see the module docstring for the profile)."""
    buf = bytes(buf)
    if buf[:4] == b"II*\x00":
        bo = "<"
    elif buf[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF (missing II*/MM* magic)")
    (ifd_off,) = struct.unpack(bo + "I", buf[4:8])
    (nent,) = struct.unpack(bo + "H", buf[ifd_off : ifd_off + 2])
    tags: dict[int, list] = {}
    for i in range(nent):
        e = buf[ifd_off + 2 + 12 * i : ifd_off + 2 + 12 * (i + 1)]
        tag, etype, count = struct.unpack(bo + "HHI", e[:8])
        v = _read_ifd_value(buf, bo, etype, count, e[8:12])
        if v is not None:
            tags[tag] = v

    def one(tag, default=None):
        v = tags.get(tag)
        return v[0] if v else default

    w = one(256)
    h = one(257)
    if not w or not h:
        raise ValueError("TIFF: missing ImageWidth/ImageLength")
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    if any(b != 8 for b in bits):
        raise NotImplementedError(
            f"TIFF bit depths {bits} not implemented (8-bit baseline only; "
            "honest gate — no silent fallback)"
        )
    comp = one(259, COMP_NONE)
    photo = one(262)
    if photo not in (0, 1, 2):
        raise NotImplementedError(
            f"TIFF photometric {photo} (palette/CMYK/YCbCr) not implemented"
        )
    if one(284, 1) != 1:
        raise NotImplementedError("TIFF planar configuration 2 not implemented")
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF organization not implemented")
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} not implemented")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF: missing/mismatched strip offsets/counts")
    rows_per_strip = one(278, h)
    if photo == 2 and spp < 3:
        raise ValueError("TIFF: RGB photometric with <3 samples per pixel")

    row_bytes = w * spp
    raw = bytearray()
    row0 = 0
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        nrows = min(rows_per_strip, h - row0)
        expected = nrows * row_bytes
        chunk = buf[off : off + cnt]
        if len(chunk) != cnt:
            raise ValueError("TIFF: strip data past end of file")
        if comp == COMP_NONE:
            if len(chunk) < expected:
                raise ValueError("TIFF: uncompressed strip too short")
            raw += chunk[:expected]
        elif comp == COMP_PACKBITS:
            raw += packbits_decode(chunk, expected)
        elif comp == COMP_LZW:
            raw += lzw_decode(chunk, expected)
        else:
            raise NotImplementedError(
                f"TIFF compression {comp} not implemented (none/LZW/PackBits "
                "are; honest gate)"
            )
        row0 += nrows
    if row0 < h:
        raise ValueError("TIFF: strips cover fewer rows than ImageLength")

    arr = np.frombuffer(bytes(raw), np.uint8).reshape(h, w, spp)
    if predictor == 2:  # horizontal differencing: undo per channel
        arr = np.cumsum(arr.astype(np.uint32), axis=1).astype(np.uint8)
    if photo == 0:  # WhiteIsZero
        arr = 255 - arr
    if spp == 1:
        return arr[:, :, 0].copy()
    return arr[:, :, :3].copy()  # ExtraSamples (alpha) dropped


# ------------------------------------------------------------- encoder


def encode_tiff(
    img: np.ndarray,
    compression: str = "none",
    predictor: int = 1,
    rows_per_strip: int = 8,
) -> bytes:
    """Encode uint8 (H, W) grayscale or (H, W, 3) RGB as a single-IFD
    little-endian baseline TIFF (see the module docstring)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_tiff wants uint8")
    if img.ndim == 2:
        arr = img[:, :, np.newaxis]
    elif img.ndim == 3 and img.shape[2] == 3:
        arr = img
    else:
        raise ValueError("encode_tiff wants (H, W) or (H, W, 3)")
    if compression not in ("none", "packbits", "lzw"):
        raise ValueError(f"unknown TIFF compression: {compression!r}")
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 (none) or 2 (horizontal)")
    if predictor == 2 and compression != "lzw":
        # TIFF 6.0 defines Predictor in the LZW extension (section 14);
        # real readers (the JDK included) ignore it for other codecs,
        # which would silently mis-decode — refuse instead
        raise ValueError("predictor 2 is only defined with LZW compression")
    h, w, spp = arr.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if predictor == 2:
        d = arr.astype(np.int16)
        d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
        arr = (d & 0xFF).astype(np.uint8)
    comp_code = {"none": COMP_NONE, "packbits": COMP_PACKBITS, "lzw": COMP_LZW}[
        compression
    ]
    strips = []
    for r0 in range(0, h, rows_per_strip):
        chunk = arr[r0 : r0 + rows_per_strip].tobytes()
        if compression == "packbits":
            chunk = packbits_encode(chunk)
        elif compression == "lzw":
            chunk = lzw_encode(chunk)
        strips.append(chunk)

    entries = []  # (tag, type, count, value_int_or_bytes)

    def short(tag, v):
        entries.append((tag, 3, 1, struct.pack("<HH", v, 0)))

    def long_(tag, v):
        entries.append((tag, 4, 1, struct.pack("<I", v)))

    nstrips = len(strips)
    # layout: header(8) + IFD + arrays + strip data
    nent = 11
    ifd_size = 2 + 12 * nent + 4
    arrays_off = 8 + ifd_size
    extra = bytearray()

    def arr_long(vals):
        nonlocal extra
        if len(vals) == 1:
            return 4, 1, struct.pack("<I", vals[0])
        off = arrays_off + len(extra)
        extra += struct.pack(f"<{len(vals)}I", *vals)
        return 4, len(vals), struct.pack("<I", off)

    def arr_short(vals):
        nonlocal extra
        if len(vals) <= 2:
            packed = struct.pack(f"<{len(vals)}H", *vals)
            return 3, len(vals), packed + b"\x00" * (4 - len(packed))
        off = arrays_off + len(extra)
        extra += struct.pack(f"<{len(vals)}H", *vals)
        if len(extra) % 2:
            extra += b"\x00"
        return 3, len(vals), struct.pack("<I", off)

    # strip offsets need the final data position: compute after extra
    # arrays by reserving their slots, two passes
    bps_t, bps_c, bps_v = arr_short([8] * spp)
    counts_t, counts_c, counts_v = arr_long([len(s) for s in strips])
    # reserve strip-offset array space
    if nstrips == 1:
        so_entry = None
        so_slot = struct.pack("<I", 0)
    else:
        so_off = arrays_off + len(extra)
        extra += b"\x00" * (4 * nstrips)
        so_entry = so_off
        so_slot = struct.pack("<I", so_off)
    data_off = arrays_off + len(extra)
    offs = []
    p = data_off
    for s in strips:
        offs.append(p)
        p += len(s)
    if nstrips == 1:
        so_slot = struct.pack("<I", offs[0])
    else:
        extra[so_entry - arrays_off : so_entry - arrays_off + 4 * nstrips] = (
            struct.pack(f"<{nstrips}I", *offs)
        )

    entries = []
    long_(256, w)
    long_(257, h)
    entries.append((258, bps_t, bps_c, bps_v))
    short(259, comp_code)
    short(262, 1 if spp == 1 else 2)  # BlackIsZero / RGB
    entries.append((273, 4, nstrips, so_slot))
    short(277, spp)
    long_(278, rows_per_strip)
    entries.append((279, counts_t, counts_c, counts_v))
    short(284, 1)
    short(317, predictor)
    entries.sort(key=lambda e: e[0])
    assert len(entries) == nent, (len(entries), nent)

    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", nent)
    for tag, etype, count, val in entries:
        out += struct.pack("<HHI", tag, etype, count) + val
    out += struct.pack("<I", 0)  # no next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)
