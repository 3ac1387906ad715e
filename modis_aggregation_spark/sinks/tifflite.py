"""Pure-Python baseline TIFF codec (stdlib struct + numpy).

TIFF is the archival/scan/satellite staple of real image corpora (the
PNG/GIF/JPEG codecs cover the web staples).  This module implements
the BASELINE profile of the public Adobe TIFF 6.0 specification:

* ``decode_tiff`` — both byte orders (II/MM); STRIP and TILE (round
  12: TileWidth/TileLength/TileOffsets/TileByteCounts, boundary-padded
  tiles cropped on placement) organization; chunky
  (PlanarConfiguration=1) AND separate-plane (PlanarConfiguration=2,
  round 12: strips/tiles ordered plane-major) layouts; 8-bit and
  16-bit samples (round 12 — 16-bit in the file's byte order, uint16
  output, the norm in scientific/GeoTIFF imagery); grayscale
  (PhotometricInterpretation 0/1, WhiteIsZero inverted on output) and
  RGB (alpha via ExtraSamples dropped), compressions: none (1),
  LZW (5, the TIFF variant: MSB-first codes, 9→12-bit widths with the
  EARLY code-width change at table sizes 510/1022/2046 — the
  convention every real writer uses, famously one entry earlier than
  the spec's sample code), and PackBits (32773); Predictor 2
  (per-channel horizontal differencing, modulo the sample width)
  undone per decompressed chunk — each strip/tile row is an
  independent difference chain, so tiles at x > 0 never chain across
  tile seams.
* ``encode_tiff`` — single-IFD little-endian writer for uint8/uint16
  grayscale / RGB: strip layout with configurable RowsPerStrip or
  TILED layout (``tile=(tw, tl)``, multiples of 16, edge-padded),
  chunky or ``planar=True`` separate planes, ``compression`` in
  {"none", "packbits", "lzw"}, optional ``predictor=2`` (applied per
  chunk row).  ``decode_tiff`` round-trips it bit-exactly (everything
  here is lossless).

Not implemented (honest gates, loud raises): palette color,
CCITT/JPEG/deflate-in-TIFF compressions, bit depths other than 8/16,
multi-IFD (only the FIRST image is decoded by design, like giflite's
first frame).

Reference parity note: the reference pipeline has no TIFF surface; the
codec serves the LLM-pipeline multimodal operators
(``decode_images(decoder="tiff")``, x113).  Validation: hand-derived
spec vectors in tests/test_tifflite.py (IFD layout, PackBits control
bytes, LZW clear/EOI codes and the early width change, predictor
arithmetic) plus parameter-sweep round trips, AND cross-validation in
BOTH directions against the JDK's javax.imageio TIFF plugin — a real,
independent production codec (it must decode our streams, we must
decode its, including LZW+predictor, tiled, planar, and 16-bit
layouts).
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
        # the decoder ADDS an entry for this final code (its table
        # reaches next_code) before reading EOI, so when that entry
        # lands exactly on the early-change boundary (511/1023/2047)
        # the decoder widens and EOI must be written at the new width
        if next_code >= (1 << width) - 1 and width < 12:
            width += 1
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
    """Decode the FIRST image of a TIFF stream → uint8/uint16 (H, W)
    grayscale or (H, W, 3) RGB (see the module docstring for the
    profile)."""
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
    if len(set(bits)) != 1 or bits[0] not in (8, 16):
        raise NotImplementedError(
            f"TIFF bit depths {bits} not implemented (uniform 8/16-bit "
            "only; honest gate — no silent fallback)"
        )
    sample_dt = np.dtype(bo + "u2") if bits[0] == 16 else np.dtype("u1")
    out_dt = np.uint16 if bits[0] == 16 else np.uint8
    white = (1 << bits[0]) - 1
    comp = one(259, COMP_NONE)
    photo = one(262)
    if photo not in (0, 1, 2):
        raise NotImplementedError(
            f"TIFF photometric {photo} (palette/CMYK/YCbCr) not implemented"
        )
    planar = one(284, 1)
    if planar not in (1, 2):
        raise ValueError(f"TIFF planar configuration {planar} invalid")
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} not implemented")
    if photo == 2 and spp < 3:
        raise ValueError("TIFF: RGB photometric with <3 samples per pixel")
    tiled = 322 in tags or 323 in tags

    def chunk_pixels(off, cnt, nrows, ncols, nch):
        """Decompress one strip/tile to a (nrows, ncols, nch) array and
        undo the predictor — each chunk row is an independent
        difference chain (tiles never chain across seams)."""
        expected = nrows * ncols * nch * sample_dt.itemsize
        chunk = buf[off : off + cnt]
        if len(chunk) != cnt:
            raise ValueError("TIFF: chunk data past end of file")
        if comp == COMP_NONE:
            if len(chunk) < expected:
                raise ValueError("TIFF: uncompressed chunk too short")
            raw = chunk[:expected]
        elif comp == COMP_PACKBITS:
            raw = packbits_decode(chunk, expected)
        elif comp == COMP_LZW:
            raw = lzw_decode(chunk, expected)
        else:
            raise NotImplementedError(
                f"TIFF compression {comp} not implemented (none/LZW/PackBits "
                "are; honest gate)"
            )
        a = np.frombuffer(raw, sample_dt).reshape(nrows, ncols, nch)
        if predictor == 2:  # horizontal differencing modulo sample width
            a = np.cumsum(a.astype(np.uint32), axis=1).astype(sample_dt)
        return a

    out = np.zeros((h, w, spp), dtype=out_dt)
    nch = spp if planar == 1 else 1
    nplanes = 1 if planar == 1 else spp

    if tiled:
        tw, tl = one(322), one(323)
        offsets, counts = tags.get(324), tags.get(325)
        if not tw or not tl:
            raise ValueError("TIFF: tiled image missing TileWidth/TileLength")
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF: missing/mismatched tile offsets/counts")
        ta, td = -(-w // tw), -(-h // tl)
        per_plane = ta * td
        if len(offsets) != per_plane * nplanes:
            raise ValueError(
                f"TIFF: {len(offsets)} tiles, expected {per_plane * nplanes}"
            )
        for p in range(nplanes):
            for ty in range(td):
                for tx in range(ta):
                    i = p * per_plane + ty * ta + tx
                    tile = chunk_pixels(offsets[i], counts[i], tl, tw, nch)
                    y0, x0 = ty * tl, tx * tw
                    ch = min(tl, h - y0)
                    cw = min(tw, w - x0)
                    if planar == 1:
                        out[y0 : y0 + ch, x0 : x0 + cw] = tile[:ch, :cw]
                    else:
                        out[y0 : y0 + ch, x0 : x0 + cw, p] = tile[:ch, :cw, 0]
    else:
        offsets = tags.get(273)
        counts = tags.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF: missing/mismatched strip offsets/counts")
        rows_per_strip = one(278, h)
        per_plane = -(-h // rows_per_strip)
        if len(offsets) != per_plane * nplanes:
            raise ValueError(
                f"TIFF: {len(offsets)} strips, expected {per_plane * nplanes}"
            )
        for p in range(nplanes):
            for si in range(per_plane):
                row0 = si * rows_per_strip
                nrows = min(rows_per_strip, h - row0)
                i = p * per_plane + si
                strip = chunk_pixels(offsets[i], counts[i], nrows, w, nch)
                if planar == 1:
                    out[row0 : row0 + nrows] = strip
                else:
                    out[row0 : row0 + nrows, :, p] = strip[:, :, 0]

    if photo == 0:  # WhiteIsZero
        out = white - out
    if spp == 1:
        return out[:, :, 0].copy()
    return out[:, :, :3].copy()  # ExtraSamples (alpha) dropped


# ------------------------------------------------------------- encoder


def encode_tiff(
    img: np.ndarray,
    compression: str = "none",
    predictor: int = 1,
    rows_per_strip: int = 8,
    planar: bool = False,
    tile: tuple[int, int] | None = None,
) -> bytes:
    """Encode uint8/uint16 (H, W) grayscale or (H, W, 3) RGB as a
    single-IFD little-endian TIFF: strip layout (``rows_per_strip``)
    or tiled (``tile=(tw, tl)``, multiples of 16 per TIFF 6.0 §15,
    edge-padded to tile boundaries), chunky or ``planar=True``
    separate planes (see the module docstring)."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        bits = 8
    elif img.dtype == np.uint16:
        bits = 16
    else:
        raise ValueError("encode_tiff wants uint8 or uint16")
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
    if tile is not None:
        tw, tl = tile
        if tw % 16 or tl % 16 or tw <= 0 or tl <= 0:
            raise ValueError("TIFF tile dimensions must be multiples of 16")
    comp_code = {"none": COMP_NONE, "packbits": COMP_PACKBITS, "lzw": COMP_LZW}[
        compression
    ]
    mask = (1 << bits) - 1
    sample_dt = np.dtype("<u2") if bits == 16 else np.dtype("u1")

    def prep(chunk_arr):
        """Predictor-diff per chunk row, serialize little-endian,
        compress."""
        if predictor == 2:
            d = chunk_arr.astype(np.int32)
            d[:, 1:, :] -= d[:, :-1, :]
            chunk_arr = (d & mask).astype(sample_dt)
        else:
            chunk_arr = chunk_arr.astype(sample_dt)
        raw = chunk_arr.tobytes()
        if compression == "packbits":
            return packbits_encode(raw)
        if compression == "lzw":
            return lzw_encode(raw)
        return raw

    planes = [arr[:, :, p : p + 1] for p in range(spp)] if planar else [arr]
    chunks = []
    if tile is not None:
        ta, td = -(-w // tw), -(-h // tl)
        ph, pw_ = td * tl, ta * tw
        for pl in planes:
            # edge-pad to tile boundaries (padding content is
            # reader-ignored; edge values compress well)
            padded = np.pad(pl, [(0, ph - h), (0, pw_ - w), (0, 0)],
                            mode="edge")
            for ty in range(td):
                for tx in range(ta):
                    chunks.append(
                        prep(padded[ty * tl : (ty + 1) * tl,
                                    tx * tw : (tx + 1) * tw])
                    )
    else:
        for pl in planes:
            for r0 in range(0, h, rows_per_strip):
                chunks.append(prep(pl[r0 : r0 + rows_per_strip]))

    # IFD assembly: header(8) + IFD + spilled arrays + chunk data
    nchunks = len(chunks)
    tag_list = [256, 257, 258, 259, 262, 277, 284, 317]
    tag_list += [322, 323, 324, 325] if tile is not None else [273, 278, 279]
    nent = len(tag_list)
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

    bps_t, bps_c, bps_v = arr_short([bits] * spp)
    counts_t, counts_c, counts_v = arr_long([len(s) for s in chunks])
    # reserve the chunk-offset array slot (needs the final data position)
    if nchunks == 1:
        co_reserved = None
        co_slot = struct.pack("<I", 0)
    else:
        co_reserved = len(extra)
        extra += b"\x00" * (4 * nchunks)
        co_slot = struct.pack("<I", arrays_off + co_reserved)
    data_off = arrays_off + len(extra)
    offs = []
    p = data_off
    for s in chunks:
        offs.append(p)
        p += len(s)
    if nchunks == 1:
        co_slot = struct.pack("<I", offs[0])
    else:
        extra[co_reserved : co_reserved + 4 * nchunks] = struct.pack(
            f"<{nchunks}I", *offs
        )

    entries = []  # (tag, type, count, 4-byte slot)

    def short(tag, v):
        entries.append((tag, 3, 1, struct.pack("<HH", v, 0)))

    def long_(tag, v):
        entries.append((tag, 4, 1, struct.pack("<I", v)))

    long_(256, w)
    long_(257, h)
    entries.append((258, bps_t, bps_c, bps_v))
    short(259, comp_code)
    short(262, 1 if spp == 1 else 2)  # BlackIsZero / RGB
    short(277, spp)
    short(284, 2 if planar else 1)
    short(317, predictor)
    if tile is not None:
        long_(322, tw)
        long_(323, tl)
        entries.append((324, 4, nchunks, co_slot))
        entries.append((325, counts_t, counts_c, counts_v))
    else:
        entries.append((273, 4, nchunks, co_slot))
        long_(278, rows_per_strip)
        entries.append((279, counts_t, counts_c, counts_v))
    entries.sort(key=lambda e: e[0])
    assert [t for t, *_ in entries] == sorted(tag_list)

    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", nent)
    for tag, etype, count, val in entries:
        out += struct.pack("<HHI", tag, etype, count) + val
    out += struct.pack("<I", 0)  # no next IFD
    out += extra
    for s in chunks:
        out += s
    return bytes(out)
