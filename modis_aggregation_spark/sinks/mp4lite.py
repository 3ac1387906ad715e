"""Minimal pure-Python ISO BMFF (MP4) metadata reader/writer.

Real container parsing for the video columns of a multimodal corpus:
``parse_mp4_meta`` walks the actual box structure of the public ISO/IEC
14496-12 specification — size/type headers (including 64-bit
``largesize`` and to-end-of-file sizes), ``ftyp`` brands, ``mvhd``
(version 0 and 1) movie timescale/duration, per-``trak`` ``tkhd``
dimensions (16.16 fixed point) and ``hdlr`` handler types — and
``write_mp4_stub`` emits a structurally valid file (ftyp + moov(mvhd +
trak(tkhd + mdia(mdhd + hdlr))) + empty mdat).

HONEST SCOPE: this is container METADATA, not video decode.  Sample
decoding (avc1/hevc codecs) needs real codec libraries that are not in
this environment — ``operators/multimodal.py`` keeps that behind its
NotImplementedError gate.  What IS real here: the byte-level box walk,
so corpus jobs can extract duration/dimensions/track inventory from
actual MP4 bytes without any media library.  Validated by writer→reader
round-trip plus field-level goldens computed without the parser (the
x61/x62 pattern); no independent MP4 parser exists in this sandbox to
cross-read (same situation as hdf4lite, documented per repo rule 5).
"""

from __future__ import annotations

import struct

__all__ = ["parse_mp4_meta", "encode_mp4_stub", "write_mp4_stub"]

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta"}


def _walk(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos < end:
        if end - pos < 8:
            raise ValueError(f"truncated box header at offset {pos}")
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if end - pos < 16:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos  # extends to end of enclosing scope
        if size < body - pos or pos + size > end:
            raise ValueError(
                f"box {btype!r} at {pos}: size {size} escapes its container"
            )
        yield btype, body, pos + size
        pos += size


def _fixed_16_16(v: int) -> float:
    return v / 65536.0


def parse_mp4_meta(data: bytes) -> dict:
    """Parse ISO BMFF bytes → metadata dict:

    ``{"major_brand", "timescale", "duration", "duration_sec",
    "n_tracks", "track_types" (sorted 4cc list), "width", "height"}``

    width/height come from the first track with non-zero tkhd
    dimensions (the video track by convention); 0.0 when absent.
    """
    if len(data) < 8:
        raise ValueError("not an MP4: shorter than one box header")
    top = list(_walk(data, 0, len(data)))
    types = [t for t, _, _ in top]
    if b"ftyp" not in types:
        raise ValueError("not an MP4: no ftyp box")
    out: dict = {
        "major_brand": "", "timescale": 0, "duration": 0,
        "duration_sec": 0.0, "n_tracks": 0, "track_types": [],
        "width": 0.0, "height": 0.0,
    }
    for btype, body, bend in top:
        if btype == b"ftyp":
            out["major_brand"] = data[body : body + 4].decode("latin-1")
        elif btype == b"moov":
            _parse_moov(data, body, bend, out)
    out["track_types"] = sorted(out["track_types"])
    if out["timescale"]:
        out["duration_sec"] = out["duration"] / out["timescale"]
    return out


def _parse_moov(data: bytes, start: int, end: int, out: dict) -> None:
    for btype, body, bend in _walk(data, start, end):
        if btype == b"mvhd":
            ver = data[body]
            if ver == 1:
                ts, dur = struct.unpack_from(">IQ", data, body + 4 + 16)
            else:
                ts, dur = struct.unpack_from(">II", data, body + 4 + 8)
            out["timescale"], out["duration"] = ts, dur
        elif btype == b"trak":
            out["n_tracks"] += 1
            _parse_trak(data, body, bend, out)


def _parse_trak(data: bytes, start: int, end: int, out: dict) -> None:
    for btype, body, bend in _walk(data, start, end):
        if btype == b"tkhd":
            ver = data[body]
            # v0: ver/flags(4) ctime(4) mtime(4) id(4) rsvd(4) dur(4)
            # v1: 64-bit ctime/mtime/duration
            off = body + (4 + 8 + 4 + 4 + 8 if ver == 1 else 4 + 8 + 4 + 4 + 4)
            off += 8 + 2 + 2 + 2 + 2 + 36  # rsvd, layer, altgrp, vol, rsvd, matrix
            w, h = struct.unpack_from(">II", data, off)
            if w and h and not (out["width"] or out["height"]):
                out["width"] = _fixed_16_16(w)
                out["height"] = _fixed_16_16(h)
        elif btype == b"mdia":
            for mtype, mbody, mend in _walk(data, body, bend):
                if mtype == b"hdlr":
                    out["track_types"].append(
                        data[mbody + 8 : mbody + 12].decode("latin-1")
                    )


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, ver: int, body: bytes) -> bytes:
    return _box(btype, struct.pack(">B", ver) + b"\x00\x00\x00" + body)


def encode_mp4_stub(
    width: int,
    height: int,
    duration: int,
    timescale: int = 1000,
    handler: bytes = b"vide",
    major_brand: bytes = b"isom",
) -> bytes:
    """Structurally valid metadata-only MP4: real box layout, empty mdat
    (no coded samples — see module docstring for the honest scope)."""
    ftyp = _box(b"ftyp", major_brand + struct.pack(">I", 0) + b"isomiso2")
    mvhd = _full(
        b"mvhd", 0,
        struct.pack(">II", 0, 0)                  # ctime, mtime
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)           # rate 1.0
        + struct.pack(">H", 0x0100)               # volume 1.0
        + b"\x00" * 10                            # reserved
        + _IDENTITY_MATRIX
        + b"\x00" * 24                            # pre_defined
        + struct.pack(">I", 2),                   # next_track_id
    )
    tkhd = _full(
        b"tkhd", 0,
        struct.pack(">III", 0, 0, 1)              # ctime, mtime, track_id
        + struct.pack(">I", 0)                    # reserved
        + struct.pack(">I", duration)
        + b"\x00" * 8                             # reserved
        + struct.pack(">HHHH", 0, 0, 0, 0)        # layer, altgrp, vol, rsvd
        + _IDENTITY_MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),          # language 'und', quality
    )
    hdlr = _full(
        b"hdlr", 0,
        struct.pack(">I", 0) + handler + b"\x00" * 12 + b"\x00",
    )
    mdia = _box(b"mdia", mdhd + hdlr)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    mdat = _box(b"mdat", b"")
    return ftyp + moov + mdat


_IDENTITY_MATRIX = struct.pack(
    ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def write_mp4_stub(path: str, **kw) -> None:
    with open(path, "wb") as fh:
        fh.write(encode_mp4_stub(**kw))
