"""Pure-Python AVI (RIFF) container codec for MJPEG video — stdlib only.

Completes the multimodal REAL-decode story: with ``sinks/jpeglite.py``
(ITU-T T.81 baseline JPEG) supplying the per-frame image codec, an
AVI/MJPEG file is a fully decodable VIDEO format in this container —
no ffmpeg, no fake. The reference pipeline has no video path
(/root/reference holds HDF4 granules only); this exists for the
LLM-training-data side of the engine, where video corpora arrive as
opaque binary columns and need frame sampling at scale
(``operators/multimodal.sample_frames(decoder="avi")``).

Format per the public Microsoft RIFF/AVI specification (Video for
Windows SDK, "AVI RIFF File Reference"):

    RIFF('AVI '
        LIST('hdrl'
            avih(MainAVIHeader)                  56-byte fixed struct
            LIST('strl' strh(AVIStreamHeader) strf(BITMAPINFOHEADER)))
        LIST('movi' 00dc(<jpeg bytes>) ...)
        idx1(AVIINDEXENTRY * n))

All integers little-endian; every chunk is WORD-aligned (a pad byte
follows odd-sized data and is NOT counted in the chunk size).

Honest gates: only the 'MJPG' fccHandler / biCompression is decodable
(the frames are then real JPEG streams for jpeglite); any other codec
raises ``NotImplementedError`` from ``avi_frame_payloads`` while
``parse_avi_meta`` still returns the container metadata. Audio
streams ('auds') are inventoried but their samples are not decoded.
"""

from __future__ import annotations

import struct

import numpy as np

_AVIIF_KEYFRAME = 0x10


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    """One RIFF chunk: fourcc + size + body (+ pad byte if odd)."""
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    jpeg_frames: list[bytes],
    width: int,
    height: int,
    fps_num: int = 25,
    fps_den: int = 1,
) -> bytes:
    """Encode already-JPEG-compressed frames as a structurally complete
    AVI/MJPEG file (avih + strh/strf headers, movi chunks, idx1 index).
    Frame pixel dimensions are caller-asserted — the container stores,
    it does not inspect."""
    if not jpeg_frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    for i, fr in enumerate(jpeg_frames):
        if not fr.startswith(b"\xff\xd8"):
            raise ValueError(f"frame {i} is not a JPEG stream (no SOI)")
    n = len(jpeg_frames)
    max_size = max(len(f) for f in jpeg_frames)
    usec_per_frame = round(1_000_000 * fps_den / fps_num)

    avih = struct.pack(
        "<14I",
        usec_per_frame,          # dwMicroSecPerFrame
        max_size * fps_num,      # dwMaxBytesPerSec (upper bound)
        0,                       # dwPaddingGranularity
        0x10,                    # dwFlags: AVIF_HASINDEX
        n,                       # dwTotalFrames
        0,                       # dwInitialFrames
        1,                       # dwStreams
        max_size,                # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,              # dwReserved[4]
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII",
            0, 0, 0,             # dwFlags, wPriority, wLanguage
            0,                   # dwInitialFrames
            fps_den,             # dwScale
            fps_num,             # dwRate  (fps = rate/scale)
            0,                   # dwStart
            n,                   # dwLength (in frames)
            max_size,            # dwSuggestedBufferSize
            0xFFFFFFFF,          # dwQuality (default)
            0,                   # dwSampleSize (0: varying)
        )
        + struct.pack("<4H", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,                      # biSize
        width, height,
        1, 24,                   # biPlanes, biBitCount
        b"MJPG",                 # biCompression
        width * height * 3,      # biSizeImage (uncompressed bound)
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b""
    index = []
    for fr in jpeg_frames:
        # idx1 offsets are measured from the 'movi' fourcc (the
        # convention Video-for-Windows writes); +4 skips the list type
        index.append((4 + len(movi_body), len(fr)))
        movi_body += _chunk(b"00dc", fr)
    movi = _list(b"movi", movi_body)

    idx1 = b"".join(
        b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, off, size)
        for off, size in index
    )
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _iter_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_size) walking WORD-aligned RIFF
    chunks in data[start:end)."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"truncated chunk header at byte {pos}")
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"chunk {fourcc!r} at {pos} overruns its parent "
                f"({body + size} > {end})"
            )
        yield fourcc, body, size
        pos = body + size + (size & 1)


def parse_avi_meta(data: bytes) -> dict:
    """Parse container metadata from an AVI file: dimensions, fps,
    frame count, stream inventory, codec fourcc, index presence.
    Raises ValueError on structural malformation (wrong magic, header
    sizes, chunk overruns, missing required headers)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if 8 + riff_size > len(data):
        raise ValueError("RIFF size overruns the payload")
    end = 8 + riff_size

    meta: dict = {
        "streams": [],
        "has_index": False,
        "n_movi_chunks": 0,
        "_movi": None,
    }
    for fourcc, body, size in _iter_chunks(data, 12, end):
        if fourcc != b"LIST" and fourcc != b"idx1":
            continue
        if fourcc == b"idx1":
            meta["has_index"] = True
            meta["_idx1"] = (body, size)
            continue
        ltype = data[body : body + 4]
        if ltype == b"hdrl":
            _parse_hdrl(data, body + 4, body + size, meta)
        elif ltype == b"movi":
            meta["_movi"] = (body, size)
            meta["n_movi_chunks"] = sum(
                1
                for cc, _, _ in _iter_chunks(data, body + 4, body + size)
                if cc[2:4] in (b"dc", b"db", b"wb")
            )
    if "width" not in meta:
        raise ValueError("AVI has no avih main header")
    if meta["_movi"] is None:
        raise ValueError("AVI has no movi list")
    return meta


def _parse_hdrl(data: bytes, start: int, end: int, meta: dict) -> None:
    for fourcc, body, size in _iter_chunks(data, start, end):
        if fourcc == b"avih":
            if size < 56:
                raise ValueError(f"avih is {size} bytes, expected >= 56")
            v = struct.unpack_from("<14I", data, body)
            meta.update(
                usec_per_frame=v[0],
                total_frames=v[4],
                n_streams=v[6],
                width=v[8],
                height=v[9],
            )
        elif fourcc == b"LIST" and data[body : body + 4] == b"strl":
            stream: dict = {}
            for cc, b2, s2 in _iter_chunks(data, body + 4, body + size):
                if cc == b"strh":
                    if s2 < 48:
                        raise ValueError(f"strh is {s2} bytes, expected >= 48")
                    stream["fcc_type"] = data[b2 : b2 + 4].decode("latin-1")
                    stream["handler"] = data[b2 + 4 : b2 + 8].decode("latin-1")
                    scale, rate = struct.unpack_from("<II", data, b2 + 20)
                    stream["scale"], stream["rate"] = scale, rate
                    stream["fps"] = (rate / scale) if scale else 0.0
                    (stream["n_samples"],) = struct.unpack_from(
                        "<I", data, b2 + 32
                    )
                elif cc == b"strf" and stream.get("fcc_type") == "vids":
                    if s2 < 40:
                        raise ValueError(f"video strf is {s2} bytes, expected >= 40")
                    stream["compression"] = data[b2 + 16 : b2 + 20].decode(
                        "latin-1"
                    )
            meta["streams"].append(stream)


def avi_frame_payloads(data: bytes) -> tuple[dict, list[bytes]]:
    """Return (metadata, per-frame compressed payloads) for the FIRST
    video stream. Only MJPG is decodable downstream — any other video
    codec raises NotImplementedError here (honest gate; the metadata
    path ``parse_avi_meta`` still works for inventory)."""
    meta = parse_avi_meta(data)
    vids = [s for s in meta["streams"] if s.get("fcc_type") == "vids"]
    if not vids:
        raise ValueError("AVI has no video stream")
    comp = vids[0].get("compression", vids[0].get("handler", ""))
    if comp not in ("MJPG", "mjpg"):
        raise NotImplementedError(
            f"AVI video codec {comp!r} is not decodable in this build; "
            "only MJPG (frames are baseline JPEG for sinks/jpeglite) is"
        )
    body, size = meta["_movi"]
    frames = [
        data[b2 : b2 + s2]
        for cc, b2, s2 in _iter_chunks(data, body + 4, body + size)
        if cc[2:4] in (b"dc", b"db") and cc[:2] == b"00"
    ]
    # cross-check the idx1 index against what the movi walk found
    if meta["has_index"]:
        b1, s1 = meta["_idx1"]
        if s1 % 16:
            raise ValueError(f"idx1 size {s1} is not a multiple of 16")
        n_idx = sum(
            1
            for off in range(b1, b1 + s1, 16)
            if data[off : off + 2] == b"00"
            and data[off + 2 : off + 4] in (b"dc", b"db")
        )
        if n_idx != len(frames):
            raise ValueError(
                f"idx1 lists {n_idx} frames but movi holds {len(frames)}"
            )
    return meta, frames


def decode_avi_frames(data: bytes) -> tuple[dict, list[np.ndarray], float]:
    """Full REAL video decode: parse the container, JPEG-decode every
    frame via ``sinks/jpeglite.py``. Returns (meta, frames, fps)."""
    from modis_aggregation_spark.sinks.jpeglite import decode_jpeg

    meta, payloads = avi_frame_payloads(data)
    vids = next(s for s in meta["streams"] if s.get("fcc_type") == "vids")
    return meta, [decode_jpeg(p) for p in payloads], vids["fps"]


def write_avi_mjpeg(
    path: str, frames: list[np.ndarray], fps: int = 25, quality: int = 75
) -> str:
    """Convenience sink: JPEG-encode raw frames (H×W gray or H×W×3 RGB)
    and write a complete AVI/MJPEG file."""
    from modis_aggregation_spark.sinks.jpeglite import encode_jpeg

    if not frames:
        raise ValueError("write_avi_mjpeg needs at least one frame")
    h, w = frames[0].shape[:2]
    for i, fr in enumerate(frames):
        if fr.shape[:2] != (h, w):
            raise ValueError(
                f"frame {i} is {fr.shape[:2]}, expected {(h, w)}: AVI "
                "streams are fixed-dimension"
            )
    payloads = [encode_jpeg(f, quality=quality) for f in frames]
    data = encode_avi_mjpeg(payloads, width=w, height=h, fps_num=fps)
    with open(path, "wb") as fh:
        fh.write(data)
    return path
