"""Minimal pure-Python HDF5 (classic format) reader + writer.

Why this exists: the container has no h5py/netCDF4, but the engine's
legacy sink (SURVEY S12/S14; reference
``MODIS_Aggregation/aggregate_functions.py:413-453,724-757``) must produce
a REAL MYD08-style HDF5 file, not a NotImplementedError. This module
implements the subset of the HDF5 File Format Specification (version
1.8, "classic" layout) that h5py emits for flat files of simple
datasets:

* superblock version 0;
* version-1 object headers (with continuation blocks on read);
* old-style groups: v1 B-tree + local heap + SNOD symbol nodes;
* dataspace (simple/scalar), datatype (fixed/float/string/vlen-string),
  fill-value, contiguous AND chunked layouts, filter pipeline
  (gzip/shuffle/fletcher32 — zlib is stdlib — and, round 11, szip
  filter id 4: uint32 size word + CCSDS-121 stream via
  ``sinks/sziplite.py``), attributes (v1-v3,
  numeric / fixed string / vlen string via global heaps).

The READER is validated against two independently produced ground-truth
files shipped by the reference repo (read-only): ``output_final.hdf5``
(h5py) and ``MYD08_D3.A2008001CloudFraction.nc`` (netCDF4, which is
HDF5 inside). The WRITER emits the same classic structures (superblock
v0, v1 headers, symbol-table group, contiguous data, fixed-string
attributes) and is round-trip-verified through the validated reader.

No code is derived from h5py or the reference — written from the public
format spec (https://docs.hdfgroup.org/hdf5/develop/_f_m_t3.html).
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF


def _szip_filter_decode(data: bytes, cdv: tuple[int, ...]) -> bytes:
    """HDF5 szip filter (id 4) chunk decode: libhdf5's H5Z__filter_szip
    prepends the chunk's UNCOMPRESSED byte count as a little-endian
    uint32, then the raw szip (CCSDS 121.0 extended-Rice) codestream;
    the stored cd_values are [options_mask, pixels_per_block,
    bits_per_pixel, pixels_per_scanline] (H5Z_SZIP_PARM_* order).
    The codestream itself decodes through ``sinks/sziplite.py`` —
    bit conventions pinned by that module's hand-derived vectors."""
    from modis_aggregation_spark.sinks.sziplite import szip_decode

    if len(cdv) < 4:
        raise ValueError(
            f"HDF5 szip filter carries {len(cdv)} cd_values, need 4 "
            "(options_mask, pixels_per_block, bits_per_pixel, "
            "pixels_per_scanline)"
        )
    if len(data) < 4:
        raise ValueError("HDF5 szip chunk shorter than its 4-byte size word")
    (raw_len,) = struct.unpack_from("<I", data, 0)
    mask, ppb, bpp, pps = cdv[0], cdv[1], cdv[2], cdv[3]
    return szip_decode(data[4:], raw_len, bpp, ppb, pps, mask)


def _fletcher32(data: bytes) -> int:
    """HDF5's fletcher32 (public H5checksum algorithm): the stream is
    summed as big-endian 16-bit words (odd trailing byte high-aligned),
    two mod-65535 accumulators, result (sum2 << 16) | sum1."""
    sum1 = sum2 = 0
    n = len(data) // 2
    i = 0
    while n:
        block = min(n, 360)
        for _ in range(block):
            sum1 += (data[i] << 8) | data[i + 1]
            sum2 += sum1
            i += 2
        sum1 %= 65535
        sum2 %= 65535
        n -= block
    if len(data) % 2:
        sum1 = (sum1 + (data[-1] << 8)) % 65535
        sum2 = (sum2 + sum1) % 65535
    return (sum2 << 16) | sum1


# ==========================================================================
# reader
# ==========================================================================

@dataclass
class _Dtype:
    kind: str          # 'int' | 'uint' | 'float' | 'string' | 'vlen_str'
    size: int          # element size in bytes (string: fixed length)
    raw: bytes = b""   # the raw datatype message (for attribute decode)

    @property
    def np(self) -> np.dtype:
        if self.kind == "float":
            return np.dtype(f"<f{self.size}")
        if self.kind == "int":
            return np.dtype(f"<i{self.size}")
        if self.kind == "uint":
            return np.dtype(f"<u{self.size}")
        if self.kind == "string":
            return np.dtype(f"S{self.size}")
        raise ValueError(f"no numpy dtype for {self.kind}")


@dataclass
class Dataset:
    name: str
    shape: tuple[int, ...]
    dtype: _Dtype
    attrs: dict = field(default_factory=dict)
    data: np.ndarray | None = None


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        if buf[:8] != b"\x89HDF\r\n\x1a\n":
            raise ValueError("not an HDF5 file")
        sb_ver = buf[8]
        if sb_ver != 0:
            raise NotImplementedError(f"superblock version {sb_ver} (classic=0 only)")
        if buf[13] != 8 or buf[14] != 8:
            raise NotImplementedError("only 8-byte offsets/lengths supported")
        # superblock v0: 24 bytes of fixed fields, then 4 addresses, then
        # the root group's symbol table entry
        self.base = struct.unpack_from("<Q", buf, 24)[0]
        self.root_ste = 24 + 8 * 4  # link_name_off(8) obj_hdr_addr(8) ...
        self.datasets: dict[str, Dataset] = {}

    # -- low-level -----------------------------------------------------
    def u(self, fmt: str, off: int):
        return struct.unpack_from("<" + fmt, self.buf, off)

    # -- object headers ------------------------------------------------
    def read_object_header(self, addr: int) -> list[tuple[int, bytes]]:
        """Return [(msg_type, body)] for a version 1 OR version 2 object
        header, following continuation messages."""
        if self.buf[addr : addr + 4] == b"OHDR":
            return self._read_object_header_v2(addr)
        ver, _, nmsg, _refs, hsize = self.u("BBHII", addr)
        if ver != 1:
            raise NotImplementedError(f"object header version {ver}")
        msgs: list[tuple[int, bytes]] = []
        blocks = [(addr + 16, hsize)]  # 12 fixed + 4 pad to 8-align
        while blocks and len(msgs) < nmsg:
            boff, bsize = blocks.pop(0)
            pos, end = boff, boff + bsize
            while pos + 8 <= end and len(msgs) < nmsg:
                mtype, msize, _flags = self.u("HHB", pos)
                body = self.buf[pos + 8 : pos + 8 + msize]
                pos += 8 + msize
                if mtype == 0x0010:  # continuation
                    caddr, clen = struct.unpack_from("<QQ", body, 0)
                    blocks.append((caddr, clen))
                else:
                    msgs.append((mtype, body))
        return msgs

    def _read_object_header_v2(self, addr: int) -> list[tuple[int, bytes]]:
        flags = self.buf[addr + 5]
        pos = addr + 6
        if flags & 0x20:  # access/mod/change/birth times
            pos += 16
        if flags & 0x10:  # max compact / min dense attrs
            pos += 4
        size_bytes = 1 << (flags & 0x03)
        chunk0 = int.from_bytes(self.buf[pos : pos + size_bytes], "little")
        pos += size_bytes
        track_corder = bool(flags & 0x04)
        msgs: list[tuple[int, bytes]] = []
        # v2 continuation blocks start with "OCHK" and end with a checksum
        blocks = [(pos, chunk0)]
        while blocks:
            boff, bsize = blocks.pop(0)
            p, end = boff, boff + bsize - 4  # trailing checksum
            while p + 4 <= end:
                mtype = self.buf[p]
                msize = struct.unpack_from("<H", self.buf, p + 1)[0]
                p += 4
                if track_corder:
                    p += 2
                body = self.buf[p : p + msize]
                p += msize
                if mtype == 0x10:
                    caddr, clen = struct.unpack_from("<QQ", body, 0)
                    blocks.append((caddr + 4, clen - 4))  # skip "OCHK" sig
                elif mtype == 0:  # NIL / gap
                    continue
                else:
                    msgs.append((mtype, body))
        return msgs

    @staticmethod
    def _decode_link(body: bytes) -> tuple[str, int] | None:
        """Hard link message (0x06) → (name, object header address)."""
        ver, flags = body[0], body[1]
        if ver != 1:
            raise NotImplementedError(f"link message version {ver}")
        pos = 2
        ltype = 0
        if flags & 0x08:
            ltype = body[pos]
            pos += 1
        if flags & 0x04:
            pos += 8  # creation order
        if flags & 0x10:
            pos += 1  # charset
        nbytes = 1 << (flags & 0x03)
        nlen = int.from_bytes(body[pos : pos + nbytes], "little")
        pos += nbytes
        name = body[pos : pos + nlen].decode()
        pos += nlen
        if ltype != 0:
            return None  # soft/external links not followed
        return name, struct.unpack_from("<Q", body, pos)[0]

    # -- message decoders ----------------------------------------------
    @staticmethod
    def _decode_dataspace(body: bytes) -> tuple[int, ...]:
        ver = body[0]
        if ver == 1:
            ndims, flags = body[1], body[2]
            off = 8
        elif ver == 2:
            ndims, flags = body[1], body[2]
            off = 4
        else:
            raise NotImplementedError(f"dataspace version {ver}")
        return tuple(
            struct.unpack_from("<Q", body, off + 8 * i)[0] for i in range(ndims)
        )

    @staticmethod
    def _decode_datatype(body: bytes) -> _Dtype:
        cls = body[0] & 0x0F
        size = struct.unpack_from("<I", body, 4)[0]
        bits0 = body[1]
        if cls == 0:  # fixed-point
            signed = bool(bits0 & 0x08)
            return _Dtype("int" if signed else "uint", size, body)
        if cls == 1:  # floating-point
            return _Dtype("float", size, body)
        if cls == 3:  # fixed string
            return _Dtype("string", size, body)
        if cls == 9:  # variable-length
            is_str = (bits0 & 0x0F) == 1
            if is_str:
                return _Dtype("vlen_str", size, body)
            raise NotImplementedError("vlen non-string datatype")
        raise NotImplementedError(f"datatype class {cls}")

    def _decode_attribute(self, body: bytes) -> tuple[str, object]:
        ver = body[0]
        if ver == 1:
            name_size, dt_size, ds_size = struct.unpack_from("<HHH", body, 2)
            off = 8
            pad = lambda n: (n + 7) & ~7  # noqa: E731
        elif ver in (2, 3):
            name_size, dt_size, ds_size = struct.unpack_from("<HHH", body, 2)
            off = 8 + (1 if ver == 3 else 0)
            pad = lambda n: n  # noqa: E731
        else:
            raise NotImplementedError(f"attribute version {ver}")
        name = body[off : off + name_size].split(b"\x00")[0].decode()
        off += pad(name_size)
        dt = self._decode_datatype(body[off : off + dt_size])
        off += pad(dt_size)
        shape = self._decode_dataspace(body[off : off + ds_size]) if ds_size else ()
        off += pad(ds_size)
        data = body[off:]
        n = int(np.prod(shape)) if shape else 1
        if dt.kind == "vlen_str":
            vals = []
            for i in range(n):
                _len, gaddr, gidx = struct.unpack_from("<IQI", data, i * 16)
                vals.append(self._global_heap_object(gaddr, gidx).decode())
            value = vals[0] if not shape else vals
        elif dt.kind == "string":
            vals = [
                data[i * dt.size : (i + 1) * dt.size].split(b"\x00")[0].decode()
                for i in range(n)
            ]
            value = vals[0] if not shape else vals
        else:
            arr = np.frombuffer(data, dtype=dt.np, count=n)
            value = arr.reshape(shape) if shape else arr[0].item()
        return name, value

    def _global_heap_object(self, addr: int, idx: int) -> bytes:
        if self.buf[addr : addr + 4] != b"GCOL":
            raise ValueError("bad global heap signature")
        size = struct.unpack_from("<Q", self.buf, addr + 8)[0]
        pos, end = addr + 16, addr + size
        while pos + 16 <= end:
            oidx, _refc = struct.unpack_from("<HH", self.buf, pos)
            osize = struct.unpack_from("<Q", self.buf, pos + 8)[0]
            if oidx == 0:
                break
            if oidx == idx:
                return self.buf[pos + 16 : pos + 16 + osize]
            pos += 16 + ((osize + 7) & ~7)
        raise KeyError(f"global heap object {idx} at {addr}")

    # -- groups ----------------------------------------------------------
    def _local_heap_name(self, heap_addr: int, name_off: int) -> str:
        assert self.buf[heap_addr : heap_addr + 4] == b"HEAP"
        data_addr = struct.unpack_from("<Q", self.buf, heap_addr + 24)[0]
        start = data_addr + name_off
        end = self.buf.index(b"\x00", start)
        return self.buf[start:end].decode()

    def _iter_group(self, btree_addr: int, heap_addr: int):
        """Yield (name, obj_header_addr) from a v1 group B-tree."""
        stack = [btree_addr]
        while stack:
            addr = stack.pop()
            sig = self.buf[addr : addr + 4]
            if sig == b"TREE":
                _ntype, level, nent = self.u("BBH", addr + 4)
                pos = addr + 8 + 16  # skip left/right sibling
                pos += 8  # key 0
                for _ in range(nent):
                    child = struct.unpack_from("<Q", self.buf, pos)[0]
                    stack.append(child)
                    pos += 8 + 8  # child + next key
            elif sig == b"SNOD":
                nsyms = struct.unpack_from("<H", self.buf, addr + 6)[0]
                pos = addr + 8
                for _ in range(nsyms):
                    name_off, ohdr = struct.unpack_from("<QQ", self.buf, pos)
                    yield self._local_heap_name(heap_addr, name_off), ohdr
                    pos += 40  # STE size: 8+8+4+4+16
            else:
                raise ValueError(f"unexpected node {sig!r} at {addr}")

    # -- data ------------------------------------------------------------
    def _read_layout(self, body: bytes, shape, dtype: _Dtype, filters):
        ver = body[0]
        if ver != 3:
            raise NotImplementedError(f"layout version {ver}")
        cls = body[1]
        n = int(np.prod(shape)) if shape else 1
        if cls == 1:  # contiguous
            addr, size = struct.unpack_from("<QQ", body, 2)
            if addr == UNDEF:
                return np.full(shape, 0, dtype=dtype.np)
            raw = self.buf[addr : addr + size]
            return np.frombuffer(raw, dtype=dtype.np, count=n).reshape(shape)
        if cls == 2:  # chunked
            ndims = body[2]  # includes the element-size dimension
            btree = struct.unpack_from("<Q", body, 3)[0]
            cdims = struct.unpack_from(
                "<" + "I" * ndims, body, 11
            )  # last = element size
            chunk_shape = cdims[:-1]
            out = np.zeros(shape, dtype=dtype.np)
            if btree != UNDEF:
                for coffsets, data in self._iter_chunks(btree, ndims):
                    arr = np.frombuffer(data, dtype=dtype.np)
                    arr = arr[: int(np.prod(chunk_shape))].reshape(chunk_shape)
                    sel = tuple(
                        slice(o, min(o + c, s))
                        for o, c, s in zip(coffsets, chunk_shape, shape)
                    )
                    sub = tuple(slice(0, s.stop - s.start) for s in sel)
                    out[sel] = arr[sub]
            return out
        if cls == 0:  # compact
            size = struct.unpack_from("<H", body, 2)[0]
            raw = body[4 : 4 + size]
            return np.frombuffer(raw, dtype=dtype.np, count=n).reshape(shape)
        raise NotImplementedError(f"layout class {cls}")

    def _iter_chunks(self, btree_addr: int, ndims: int):
        """Yield (chunk_offsets, decoded_bytes) from a v1 chunk B-tree."""
        key_size = 8 + 8 * ndims  # size(4)+mask(4)+offsets
        stack = [btree_addr]
        while stack:
            addr = stack.pop()
            assert self.buf[addr : addr + 4] == b"TREE"
            _ntype, level, nent = self.u("BBH", addr + 4)
            pos = addr + 8 + 16
            for _ in range(nent):
                csize, fmask = struct.unpack_from("<II", self.buf, pos)
                offs = struct.unpack_from("<" + "Q" * ndims, self.buf, pos + 8)
                child = struct.unpack_from("<Q", self.buf, pos + key_size)[0]
                if level > 0:
                    stack.append(child)
                else:
                    data = self.buf[child : child + csize]
                    yield offs[:-1], self._apply_filters(data, fmask)
                pos += key_size + 8
            # trailing key ignored

    def _apply_filters(self, data: bytes, mask: int) -> bytes:
        # pipeline order is the WRITE order — invert in reverse; mask bit
        # j set means filter j was skipped for this chunk
        for j in range(len(self.filters) - 1, -1, -1):
            fid, cdv = self.filters[j]
            if mask & (1 << j):
                continue
            if fid == 1:
                data = zlib.decompress(data)
            elif fid == 3:
                payload, stored = data[:-4], struct.unpack("<I", data[-4:])[0]
                if _fletcher32(payload) != stored:
                    raise ValueError("fletcher32 checksum mismatch in chunk")
                data = payload
            elif fid == 2:  # shuffle: bytes grouped by byte position
                elem = cdv[0] if cdv else 0
                arr = np.frombuffer(data, dtype=np.uint8)
                n = len(arr) // elem
                data = arr[: n * elem].reshape(elem, n).T.tobytes()
            elif fid == 4:  # szip (round 11): sinks/sziplite CCSDS-121
                data = _szip_filter_decode(data, cdv)
            else:
                raise NotImplementedError(f"filter id {fid}")
        return data

    # -- top level -------------------------------------------------------
    def read(self) -> dict[str, Dataset]:
        # root STE: cache may hold the btree/heap addrs, but the object
        # header always has the group membership messages — use those
        ohdr_addr = struct.unpack_from("<Q", self.buf, self.root_ste + 8)[0]
        self._ingest_group(self.read_object_header(ohdr_addr), "")
        return self.datasets

    def _ingest_group(self, msgs, prefix: str) -> None:
        """Register children from a group's messages — old-style (symbol
        table, 0x11) or new-style compact (hard link messages, 0x06).
        Dense link storage (Link Info with a defined fractal heap) is
        refused LOUDLY rather than silently returning no children."""
        for t, b in msgs:
            if t == 0x0002:  # Link Info: check for dense storage
                flags = b[1]
                off = 2 + (8 if flags & 0x01 else 0)
                heap_addr = struct.unpack_from("<Q", b, off)[0]
                if heap_addr != UNDEF and not any(
                    mt in (0x0006, 0x0011) for mt, _ in msgs
                ):
                    raise NotImplementedError(
                        "dense (fractal-heap) group links not supported"
                    )
        for t, b in msgs:
            if t == 0x0011:
                btree, heap = struct.unpack_from("<QQ", b, 0)
                for name, addr in self._iter_group(btree, heap):
                    self.datasets[prefix + name] = self._read_dataset(
                        prefix + name, addr
                    )
            elif t == 0x0006:
                link = self._decode_link(b)
                if link:
                    name, addr = link
                    self.datasets[prefix + name] = self._read_dataset(
                        prefix + name, addr
                    )

    def _read_dataset(self, name: str, addr: int) -> Dataset:
        msgs = self.read_object_header(addr)
        shape: tuple[int, ...] = ()
        dtype: _Dtype | None = None
        layout: bytes | None = None
        attrs: dict = {}
        self.filters: list[tuple[int, tuple[int, ...]]] = []
        is_group = any(t in (0x0011, 0x0006, 0x0002) for t, _ in msgs)
        for t, b in msgs:
            if t == 0x0001:
                shape = self._decode_dataspace(b)
            elif t == 0x0003:
                dtype = self._decode_datatype(b)
            elif t == 0x0008:
                layout = b
            elif t == 0x000C:
                try:
                    k, v = self._decode_attribute(b)
                    attrs[k] = v
                except (NotImplementedError, KeyError, ValueError):
                    pass  # reference/compound-typed attrs are skipped
            elif t == 0x000B:
                self._decode_filters(b)
        if is_group and layout is None:
            self._ingest_group(msgs, f"{name}/")
            return Dataset(name, (), _Dtype("string", 0), attrs, None)
        if dtype is None or layout is None:
            return Dataset(name, shape, dtype or _Dtype("string", 0), attrs, None)
        if dtype.kind == "vlen_str":
            return Dataset(name, shape, dtype, attrs, None)  # data skipped
        data = self._read_layout(layout, shape, dtype, self.filters)
        return Dataset(name, shape, dtype, attrs, data)

    def _decode_filters(self, body: bytes) -> None:
        ver, nf = body[0], body[1]
        pos = 8 if ver == 1 else 2
        out = []
        for _ in range(nf):
            fid = struct.unpack_from("<H", body, pos)[0]
            pos += 2
            # v2 OMITS the Name Length field entirely for ids < 256
            if ver == 1 or fid >= 256:
                namelen = struct.unpack_from("<H", body, pos)[0]
                pos += 2
            else:
                namelen = 0
            _flags, ncdv = struct.unpack_from("<HH", body, pos)
            pos += 4
            if namelen:
                pos += (namelen + 7) & ~7 if ver == 1 else namelen
            cdv = struct.unpack_from("<" + "I" * ncdv, body, pos)
            pos += 4 * ncdv
            if ver == 1 and ncdv % 2:
                pos += 4  # padding
            out.append((fid, tuple(cdv)))
        self.filters = out


def read_hdf5(path: str) -> dict[str, Dataset]:
    """Parse an HDF5 classic-format file into {name: Dataset}."""
    with open(path, "rb") as f:
        return _Reader(f.read()).read()


# ==========================================================================
# writer
# ==========================================================================

# datatype message templates captured from the validated ground-truth
# parse of the reference sample files (IEEE little-endian; byte layout per
# spec section IV.A.2.d) — NOT copied code, just the canonical on-disk
# encoding of the standard types
_DT_F8 = bytes.fromhex("11203f000800000000004000340b0034ff030000") + b"\x00" * 4
_DT_F4 = bytes.fromhex("11211f000400000000002000170800177f000000") + b"\x00" * 4
_DT_I8 = bytes.fromhex("10080000080000000000400000000000")
_DT_I4 = bytes.fromhex("10080000040000000000200000000000")


def _dt_message(dt: np.dtype) -> bytes:
    if dt == np.dtype("<f8"):
        return _DT_F8
    if dt == np.dtype("<f4"):
        return _DT_F4
    if dt == np.dtype("<i8"):
        return _DT_I8
    if dt == np.dtype("<i4"):
        return _DT_I4
    if dt.kind == "S":
        # fixed ASCII string, NUL-terminated padding
        body = struct.pack("<BBBB", 0x13, 0x00, 0x00, 0x00)
        body += struct.pack("<I", dt.itemsize)
        return _pad8(body)
    raise NotImplementedError(f"unsupported dtype {dt}")


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _dataspace_message(shape: tuple[int, ...]) -> bytes:
    body = struct.pack("<BBBBI", 1, len(shape), 0, 0, 0)
    for s in shape:
        body += struct.pack("<Q", s)
    return _pad8(body)


def _attr_value(value) -> np.ndarray:
    if isinstance(value, str):
        raw = value.encode() + b"\x00"
        return np.array(raw, dtype=f"S{len(raw)}")
    if isinstance(value, bool):
        return np.array(int(value), dtype="<i8")
    if isinstance(value, (int, np.integer)):
        return np.array(int(value), dtype="<i8")
    if isinstance(value, (float, np.floating)):
        return np.array(float(value), dtype="<f8")
    arr = np.asarray(value)
    if arr.dtype.kind == "f":
        return arr.astype("<f8") if arr.dtype.itemsize > 4 else arr.astype("<f4")
    if arr.dtype.kind in "iu":
        return arr.astype("<i8") if arr.dtype.itemsize > 4 else arr.astype("<i4")
    raise NotImplementedError(f"unsupported attribute {type(value)}")


def _attr_message(name: str, value) -> bytes:
    arr = _attr_value(value)
    dt = _dt_message(arr.dtype)
    ds = _dataspace_message(() if arr.shape == () else arr.shape)
    nameb = name.encode() + b"\x00"
    body = struct.pack("<BBHHH", 1, 0, len(nameb), len(dt), len(ds))
    body += _pad8(nameb) + dt + ds + arr.tobytes()
    return _pad8(body)


def _object_header(messages: list[tuple[int, bytes]]) -> bytes:
    hsize = sum(8 + len(b) for _, b in messages)
    out = struct.pack("<BBHII", 1, 0, len(messages), 1, hsize) + b"\x00" * 4
    for mtype, body in messages:
        assert len(body) % 8 == 0
        out += struct.pack("<HHBBBB", mtype, len(body), 0, 0, 0, 0) + body
    return out


def write_hdf5(path: str, datasets: dict[str, tuple[np.ndarray, dict]]) -> None:
    """Write a flat HDF5 classic file: {name: (array, attrs)} at the root.

    Emits superblock v0, a v1-object-header root group with a symbol
    table (one B-tree node + one SNOD + local heap), and per-dataset v1
    object headers with contiguous little-endian data — the same
    structures libhdf5/h5py produce for this shape of file, INTENDED to
    be h5py-readable. That cross-read is not verifiable in this
    container (no h5py); what IS verified: round-trip through
    ``read_hdf5`` (itself validated against h5py/netCDF4-produced ground
    truth), plus byte-level structural tests, so the emitted field
    layouts match the h5py-produced sample's. Environments with h5py
    should round-trip once as a CI check.
    """
    names = sorted(datasets)
    n = len(names)
    leaf_k = max(4, (n + 1) // 2 + 1)  # one SNOD holds all (2K >= n)
    internal_k = 16
    buf = bytearray()

    def alloc(size: int, align: int = 8) -> int:
        while len(buf) % align:
            buf.append(0)
        off = len(buf)
        buf.extend(b"\x00" * size)
        return off

    def put(off: int, data: bytes) -> None:
        buf[off : off + len(data)] = data

    sb = alloc(96)  # superblock v0 + root symbol-table entry
    # local heap: reserved 8 bytes at offset 0, then NUL-terminated names
    heap_off_of: dict[str, int] = {}
    heap_data = bytearray(b"\x00" * 8)
    for nm in names:
        heap_off_of[nm] = len(heap_data)
        heap_data += nm.encode() + b"\x00"
        while len(heap_data) % 8:
            heap_data += b"\x00"
    heap_hdr = alloc(32)
    heap_dat = alloc(len(heap_data))
    put(heap_dat, bytes(heap_data))
    put(
        heap_hdr,
        b"HEAP"
        + struct.pack("<BBBB", 0, 0, 0, 0)
        + struct.pack("<QQQ", len(heap_data), 1, heap_dat),  # 1 = no free block
    )

    # per-dataset: data block + object header
    ohdr_of: dict[str, int] = {}
    for nm in names:
        arr, attrs = datasets[nm]
        arr = np.ascontiguousarray(arr)
        if arr.dtype.kind == "f":
            arr = arr.astype("<f8") if arr.dtype.itemsize > 4 else arr.astype("<f4")
        elif arr.dtype.kind in "iu":
            arr = arr.astype("<i8") if arr.dtype.itemsize > 4 else arr.astype("<i4")
        else:
            raise NotImplementedError(f"dataset dtype {arr.dtype}")
        data_off = alloc(arr.nbytes)
        put(data_off, arr.tobytes())
        layout = _pad8(
            struct.pack("<BB", 3, 1) + struct.pack("<QQ", data_off, arr.nbytes)
        )
        msgs = [
            (0x0001, _dataspace_message(arr.shape)),
            (0x0003, _dt_message(arr.dtype)),
            (0x0008, layout),
        ]
        for k, v in attrs.items():
            msgs.append((0x000C, _attr_message(k, v)))
        hdr = _object_header(msgs)
        ohdr_of[nm] = alloc(len(hdr))
        put(ohdr_of[nm], hdr)

    # SNOD with every (sorted) entry
    snod_size = 8 + 40 * 2 * leaf_k
    snod = alloc(snod_size)
    put(snod, b"SNOD" + struct.pack("<BBH", 1, 0, n))
    pos = snod + 8
    for nm in names:
        put(pos, struct.pack("<QQII", heap_off_of[nm], ohdr_of[nm], 0, 0))
        pos += 40  # + 16-byte zero scratch

    # group B-tree: one leaf-level node pointing at the SNOD
    btree_size = 24 + 8 * (2 * internal_k + 1) + 8 * (2 * internal_k)
    btree = alloc(btree_size)
    put(
        btree,
        b"TREE"
        + struct.pack("<BBH", 0, 0, 1)
        + struct.pack("<QQ", UNDEF, UNDEF)
        + struct.pack("<QQQ", 0, snod, heap_off_of[names[-1]] if names else 0),
    )

    # root group object header
    root_hdr = _object_header([(0x0011, struct.pack("<QQ", btree, heap_hdr))])
    root = alloc(len(root_hdr))
    put(root, root_hdr)

    eof = len(buf)
    super_block = (
        b"\x89HDF\r\n\x1a\n"
        + struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0)
        + struct.pack("<HH", leaf_k, internal_k)
        + struct.pack("<I", 0)
        + struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
        # root symbol-table entry: name offset 0, header addr, no cache
        + struct.pack("<QQII", 0, root, 0, 0)
        + b"\x00" * 16
    )
    assert len(super_block) == 96
    put(sb, super_block)
    with open(path, "wb") as f:
        f.write(bytes(buf))
