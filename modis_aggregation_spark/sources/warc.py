"""Spark 4 Python DataSource for WARC web-archive files (ISO 28500).

WARC is THE wire format of web-scale LLM training corpora — Common
Crawl publishes everything as WARC/1.0 with each record individually
gzip-compressed and the members concatenated (a valid multi-member
gzip stream, seekable per record). This source reads that shape plus
plain uncompressed WARC, keeping the unit of parallelism at the WARC
FILE (one InputPartition per file, records parsed inside the
partition, Arrow batches out — the same scan contract as the
archive/granule sources).

Record grammar per the public ISO 28500 / IIPC warc-specifications:

    WARC/1.0\r\n
    <name>: <value>\r\n ...          (headers; Content-Length required)
    \r\n
    <Content-Length bytes of block>
    \r\n\r\n                         (record boundary)

For ``response`` records whose Content-Type is ``application/http``
the HTTP layer is additionally split: status code parsed from the
status line, ``text`` carries only the HTTP body (what a WET extract
keeps); for every other record type ``text`` is the whole block.

Schema::

    archive STRING, record_id STRING, warc_type STRING,
    target_uri STRING, content_type STRING, content_length BIGINT,
    http_status INT, text STRING

Pushdown: ``EqualTo``/``In`` on ``archive`` prunes whole files
(partition-level); ``EqualTo``/``In`` on ``warc_type`` skips
non-matching records BEFORE any HTTP split or text decode (the filter
is also handed back to Spark for re-checking). Malformed records
(bad version line, missing Content-Length, truncated block, broken
boundary) raise ValueError with the byte offset — never silently
skipped.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
)
from pyspark.sql.types import StructType

WARC_SCHEMA = (
    "archive STRING, record_id STRING, warc_type STRING, "
    "target_uri STRING, content_type STRING, content_length BIGINT, "
    "http_status INT, text STRING"
)
_BATCH_RECORDS = 1024


def write_warc(
    path: str,
    records: list[dict],
    gzip_records: bool = True,
) -> str:
    """Write WARC/1.0 records. Each dict: ``warc_type`` (required),
    ``block`` (bytes, required), and optional ``record_id``,
    ``target_uri``, ``content_type``, ``date``. With
    ``gzip_records=True`` each record is its own gzip member
    (Common Crawl layout); otherwise the file is plain WARC."""
    out = io.BytesIO()
    for i, rec in enumerate(records):
        block = rec["block"]
        headers = [
            ("WARC-Type", rec["warc_type"]),
            ("WARC-Record-ID", rec.get("record_id", f"<urn:rec:{i}>")),
            ("WARC-Date", rec.get("date", "2026-01-01T00:00:00Z")),
        ]
        if rec.get("target_uri"):
            headers.append(("WARC-Target-URI", rec["target_uri"]))
        if rec.get("content_type"):
            headers.append(("Content-Type", rec["content_type"]))
        headers.append(("Content-Length", str(len(block))))
        raw = (
            b"WARC/1.0\r\n"
            + b"".join(f"{k}: {v}\r\n".encode() for k, v in headers)
            + b"\r\n"
            + block
            + b"\r\n\r\n"
        )
        if gzip_records:
            # mtime pinned so the byte stream is deterministic
            out.write(gzip.compress(raw, mtime=0))
        else:
            out.write(raw)
    with open(path, "wb") as fh:
        fh.write(out.getvalue())
    return path


def _read_stream(path: str) -> bytes:
    """Whole-file read, transparently inflating (multi-member) gzip.
    A WARC file is bounded (~1 GB for Common Crawl shards); per-record
    streaming would also work but buys nothing inside one task."""
    with open(path, "rb") as fh:
        head = fh.read(2)
        fh.seek(0)
        data = fh.read()
    if head == b"\x1f\x8b":
        out, pos = [], 0
        # decompress member-by-member: gzip.decompress stops after ONE
        # member, so walk the stream with raw zlib to honor all of them.
        # memoryview slices keep the walk O(total) — a bytes slice here
        # would copy the remaining buffer per member (quadratic in the
        # member count, which is the record count for Common Crawl files)
        view = memoryview(data)
        while pos < len(data):
            d = zlib.decompressobj(wbits=31)
            out.append(d.decompress(view[pos:]))
            if not d.eof:
                raise ValueError(f"truncated gzip member at byte {pos}")
            pos = len(data) - len(d.unused_data)
        return b"".join(out)
    return data


def iter_warc_records(path: str) -> Iterator[dict]:
    """Yield one dict per WARC record: the WARC headers (lower-cased
    keys) plus ``block`` bytes. Raises ValueError on malformation."""
    data = _read_stream(path)
    pos = 0
    while pos < len(data):
        if data[pos : pos + 2] == b"\r\n":  # tolerate extra boundary CRLFs
            pos += 2
            continue
        eol = data.find(b"\r\n", pos)
        if eol == -1 or not data[pos:eol].startswith(b"WARC/"):
            raise ValueError(
                f"expected WARC version line at byte {pos}, "
                f"got {data[pos : pos + 20]!r}"
            )
        hdr_end = data.find(b"\r\n\r\n", eol)
        if hdr_end == -1:
            raise ValueError(f"unterminated WARC header block at byte {pos}")
        headers: dict[str, str] = {}
        for line in data[eol + 2 : hdr_end].split(b"\r\n"):
            k, sep, v = line.partition(b":")
            if not sep:
                raise ValueError(f"malformed WARC header line {line!r}")
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("utf-8", "replace")
            )
        if "content-length" not in headers:
            raise ValueError(f"record at byte {pos} has no Content-Length")
        n = int(headers["content-length"])
        body_start = hdr_end + 4
        body_end = body_start + n
        if body_end + 4 > len(data):
            raise ValueError(
                f"record at byte {pos} truncated: needs {n} block bytes "
                "+ CRLFCRLF boundary"
            )
        if data[body_end : body_end + 4] != b"\r\n\r\n":
            raise ValueError(
                f"record at byte {pos}: missing CRLFCRLF boundary after block"
            )
        headers["block"] = data[body_start:body_end]
        yield headers
        pos = body_end + 4


def _split_http(block: bytes) -> tuple[int | None, bytes]:
    """Split an application/http block into (status, body)."""
    sep = block.find(b"\r\n\r\n")
    head = block[:sep] if sep != -1 else block
    body = block[sep + 4 :] if sep != -1 else b""
    status: int | None = None
    line = head.split(b"\r\n", 1)[0]
    parts = line.split()
    if len(parts) >= 2 and parts[0].startswith(b"HTTP/"):
        try:
            status = int(parts[1])
        except ValueError:
            status = None
    return status, body


class WarcPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        paths = options.get("paths", "")
        self.paths = [p for p in paths.split(",") if p]
        if not self.paths:
            raise ValueError("warc source requires the 'paths' option")
        self.encoding = options.get("encoding", "utf-8")
        self.types: set[str] | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            col = getattr(f, "attribute", None)
            name = col[0] if isinstance(col, tuple) else col
            if name == "archive":
                if isinstance(f, EqualTo):
                    self.paths = [p for p in self.paths if p == f.value]
                    continue
                if isinstance(f, In):
                    keep = set(f.values)
                    self.paths = [p for p in self.paths if p in keep]
                    continue
            if name == "warc_type":
                if isinstance(f, EqualTo):
                    self.types = {f.value}
                    yield f  # Spark re-checks; we only pre-filter
                    continue
                if isinstance(f, In):
                    self.types = set(f.values)
                    yield f
                    continue
            yield f

    def partitions(self) -> list[WarcPartition]:
        return [WarcPartition(p) for p in self.paths]

    def read(self, partition: WarcPartition):
        import pyarrow as pa

        cols: dict[str, list] = {
            k: []
            for k in (
                "record_id", "warc_type", "target_uri", "content_type",
                "content_length", "http_status", "text",
            )
        }
        arc = partition.path

        def flush():
            batch = pa.RecordBatch.from_arrays(
                [
                    pa.array([arc] * len(cols["record_id"])),
                    pa.array(cols["record_id"]),
                    pa.array(cols["warc_type"]),
                    pa.array(cols["target_uri"]),
                    pa.array(cols["content_type"]),
                    pa.array(cols["content_length"], pa.int64()),
                    pa.array(cols["http_status"], pa.int32()),
                    pa.array(cols["text"]),
                ],
                names=[
                    "archive", "record_id", "warc_type", "target_uri",
                    "content_type", "content_length", "http_status", "text",
                ],
            )
            for v in cols.values():
                v.clear()
            return batch

        for rec in iter_warc_records(arc):
            wtype = rec.get("warc-type", "")
            if self.types is not None and wtype not in self.types:
                continue
            block = rec["block"]
            ctype = rec.get("content-type", "")
            status: int | None = None
            if ctype.startswith("application/http"):
                status, body = _split_http(block)
            else:
                body = block
            cols["record_id"].append(rec.get("warc-record-id", ""))
            cols["warc_type"].append(wtype)
            cols["target_uri"].append(rec.get("warc-target-uri"))
            cols["content_type"].append(ctype or None)
            cols["content_length"].append(len(block))
            cols["http_status"].append(status)
            cols["text"].append(body.decode(self.encoding, errors="replace"))
            if len(cols["record_id"]) >= _BATCH_RECORDS:
                yield flush()
        if cols["record_id"]:
            yield flush()


class WarcDataSource(DataSource):
    """``spark.read.format("warc")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_SCHEMA

    def reader(self, schema: StructType) -> WarcReader:
        return WarcReader(schema, dict(self.options))
