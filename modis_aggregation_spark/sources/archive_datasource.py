"""Spark 4 Python DataSource for text archives (zip / tar of documents).

LLM corpora ship as archives of many small text members (WET/WARC-style
crawls, dataset dumps, scraped bundles). Reading them through a
DataSource keeps the unit of parallelism at the ARCHIVE file — one
InputPartition per archive, members decoded inside the partition and
emitted as Arrow batches — the same scan shape as the granule source
(one task per container, no driver-side listing of members).

Stdlib ``zipfile``/``tarfile`` only. Schema::

    archive STRING, member STRING, size_bytes BIGINT, text STRING

Options:

* ``paths`` — comma-separated archive file paths (zip and/or tar mixed;
  type sniffed per file from magic bytes, not extension).
* ``encoding`` (default utf-8) — member decode; undecodable bytes are
  replaced, never dropped silently (size_bytes reports the RAW size).
* ``member_prefix`` — server-side member filter, also reachable through
  Catalyst pushdown: ``StringStartsWith``/``EqualTo`` filters on
  ``member`` prune INSIDE each archive before any text decode, and
  ``EqualTo``/``In`` on ``archive`` prunes whole files (partition-level,
  like granule-id pushdown).

Usage::

    spark.dataSource.register(ArchiveDataSource)
    df = (spark.read.format("text_archive")
          .option("paths", "/data/shard1.zip,/data/shard2.tar")
          .load())
"""

from __future__ import annotations

import io
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    StringStartsWith,
)
from pyspark.sql.types import StructType

ARCHIVE_SCHEMA = (
    "archive STRING, member STRING, size_bytes BIGINT, text STRING"
)
_BATCH_MEMBERS = 1024


class ArchivePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def iter_archive_members(path: str) -> Iterator[tuple[str, int, bytes]]:
    """Yield (member_name, raw_size, raw_bytes) for every regular-file
    member. Container type is sniffed from magic bytes: PK zip, else
    tar (ustar or pre-POSIX, handled by tarfile)."""
    import tarfile
    import zipfile

    with open(path, "rb") as fh:
        magic = fh.read(4)
    # full 4-byte zip signatures (local header / empty archive / spanned):
    # a bare "PK" prefix would misroute a tar whose first member name
    # starts with "PK" (e.g. an sdist's PKG-INFO) to zipfile
    if magic in (b"PK\x03\x04", b"PK\x05\x06", b"PK\x07\x08"):
        with zipfile.ZipFile(path) as zf:
            for info in zf.infolist():
                if info.is_dir():
                    continue
                yield info.filename, info.file_size, zf.read(info)
    else:
        with tarfile.open(path, "r:*") as tf:
            for member in tf:
                if not member.isfile():
                    continue
                f = tf.extractfile(member)
                yield member.name, member.size, f.read() if f else b""


class ArchiveReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        paths = options.get("paths", "")
        self.paths = [p for p in paths.split(",") if p]
        if not self.paths:
            raise ValueError("text_archive requires the 'paths' option")
        self.encoding = options.get("encoding", "utf-8")
        self.member_prefix = options.get("member_prefix", "")
        self.member_exact: set[str] | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """archive equality prunes partitions (whole files); member
        prefix/equality prunes inside each archive before text decode.
        Everything else goes back to Spark."""
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
            if name == "member":
                if isinstance(f, StringStartsWith):
                    # narrowest prefix wins; both still re-checked by Spark
                    if len(f.value) > len(self.member_prefix):
                        self.member_prefix = f.value
                    yield f  # keep Spark-side check (we only pre-filter)
                    continue
                if isinstance(f, EqualTo):
                    self.member_exact = (self.member_exact or set()) | {f.value}
                    yield f
                    continue
            yield f

    def partitions(self) -> list[ArchivePartition]:
        return [ArchivePartition(p) for p in self.paths]

    def read(self, partition: ArchivePartition):
        import pyarrow as pa

        names, sizes, texts = [], [], []
        arc = partition.path

        def flush():
            batch = pa.RecordBatch.from_arrays(
                [
                    pa.array([arc] * len(names)),
                    pa.array(names),
                    pa.array(sizes, pa.int64()),
                    pa.array(texts),
                ],
                names=["archive", "member", "size_bytes", "text"],
            )
            names.clear(), sizes.clear(), texts.clear()
            return batch

        for member, size, raw in iter_archive_members(arc):
            if self.member_prefix and not member.startswith(self.member_prefix):
                continue
            if self.member_exact is not None and member not in self.member_exact:
                continue
            names.append(member)
            sizes.append(size)
            texts.append(raw.decode(self.encoding, errors="replace"))
            if len(names) >= _BATCH_MEMBERS:
                yield flush()
        if names:
            yield flush()


class ArchiveDataSource(DataSource):
    """``spark.read.format("text_archive")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "text_archive"

    def schema(self) -> str:
        return ARCHIVE_SCHEMA

    def reader(self, schema: StructType) -> ArchiveReader:
        return ArchiveReader(schema, dict(self.options))


def write_text_archive(
    path: str, members: dict[str, str], encoding: str = "utf-8"
) -> str:
    """Test/fixture helper: write ``{member_name: text}`` as a zip
    (``.zip`` suffix) or tar (anything else)."""
    import tarfile
    import zipfile

    if path.endswith(".zip"):
        with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
            for name, text in members.items():
                zf.writestr(name, text.encode(encoding))
    else:
        with tarfile.open(path, "w") as tf:
            for name, text in members.items():
                data = text.encode(encoding)
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    return path
