"""Archive (zip/tar) text DataSource: member round-trips, container
sniffing by magic bytes, partition- and member-level pushdown pruning."""

import pytest

from modis_aggregation_spark.sources.archive_datasource import (
    ArchiveDataSource,
    iter_archive_members,
    write_text_archive,
)


def _load(spark, paths, **opts):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ArchiveDataSource)
    r = spark.read.format("text_archive").option("paths", ",".join(paths))
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_zip_and_tar_roundtrip(spark, tmp_path):
    members = {"a.txt": "héllo wörld", "sub/b.txt": "two\nlines"}
    z = write_text_archive(str(tmp_path / "x.zip"), members)
    t = write_text_archive(str(tmp_path / "y.tar"), members)
    # container sniffing is magic-byte-based, not extension-based
    assert [m for m, _, _ in iter_archive_members(z)] == list(members)
    assert [m for m, _, _ in iter_archive_members(t)] == list(members)
    rows = _load(spark, [z, t]).collect()
    assert len(rows) == 4
    got = {(r["archive"], r["member"]): r for r in rows}
    for arc in (z, t):
        for name, text in members.items():
            r = got[(arc, name)]
            assert r["text"] == text
            assert r["size_bytes"] == len(text.encode("utf-8"))


def test_archive_equality_prunes_partitions(spark, tmp_path):
    """archive = <path> pushdown prunes whole files — a LISTED archive
    that does not exist proves its partition never opened."""
    z = write_text_archive(str(tmp_path / "x.zip"), {"a.txt": "hi"})
    ghost = str(tmp_path / "missing.zip")
    df = _load(spark, [z, ghost]).filter(f"archive = '{z}'")
    assert df.count() == 1


def test_member_prefix_prunes_and_recheck(spark, tmp_path):
    members = {f"train/{i}.txt": f"t{i}" for i in range(5)}
    members.update({f"val/{i}.txt": f"v{i}" for i in range(3)})
    z = write_text_archive(str(tmp_path / "x.zip"), members)
    df = _load(spark, [z]).filter("member LIKE 'val/%'")
    assert df.count() == 3
    got = _load(spark, [z], member_prefix="train/").collect()
    assert len(got) == 5 and all(r["member"].startswith("train/") for r in got)
    exact = _load(spark, [z]).filter("member = 'val/1.txt'").collect()
    assert len(exact) == 1 and exact[0]["text"] == "v1"


def test_undecodable_bytes_replaced_size_raw(spark, tmp_path):
    import zipfile

    p = str(tmp_path / "bin.zip")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("weird.txt", b"ok\xff\xfe!")
    r = _load(spark, [p]).collect()[0]
    assert r["size_bytes"] == 5            # RAW byte size
    assert "ok" in r["text"] and "!" in r["text"]
    assert "�" in r["text"]           # replacement, not silent drop


def test_missing_paths_option_raises(spark):
    spark.dataSource.register(ArchiveDataSource)
    with pytest.raises(Exception, match="paths"):
        spark.read.format("text_archive").load().count()


def test_tar_with_pk_prefixed_member_not_misrouted(spark, tmp_path):
    """Container sniffing must use the FULL 4-byte zip signature: a tar
    whose first member is named 'PKG-INFO' starts with the bytes 'PK'
    and must still route to tarfile."""
    t = write_text_archive(
        str(tmp_path / "sdist.tar"), {"PKG-INFO": "Name: pkg", "x.txt": "hi"}
    )
    assert [m for m, _, _ in iter_archive_members(t)] == ["PKG-INFO", "x.txt"]
    rows = _load(spark, [t]).collect()
    assert {r["member"] for r in rows} == {"PKG-INFO", "x.txt"}
