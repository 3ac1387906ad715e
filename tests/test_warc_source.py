"""WARC/1.0 source: record grammar, gzip member handling, HTTP split,
pushdown behavior, malformation rejection."""

import gzip

import pytest

from modis_aggregation_spark.sources.warc import (
    WarcDataSource,
    iter_warc_records,
    write_warc,
)


def _mk_records(n=3):
    recs = [
        {
            "warc_type": "warcinfo",
            "content_type": "application/warc-fields",
            "block": b"software: test\r\n",
        }
    ]
    for i in range(n):
        body = f"hello document {i}".encode()
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
            + f"Content-Length: {len(body)}\r\n\r\n".encode()
            + body
        )
        recs.append(
            {
                "warc_type": "response",
                "target_uri": f"https://example.org/doc/{i}",
                "content_type": "application/http;msgtype=response",
                "record_id": f"<urn:uuid:{i:04d}>",
                "block": http,
            }
        )
    return recs


@pytest.mark.parametrize("gz", [True, False])
def test_roundtrip_plain_and_gzip(tmp_path, gz):
    p = str(tmp_path / ("a.warc.gz" if gz else "a.warc"))
    write_warc(p, _mk_records(4), gzip_records=gz)
    got = list(iter_warc_records(p))
    assert [r["warc-type"] for r in got] == ["warcinfo"] + ["response"] * 4
    assert got[1]["warc-target-uri"] == "https://example.org/doc/0"
    assert got[2]["block"].endswith(b"hello document 1")
    assert int(got[1]["content-length"]) == len(got[1]["block"])


def test_multi_member_gzip_is_per_record(tmp_path):
    """Common Crawl layout: each record its own gzip member — the raw
    file must contain one gzip magic per record."""
    p = str(tmp_path / "cc.warc.gz")
    write_warc(p, _mk_records(5), gzip_records=True)
    raw = open(p, "rb").read()
    assert raw.count(b"\x1f\x8b\x08") == 6  # warcinfo + 5 responses


def test_malformed_records_raise(tmp_path):
    p = str(tmp_path / "bad.warc")
    with open(p, "wb") as fh:
        fh.write(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="version line"):
        list(iter_warc_records(p))

    # missing Content-Length
    with open(p, "wb") as fh:
        fh.write(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nxx\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        list(iter_warc_records(p))

    # truncated block
    good = str(tmp_path / "good.warc")
    write_warc(good, _mk_records(1), gzip_records=False)
    data = open(good, "rb").read()
    with open(p, "wb") as fh:
        fh.write(data[:-6])
    with pytest.raises(ValueError, match="truncated|boundary"):
        list(iter_warc_records(p))

    # broken boundary
    with open(p, "wb") as fh:
        fh.write(data.replace(b"\r\n\r\nWARC/1.0", b"\rX\r\nWARC/1.0", 1))
    with pytest.raises(ValueError, match="boundary"):
        list(iter_warc_records(p))

    # truncated gzip member
    gz = str(tmp_path / "t.warc.gz")
    write_warc(gz, _mk_records(1), gzip_records=True)
    gzdata = open(gz, "rb").read()
    with open(gz, "wb") as fh:
        fh.write(gzdata[:-8])
    with pytest.raises(ValueError, match="gzip"):
        list(iter_warc_records(gz))


def test_spark_scan_schema_and_http_split(spark, tmp_path):
    p1 = str(tmp_path / "s1.warc.gz")
    p2 = str(tmp_path / "s2.warc")
    write_warc(p1, _mk_records(3), gzip_records=True)
    write_warc(p2, _mk_records(2), gzip_records=False)
    spark.dataSource.register(WarcDataSource)
    df = spark.read.format("warc").option("paths", f"{p1},{p2}").load()
    rows = df.collect()
    assert len(rows) == 7  # 2 warcinfo + 5 responses
    resp = [r for r in rows if r["warc_type"] == "response"]
    assert all(r["http_status"] == 200 for r in resp)
    # text carries only the HTTP body, not the HTTP headers
    assert sorted(r["text"] for r in resp if r["archive"] == p2) == [
        "hello document 0", "hello document 1",
    ]
    # content_length is the full block (headers + body), per the spec
    r0 = next(r for r in resp if r["target_uri"].endswith("/0"))
    assert r0["content_length"] > len(r0["text"])
    info = [r for r in rows if r["warc_type"] == "warcinfo"]
    assert all(r["http_status"] is None for r in info)
    assert all(r["text"] == "software: test\r\n" for r in info)


def test_pushdown_prunes_types_and_archives(spark, tmp_path):
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass
    p1 = str(tmp_path / "a1.warc.gz")
    p2 = str(tmp_path / "a2.warc.gz")
    write_warc(p1, _mk_records(3), gzip_records=True)
    write_warc(p2, _mk_records(3), gzip_records=True)
    spark.dataSource.register(WarcDataSource)
    df = (
        spark.read.format("warc")
        .option("paths", f"{p1},{p2}")
        .load()
        .filter("warc_type = 'response' AND archive = '%s'" % p1)
    )
    assert df.count() == 3
    assert set(r["archive"] for r in df.collect()) == {p1}
