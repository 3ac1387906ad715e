"""Unit tests for the Catalyst expression builders (bits, grid, histogram,
day rules) on hand-computed frames — SURVEY §5.2 item 2."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from modis_aggregation_spark.functions.bits import bit_field, cloud_mask_flag
from modis_aggregation_spark.functions.grid import cell_id, lat_idx, lon_idx
from modis_aggregation_spark.functions.histogram import hist_bucket, hist_bucket_sql
from modis_aggregation_spark.functions.dayrules import day_definition_null


def test_bit_field(spark):
    # byte 0b10110101: bits1-2 = 0b10 = 2, bit0 = 1
    df = spark.createDataFrame([(0b10110101,)], "v int")
    row = df.select(
        bit_field(F.col("v"), 1, 2).alias("flag"),
        bit_field(F.col("v"), 0, 1).alias("status"),
    ).first()
    assert row.flag == 2
    assert row.status == 1


@pytest.mark.parametrize(
    "raw,expected",
    [
        (0b000, -1),  # status 0 -> undetermined
        (0b001, 0),   # cloudy, determined
        (0b011, 1),   # prob-cloudy
        (0b101, 2),   # prob-clear
        (0b111, 3),   # clear
        (0b110, -1),  # clear but status 0
        (0b1111001, 0),  # high noise bits ignored
    ],
)
def test_cloud_mask_flag(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], "cm_raw int")
    assert df.select(cloud_mask_flag(F.col("cm_raw")).alias("cm")).first().cm == expected


def test_cell_id_row_major(spark):
    # 1-degree global grid: lat -90..90 (180 rows), lon -180..180 (360 cols)
    df = spark.createDataFrame(
        [(-89.5, -179.5), (-89.5, 179.5), (89.5, 179.5), (0.5, 0.5)], "lat double, lon double"
    )
    out = df.select(
        cell_id(F.col("lat"), F.col("lon"), -90.0, -180.0, 1.0, 1.0, 360).alias("cell"),
        lat_idx(F.col("lat"), -90.0, 1.0).alias("li"),
        lon_idx(F.col("lon"), -180.0, 1.0).alias("lj"),
    ).collect()
    assert [r.cell for r in out] == [0, 359, 179 * 360 + 359, 90 * 360 + 180]
    assert [(r.li, r.lj) for r in out] == [(0, 0), (0, 359), (179, 359), (90, 180)]


def test_hist_bucket_numpy_semantics(spark):
    edges = [0.0, 1.0, 2.0, 3.0]
    vals = [(-0.5,), (0.0,), (0.99,), (1.0,), (2.5,), (3.0,), (3.01,), (None,)]
    df = spark.createDataFrame(vals, "v double")
    got = [r.b for r in df.select(hist_bucket(F.col("v"), edges).alias("b")).collect()]
    # below range -> NULL; 3.0 in CLOSED last bin; above range -> NULL
    assert got == [None, 0, 0, 1, 2, 2, None, None]


def test_hist_bucket_irregular_edges(spark):
    edges = [50.5, 150.0, 250.0, 1050.0]  # non-uniform (reference ctp head)
    df = spark.createDataFrame([(50.5,), (149.9,), (150.0,), (1050.0,), (1050.1,)], "v double")
    got = [r.b for r in df.select(hist_bucket(F.col("v"), edges).alias("b")).collect()]
    assert got == [0, 0, 1, 2, None]


def test_hist_bucket_matches_numpy_random(spark):
    rng = np.random.default_rng(7)
    edges = [0.0, 0.3, 1.1, 2.0, 5.0]
    vals = rng.uniform(-1, 6, 500).tolist()
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [r.b for r in df.select(hist_bucket(F.col("v"), edges).alias("b")).collect()]
    arr = np.asarray(vals)
    counts_np, _ = np.histogram(arr, bins=edges)
    counts_spark = np.bincount([g for g in got if g is not None], minlength=4)
    assert (counts_np == counts_spark).all()
    n_in_range = ((arr >= edges[0]) & (arr <= edges[-1])).sum()
    assert sum(g is not None for g in got) == n_in_range


def test_hist_bucket_sql_matches_column_expr(spark):
    edges = [0.0, 1.5, 2.0, 7.0]
    df = spark.createDataFrame([(float(x) / 3,) for x in range(-5, 25)], "v double")
    a = [r.b for r in df.select(hist_bucket(F.col("v"), edges).alias("b")).collect()]
    b = [r.b for r in df.selectExpr(f"{hist_bucket_sql('v', edges)} AS b").collect()]
    assert a == b


def test_day_definition_null(spark):
    rows = [
        # (lon, doy, hour, expect_nulled)
        (-120.0, 2, 1, True),   # end day, shifted hour, daytime quadrant
        (-120.0, 2, 5, False),  # not a shifted hour
        (-120.0, 1, 1, False),  # not end/spill day
        (45.0, 2, 0, True),     # end day, [0,90]
        (-90.0, 2, 2, True),    # inclusive bound
        (120.0, 3, 1, True),    # spill day, [90,180]
        (-45.0, 3, 2, True),    # spill day, [-90,0]
        (120.0, 2, 1, False),   # end day but spill-day quadrant
        (-45.0, 2, 1, False),
    ]
    df = spark.createDataFrame(
        [(lon, doy, h, 1.0) for lon, doy, h, _ in rows],
        "lon double, doy int, hour int, ctp double",
    )
    out = day_definition_null(df, ["ctp"], end_doy=2, spill_doy=3).collect()
    for (lon, doy, h, nulled), r in zip(rows, out):
        assert (r.ctp is None) == nulled, (lon, doy, h)


# ---------------------------------------------------------------------------
# C4 line cleaning + Gopher quality rules
# ---------------------------------------------------------------------------

def test_c4_clean_line_rules(spark):
    from modis_aggregation_spark.functions.text import c4_clean

    doc = "\n".join([
        "This line has enough words and ends well.",   # kept
        "Too short.",                                  # < 5 words
        "This line has no terminal punctuation at all",  # no terminal
        "Enable javascript to view this page today.",  # javascript
        'He said "stop right there officer!"',         # ends with quote: kept
    ])
    df = spark.createDataFrame([(1, doc), (2, "code { x } here."), (3, "")],
                               ["doc_id", "text"])
    out = {r["doc_id"]: r for r in c4_clean(df, min_sentences=1).collect()}
    assert out[1]["n_lines"] == 5
    assert out[1]["n_lines_kept"] == 2
    assert out[1]["clean_text"].splitlines() == [
        "This line has enough words and ends well.",
        'He said "stop right there officer!"',
    ]
    assert out[1]["kept"]
    assert not out[2]["kept"]          # '{' marker kills the doc
    assert out[3]["n_lines_kept"] == 0 and not out[3]["kept"]


def test_c4_clean_min_sentences(spark):
    from modis_aggregation_spark.functions.text import c4_clean

    df = spark.createDataFrame(
        [(1, "One good sentence stands here alone today.")], ["doc_id", "text"]
    )
    assert c4_clean(df, min_sentences=1).first()["kept"]
    assert not c4_clean(df, min_sentences=2).first()["kept"]


def test_gopher_quality_rules(spark):
    from modis_aggregation_spark.functions.text import gopher_quality

    good = ("the data pipeline should be of use and have that property with "
            "many plain words " * 5)
    short = "the cat sat"                          # word count < 50
    symbols = " ### ".join(["the of and that be have with to word"] * 8)
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in gopher_quality(df).collect()}
    assert out[1]["gopher_pass"]
    assert out[1]["n_stopword_hits"] >= 2
    assert not out[2]["gopher_pass"] and out[2]["word_count"] == 3
    assert not out[3]["gopher_pass"] and out[3]["symbol_ratio"] > 0.1


def test_gopher_line_fractions(spark):
    from modis_aggregation_spark.functions.text import gopher_quality

    doc = "\n".join(["- bullet one", "- bullet two", "trailing thought..."])
    r = gopher_quality(spark.createDataFrame([(1, doc)], ["doc_id", "text"])).first()
    assert abs(r["bullet_frac"] - 2 / 3) < 1e-9
    assert abs(r["ellipsis_frac"] - 1 / 3) < 1e-9


def test_tokens_cross_engine_whitespace_parity(spark):
    """Java \\s includes vertical tab, RE2's (DuckDB oracle) does not —
    tokens() must use the explicit shared class so a \\x0b document can
    never hash-mismatch a token-derived contract query."""
    import duckdb

    from modis_aggregation_spark.functions.text import tokens

    cases = ["a\x0bb", "a\tb  c", "x y", "a\x1cb", "a b", "tabs\t\tend "]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    sp = [list(r[0]) for r in df.select(tokens(F.col("text"))).collect()]
    con = duckdb.connect()
    dt = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"
    dk = [
        con.execute(f"SELECT {dt} FROM (SELECT ? AS text)", [c]).fetchone()[0]
        for c in cases
    ]
    assert sp == dk


def test_spread_small_scan_semantics(spark):
    """spread_small_scan: repartitions a below-parallelism scan, is a
    NO-OP (same plan object) at or above parallelism, and passes
    streaming frames through untouched."""
    from pyspark.sql import functions as F

    from modis_aggregation_spark.functions.layout import spread_small_scan

    p = spark.sparkContext.defaultParallelism
    small = spark.range(0, 1000, 1, 1)
    out = spread_small_scan(small)
    assert out.rdd.getNumPartitions() == p
    assert out.count() == 1000
    wide = spark.range(0, 1000, 1, p + 2)
    assert spread_small_scan(wide) is wide  # no shuffle added
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    assert spread_small_scan(stream) is stream


def test_zorder_key_matches_python_reference(spark):
    """functions/grid.zorder_key: bit-interleave parity with a direct
    python reference over the full 6-bit square, plus the documented
    odd/even position convention (x odd, y even)."""
    from pyspark.sql import functions as F

    from modis_aggregation_spark.functions.grid import zorder_key

    df = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], "x INT, y INT"
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_key(F.col("x"), F.col("y"), 3).alias("z")
        ).collect()
    }

    def ref(x, y):
        z = 0
        for b in range(3):
            z |= ((x >> b) & 1) << (2 * b + 1) | ((y >> b) & 1) << (2 * b)
        return z

    assert got == {(x, y): ref(x, y) for x in range(8) for y in range(8)}
    assert got[(1, 0)] == 2 and got[(0, 1)] == 1  # x odd, y even positions
