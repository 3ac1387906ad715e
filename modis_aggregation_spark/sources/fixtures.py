"""Deterministic MODIS-shaped fixture tables (FIXTURES.md §1-2).

Models what the reference reads from real MYD06_L2/MYD03 granules
(``MODIS_Aggregation/aggregate_functions.py:124-223``) as two parquet tables:

* ``granules`` — the paired file catalog (filename scheme
  ``{product}.A{yyyy}{ddd}.{hhmm}.061.{proc}.hdf``, reference ``:70-71``):
  2 simulated days + the first 3 hours of day 3 (the "definition of day"
  spill, ``:589-601``), 12 granules/hour ⇒ 612 rows per product.
* ``pixels`` — the decoded swath fact table, one row per pixel, wide layout
  (one column per variable), with fill-values already mapped to NULL
  (SURVEY §1.4), 8% NULL per measure, partially-overlapping NULL masks for
  ctp/cee (exercises joint-histogram pairing, quirk Q4), and exact
  boundary pixels at lat=±20, lon=0 (strict-bounds quirk Q7).

Generation is pure NumPy + pyarrow (no Spark), seeded, and stable across
runs — tests assert the fixture hash so the DuckDB oracle and the Spark
engine always see identical bytes.
"""

from __future__ import annotations

import os
from datetime import date, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXTURES_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "fixtures")

GRANULES_PATH = os.path.join(FIXTURES_DIR, "granules.parquet")
GRANULES_BROKEN_PATH = os.path.join(FIXTURES_DIR, "granules_broken.parquet")
PIXELS_PATH = os.path.join(FIXTURES_DIR, "pixels.parquet")

# Simulated mission slice: 2008-01-01 .. 2008-01-02 plus 3h of day 3.
START = date(2008, 1, 1)
N_FULL_DAYS = 2
SPILL_HOURS = 3
GRANULES_PER_HOUR = 12  # one per 5 minutes
NI, NJ = 24, 16  # pixels per granule (small-swath stand-in for 2030x1354)


def _granule_times() -> list[tuple[date, int, int]]:
    """(day, hour, minute) for every simulated granule."""
    out = []
    for d in range(N_FULL_DAYS):
        day = START + timedelta(days=d)
        for hour in range(24):
            for slot in range(GRANULES_PER_HOUR):
                out.append((day, hour, slot * 5))
    spill_day = START + timedelta(days=N_FULL_DAYS)
    for hour in range(SPILL_HOURS):
        for slot in range(GRANULES_PER_HOUR):
            out.append((spill_day, hour, slot * 5))
    return out


def _filename(product: str, day: date, hour: int, minute: int) -> str:
    doy = day.timetuple().tm_yday
    return f"{product}.A{day.year:04d}{doy:03d}.{hour:02d}{minute:02d}.061.2008000000000.hdf"


def build_granules() -> pa.Table:
    times = _granule_times()
    rows = {k: [] for k in ("granule_id", "product", "filename", "date", "doy", "hhmm", "hour")}
    gid = 0
    for product in ("MYD06_L2", "MYD03"):
        for day, hour, minute in times:
            rows["granule_id"].append(gid)
            rows["product"].append(product)
            rows["filename"].append(_filename(product, day, hour, minute))
            rows["date"].append(day)
            rows["doy"].append(day.timetuple().tm_yday)
            rows["hhmm"].append(f"{hour:02d}{minute:02d}")
            rows["hour"].append(hour)
            gid += 1
    return pa.table(
        {
            "granule_id": pa.array(rows["granule_id"], pa.int64()),
            "product": pa.array(rows["product"], pa.string()),
            "filename": pa.array(rows["filename"], pa.string()),
            "date": pa.array(rows["date"], pa.date32()),
            "doy": pa.array(rows["doy"], pa.int32()),
            "hhmm": pa.array(rows["hhmm"], pa.string()),
            "hour": pa.array(rows["hour"], pa.int32()),
        }
    )


def build_granules_broken(granules: pa.Table) -> pa.Table:
    """Same catalog with one MYD03 partner removed (S2 anti-join check)."""
    n_pairs = granules.num_rows // 2
    victim = n_pairs + 7  # a MYD03 row
    mask = np.ones(granules.num_rows, dtype=bool)
    mask[victim] = False
    return granules.filter(pa.array(mask))


def build_pixels(granules: pa.Table, seed: int = 43) -> pa.Table:
    rng = np.random.default_rng(seed)
    myd06 = granules.filter(pa.compute.equal(granules["product"], "MYD06_L2"))
    gids = myd06["granule_id"].to_numpy()
    n_gran = len(gids)
    px_per_gran = NI * NJ
    n = n_gran * px_per_gran

    granule_id = np.repeat(gids, px_per_gran)
    i_idx = np.tile(np.repeat(np.arange(NI, dtype=np.int32), NJ), n_gran)
    j_idx = np.tile(np.tile(np.arange(NJ, dtype=np.int32), NI), n_gran)

    # Rectangular footprints ~10x16 degrees with per-pixel jitter; centers
    # spread globally so grid cells straddle granule borders.
    lat_c = rng.uniform(-82.0, 82.0, n_gran)
    lon_c = rng.uniform(-180.0, 180.0, n_gran)
    lat0 = np.repeat(lat_c - 5.0, px_per_gran)
    lon0 = np.repeat(lon_c - 8.0, px_per_gran)
    lat = lat0 + (i_idx + rng.uniform(0, 1, n)) * (10.0 / NI)
    lon = lon0 + (j_idx + rng.uniform(0, 1, n)) * (16.0 / NJ)
    lat = np.clip(lat, -89.999, 89.999)
    lon = ((lon + 180.0) % 360.0) - 180.0

    # cloud-mask raw byte: bits 1-2 flag (0..3), bit 0 status, bits 3-7 noise
    flag = rng.integers(0, 4, n)
    status = (rng.uniform(0, 1, n) > 0.05).astype(np.int64)  # 5% undetermined
    noise = rng.integers(0, 16, n)
    cm_raw = ((noise << 3) | (flag << 1) | status).astype(np.int8)

    def measure(vals: np.ndarray, null_mask: np.ndarray) -> pa.Array:
        return pa.array(vals, pa.float64(), mask=null_mask)

    null_ctp = rng.uniform(0, 1, n) < 0.08
    # cee nulls: half shared with ctp, half independent (quirk Q4 coverage)
    null_cee = np.where(
        rng.uniform(0, 1, n) < 0.5, null_ctp, rng.uniform(0, 1, n) < 0.08
    )
    null_ctt = rng.uniform(0, 1, n) < 0.08
    null_cth = rng.uniform(0, 1, n) < 0.08

    ctp = rng.uniform(50.0, 1050.0, n)
    ctt = np.clip(rng.normal(250.0, 25.0, n), 190.0, 310.0)
    cee = rng.beta(2.0, 2.0, n)
    cth = rng.uniform(0.0, 18000.0, n)

    # Exact boundary pixels (quirk Q7): first granule's first rows pinned.
    lat[:4] = [20.0, -20.0, 10.0, 10.0]
    lon[:4] = [10.0, 10.0, 0.0, 35.0]
    # An all-NULL granule-cell: granule 1, all measures null for first 8 px
    g1 = slice(px_per_gran, px_per_gran + 8)
    for m in (null_ctp, null_cee, null_ctt, null_cth):
        m[g1] = True

    return pa.table(
        {
            "granule_id": pa.array(granule_id, pa.int64()),
            "i": pa.array(i_idx, pa.int32()),
            "j": pa.array(j_idx, pa.int32()),
            "lat": pa.array(lat, pa.float64()),
            "lon": pa.array(lon, pa.float64()),
            "cm_raw": pa.array(cm_raw, pa.int8()),
            "ctp": measure(ctp, null_ctp),
            "ctt": measure(ctt, null_ctt),
            "cee": measure(cee, null_cee),
            "cth": measure(cth, null_cth),
        }
    )


# pixels.parquet is a DIRECTORY of part files: real granule data arrives as
# one file per granule (the axis the reference's MPI/Dask drivers split on),
# and a single-file fixture serializes every scan onto one core — Spark
# parallelizes parquet by file/byte-range, and a 12 MB single-row-group file
# is one task no matter how many executor threads exist.
N_PIXEL_FILES = 32


def generate_fixtures(out_dir: str = FIXTURES_DIR) -> dict[str, str]:
    os.makedirs(out_dir, exist_ok=True)
    granules = build_granules()
    paths = {
        "granules": os.path.join(out_dir, "granules.parquet"),
        "granules_broken": os.path.join(out_dir, "granules_broken.parquet"),
        "pixels": os.path.join(out_dir, "pixels.parquet"),
    }
    pq.write_table(granules, paths["granules"])
    pq.write_table(build_granules_broken(granules), paths["granules_broken"])
    pixels = build_pixels(granules)
    os.makedirs(paths["pixels"], exist_ok=True)
    n = pixels.num_rows
    per = -(-n // N_PIXEL_FILES)  # ceil — deterministic contiguous slices
    for k in range(N_PIXEL_FILES):
        chunk = pixels.slice(k * per, per)
        if chunk.num_rows:
            pq.write_table(
                chunk, os.path.join(paths["pixels"], f"part-{k:05d}.parquet")
            )
    return paths


def read_granules(spark, path: str = GRANULES_PATH):
    return spark.read.parquet(path)


def read_pixels(spark, path: str = PIXELS_PATH):
    return spark.read.parquet(path)


if __name__ == "__main__":
    for name, p in generate_fixtures().items():
        print(name, p, os.path.getsize(p))
