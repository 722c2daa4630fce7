"""operators/retrieval.py — BM25 scoring semantics (t47/x23's builder)."""

import math

import pytest
from pyspark.sql import Row

from stock_crypto_data_pipeline_public_spark.operators import retrieval as R


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="hash join hash join hash"),
            Row(doc_id=2, text="hash scan scan scan scan scan scan scan"),
            Row(doc_id=3, text="vector"),
            Row(doc_id=4, text="nothing relevant here at all whatsoever"),
        ]
    )


def _scores(docs, terms):
    rows = R.bm25_scores(docs, terms).collect()
    return {r.doc_id: r for r in rows}


def test_only_matching_docs_emitted(docs):
    s = _scores(docs, ("hash", "join"))
    assert set(s) == {1, 2}
    assert s[1].n_matched_terms == 2
    assert s[2].n_matched_terms == 1


def test_textbook_bm25_value(docs):
    """Hand-computed score for doc 3 / term 'vector': tf=1, df=1, dl=1,
    N=4 docs, total=20 tokens → idf=ln(1+3.5/1.5), norm=(0.75*1*4)/20."""
    s = _scores(docs, ("vector",))
    idf = math.log(1.0 + (4 - 1 + 0.5) / (1 + 0.5))
    norm = (0.75 * 1 * 4) / 20
    expected = idf * (1 * 2.2 / (1 + 1.2 * (1.0 - 0.75 + norm)))
    assert s[3].bm25 == pytest.approx(expected, abs=1e-12)


def test_tf_saturation_monotone_but_sublinear(docs):
    """5x the tf must raise the score by strictly less than 5x (k1 cap)."""
    s = _scores(docs, ("scan",))
    one = _scores(docs.filter("doc_id <> 2"), ("scan",))
    assert not one  # 'scan' only occurs in doc 2
    s_hash = _scores(docs, ("hash",))
    # doc 1: tf=3 of 5 tokens; doc 2: tf=1 of 8 — higher tf, shorter doc wins
    assert s_hash[1].bm25 > s_hash[2].bm25


def test_oracle_ctes_mirror_spark(docs, tmp_path):
    import duckdb

    pq = str(tmp_path / "docs.parquet")
    docs.coalesce(1).write.parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    terms = ("hash", "join", "scan")
    oracle = con.execute(
        f"WITH {R.bm25_oracle_ctes(terms)} SELECT doc_id, n_matched_terms, bm25.bm25 FROM bm25"
    ).fetchall()
    got = {(r[0], r[1]): r[2] for r in oracle}
    want = {(r.doc_id, r.n_matched_terms): r.bm25 for r in _scores(docs, terms).values()}
    assert set(got) == set(want)
    for k, v in want.items():
        # fixed-order pivot addition: bit-identical, not merely approx
        assert got[k] == v, (k, got[k], v)
