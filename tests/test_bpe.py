"""BPE tokenizer: distributed trainer pinned to the pure-Python reference,
encode invariants, and the t38 accounting query's building blocks.

The oracle gate (t38) proves the ENCODE chain is cross-engine exact; these
tests prove the TRAINER — whose learned merges depend on the data and so
cannot live in a static oracle string — implements exactly the documented
semantics (all-adjacent-pairs counting, (-count, pair) argmax, 2-pass
literal-replace application)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from stock_crypto_data_pipeline_public_spark.operators import bpe as B

from pyspark.sql import functions as F

_CORPUS = {
    # engineered so several merge rounds have clear, distinct winners and
    # later merges chain onto earlier merged symbols ("th" -> "the")
    "the": 50,
    "then": 12,
    "there": 9,
    "cat": 20,
    "cats": 11,
    "at": 18,
    "rat": 7,
    "banana": 5,
    "aaaaaa": 3,  # repeated-pair run: exercises the 2-pass replace rule
}


def _spark_vocab(spark):
    return spark.createDataFrame(
        [(w, f) for w, f in _CORPUS.items()], "word string, freq long"
    )


def test_trainer_matches_python_reference(spark):
    got = B.train_bpe(_spark_vocab(spark), rounds=8)
    want = B.reference_train_bpe(_CORPUS, rounds=8)
    assert got == want
    assert len(got) == 8  # corpus is rich enough that no round dries up


def test_trainer_min_freq_stops_early(spark):
    vocab = spark.createDataFrame([("ab", 1)], "word string, freq long")
    # every pair occurs once < min_freq=2 -> zero merges
    assert B.train_bpe(vocab, rounds=4) == []
    assert B.reference_train_bpe({"ab": 1}, rounds=4) == []


def test_encode_token_counts_monotone_and_exact(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "then there"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    merges = B.reference_train_bpe(_CORPUS, rounds=6)
    rows = {
        r["doc_id"]: r
        for r in B.encode_tokens(docs, merges).collect()
    }
    # per-doc exactness vs a direct python replay of the same chain
    for doc_id, text in [(1, "the cat sat"), (2, "then there")]:
        s = " " + " ".join(text.replace(" ", "_")) + " "
        for a, b in merges:
            s = s.replace(f" {a} {b} ", f" {a}{b} ").replace(
                f" {a} {b} ", f" {a}{b} "
            )
        assert rows[doc_id]["n_bpe_tokens"] == len(s.split()), (doc_id, s)
        assert rows[doc_id]["n_symbols"] >= rows[doc_id]["n_bpe_tokens"]
    # empty and NULL text both tokenize to zero (the m-series NULL-text rule)
    assert rows[3]["n_symbols"] == 0 and rows[3]["n_bpe_tokens"] == 0
    assert rows[4]["n_symbols"] == 0 and rows[4]["n_bpe_tokens"] == 0


def test_each_merge_never_increases_tokens(spark):
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(_CORPUS)], "doc_id long, text string"
    )
    merges = B.reference_train_bpe(_CORPUS, rounds=8)
    sym = B.symbolize("text")
    prev = None
    for k in range(len(merges) + 1):
        total = (
            docs.select(
                B.token_count(B.apply_merges(sym, merges[:k])).alias("n")
            )
            .agg(F.sum("n"))
            .collect()[0][0]
        )
        if prev is not None:
            assert total <= prev, f"merge {k} increased token count"
        prev = total


@settings(max_examples=30, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abct", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_reference_trainer_merges_are_wellformed(word_freqs, rounds):
    merges = B.reference_train_bpe(word_freqs, rounds)
    assert len(merges) <= rounds
    seen = {c for w in word_freqs for c in w} | {B.WORD_MARK}
    for a, b in merges:
        # merges only combine symbols that existed at that point
        assert set(a) <= seen and set(b) <= seen
        seen.add(a + b)
