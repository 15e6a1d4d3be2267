"""Semantic tests for vocabulary building and vocab-mapped encoding
(operators/text.py::build_vocab / encode_with_vocab) on crafted
corpora — the oracle gate proves engine agreement; these prove the
ids, UNK fallback and ordering are the RIGHT ones."""

from __future__ import annotations

from real_time_data_analytics_cassandra_spark.operators.text import (
    build_vocab,
    encode_with_vocab,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vocab_ranked_by_frequency_then_token(spark):
    df = _docs(spark, [(1, "b b b a a c"), (2, "a d")])
    vocab = {
        r["token"]: r["token_id"]
        for r in build_vocab(df, "doc_id", "text", vocab_size=3).collect()
    }
    # a and b tie at 3 -> token order breaks the tie; c and d tie at 1
    # -> c wins the last slot
    assert vocab == {"a": 1, "b": 2, "c": 3}


def test_encode_order_unk_and_counts(spark):
    df = _docs(spark, [(1, "b a zz a"), (2, "c c")])
    vocab = build_vocab(df, "doc_id", "text", vocab_size=3)
    out = {
        r["id"]: r
        for r in encode_with_vocab(df, vocab, "doc_id", "text").collect()
    }
    # corpus counts: a=2, c=2, b=1, zz=1 -> vocab a=1, c=2, b=3
    assert out[1]["token_ids"] == [3, 1, 0, 1]
    assert out[1]["n_tokens"] == 4 and out[1]["n_unk"] == 1
    assert out[2]["token_ids"] == [2, 2]
    assert out[2]["n_unk"] == 0


def test_encode_with_external_vocab(spark):
    """Production shape: the vocab is a fixed model table, not
    derived from the batch being encoded."""
    df = _docs(spark, [(1, "x y x q")])
    vocab = spark.createDataFrame(
        [("x", 7), ("y", 9)], "token string, token_id long"
    )
    [row] = encode_with_vocab(df, vocab, "doc_id", "text").collect()
    assert row["token_ids"] == [7, 9, 7, 0]
    assert row["n_unk"] == 1
