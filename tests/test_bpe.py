"""BPE training/encoding exactness (operators/bpe.py): the Spark
implementation must reproduce a pure-Python reference of the Sennrich
algorithm EXACTLY — merge sequence, counts, and per-document
tokenization — on real corpus data.  This is the oracle-equivalent
gate for an operator SQL cannot express.
"""

from __future__ import annotations

import hashlib
from collections import Counter

from pyspark.sql import functions as F

from real_time_data_analytics_cassandra_spark.catalog import table
from real_time_data_analytics_cassandra_spark.operators import bpe
from tests.conftest import SF_SMOKE
import pytest

K = 12


def _py_word_freqs(texts):
    c = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                c[w] += 1
    return c


def _py_train(freqs, k):
    """Reference BPE trainer: symbols per word, k argmax merges with
    (count desc, left asc, right asc) tie-break, greedy L2R apply."""
    words = {w: list(w) for w in freqs}
    merges = []
    for _ in range(k):
        pairs = Counter()
        for w, syms in words.items():
            n = freqs[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((a, b, cnt))
        for w in words:
            words[w] = _py_apply_one(words[w], a, b)
    return merges


def _py_apply_one(syms, a, b):
    out = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _py_encode(text, merges):
    words = [list(w) for w in text.split(" ") if w]
    for a, b, _ in merges:
        words = [_py_apply_one(w, a, b) for w in words]
    return words


def test_trained_merges_match_python_reference(spark):
    docs = table(spark, SF_SMOKE, "documents")
    got = bpe.train_bpe_merges(docs, "text", k=K)
    texts = [r["text"] for r in docs.select("text").collect()]
    expect = _py_train(_py_word_freqs(texts), K)
    assert got == expect


def test_encoding_matches_python_reference(spark):
    docs = table(spark, SF_SMOKE, "documents").limit(50)
    merges = bpe.train_bpe_merges(docs, "text", k=K)
    out = {
        r["id"]: r
        for r in bpe.apply_bpe_merges(docs, "doc_id", "text", merges).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        words = _py_encode(r["text"], merges)
        joined = " ".join("▁".join(w) for w in words)
        md5 = hashlib.md5(joined.encode()).hexdigest()
        row = out[r["doc_id"]]
        assert row["n_words"] == len(words)
        assert row["n_subwords"] == sum(len(w) for w in words)
        assert row["subwords_md5"] == md5


@pytest.mark.slow
def test_merges_reduce_token_count_monotonically(spark):
    docs = table(spark, SF_SMOKE, "documents").limit(100)
    merges = bpe.train_bpe_merges(docs, "text", k=6)
    prev = None
    for i in range(0, len(merges) + 1, 2):
        n = (
            bpe.apply_bpe_merges(docs, "doc_id", "text", merges[:i])
            .agg(F.sum("n_subwords"))
            .collect()[0][0]
        )
        if prev is not None:
            assert n < prev, "each merge must strictly shrink the corpus"
        prev = n


def test_source_token_fertility_matches_python_reference(spark):
    """Pure-Python recompute gate for the per-source fertility audit:
    every integer sum and every IEEE ratio must equal a from-scratch
    recompute through _py_encode with the frozen merge table."""
    from real_time_data_analytics_cassandra_spark import queries as q
    from real_time_data_analytics_cassandra_spark.queries import (
        _BPE_FIXED_MERGES,
    )
    from tests.conftest import SF_ORACLE

    docs = table(spark, SF_ORACLE, "documents")
    merges = [(a, b, 0) for a, b in _BPE_FIXED_MERGES]
    per_source: dict = {}
    for r in docs.select("source", "text").collect():
        if len(r["text"]) == 0:
            continue
        words = _py_encode(r["text"], merges)
        s = per_source.setdefault(
            r["source"],
            {"docs": 0, "bytes": 0, "chars": 0, "words": 0, "tokens": 0},
        )
        s["docs"] += 1
        s["bytes"] += len(r["text"].encode("utf-8"))
        s["chars"] += len(r["text"])
        s["words"] += len(words)
        s["tokens"] += sum(len(w) for w in words)
    got = {
        r["source"]: r for r in q.source_token_fertility(
            spark, SF_ORACLE
        ).collect()
    }
    assert set(got) == set(per_source)
    for src, s in per_source.items():
        g = got[src]
        assert (
            g["n_docs"], g["n_bytes"], g["n_chars"],
            g["n_words"], g["n_tokens"],
        ) == (s["docs"], s["bytes"], s["chars"], s["words"], s["tokens"]), src
        assert g["tokens_per_byte"] == round(s["tokens"] / s["bytes"], 6)
        assert g["tokens_per_char"] == round(s["tokens"] / s["chars"], 6)
        assert g["tokens_per_word"] == round(s["tokens"] / s["words"], 6)


def test_fertility_tokens_equal_bpe_encode_sums(spark):
    """Cross-operator equivalence: the fertility audit's per-source
    token sums must equal bpe_encode_docs' per-doc n_subwords summed
    by source — the two queries share one encode definition."""
    from collections import defaultdict

    from real_time_data_analytics_cassandra_spark import queries as q
    from tests.conftest import SF_ORACLE

    src_of = {
        r["doc_id"]: r["source"]
        for r in table(spark, SF_ORACLE, "documents")
        .select("doc_id", "source")
        .collect()
    }
    want: dict = defaultdict(int)
    for r in q.bpe_encode_docs(spark, SF_ORACLE).collect():
        want[src_of[r["doc_id"]]] += r["n_subwords"]
    got = {
        r["source"]: r["n_tokens"]
        for r in q.source_token_fertility(spark, SF_ORACLE).collect()
    }
    assert got == dict(want)
