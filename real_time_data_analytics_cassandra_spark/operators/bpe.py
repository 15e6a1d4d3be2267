"""Byte-pair-encoding merge training and application (Sennrich et al.
2016) — the trainable-tokenizer half the vocab operators
(text.py::build_vocab / encode_with_vocab) don't cover: instead of a
fixed word vocabulary, BPE LEARNS k subword merges from corpus
statistics and can tokenize any word — including unseen ones — into
subwords.

Faithful to the real algorithm's economics (this is how production
BPE trainers work): BPE trains on the WORD FREQUENCY TABLE, not the
corpus.  The single corpus-scale pass is the distributed word-count
aggregate; the frequency head (``vocab_cap`` most frequent words — a
few million rows at web scale, bounded by construction) is collected
and the k-merge argmax loop runs driver-side over it, the same
bounded-driver-training discipline as the KMeans/PQ codebook
operators (similarity.py).  Corpus bytes never reach the driver.

ENCODING is distributed the other way around: the merges are applied
(k chained greedy folds, pure JVM expressions) to the DISTINCT-WORD
table — vocab-sized work — and the corpus then joins the resulting
word -> subwords map (broadcast while the vocab fits, sort-merge
join beyond) and reassembles each document's subword sequence in
word order.  One corpus shuffle (the per-doc regroup), never a
per-row interpreted merge loop; a genuinely unseen word at inference
time falls back to the same fold expression the vocab pass uses.

Determinism: the winning pair maximizes (count desc, left asc, right
asc) — total order, no RNG; greedy left-to-right application within a
word is the standard tie rule.  tests/test_bpe.py re-runs training
with an INDEPENDENT pure-Python reference on the same corpus and
asserts identical merge sequences, and that the distributed encoding
equals the Python tokenizer word-for-word — an exactness gate as
strong as a SQL oracle, for an operator SQL cannot express.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from real_time_data_analytics_cassandra_spark.functions.textfns import tokens


def _merge_expr(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right application of ONE merge (left, right) ->
    left||right over a symbol array, as a pure JVM fold: append each
    symbol, collapsing it into the previous one when the pair
    matches.  Overlaps resolve leftmost-first ('a a a' under (a,a)
    -> ['aa', 'a']), the standard BPE rule."""
    return F.aggregate(
        symbols,
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_freq_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) over the corpus — the one corpus-scale pass."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _apply_one(syms: list, a: str, b: str) -> list:
    out: list = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def train_bpe_merges(
    df: DataFrame,
    text_col: str,
    k: int = 20,
    vocab_cap: int = 1_000_000,
) -> list[tuple[str, str, int]]:
    """Learn ``k`` merges; returns [(left, right, pair_count), ...]
    in training order.  One distributed corpus pass; the argmax loop
    runs driver-side over the collected frequency head (top
    ``vocab_cap`` by (n desc, word asc) — deterministic truncation
    when the vocabulary exceeds the cap)."""
    head = (
        word_freq_table(df, text_col)
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(vocab_cap)
        .collect()
    )
    freqs = {r["word"]: r["n"] for r in head}
    words = {w: list(w) for w in freqs}
    merges: list[tuple[str, str, int]] = []
    for _ in range(k):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            n = freqs[w]
            for pair in zip(syms, syms[1:]):
                pairs[pair] = pairs.get(pair, 0) + n
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((a, b, cnt))
        words = {w: _apply_one(s, a, b) for w, s in words.items()}
    return merges


def apply_bpe_merges(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str, int]],
) -> DataFrame:
    """Tokenize every document with the learned merges, distributed
    via tokenize-the-vocab-then-join: the k merge folds run over the
    DISTINCT-word table only; the corpus posexplodes its words, joins
    the word -> subwords map (broadcast — vocab-sized), and each
    document reassembles its subword sequence in word order with one
    per-doc aggregate.

    Output: (id, n_words, n_subwords, subwords_md5) — the sequence
    proven by md5 like vocab_encode_docs."""
    base = df.filter(F.length(text_col) > 0).select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("words")
    )
    vocab = base.select(
        F.explode("words").alias("word")
    ).distinct()
    col: Column = F.split("word", "")
    for left, right, _cnt in merges:
        col = _merge_expr(col, left, right)
    vocab_map = vocab.select(
        "word", F.array_join(col, "▁").alias("sub")
    )
    exploded = base.select(
        "id", F.posexplode("words").alias("pos", "word")
    ).join(F.broadcast(vocab_map), "word")
    return (
        exploded.groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(
                F.size(F.split("sub", "▁"))
            ).cast("long").alias("n_subwords"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "sub"))
                        ),
                        lambda x: x["sub"],
                    ),
                    " ",
                )
            ).alias("subwords_md5"),
        )
        .select("id", "n_words", "n_subwords", "subwords_md5")
    )
