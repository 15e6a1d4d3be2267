"""Deterministic sampling / splitting for training-data pipelines.

A 100 TB corpus is split into train/val/test, stratified-sampled per
class, and majority-capped *before* any model sees it.  All of these
must be (a) deterministic across reruns and engines (no RNG state —
the assignment is a pure function of the row key), (b) map-side only
where possible (an extra shuffle over 100 TB to "sample" it is the
classic pipeline mistake), and (c) stable under repartitioning (a
`rand()`-based sample changes when the partitioning does; a key-hash
sample never does).

The bucket function is the first 16 bits of md5(key) modulo
``n_buckets``: md5 is available and bit-identical in every engine
(Spark, DuckDB, Python), making these operators oracle-checkable —
unlike xxhash64/crc32 which are Spark-private.  The modulo bias with
65536 inputs is < 0.6% for 100 buckets, irrelevant for split
purposes; use more nibbles if finer balance is ever needed.

Spark mapping notes: hash_bucket is a pure projection (no shuffle, no
UDF — md5/conv/pmod are all codegen'd JVM expressions), so split and
stratified-sample are free at scan time and fully pushdown-friendly.
cap_per_group is the only shuffling operator here (a per-group rank
needs the group on one partition); its window orders by the hash so
the kept subset is an unbiased, deterministic "random" K.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

BUCKETS = 100


def hash_bucket(key: Column | str, n_buckets: int = BUCKETS) -> Column:
    """Deterministic bucket in [0, n_buckets) from md5 of the key.

    Engine-portable analog of the reference's keyed partitioning
    (Cassandra partitioners hash the partition key the same way on
    every node; README.md:135-141 'query-first' keyed layout): the
    assignment is a property of the data, not of the run.
    """
    h = F.md5(F.col(key).cast("string") if isinstance(key, str) else key.cast("string"))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % n_buckets


def hash_bucket_sql(key_sql: str, n_buckets: int = BUCKETS) -> str:
    """DuckDB expression computing exactly :func:`hash_bucket`."""
    return (
        f"(CAST('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 1, 4) AS INTEGER)"
        f" % {n_buckets})"
    )


def with_split(
    df: DataFrame,
    key: str,
    splits: Sequence[tuple[str, int]] = (("train", 80), ("val", 90), ("test", 100)),
    col_name: str = "split",
) -> DataFrame:
    """Assign a train/val/test split label per row.

    ``splits`` is (label, exclusive upper bucket bound) in ascending
    order over :data:`BUCKETS` buckets — the default is an 80/10/10
    split.  Pure projection: no shuffle, stable under repartitioning,
    and a row's split never changes as the corpus grows (new rows
    hash independently).
    """
    b = hash_bucket(key)
    # chained CASE, first match wins (ascending bounds)
    case = F.when(b < splits[0][1], F.lit(splits[0][0]))
    for label, bound in splits[1:]:
        case = case.when(b < bound, F.lit(label))
    return df.withColumn(col_name, case)


def split_case_sql(
    key_sql: str,
    splits: Sequence[tuple[str, int]] = (("train", 80), ("val", 90), ("test", 100)),
) -> str:
    """DuckDB CASE expression computing exactly :func:`with_split`."""
    b = hash_bucket_sql(key_sql)
    whens = " ".join(f"WHEN {b} < {bound} THEN '{label}'" for label, bound in splits)
    return f"CASE {whens} END"


def stratified_flag(key: Column | str, percent: int) -> Column:
    """True for a deterministic ~percent% subset (by key hash) —
    applied per stratum via a plain filter/conditional aggregate, so
    stratified sampling is shuffle-free."""
    return hash_bucket(key) < percent


def weighted_sample_topk(
    df: DataFrame,
    key: str,
    weight_col: str,
    k: int,
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement (Efraimidis–
    Spirakis A-ES): every row draws u ~ Uniform(0,1) from md5(salt ||
    key) and the k rows with the largest ``ln(u)/w`` win — each row's
    inclusion probability is proportional to its weight, exactly the
    reservoir-sampling-by-weight result but as a pure projection +
    distributed top-k (TakeOrderedAndProject), no RNG state, no
    shuffle of the corpus, stable under repartitioning and across
    engines.  (``ln(u)/w`` is the monotone log form of the usual
    ``u^(1/w)`` A-ES key — one libm call and no overflow for huge
    weights.)

    The training-mix use case: token-budget-proportional or
    quality-score-proportional corpus subsampling, where "sample 50k
    docs by weight" must give byte-identical corpora on every rerun
    at any parallelism.

    Output: input columns + ``sample_key`` (rounded 6dp) + ``rnk``.
    Weights must be > 0.
    """
    from pyspark.sql import Window

    v = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    u = (v.cast("double") + 0.5) / F.lit(float(16**8))
    skey = F.log(u) / F.col(weight_col)
    keyed = df.withColumn("__skey", skey)
    top = keyed.orderBy(F.desc("__skey"), F.asc(key)).limit(k)
    w = Window.orderBy(F.desc("__skey"), F.asc(key))
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("long"))
        .withColumn("sample_key", F.round("__skey", 6))
        .drop("__skey")
    )


def weighted_sample_key_sql(key_sql: str, weight_sql: str, salt: str = "ws") -> str:
    """DuckDB expression computing exactly the A-ES ``ln(u)/w`` key of
    :func:`weighted_sample_topk` (same md5-derived uniform)."""
    return (
        f"ln((CAST('0x' || substr(md5('{salt}' || CAST({key_sql} AS VARCHAR)), 1, 8) "
        f"AS BIGINT) + 0.5) / {float(16**8)!r}) / {weight_sql}"
    )


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    key: str,
    k: int,
) -> DataFrame:
    """Keep at most ``k`` rows per group, chosen deterministically by
    the key hash (an unbiased fixed "random" subset — class
    rebalancing for a skewed corpus).  One shuffle on the group
    columns; ties in the 16-bit hash break on the key itself so the
    kept set is unique.  At 100 TB prefer pre-bucketed storage on the
    group columns so the window re-uses the layout instead of
    shuffling."""
    w = Window.partitionBy(*group_cols).orderBy(
        hash_bucket(key), F.md5(F.col(key).cast("string")), F.col(key)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def uniform01(key: Column | str, salt: str = "u01") -> Column:
    """Deterministic u ~ Uniform(0,1) from md5(salt || key) — the
    same 32-bit-prefix construction :func:`weighted_sample_topk`
    uses, factored out for rate-based (Bernoulli) samplers."""
    k = F.col(key) if isinstance(key, str) else key
    v = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), k.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return (v.cast("double") + 0.5) / F.lit(float(16**8))


def uniform01_sql(key_sql: str, salt: str = "u01") -> str:
    """DuckDB expression computing exactly :func:`uniform01`."""
    return (
        f"((CAST('0x' || substr(md5('{salt}' || CAST({key_sql} AS VARCHAR)), "
        f"1, 8) AS BIGINT) + 0.5) / {float(16**8)!r})"
    )


def digest_slice_u01(digest: Column, slice_idx: Column | int) -> Column:
    """u ~ Uniform(0,1) from 8 hex chars of an ALREADY-COMPUTED md5
    digest column — the slicing half of :func:`uniform01_slice`, for
    plans that materialize one digest per key block and read all four
    slices from it (the digest, not the slice, is the dominant cost
    of a draw — computing it once per 4 draws is the whole point).
    ``slice_idx`` must be in 0..3: an md5 digest is 32 hex chars, so
    slice 4+ would substr past the end and yield NULL draws."""
    s = F.lit(slice_idx) if isinstance(slice_idx, int) else slice_idx
    v = F.conv(
        digest.substr(F.lit(1) + s.cast("int") * F.lit(8), F.lit(8)),
        16,
        10,
    ).cast("bigint")
    return (v.cast("double") + 0.5) / F.lit(float(16**8))


def uniform01_slice(
    key: Column | str, slice_idx: Column | int, salt: str = "u01"
) -> Column:
    """FOUR independent u ~ Uniform(0,1) draws from ONE md5 digest:
    slice ``slice_idx`` ∈ {0,1,2,3} reads hex chars
    [1 + 8·slice, 8·slice + 8] of md5(salt || key).  md5 output bytes
    are uniform and independent enough for resampling weights, so a
    B-way fan-out (e.g. Poisson bootstrap) needs only B/4 digests.
    To actually realize the 4× digest saving, materialize the digest
    once per key block and slice it with :func:`digest_slice_u01`
    (separate rows never share a digest computation).  Slice 0
    reproduces :func:`uniform01` bit-for-bit."""
    h = F.md5(
        F.concat(
            F.lit(salt),
            F.col(key).cast("string") if isinstance(key, str) else key.cast("string"),
        )
    )
    return digest_slice_u01(h, slice_idx)


def uniform01_slice_sql(
    key_sql: str, slice_sql: str, salt: str = "u01"
) -> str:
    """DuckDB expression computing exactly :func:`uniform01_slice`
    (same digest, same slice arithmetic, same +0.5 scaling)."""
    return (
        f"((CAST('0x' || substr(md5('{salt}' || CAST({key_sql} AS VARCHAR)), "
        f"1 + 8 * ({slice_sql}), 8) AS BIGINT) + 0.5) / {float(16**8)!r})"
    )


def temperature_resample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    tau: float = 0.7,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based mixture resampling (the multilingual /
    multi-source rebalancing rule of mT5 / UniMax): group g holding
    n_g of N docs gets target share p_g = n_g^tau / sum_h n_h^tau;
    realized by pure DOWN-sampling with per-group keep rate
    r_g = p_g * T / n_g where T = min_g n_g / p_g is the largest
    budget reachable without upsampling (the scarcest group is kept
    in full, rate exactly 1).  tau=1 is a no-op, tau=0 targets the
    uniform mixture.

    Per-doc keep verdicts are deterministic Bernoulli(r_g) draws from
    :func:`uniform01` (md5 of the doc id) — byte-identical corpora on
    any engine, rerun, or partitioning.  Rates are rounded to 6dp
    BEFORE the comparison so the (libm-pow-derived) threshold admits
    no cross-engine last-ulp ambiguity.

    Output: one row per group — (group, n_docs, keep_rate, n_kept)
    plus the realized post-sampling share.  The per-doc verdict is
    the ``u < keep_rate`` predicate inline; materializing the kept
    corpus is the same plan minus the final aggregate.

    Scale shape: one map-side-combined count per group; the 1-row
    budget reduce and the per-group rate table broadcast back over
    the corpus scan (groups are few); verdicts are a codegen
    projection — no corpus shuffle at all.  100 TB = two scans.
    """
    counts = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("n_g")
    )
    shared = counts.withColumn("p_raw", F.pow(F.col("n_g").cast("double"), tau))
    tot = shared.agg(
        F.min(F.col("n_g") / F.col("p_raw")).alias("t_over_z"),
    )
    # T = min_g n_g/p_g with p_g = p_raw/z => T/z = min_g n_g/p_raw and
    # rate_g = p_g*T/n_g = p_raw * (T/z) / n_g  (z cancels — one fewer
    # float op to keep oracle-identical)
    rates = shared.crossJoin(F.broadcast(tot)).select(
        "g",
        "n_g",
        F.round(
            F.least(
                F.lit(1.0),
                F.col("p_raw") * F.col("t_over_z") / F.col("n_g"),
            ),
            6,
        ).alias("keep_rate"),
    )
    verdicts = (
        df.select(F.col(id_col).alias("id"), F.col(group_col).alias("g"))
        .join(F.broadcast(rates), "g")
        .withColumn("u", uniform01("id", salt))
        .withColumn("kept", F.col("u") < F.col("keep_rate"))
    )
    out = verdicts.groupBy("g", "n_g", "keep_rate").agg(
        F.sum(F.col("kept").cast("long")).alias("n_kept")
    )
    k_tot = out.agg(F.sum("n_kept").alias("k_total"))
    return out.crossJoin(F.broadcast(k_tot)).select(
        F.col("g").alias(group_col),
        F.col("n_g").cast("long").alias("n_docs"),
        "keep_rate",
        F.col("n_kept").cast("long").alias("n_kept"),
        F.round(
            F.col("n_kept").cast("double") / F.col("k_total"), 6
        ).alias("realized_share"),
    )


def waterfill_budget(
    per_group: DataFrame,
    group_col: str,
    avail_col: str,
    budget_df: DataFrame,
    budget_col: str = "budget",
) -> DataFrame:
    """Equal-share WATERFILLING of an integer token budget across
    groups: every group is owed ``budget / n`` tokens, but a group
    with less available than its share keeps only what it has and the
    surplus redistributes among the others — repeated until the
    level settles.  The classic "mix a token budget from
    heterogeneous sources under availability caps" step of assembling
    a training set, in its exact CLOSED FORM (no iteration):

    sort groups by availability ascending; group i (1-based, n total)
    SATURATES iff ``avail_i * (n-i+1) <= budget - sum(avail_1..i-1)``
    (even handing every remaining group avail_i leaves its own cap
    unmet).  The test is prefix-monotone, so the saturated set is
    exactly the rows where it holds, and the final water level is
    ``(budget - sum(saturated avail)) / n_unsaturated``.

    Exactness: availability, budget, cumulative sums, and the
    saturation comparison are all BIGINT — bit-identical in any
    engine; the level is ONE double division of exact integers, so
    the doubles agree too.  Scale shape: ``per_group`` must be a
    BOUNDED aggregate relation (one row per source/language/shard
    family — the big pass producing it has already reduced the
    corpus), so the unpartitioned order window and the two 1-row
    broadcasts here are over dozens of rows, never facts.

    Returns one row per group: group, avail_tokens, saturated,
    alloc_tokens (6dp), sample_rate (6dp; 1.0 for saturated groups).
    """
    from pyspark.sql import Window

    glob = Window.partitionBy()
    w_ord = Window.orderBy(avail_col, group_col)
    avail = F.col(avail_col).cast("long")
    flagged = per_group.crossJoin(F.broadcast(budget_df)).select(
        F.col(group_col),
        avail.alias("__avail"),
        F.col(budget_col).cast("long").alias("__budget"),
        (
            avail
            * (
                F.count(F.lit(1)).over(glob)
                - F.row_number().over(w_ord)
                + F.lit(1)
            ).cast("long")
            <= F.col(budget_col).cast("long")
            - F.coalesce(
                F.sum(avail).over(
                    w_ord.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("long"),
            )
        ).alias("saturated"),
    )
    stats = flagged.agg(
        F.sum(F.when(F.col("saturated"), F.col("__avail")).otherwise(0)).alias(
            "__cum_sat"
        ),
        F.sum(F.when(F.col("saturated"), 1).otherwise(0)).alias("__n_sat"),
        F.count(F.lit(1)).alias("__n"),
    )
    level = (F.col("__budget") - F.col("__cum_sat")).cast("double") / (
        F.col("__n") - F.col("__n_sat")
    ).cast("double")
    alloc = F.when(
        F.col("saturated"), F.col("__avail").cast("double")
    ).otherwise(level)
    return flagged.crossJoin(F.broadcast(stats)).select(
        F.col(group_col),
        F.col("__avail").alias("avail_tokens"),
        "saturated",
        F.round(alloc, 6).alias("alloc_tokens"),
        F.round(alloc / F.col("__avail").cast("double"), 6).alias("sample_rate"),
    )
