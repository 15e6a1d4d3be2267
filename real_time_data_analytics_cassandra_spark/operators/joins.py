"""Join strategies beyond plain equi-joins.

The reference's only joins are tiny broadcast dict lookups
(SURVEY.md §2.3 J1/J2); these are the engine's superset surface with
the 100 TB execution concerns made explicit:

- ``band_range_join``: non-equi (range-predicate) join against a
  small literal dimension — broadcast nested loop, the right physical
  plan when the dim is tiny and the condition is theta.
- ``salted_equi_join``: shuffle-join skew mitigation.  When one join
  key dominates (a hot user, a null bucket), the default hash
  partitioning puts the whole key on one task.  Salting appends a
  random-but-deterministic salt to the big side's key and replicates
  the small side once per salt value, spreading the hot key over
  ``num_salts`` tasks.  AQE's skew-join handles moderate skew
  automatically; explicit salting is the belt-and-braces form for
  pathological keys, and produces bit-identical results to the plain
  join (asserted in tests and by sharing the oracle of the unsalted
  query).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def band_range_join(
    facts: DataFrame,
    spark: SparkSession,
    value_col: str,
    bands: Sequence[tuple[str, float, float]],
    band_name_col: str = "band_name",
) -> DataFrame:
    """Inner range join: rows matched to the (name, lo, hi) band with
    lo <= value < hi.  The band table is a broadcast literal, so the
    plan is a single pass over the facts (BroadcastNestedLoopJoin) —
    no shuffle of the big side."""
    dim = spark.createDataFrame(list(bands), [band_name_col, "band_lo", "band_hi"])
    cond = (F.col(value_col) >= F.col("band_lo")) & (F.col(value_col) < F.col("band_hi"))
    return facts.join(F.broadcast(dim), cond, "inner")


def salted_equi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    num_salts: int = 8,
    how: str = "left",
) -> DataFrame:
    """Skew-resistant equi-join: big side salted by a deterministic
    hash of its whole row id-space, small side replicated num_salts
    times.  Output columns = big's ++ small's (join keys included),
    exactly like the plain join."""
    # salt = hash of the WHOLE big-side row, so a hot key's rows land
    # on all num_salts shuffle partitions (hashing only the key would
    # keep the hot key on one task); any salt assignment yields the
    # same join result, so correctness never depends on the hash
    salted_big = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(num_salts)).cast(
            "int"
        ),
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))).alias("__salt")
    salted_small = small.select("*", salts)
    out = salted_big.join(
        salted_small,
        (salted_big[big_key] == salted_small[small_key])
        & (salted_big["__salt"] == salted_small["__salt"]),
        how,
    )
    return out.drop("__salt")


# memoized skew probes: (plan semanticHash, input-file fingerprint,
# key, denom) -> max-key share.  Bounded FIFO so a long-lived session
# composing many joins never grows it unboundedly; semantic hashing
# means a re-read of the same source with the same plan reuses the
# measurement.  The file fingerprint keeps the memo honest across
# INGEST: semanticHash is a function of the plan, not the data, so new
# part files appended under the same path would otherwise keep
# resurrecting a stale share (performance-only staleness — salting is
# result-invariant — but a wrong salt factor for the session's
# lifetime).
_PROBE_CACHE: dict = {}
_PROBE_CACHE_MAX = 256


def _input_fingerprint(df: DataFrame) -> int:
    """Hash of the plan's resolved input file list (empty for
    non-file sources).  Parquet ingest only ever ADDS part files, so
    any append/overwrite under the same path changes the list; the
    listing itself comes from the already-analyzed plan's file index,
    not a fresh directory walk."""
    try:
        return hash(tuple(sorted(df.inputFiles())))
    except Exception:  # pragma: no cover - non-file / barrier plans
        return 0


def _probe_max_key_share(big: DataFrame, big_key: str, sample_denom: int) -> float:
    try:
        cache_key = (
            big.semanticHash(),
            _input_fingerprint(big),
            big_key,
            sample_denom,
        )
    except Exception:  # pragma: no cover - analysis-barrier plans
        cache_key = None
    if cache_key is not None and cache_key in _PROBE_CACHE:
        return _PROBE_CACHE[cache_key]
    probe = (
        big.filter(
            F.pmod(
                F.xxhash64(*[F.col(c) for c in big.columns]),
                F.lit(sample_denom),
            )
            == 0
        )
        .groupBy(big_key)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("mx"), F.sum("c").alias("tot"))
        .collect()
    )
    mx, tot = (probe[0]["mx"] or 0), (probe[0]["tot"] or 0)
    share = (mx / tot) if tot else 0.0
    if cache_key is not None:
        if len(_PROBE_CACHE) >= _PROBE_CACHE_MAX:
            _PROBE_CACHE.pop(next(iter(_PROBE_CACHE)))
        _PROBE_CACHE[cache_key] = share
    return share


def bloom_bitmap(
    small: DataFrame,
    key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """ONE-ROW DataFrame holding a Bloom filter of ``small``'s distinct
    ``key`` values as a sparse word->bits map (``__bloom``), plus the
    parameters the probe side needs.

    Build cost is one shuffle of the SMALL side only (distinct keys ->
    explode ``num_hashes`` bit positions -> ``bit_or`` per 64-bit
    word); the finished bitmap is at most ``num_bits/8`` bytes and is
    meant to be broadcast.  Hashing is Spark-internal ``xxhash64``
    (salted per hash function) — portability does not matter because a
    Bloom filter only ever PRE-filters: downstream joins stay exact,
    so no result can depend on the hash (false positives are removed
    by the real join; false negatives are impossible — every true
    key's bits are set by construction)."""
    bit_exprs = [
        F.pmod(F.xxhash64(F.col("k"), F.lit(j)), F.lit(num_bits))
        for j in range(num_hashes)
    ]
    return (
        small.select(F.col(key).alias("k"))
        .distinct()
        .select(F.explode(F.array(*bit_exprs)).alias("bit"))
        .select(
            (F.col("bit") / 64).cast("int").alias("w"),
            # shiftleft's bit-count arg must be a literal in the
            # python API; the SQL form accepts a column
            F.expr("shiftleft(1L, cast(bit % 64 as int))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("word"))
        .agg(
            F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("__bloom")
        )
        .select(
            "__bloom",
            F.lit(num_bits).alias("__bloom_bits"),
            F.lit(num_hashes).alias("__bloom_hashes"),
        )
    )


def bloom_prefilter(
    big: DataFrame,
    big_key: str,
    small: DataFrame,
    small_key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Filter ``big`` down to rows whose ``big_key`` MIGHT appear in
    ``small`` (a guaranteed SUPERSET of the true semi-join: false
    positives at the Bloom rate, zero false negatives).

    This is the explicit form of Spark's runtime row-level bloom join,
    for when the optimizer cannot inject it — across a storage or
    stage boundary, in streaming-static joins, or when the build side
    is only available as a DataFrame.  At 100 TB the point is shuffle
    avoidance: the big side is cut to ~(selectivity + fpr) BEFORE the
    join exchange, for the price of one broadcast of a <=num_bits/8-
    byte bitmap and ``num_hashes`` cheap hashes per probe row — no
    shuffle of the big side is added (the filter runs inside its
    scan stage).

    Key types: ``xxhash64`` is TYPE-DEPENDENT (int, bigint and string
    encodings of the same value hash differently), so hashing the two
    sides as-is would silently drop true matches whenever the key
    columns' types differ — a case the plain join handles via implicit
    casts.  Differing integral types are therefore widened to bigint
    on BOTH sides (lossless) before hashing; any other type mismatch
    raises instead of risking false negatives."""
    big_t = big.schema[big_key].dataType.typeName()
    small_t = small.schema[small_key].dataType.typeName()
    probe_key = f"`{big_key}`"
    if big_t != small_t:
        integral = {"byte", "short", "integer", "long"}
        if big_t in integral and small_t in integral:
            small = small.withColumn(
                small_key, F.col(small_key).cast("bigint")
            )
            probe_key = f"cast(`{big_key}` as bigint)"
        else:
            raise ValueError(
                f"bloom key type mismatch: {big_key}:{big_t} vs "
                f"{small_key}:{small_t} — xxhash64 is type-dependent, "
                "so differing non-integral key types would silently "
                "drop true matches; cast the keys to a common type "
                "first"
            )
    bm = bloom_bitmap(small, small_key, num_bits, num_hashes)
    probe = big.crossJoin(F.broadcast(bm))
    cond = F.lit(True)
    for j in range(num_hashes):
        bit = f"pmod(xxhash64({probe_key}, {j}), {num_bits})"
        test = (
            f"(shiftrightunsigned(coalesce(element_at(__bloom, "
            f"cast({bit} / 64 as int)), 0L), cast({bit} % 64 as int)) & 1) = 1"
        )
        cond = cond & F.expr(test)
    return probe.filter(cond).drop("__bloom", "__bloom_bits", "__bloom_hashes")


def bloom_semi_join(
    big: DataFrame,
    big_key: str,
    small: DataFrame,
    small_key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """EXACT left-semi join with a Bloom pre-filter: bloom_prefilter
    removes the overwhelming majority of non-matching big-side rows
    inside the scan stage, then a real ``left_semi`` join removes the
    Bloom's false positives — the result is bit-identical to
    ``big.join(small, key, "left_semi")`` (shared oracle), but the
    exchange only ever sees the surviving sliver."""
    pref = bloom_prefilter(big, big_key, small, small_key, num_bits, num_hashes)
    keys = small.select(F.col(small_key).alias(small_key)).distinct()
    return pref.join(keys, pref[big_key] == keys[small_key], "left_semi")


def auto_salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    how: str = "left",
    target_parallelism: int = 32,
    sample_denom: int = 64,
) -> DataFrame:
    """Skew-ADAPTIVE equi-join: measure the big side's hottest-key
    share from a deterministic 1/``sample_denom`` row sample (one
    cheap aggregate, ONE scalar row to the driver), then pick the
    salt factor `ceil(max_share * target_parallelism)` — 1 (plain
    join) for uniform keys, up to ``target_parallelism`` when one key
    owns the table.  This automates the judgement call
    join_key_skew_report surfaces: replication cost is paid only in
    proportion to measured skew, and any choice yields the same rows
    (salting is result-invariant), so the probe can never be *wrong*,
    only suboptimal.

    Row-level (not key-level) sampling: a hot key's rows are
    many, so its sampled count concentrates at true/denom — the
    share estimate is tight exactly for the keys that matter.
    AQE's skew-join handles residual imbalance either way.

    NOTE this function is EAGER: the probe executes a sampled scan of
    the big side AT CALL TIME (the salt factor shapes the returned
    plan, so it cannot be deferred to action time).  Callers composing
    plans lazily should call it once and reuse the result; repeated
    calls on a semantically-identical input reuse the memoized probe
    below instead of re-scanning.
    """
    import math

    share = _probe_max_key_share(big, big_key, sample_denom)
    num_salts = max(1, min(target_parallelism, math.ceil(share * target_parallelism)))
    if num_salts == 1:
        return big.join(small, big[big_key] == small[small_key], how)
    return salted_equi_join(big, small, big_key, small_key, num_salts, how)
