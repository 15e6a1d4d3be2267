"""Physical-plan invariants — the 100 TB posture, kept honest in CI
(see plans/checks.py).  A refactor that drops a pushdown or degrades
a broadcast join to a shuffle join fails here, not on a cluster.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_analytics_cassandra_spark import queries as q
from real_time_data_analytics_cassandra_spark.catalog import table
from real_time_data_analytics_cassandra_spark.plans import (
    explain_str,
    has_broadcast_join,
    operator_count,
    pushed_filters,
    python_eval_free,
    unpartitioned_window_count,
    wholestage_codegen_count,
)
from tests.conftest import SF_SMOKE
import pytest


def test_point_lookup_filter_pushed_to_scan(spark):
    df = q.latest_info_point_lookup(spark, SF_SMOKE)
    pushed = pushed_filters(df)
    assert any("user_id" in f for f in pushed), pushed


def test_event_type_filter_pushed(spark):
    df = table(spark, SF_SMOKE, "events").filter(F.col("event_type") == "signup")
    pushed = pushed_filters(df)
    assert any("event_type" in f for f in pushed), pushed


def test_geo_query_uses_broadcast_join(spark):
    assert has_broadcast_join(q.geo_hourly_counts(spark, SF_SMOKE))


def test_subcategory_enrichment_uses_broadcast_join(spark):
    assert has_broadcast_join(q.subcategory_enrichment(spark, SF_SMOKE))


def test_top_n_compiles_to_take_ordered(spark):
    plan = explain_str(q.global_recent_customers(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan, plan


def test_pricing_summary_stays_in_codegen(spark):
    df = q.pricing_summary(spark, SF_SMOKE)
    assert wholestage_codegen_count(df) >= 1
    assert python_eval_free(df)


def test_text_operators_python_free(spark):
    """Text analysis must stay JVM-side (no row-at-a-time Python)."""
    for name in ("text_quality", "token_count", "lang_id", "dedup_exact"):
        assert python_eval_free(q.queries()[name](spark, SF_SMOKE)), name


def test_pricing_summary_prunes_columns(spark):
    plan = explain_str(q.pricing_summary(spark, SF_SMOKE))
    # ReadSchema on the lineitem scan must not include unused columns
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


def test_knn_broadcasts_queries_not_corpus(spark):
    plan = explain_str(q.knn_bruteforce(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_exact_topk_is_two_phase(spark):
    """The exact top-k family must rank through the salted partial
    window (operators/topk.py::bounded_topk_per_key): two Window
    nodes, so the final per-query exchange reads <= buckets*k rows per
    key instead of funneling the full scored corpus into |queries|
    tasks (VERDICT r5 item 2)."""
    for name in ("knn_bruteforce", "hard_negative_mining", "hybrid_search_rrf"):
        df = q.queries()[name](spark, SF_SMOKE)
        assert operator_count(df, "Window") >= 2, name


def test_band_range_join_broadcasts_dim(spark):
    """Non-equi band join must broadcast the literal dim, never
    shuffle the fact side."""
    plan = explain_str(q.price_band_stats(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_filtered_parts_predicates_pushed(spark):
    df = q.filtered_parts_stats(spark, SF_SMOKE)
    pushed = pushed_filters(df)
    joined = " ".join(pushed)
    for key in ("p_size", "p_type"):
        assert key in joined, pushed


def test_running_spend_single_shuffle(spark):
    """Both window functions share one (user_id) sort+shuffle."""
    df = q.purchase_running_spend(spark, SF_SMOKE)
    assert operator_count(df, "Exchange") == 1
    assert operator_count(df, "Window") == 1


def test_pivot_single_scan(spark):
    """Explicit pivot values -> exactly one scan of events."""
    df = q.hourly_type_pivot(spark, SF_SMOKE)
    assert operator_count(df, "Scan parquet") == 1


def test_multi_granularity_single_scan(spark):
    """All three granularities from ONE fact scan (explode, not a
    per-granularity union)."""
    df = q.new_count_multi_granularity(spark, SF_SMOKE)
    assert operator_count(df, "Scan parquet") == 1


def test_two_level_aggregates_scan_fact_once(spark):
    """Queries whose second aggregate re-aggregates the first's
    grouped output (Q20/Q11/Q21 shapes) must scan the fact ONCE —
    ReuseExchange shares the grouped shuffle; a refactor that
    re-derives the second aggregate from the raw fact fails here."""
    from real_time_data_analytics_cassandra_spark.plans import scan_count

    for name in (
        "dominant_part_suppliers",
        "part_value_share",
        "sole_return_suppliers",
    ):
        df = q.queries()[name](spark, SF_SMOKE)
        assert scan_count(df, "lineitem") == 1, name


def test_sole_return_suppliers_no_expand(spark):
    """Q21's distinct-supplier profile comes from re-aggregating the
    (orderkey, suppkey) groups — no Expand-based COUNT(DISTINCT)
    touches the raw fact."""
    df = q.sole_return_suppliers(spark, SF_SMOKE)
    assert operator_count(df, "Expand") == 0, explain_str(df)


def test_exists_semi_join_is_equi_keyed(spark):
    """The Q4-shape EXISTS must plan as a hash-partitioned semi join
    on orderkey (the non-equi date predicate rides along as a join
    condition) — never a nested loop over the fact table."""
    df = q.late_order_priority_counts(spark, SF_SMOKE)
    plan = explain_str(df)
    assert "LeftSemi" in plan, plan
    assert operator_count(df, "BroadcastNestedLoopJoin") == 0, plan
    assert operator_count(df, "CartesianProduct") == 0, plan


def test_small_quantity_revenue_single_shuffle(spark):
    """The Q17-shape scalar subquery is ONE window over l_partkey —
    a single scan and a single data shuffle (the second exchange is
    the SinglePartition gather of the already-partial-aggregated
    global sum: a handful of rows), no self-join rescan of
    lineitem."""
    df = q.small_quantity_revenue(spark, SF_SMOKE)
    assert operator_count(df, "Scan parquet") == 1, explain_str(df)
    assert operator_count(df, "Exchange") <= 2, explain_str(df)
    assert explain_str(df).count("hashpartitioning") == 1, explain_str(df)


def test_trailing_hour_stats_single_shuffle(spark):
    """Both trailing-hour window aggregates share one user_id
    exchange."""
    df = q.user_trailing_hour_stats(spark, SF_SMOKE)
    assert operator_count(df, "Exchange") == 1, explain_str(df)
    assert python_eval_free(df)


def test_user_event_paths_partial_aggregates(spark):
    """Ordered path agg still partial-aggregates map-side (two
    HashAggregate/ObjectHashAggregate levels around one exchange)."""
    df = q.user_event_paths(spark, SF_SMOKE)
    assert operator_count(df, "Exchange") == 1, explain_str(df)
    plan = explain_str(df)
    assert plan.count("Aggregate") >= 2, plan


def test_forecast_revenue_filters_pushed(spark):
    """Q6's whole predicate set must reach the parquet scan."""
    df = q.forecast_revenue(spark, SF_SMOKE)
    pushed = " ".join(pushed_filters(df))
    for key in ("l_shipdate", "l_discount", "l_quantity"):
        assert key in pushed, pushed


def test_nation_trade_volume_broadcasts_dims(spark):
    """Q7: both nation-side lookups broadcast; no nested loop."""
    df = q.nation_trade_volume(spark, SF_SMOKE)
    assert has_broadcast_join(df)
    assert operator_count(df, "BroadcastNestedLoopJoin") == 0


def test_decontaminate_broadcasts_eval_shingles(spark):
    """The corpus side must meet the eval set in a broadcast join —
    a shuffled corpus here would be the 100 TB bottleneck."""
    assert has_broadcast_join(q.decontaminate_overlap(spark, SF_SMOKE))


def test_repetition_filter_pure_projection(spark):
    """The sorted-run formulation is a pure projection: one documents
    scan, no join, and no AGGREGATION shuffle — the only allowed
    exchange is catalog.spread's adaptive round-robin split of an
    under-parallel scan."""
    df = q.repetition_filter(spark, SF_SMOKE)
    assert operator_count(df, "Scan parquet") == 1, explain_str(df)
    plan = explain_str(df)
    assert "Join" not in plan, plan
    assert "hashpartitioning" not in plan, plan
    assert operator_count(df, "HashAggregate") == 0, plan


def test_repetition_grouped_variant_matches(spark):
    """The shuffle-free and grouped forms are interchangeable."""
    from real_time_data_analytics_cassandra_spark.catalog import table
    from real_time_data_analytics_cassandra_spark.operators.text import (
        repetition_stats,
        repetition_stats_grouped,
    )

    docs = table(spark, SF_SMOKE, "documents")
    a = sorted(map(tuple, repetition_stats(docs, "doc_id", "text").collect()))
    cols = ["doc_id", "n_words", "distinct_word_ratio", "top_bigram_cnt", "top_bigram_frac"]
    b = sorted(
        map(
            tuple,
            repetition_stats_grouped(docs, "doc_id", "text").select(*cols).collect(),
        )
    )
    assert a == b


def test_part_value_share_single_fact_alignment(spark):
    """Q11: the global total is a broadcast scalar, and both
    aggregates partial-aggregate map-side (no driver collect)."""
    df = q.part_value_share(spark, SF_SMOKE)
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert python_eval_free(df)


def test_grouping_sets_single_shuffle(spark):
    """GROUPING SETS expands in one Expand + one aggregation —
    never one scan per set (each of the 4 source tables is scanned
    exactly once)."""
    df = q.geo_grouping_sets(spark, SF_SMOKE)
    assert operator_count(df, "Expand") == 1, explain_str(df)
    assert operator_count(df, "Scan parquet") == 4, explain_str(df)
    assert operator_count(df, "HashAggregate") == 2, explain_str(df)


def test_embedding_norm_stats_python_free(spark):
    """The norm fold is a JVM higher-order function, not a UDF."""
    assert python_eval_free(q.embedding_norm_stats(spark, SF_SMOKE))


# Batch queries that intentionally use Arrow-batched Python stages
# (mapInPandas / applyInPandas) — everything else must be JVM-only.
_ARROW_QUERIES = {
    "multimodal_decode_meta",
    "media_wav_decode",  # real RIFF parse via mapInPandas
    "media_png_decode",  # real zlib inflate + defilter via mapInPandas
    "media_png_adam7_decode",  # interlaced twin, same Arrow stage
    "media_png_palette_decode",  # 4-bit PLTE twin, same Arrow stage
    "media_png_gray16_decode",  # 16-bit twin, same Arrow stage
    "media_png_rgba_decode",  # 4-channel twin, same Arrow stage
    "media_ppm_decode",  # real P6 header token scan via mapInPandas
    "image_ahash_clusters",  # real PNG decode + aHash via mapInPandas
    "image_phash_near_dup",  # same Arrow signature stage, JVM past it
    "image_dhash_near_dup",  # gradient-hash twin, same Arrow stage
    "image_dup_components",  # same Arrow signature stage, JVM past it
    "audio_fingerprint_near_dup",  # real RIFF decode + envelope via mapInPandas
    "audio_spectral_near_dup",  # real RIFF decode + HK spectral hash, same Arrow stage
    "multimodal_features",
    "frame_samples",
    "audio_window_features",
    "embedding_near_dup",
    "embedding_near_dup_cells",
    "pack_context_windows",
    "knn_bruteforce",
    "hybrid_search_rrf",  # dense arm rides the knn broadcast + Arrow dot products
    "hard_negative_mining",  # broadcast anchors x corpus non-equi (label) join
    "ann_ivf",
    "ann_ivf_kmeans",
    "ann_pq",
    "ann_ivfpq",
    "incremental_ann_search",  # persisted-index probe, same Arrow stages
    "purchase_attribution_cogrouped",  # cogroup applyInPandas surface
    "multimodal_features_arrow",  # mapInArrow surface
    "weighted_median_prices_vudf",  # grouped-agg pandas_udf surface
    "embedding_pca_norms",
    "udtf_token_windows",
    "heavy_hitter_tokens",  # Misra-Gries partition summaries
    "semantic_dedup",  # cell assignment + per-cell greedy sweep
    "srp_near_dup",  # sign-bit GEMM signatures (dim x n_bits BLAS)
    "mmr_diverse_neighbors",  # per-query greedy MMR over the Arrow shortlist
    "ann_ivf_kmeans_refined",  # refined-centroid assignment + probe stages
}

# Queries where a broadcast nested loop is the intended plan (non-equi
# broadcast joins / tiny-side cross joins against 1-row aggregates).
_BNLJ_OK = {
    "knn_bruteforce",
    "hybrid_search_rrf",  # dense arm = knn broadcast-queries non-equi join
    "hard_negative_mining",  # broadcast anchors, label-mismatch BNLJ by design
    "bloom_prefiltered_part_revenue",  # 1-row bloom-bitmap broadcast
    "ann_ivf",
    "ann_ivf_kmeans",
    "price_band_stats",
    "top_supplier_revenue",
    "part_value_share",
    "value_histogram",
    "value_psi_drift",  # same 1-row range broadcast + 10-row ref broadcast
    "idle_high_balance_customers",
    "small_quantity_revenue",
    "tfidf_top_terms",
    "bm25_search",
    "bm25_search_persisted",  # same 1-row corpus-stats broadcast
    "incremental_bm25_search",  # same 1-row corpus-stats broadcast
    "length_bucket_stats",
    "rfm_scores",
    "value_zscores",
    "quality_filtered_docs",
    "hourly_value_interpolated",
    "value_deciles",
    "bigram_lm_doc_scores",  # 1-row vocabulary-size broadcast
    "lm_quality_buckets",  # same + 1-row tercile-boundary broadcast
    "source_mixture_weights",  # 1-row totals broadcast
    "event_hourly_ols_trend",  # 1-row first-hour broadcast
    "hourly_count_acf",  # 1-row totals/denominator + 24-row lag broadcasts
    "ks_test_purchase_values",  # 1-row arm-totals broadcast (twice)
    "mannwhitney_purchase_values",  # same 1-row arm-totals broadcast
    "source_length_ks_drift",  # source-enum grid + 1-row total broadcasts
    "source_length_psi",  # same source-enum grid + 1-row total broadcast
    "value_benford_audit",  # 1-row digit-total broadcast
    "purchase_mean_bootstrap_ci",  # 1-row CI-bound broadcasts
    "streaming_ks_drift",  # same 1-row arm-totals broadcasts as the batch KS
    "event_type_correlation_matrix",  # type-enum grid broadcast
    "hourly_spearman_matrix",  # same type-enum grid broadcast
    "hourly_dispersion_index",  # same type-enum grid broadcast
    "friedman_hourly_type_ranks",  # same type-enum grid broadcast
    "token_budget_mixture",  # 1-row budget + level broadcasts over the lang frame
    "curriculum_shards",  # 1-row per-shard-size broadcast over the ranked frame
    "heavy_hitter_tokens",  # 1-row error-mass broadcast
    "temperature_resample_langs",  # 1-row budget + kept-total broadcasts
    "data_quality_report",  # 1-row orphan/null-count broadcasts (FK check)
    "part_affinity",  # 1-row order-count broadcast for support/lift
    "pipeline_retention_funnel",  # per-stage 1-row threshold/total broadcasts
    "kmv_user_overlap",  # algebra over 1-row estimates of <=k-row sketches
    "join_size_estimate_cms",  # 1-row est label union (legacy allow)
    "nb_lang_classifier",  # 1-row vocab/doc-count + tiny lang-dim broadcasts
    "source_token_kl",  # 1-row corpus-total broadcast
    "chi2_type_daypart",  # 1-row N broadcast over the tiny cell frame
    "source_upsample_repeats",  # 1-row max-count broadcast for weights
    "revenue_concentration",  # 1-row n/total broadcasts over the rank frame
    "retention_survival_curve",  # 1-row corpus-horizon broadcast
    "doc_keywords",  # 1-row doc-count broadcast for the idf term
    "mmr_diverse_neighbors",  # knn's broadcast query x corpus non-equi join
    "ann_ivf_kmeans_refined",  # broadcast centroid/query non-equi probes
    "embedding_class_auc",  # 1-row total-rank broadcast over 10 label rows
}


def test_connected_components_plan_is_o1_not_o_iterations(spark):
    """Lineage truncation: the iterative label-propagation loop must
    localCheckpoint each iteration, so the RETURNED frame's plan is a
    leaf scan — not an unrolled O(iterations) join tree (previously
    ~208 exchanges for dedup_clusters; a driver-side scale-killer)."""
    from real_time_data_analytics_cassandra_spark.operators.graph import (
        connected_components,
    )

    # A path graph: 0-1-2-...-12 forces ~log-diameter iterations of
    # min-label propagation before convergence.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    comp = connected_components(edges)
    plan = explain_str(comp)
    n_exchanges = plan.count("Exchange") // 2  # tree + detail listing
    assert n_exchanges <= 2, f"unrolled plan leaked through: {plan[:2000]}"
    assert "ExistingRDD" in plan or "Scan" in plan
    # correctness unchanged: one component labelled by the min id
    rows = comp.collect()
    assert len(rows) == 13 and all(r.component == 0 for r in rows)


def test_build_vocab_rank_window_is_post_takeordered(spark):
    """The vocabulary rank window must NOT run over the whole
    distinct-token relation (billions of noisy singletons at 100 TB
    in one task).  build_vocab cuts top-V with orderBy().limit()
    first — a distributed TakeOrdered — and only the <= vocab_size
    survivors reach the unpartitioned id-assignment window."""
    from real_time_data_analytics_cassandra_spark.operators.text import build_vocab

    docs = table(spark, SF_SMOKE, "documents")
    vocab = build_vocab(docs, "doc_id", "text", vocab_size=20)
    plan = explain_str(vocab)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    # The window must sit ABOVE the TakeOrdered cut, i.e. the global
    # sort for the window consumes the limited relation, not the raw
    # token counts: in the formatted plan the Window's child chain
    # contains the TakeOrderedAndProject node.
    win_pos = plan.find("Window")
    take_pos = plan.find("TakeOrderedAndProject")
    assert 0 <= win_pos < take_pos, (win_pos, take_pos)


def test_runtime_bloom_filter_prunes_shuffle_join(spark):
    """Shuffle-pruning posture for big x big joins at scale: when the
    build side carries a selective filter and the join cannot
    broadcast, Catalyst injects a runtime BLOOM FILTER on the probe
    side (might_contain over a bloom_filter_agg subquery), so the big
    side's shuffle writes only rows that can possibly match — the
    Spark-native analog of a semi-join reducer.  Thresholds are
    production-scale; the test lowers the probe-side floor so the
    optimization fires on fixture sizes, then asserts the plan shape."""
    from real_time_data_analytics_cassandra_spark.catalog import table as t

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = t(spark, SF_SMOKE, "lineitem")
        orders = t(spark, SF_SMOKE, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_orderpriority"
        )
        plan = explain_str(joined).lower()
        assert "might_contain" in plan or "bloomfilter" in plan, plan[:3000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# Unpartitioned (empty PARTITION BY) windows funnel their input
# through ONE task — allowed only where the windowed relation is
# bounded by CONSTRUCTION, never by data volume.  name -> (max spec
# count, the bound).  Anything else planning a global window fails
# the sweep — this automates the audit the round-7 review did by
# hand ("remaining unpartitioned windows all run over bounded or
# pre-truncated relations — verified individually").
_GLOBAL_WINDOW_OK = {
    "bm25_search": (1, "rank over the <= k retrieved results"),
    "bm25_search_persisted": (1, "rank over the <= k retrieved results"),
    "incremental_bm25_search": (1, "rank over the <= k retrieved results"),
    "curriculum_shards": (1, "shard boundaries over the <= n_shards row frame"),
    "customer_spend_rank": (1, "global_rank offsets: <= num_partitions rows"),
    "embedding_label_auc": (1, "global_rank offsets: <= num_partitions rows"),
    "embedding_class_auc": (2, "global_rank offsets, reused per class"),
    "heavy_hitter_tokens": (1, "rank over the <= k Misra-Gries summary"),
    "ks_test_purchase_values": (2, "global_cumsum offsets: <= num_partitions rows"),
    "mannwhitney_purchase_values": (1, "global_cumsum offsets: <= num_partitions rows"),
    "kruskal_wallis_value_by_type": (1, "global_cumsum offsets: <= num_partitions rows"),
    "order_backlog_daily": (1, "running sum over the per-DAY relation (calendar-bounded)"),
    "part_affinity": (1, "rank over the TakeOrdered(20) survivors"),
    "purchase_mean_bootstrap_ci": (2, "CI rank over the B=100 resample means"),
    "retention_survival_curve": (1, "KM product over the per-day relation (calendar-bounded)"),
    "revenue_concentration": (2, "global_rank offsets + Lorenz over them"),
    "token_budget_mixture": (6, "per-level cuts over the <= |langs| mixture frame"),
    "vocab_encode_docs": (1, "id assignment over the <= vocab_size TakeOrdered cut"),
    "token_zipf_fit": (1, "rank over the <= K TakeOrdered cut"),
    "weighted_token_sample": (1, "rank over the <= k weighted sample"),
}


@pytest.mark.slow
def test_registry_wide_plan_hygiene(spark):
    """Every batch registry query must plan without a CartesianProduct
    and without row-at-a-time Python (BatchEvalPython); Arrow stages
    are allowed only where declared; unpartitioned windows only over
    construction-bounded relations (named in _GLOBAL_WINDOW_OK with
    the bound).  Streaming and environment-dependent queries are
    exercised by their own gates."""
    skip = {n for n in q.queries() if n.startswith("streaming_")} | {
        "amqp_replay_type_counts",  # local dump fixture, covered by its gate
        "dedup_clusters",  # iterative; cross-checked by recursive-CTE oracle
        "part_copurchase_components",  # iterative star contraction, same gate
        "part_copurchase_kcore",  # iterative peeling, unrolled-CTE oracle
        "part_copurchase_coreness",  # iterative h-index, unrolled-CTE oracle
        "copurchase_hub_hop_histogram",  # iterative BFS, recursive-CTE oracle
        "incremental_dedup_clusters",  # iterative + persisted fixture, own gates
        "dedup_cluster_representatives",
    }
    failures = []
    for name, fn in sorted(q.queries().items()):
        if name in skip:
            continue
        df = fn(spark, SF_SMOKE)
        plan = explain_str(df)
        if "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct")
        if "BatchEvalPython" in plan:
            failures.append(f"{name}: row-at-a-time Python")
        if name not in _ARROW_QUERIES and (
            "MapInPandas" in plan
            or "FlatMapGroupsInPandas" in plan
            or "ArrowEvalPython" in plan
        ):
            failures.append(f"{name}: undeclared Arrow stage")
        if name not in _BNLJ_OK and "BroadcastNestedLoopJoin" in plan:
            failures.append(f"{name}: unexpected BroadcastNestedLoopJoin")
        n_glob = unpartitioned_window_count(df)
        cap = _GLOBAL_WINDOW_OK.get(name, (0, "not allowlisted"))[0]
        if n_glob > cap:
            failures.append(
                f"{name}: {n_glob} unpartitioned window(s), allowed {cap}"
            )
    assert not failures, failures


@pytest.mark.slow
def test_lineitem_never_under_broadcast_exchange(spark):
    """Fact-never-broadcast invariant across the TPC-H join family:
    a dim subtree whose size estimate blows past the fact's can flip
    the planner into broadcasting LINEITEM itself (BuildLeft over the
    600k-row fact was the round-8..10 nation_trade_volume drift — at
    production scale that plan is catastrophic).  The fix keeps dim
    subtrees as pure base-table filters; this gate keeps it fixed."""
    from real_time_data_analytics_cassandra_spark.plans import (
        broadcast_scanned_tables,
    )

    family = [
        "nation_trade_volume",
        "market_share_by_year",
        "profit_by_nation_year",
        "sole_return_suppliers",
        "dominant_part_suppliers",
        "cheapest_supplier_per_part",
        "returned_items_top_customers",
        "part_supplier_variety",
        "disjunctive_parts_revenue",
        "bloom_prefiltered_part_revenue",
        "top_supplier_revenue",
        "revenue_by_nation",
        "pricing_summary",
    ]
    for name in family:
        tables = broadcast_scanned_tables(q.queries()[name](spark, SF_SMOKE))
        assert "lineitem" not in tables, (name, tables)
