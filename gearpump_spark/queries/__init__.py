"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers here as a named
query: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) an ANSI-SQL oracle string that DuckDB runs
over the same parquet files. The driver hash-compares both sides at
sf=0.01; column names/aliases MUST match between the two.

Determinism rules every registered query follows:
- No LIMIT without a total tie-breaking ORDER BY.
- Float aggregates rounded (summation order differs between engines).
- Timestamps stay native; the session is pinned to UTC.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from gearpump_spark.session import ensure_runtime_conf


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None → rows-only check
    desc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, desc: str = ""):
    """Decorator: add a query to the registry."""

    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_runtime_conf(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name, wrapped, oracle, desc)
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return {name: q.fn for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle}


_LOADED = False

# The driver's correctness gate samples the FIRST 50 registered queries, so
# the sample window is CURATED, not emergent: every operator family's
# flagship queries are pinned here explicitly, and _load() reorders the
# registry to put them first (remaining queries keep module import order).
# A name listed here but not registered is a hard error — the curation list
# cannot silently rot. tests/test_registry_order.py pins family coverage.
DRIVER_SAMPLE_WINDOW = [
    # ROUND-4 ROTATION. Policy (r3 verdict #1/#6): (a) every never-sampled
    # query windows first — after this round EVERY registered query has a
    # driver record; (b) the remaining slots re-verify the LEAST-recently-
    # verified cohort (the r1-verified relational/TPC-H suite — their
    # records are 3 rounds old) so stale greens can't hide regressions.
    # tests/test_registry_order.py::test_window_prefers_least_recently_verified
    # enforces (b) mechanically against the CORRECTNESS_r*.json artifacts.
    #
    # -- never-sampled, oracle-backed (incl. the r3 red, now fixed: array
    #    outputs serialize via array_join per the q_array_ops convention;
    #    and the three ex-rows-only fake-decoder ops, now with closed-form
    #    md5 oracles) --
    "embedding_quantize_int8",
    "q_merge_into",
    "embedding_quantize_int4",
    "multimodal_jpeg12_real",
    "multimodal_jpeg_411_real",
    "multimodal_frames",
    "multimodal_resize",
    "multimodal_features",
    # -- never-sampled, rows-only (approximate by construction; pytest
    #    goldens hold the exactness evidence) --
    "multimodal_phash_neardup",
    "text_bpe_bytes",
    # -- converted to oracle-backed in r4 (bit-deterministic: SimHash
    #    integer votes, seeded-md5 LSH hyperplanes, closed-form seed
    #    centroids) — their only records are rows-only, so a hash-checked
    #    slot is a strict upgrade over an r1 re-verification --
    "dedup_simhash",
    "similarity_topk_lsh",
    "similarity_topk_ivf_seeded",
    # -- new in r4, oracle-backed, never verified: the bit-reproducible
    #    iterative pair (integer PageRank / integer k-means — their float
    #    flagships can only ever be rows-only), the Z-order layout op, SCD
    #    Type-2 history, and SymSpell fuzzy matching --
    "graph_pagerank_int",
    "kmeans_clusters_int",
    "text_bpe_exact",
    "multimodal_ahash_neardup",
    "sketch_hll_registers",
    "q_zorder_layout",
    "q_scd2_history",
    "dedup_fuzzy_names",
    # -- new late-r4, oracle-backed, never verified: the PQ quantization/
    #    ADC-search pair (FAISS analog, integer micro-unit arithmetic) and
    #    the HLL register set-union (mergeability flagship) --
    "embedding_quantize_pq",
    "similarity_topk_pq_adc",
    "similarity_topk_ivfpq",
    "sketch_hll_union",
    "graph_kcore",
    "graph_label_propagation",
    "dedup_canonical_pick",
    "text_gopher_rules",
    "text_blocklist_filter",
    "sample_negative_pairs",
    "text_length_band_filter",
    "embedding_random_projection",
    "sample_unimax_mix",
    "graph_link_prediction",
    "multimodal_video_fps",
    "sample_cluster_split",
    "dedup_cdc_chunks",
    "similarity_hard_negatives",
    "sketch_kmv_distinct",
    "q_compaction_plan",
    "text_hybrid_rrf",
    "q_ohlc_downsample",
    "sketch_theta_overlap",
    "graph_khop_reach",
    "text_oov_rate",
    "embedding_matryoshka",
    "graph_degree_distribution",
    "q_gap_detection",
    "q_first_touch_attribution",
    # -- re-verification: last driver record is round 1 (oldest cohort) --
    # TPC-H analog suite
    # (q_asof_join, q_range_join, q1_pricing_summary, q2_min_acctbal_supplier,
    # q3_shipping_priority, q4_order_priority, q5_local_supplier_volume, q6_revenue_forecast, q7_volume_shipping, q8_market_share,
    # q9_product_profit, q10_returned_items, q11_important_parts,
    # q12_ship_priority_class, q13_customer_distribution, q14_promo_revenue,
    # q15_top_supplier, q16_supplier_count, q17_small_quantity_revenue,
    # q18_large_volume_customer — r1-verified,
    # stable code paths — gave their slots to the late-r4 never-verified
    # queries sample_negative_pairs/text_length_band_filter/
    # embedding_random_projection/sample_unimax_mix/graph_link_prediction/
    # multimodal_video_fps/sample_cluster_split/dedup_cdc_chunks/
    # similarity_hard_negatives/sketch_kmv_distinct/q_compaction_plan/
    # text_hybrid_rrf/q_ohlc_downsample/sketch_theta_overlap/
    # multimodal_jfif_real, dedup_savings_report, text_retrieval_eval,
    # q_moving_zscore, multimodal_exif_real —
    # registered after the window filled with never-verified queries —
    # wait for the r5 rotation (the <=8 in-flight bound in
    # test_registry_order covers them);
    # graph_khop_reach/text_oov_rate/embedding_matryoshka/
    # graph_degree_distribution above — after which the window is 100%
    # never-verified queries; q1/q2's r1 records remain the freshest-risk
    # items outside it;
    # q_rollup, q_cube, q_pivot, q_topk_per_group, q_window_running, q_lag_lead, q_trailing_1h,
    # q_sessionize — same r1-verified cohort — rotated out to hold the
    # window at exactly 50 as eight never-verified r4 queries took slots;
    # q_semi_join, q_anti_join, q_outer_join_counts,
    # q_cross_join_broadcast, q_copurchase_pairs, and now
    # q19_disjunctive_revenue/q20_excess_part_suppliers/q21_last_shipper/
    # q22_idle_customers — the most stable code paths in the cohort —
    # gave their slots to the nine late-r4 never-verified queries above)
]


def _load() -> None:
    """Import every query module (each registers on import), then reorder
    the registry so DRIVER_SAMPLE_WINDOW registers first."""
    global _LOADED
    if _LOADED:
        return
    import gearpump_spark.queries.llm  # noqa: F401
    import gearpump_spark.queries.sketches  # noqa: F401
    import gearpump_spark.queries.sampling  # noqa: F401
    import gearpump_spark.queries.dataflow  # noqa: F401
    import gearpump_spark.queries.temporal  # noqa: F401
    import gearpump_spark.queries.relational  # noqa: F401
    import gearpump_spark.queries.tpch_extra  # noqa: F401

    missing = [n for n in DRIVER_SAMPLE_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"DRIVER_SAMPLE_WINDOW names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in DRIVER_SAMPLE_WINDOW}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)

    _LOADED = True
