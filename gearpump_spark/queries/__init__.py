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
    # ROUND-5 ROTATION. CORRECTNESS_r04 came back 100% green (48 hash-green
    # + 2 rows-only by construction), so the window policy (r3 verdict
    # #1/#6) now reads: (a) never-driver-verified queries go first — the 7
    # registered after the r4 window filled, then the 16 new r5 operators;
    # (b) every remaining slot re-verifies the LEAST-recently-verified
    # cohort, which is the round-1 relational/TPC-H suite (records now 4
    # rounds old).
    # tests/test_registry_order.py::test_window_prefers_least_recently_verified
    # enforces (b) mechanically against the CORRECTNESS_r*.json artifacts.
    #
    # -- never-sampled, oracle-backed (registered late-r4) --
    "multimodal_jfif_real",
    "multimodal_exif_real",
    "dedup_savings_report",
    "text_retrieval_eval",
    "q_moving_zscore",
    "dedup_duplicate_spans",
    # -- never-sampled, rows-only (power iteration: float dot-product
    #    reduction order is engine-specific; numpy golden holds exactness) --
    "embedding_top_pc",
    # -- new in r5, oracle-backed, never verified: temporal analytics
    #    (EWMA / gap interpolation / exact-median MAD), CDC snapshot diff,
    #    LM-quality text scores (rounded-log-term decimal-sum discipline),
    #    the AMS F2 sketch, Efraimidis-Spirakis weighted sampling, local
    #    clustering coefficients, the IVF recall gate, exact embedding
    #    centering, zone-map skip accounting, G.711 mu-law + QOI + TIFF
    #    real-byte decodes --
    "q_ewma_smooth",
    "q_interp_gapfill",
    "q_mad_outliers",
    "q_snapshot_diff",
    "text_unigram_logprob",
    "text_char_entropy",
    "sketch_ams_f2",
    "sample_weighted_reservoir",
    "graph_clustering_coeff",
    "similarity_ivf_recall",
    "multimodal_mulaw_real",
    "embedding_center_project",
    "q_file_skip_stats",
    "multimodal_qoi_real",
    "multimodal_tiff_pixels_real",
    # -- new in r5, rows-only (deflated power iteration; numpy golden) --
    "embedding_top_pcs",
    # -- late-r5, oracle-backed: growth accounting + user-flow matrix,
    #    drift monitors, data-quality audits, graph/codec additions --
    "q_running_distinct",
    "q_event_transitions",
    "graph_assortativity",
    "q_psi_drift",
    "text_kl_source_drift",
    "q_benford_digits",
    "q_fd_violations",
    "multimodal_wav_resample",
    "q_temporal_lookup",
    "graph_harmonic_centrality",
    "dedup_soft_weights",
    # -- re-verification: the full round-1 cohort minus the 7 most static
    #    scalar-expression queries (q_distinct, q_sort_limit, q_set_ops,
    #    q_count_distinct, q_scalar_string_date_math, q_json_extract,
    #    q_array_ops — pure built-in-function plans with no joins or state;
    #    they wait for r6). TPC-H analog suite first: --
    "q1_pricing_summary",
    "q2_min_acctbal_supplier",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q11_important_parts",
    "q12_ship_priority_class",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_count",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q19_disjunctive_revenue",
    "q20_excess_part_suppliers",
    "q21_last_shipper",
    "q22_idle_customers",
    # (q4/q6/q7/q8/q9/q10 of the TPC-H cohort, q_asof_join, q_range_join,
    # q_outer_join_counts, q_semi_join, q_anti_join — rotated to r6 as two late-r5 queries
    # took their slots; q_cross_join_broadcast, q_copurchase_pairs, q_rollup, q_cube,
    # q_pivot, q_unpivot, q_topk_per_group, q_window_running, q_lag_lead,
    # q_ntile, q_trailing_1h, q_sessionize, q_quantiles, q_agg_stats,
    # q_groupby_having, q_incremental_agg — r1-verified, stable code
    # paths — gave their re-verification slots to the sixteen
    # never-verified r5 queries above; they re-verify in r6 together
    # with the 7 scalar-expression queries already queued there)
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
