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
# The round in which DRIVER_SAMPLE_WINDOW below was authored. The
# staleness ratchet (tests/test_registry_order.py) judges the window
# against the CORRECTNESS artifacts that existed BEFORE this round —
# the window's own results landing (CORRECTNESS_r{ROUND}.json, written
# by the driver AFTER the round's last commit) must not retroactively
# turn the tree red, which is exactly what happened at the r5/r6
# boundary (r5 VERDICT "What's wrong" #1). Bump this whenever the
# window rotates.
DRIVER_SAMPLE_WINDOW_ROUND = 6

DRIVER_SAMPLE_WINDOW = [
    # ROUND-6 ROTATION. CORRECTNESS_r05 came back 100% green (48 hash-green
    # + 2 rows-only by construction), so the policy holds: (a) the 7
    # queries registered after the r5 window filled go first (all
    # oracle-backed, all local-exact + swept to sf1 during r5); (b) every
    # remaining slot re-verifies the LEAST-recently-verified cohort — the
    # 34 remaining round-1 records (TPC-H q4/q6-q10, the join family,
    # rollup/cube/pivot/unpivot, window analytics, the scalar-expression
    # suite), then the stalest round-2 records fill the last 9 slots.
    # tests/test_registry_order.py::test_window_prefers_least_recently_verified
    # enforces (b) mechanically against the CORRECTNESS_r*.json artifacts.
    #
    # -- never-sampled, oracle-backed (registered late-r5): the 1-bit
    #    quantize + Hamming top-k + binary->cosine rerank cascade, MMR
    #    diversified rerank, capped neighborhood Jaccard, lossless JPEG
    #    (SOF3), winsorization --
    "embedding_quantize_binary",
    "similarity_topk_hamming",
    "similarity_binary_rerank",
    "similarity_mmr_rerank",
    "graph_jaccard_neighbors",
    "multimodal_jpeg_lossless_real",
    "q_winsorize",
    # -- round-1 records, 5 rounds stale: the full remaining r1 cohort.
    #    TPC-H analog suite first --
    "q4_order_priority",
    "q6_revenue_forecast",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    # -- the join family (the capability the reference entirely lacks,
    #    SURVEY §2.F) --
    "q_asof_join",
    "q_range_join",
    "q_semi_join",
    "q_anti_join",
    "q_outer_join_counts",
    "q_cross_join_broadcast",
    "q_copurchase_pairs",
    # -- grouping/rollup + window analytics --
    "q_rollup",
    "q_cube",
    "q_pivot",
    "q_unpivot",
    "q_topk_per_group",
    "q_window_running",
    "q_lag_lead",
    "q_ntile",
    "q_trailing_1h",
    "q_sessionize",
    "q_quantiles",
    "q_agg_stats",
    "q_groupby_having",
    "q_incremental_agg",
    # -- scalar-expression suite (pure built-in-function plans) --
    "q_distinct",
    "q_sort_limit",
    "q_set_ops",
    "q_count_distinct",
    "q_scalar_string_date_math",
    "q_json_extract",
    "q_array_ops",
    # -- round-2 records, next-stalest: flagship per-family picks fill the
    #    remaining 9 slots --
    "wordcount",
    "q_gbk_combine",
    "q_keyed_route",
    "q_window_tumbling",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    # -- new in r6, never verified: the window funnel, integer-threshold
    #    Poisson bootstrap, and integer CUSUM changepoint (the other 8 r6
    #    additions registered after these slots filled wait for r7:
    #    multimodal_alaw_real, dedup_containment, dedup_url_canonical,
    #    q_asof_tolerance_join, embedding_covariance,
    #    similarity_range_search, text_zipf_fit, sketch_hll_sparse) --
    "q_window_funnel",
    "sample_poisson_bootstrap",
    "q_cusum_changepoint",
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
