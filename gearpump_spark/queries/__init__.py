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
DRIVER_SAMPLE_WINDOW_ROUND = 10

DRIVER_SAMPLE_WINDOW = [
    # ROUND-10 ROTATION (r9 verdict "Next round" #2). Policy unchanged:
    # never-driver-oracle-verified first, then the stalest records; ZERO
    # slots on rows-only queries — a rows-only re-sample buys no new
    # signal once a rows-only record exists (the r9 window's one lapse,
    # multimodal_phash_neardup, is exactly what this list must not
    # repeat; the staleness ratchet in tests/test_registry_order.py
    # encodes the policy).
    #
    # -- the nine r10 additions (never sampled by construction): the
    #    unigram-LM Viterbi segmenter, the six streaming queries
    #    (sliding panes, replay dedup, merging session windows,
    #    update-mode running state, inner and LEFT OUTER stream-stream
    #    interval joins), the DSIR example selector, and the composed
    #    media curation pipeline. --
    "text_sentencepiece_tokens",
    "q_window_sliding_stream",
    "q_stream_dedup_replay",
    "q_session_window_stream",
    "q_running_aggregate_stream",
    "q_stream_stream_join",
    "q_stream_join_outer",
    "sample_dsir_select",
    "pipeline_media_dedup_shard",
    # -- the full remaining round-4 cohort (33 oracle-backed queries
    #    whose newest green is CORRECTNESS_r04, 6 rounds stale — the
    #    16 other r4 records were re-greened in the r9 window). --
    "dedup_canonical_pick",
    "dedup_simhash",
    "dedup_fuzzy_names",
    "dedup_cdc_chunks",
    "embedding_quantize_pq",
    "embedding_quantize_int8",
    "embedding_quantize_int4",
    "embedding_random_projection",
    "embedding_matryoshka",
    "similarity_topk_pq_adc",
    "similarity_topk_ivfpq",
    "similarity_hard_negatives",
    "text_gopher_rules",
    "text_length_band_filter",
    "text_blocklist_filter",
    "text_bpe_exact",
    "text_hybrid_rrf",
    "text_oov_rate",
    "sample_cluster_split",
    "sample_negative_pairs",
    "sample_unimax_mix",
    "graph_degree_distribution",
    "sketch_hll_registers",
    "sketch_hll_union",
    "sketch_kmv_distinct",
    "sketch_theta_overlap",
    "q_merge_into",
    "q_scd2_history",
    "q_ohlc_downsample",
    "q_gap_detection",
    "q_first_touch_attribution",
    "q_zorder_layout",
    "q_compaction_plan",
    # -- 8 of the 48 round-5 records (5 rounds stale), registration
    #    order; the remaining 40 head the r11 rotation. --
    "dedup_duplicate_spans",
    "multimodal_jfif_real",
    "dedup_savings_report",
    "text_retrieval_eval",
    "multimodal_exif_real",
    "text_unigram_logprob",
    "text_char_entropy",
    "graph_clustering_coeff",
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
