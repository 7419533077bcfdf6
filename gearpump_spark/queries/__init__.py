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
DRIVER_SAMPLE_WINDOW_ROUND = 7

DRIVER_SAMPLE_WINDOW = [
    # ROUND-7 ROTATION (re-authored mid-round when the r7 second wave
    # registered). Policy: every NEVER-verified oracle-backed query gets
    # a slot before any re-verification — 31 such queries exist now (the
    # 8 first-wave r6 backlog the r6 verdict names, the 8 r7 first-wave
    # additions, and the 15 r7 second..fifth-wave additions), so the
    # remaining 19 slots re-verify the stalest records, all from round 2.
    # The 23 r2 queries this displaces (the window held the full 42-query
    # r2 cohort before the new waves landed) keep their round-2 records
    # and head the r8 rotation — never-verified > stale is the
    # preference test_window_prefers_least_recently_verified encodes
    # (never-verified queries have no record to be judged fresher than an
    # excluded one's).
    #
    # -- never-sampled, oracle-backed (registered mid-r6) --
    "multimodal_alaw_real",
    "dedup_containment",
    "dedup_url_canonical",
    "q_asof_tolerance_join",
    "embedding_covariance",
    "similarity_range_search",
    "text_zipf_fit",
    "sketch_hll_sparse",
    # -- never-sampled, oracle-backed (r7 first wave): integer
    #    personalized PageRank, theta A-NOT-B, HLL++ switchover audit,
    #    percentile bands, integer top-PC, Adam7 interlace audit, PMI
    #    collocations, group-wise mode --
    "graph_pagerank_personalized_int",
    "sketch_theta_anotb",
    "sketch_hll_switchover",
    "q_percentile_bands",
    "embedding_top_pc_int",
    "multimodal_png_adam7_real",
    "text_pmi_bigrams",
    "q_mode_per_group",
    # -- never-sampled, oracle-backed (r7 second wave): weighted integer
    #    PageRank, HLL intersection w/ error band, Cavnar-Trenkle q-gram
    #    language distance, longest duplicated n-gram ladder, bottom-k
    #    rank-error audit, PackBits TIFF decode --
    "graph_pagerank_weighted_int",
    "sketch_hll_intersection",
    "text_qgram_lang_distance",
    "text_longest_dup_ngram",
    "sketch_bottomk_rank_error",
    "multimodal_tiff_packbits_real",
    # -- never-sampled, oracle-backed (r7 third wave): time-decayed
    #    counts, curriculum ordering, feature hashing, BMP RLE8 decode --
    "q_decay_counts",
    "sample_curriculum_order",
    "text_hashed_ngram_features",
    "multimodal_bmp_rle8_real",
    # -- never-sampled, oracle-backed (r7 fourth wave): weighted
    #    personalized PageRank, Cavnar-Trenkle language attribution,
    #    day-of-month activity bitmaps, bigram-LM perplexity --
    "graph_pagerank_weighted_personalized_int",
    "text_lang_attribution",
    "q_activity_bitmaps",
    "text_bigram_lm_perplexity",
    # -- never-sampled, oracle-backed (r7 fifth wave): the LSH banding
    #    S-curve audit with the scale-adaptive sample rate --
    "dedup_lsh_scurve",
    # -- round-2 records, 5 rounds stale (19 of the 42-query r2 cohort;
    #    the other 23 are the head of the r8 rotation). Dedup family --
    "dedup_clusters",
    "dedup_minhash_signature",
    "dedup_semantic",
    # -- text-analysis suite --
    "text_bm25_topk",
    "text_doc_stats",
    "text_pii_redact",
    "text_quality",
    # -- sampling / mixing suite --
    "sample_hash_10pct",
    "sample_pack_sequences",
    "sample_shuffle_order",
    # -- sketches --
    "sketch_bloom_join",
    "sketch_bloom_membership",
    "sketch_hll_distinct",
    # -- remaining r2 flagships: fingerprinting, similarity, multimodal
    #    metadata, the end-to-end quality pipeline, and the two r2
    #    rows-only records (iterative float fixpoints — the ratchet pulls
    #    them in because their rows-only records are the stalest left) --
    "doc_fingerprint",
    "similarity_topk",
    "multimodal_metadata",
    "pipeline_quality_dedup_sample",
    "graph_pagerank",
    "kmeans_clusters",
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
