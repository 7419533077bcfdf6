"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()``   — every implemented operator from SURVEY.md §2 (+ the
                  LLM-pipeline extensions), as (spark, sf_dir) -> DataFrame.
``oracle_sql()``— DuckDB-equivalent SQL per query (omitted only for the
                  7 genuinely non-reproducible ops: iterative fixpoints
                  with order-dependent float math — float PageRank ×2,
                  k-means, float top-PCs ×2, Lloyd-refined IVF — plus
                  the float-DCT pHash pairing; every one has an
                  oracle-backed integer/greedy twin — the pagerank_int
                  family, kmeans_clusters_int, embedding_top_pc_int,
                  similarity_topk_ivf_seeded, multimodal_phash_int.
                  Both BPE tokenizers and the WordPiece encoder are
                  fully oracle-backed as of r8/r9).

Implementation lives in gearpump_spark/ — see gearpump_spark/queries/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1 pricing summary."""
    from gearpump_spark.queries import all_queries

    return all_queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gearpump_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from gearpump_spark.queries import all_oracles

    return all_oracles()
