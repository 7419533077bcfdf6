"""Document chunking for context-window construction.

Training pipelines split long documents into overlapping token windows
("chunks") before packing them into fixed-length model contexts. This is a
pure narrow map — tokenize, generate window starts, slice — with NO shuffle
at all: at 100 TB each input split chunks independently and the output
inherits the scan's partitioning. The only wide operation a user might add
downstream (packing, global shuffle order) lives in operators/sampling.py.

Chunk semantics (mirrors HF tokenizers' overflow-with-stride, expressed so
DuckDB can replay it exactly):
- window starts at 0, stride, 2*stride, ... while start < n_tokens;
- a truncated tail window is kept only if it contributes at least one
  token beyond the previous window's end, i.e. start == 0 OR
  n_tokens > start + size - stride — otherwise the tail is already fully
  contained in its predecessor and would duplicate training text.

Reference provenance: the reference has no chunking operator (its tasks are
arbitrary user code, e.g. examples/streaming/wordcount Split at
Split.scala:30-40 is a flatMap); this is part of the LLM-pipeline surface
BASELINE.json commits us to beyond the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gearpump_spark.functions import text as TX


def chunk_by_tokens(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split each document into overlapping token windows.

    Returns (id_col, chunk_idx, tok_start, n_tokens, chunk_text), one row
    per kept window. Narrow map — zero exchanges; fan-out is bounded by
    ceil(n_tokens/stride) per document, so output partitions stay
    proportional to input splits (no skew beyond the documents' own).
    """
    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError("need 0 < stride <= size")
    tk = TX.tokens(F.col(text_col))
    base = docs.select(F.col(id_col), tk.alias("tk")).filter(F.size("tk") > 0)
    n = F.size("tk")
    starts = F.sequence(F.lit(0), n - 1, F.lit(stride))
    ex = base.select(
        id_col, "tk", F.posexplode(starts).alias("chunk_idx", "tok_start")
    ).filter(
        (F.col("tok_start") == 0)
        | (F.size("tk") > F.col("tok_start") + F.lit(size - stride))
    )
    chunk = F.slice(F.col("tk"), F.col("tok_start") + 1, size)
    return ex.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("tok_start").cast("long").alias("tok_start"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
