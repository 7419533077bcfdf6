"""Operator library: dedup, similarity, retrieval (BM25 + inverted index),
bpe (real trainer/tokenizer), chunking, sketches, sampling, temporal,
graph, multimodal, physical (salting/bucketing).

Every operator is a pure DataFrame→DataFrame transform built from JVM-side
expressions wherever possible (codegen, no Python in the hot path), so each
inherits Spark's partitioning/shuffle machinery and scales to cluster data
sizes unchanged.
"""
