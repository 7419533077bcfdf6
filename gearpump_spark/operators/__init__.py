"""Operator library: dedup, similarity, text, multimodal, graph.

Every operator is a pure DataFrame→DataFrame transform built from JVM-side
expressions wherever possible (codegen, no Python in the hot path), so each
inherits Spark's partitioning/shuffle machinery and scales to cluster data
sizes unchanged.
"""
