"""Local replica of the driver's t2 correctness gate: run every registered
query on Spark AND its DuckDB oracle over the same parquet, then compare
row counts, column names, and exact values (order-insensitive).

Stricter than the driver in one way: float columns are compared for exact
equality — our decimal-sum discipline is supposed to make both engines
produce bitwise-identical doubles, and this test is where that's enforced.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from gearpump_spark.queries import REGISTRY, _load

_load()

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle)
ROWS_ONLY_QUERIES = sorted(name for name, q in REGISTRY.items() if not q.oracle)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            dt = df[c]
            if getattr(dt.dtype, "tz", None) is not None:
                dt = dt.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = dt.astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_object_dtype(df[c]):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(duck_pdf)} (duckdb)"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    s, d = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in s.columns:
        sc, dc = s[c], d[c]
        if pd.api.types.is_float_dtype(sc) or pd.api.types.is_float_dtype(dc):
            sc, dc = sc.astype(float), dc.astype(float)
            mism = [
                (i, a, b)
                for i, (a, b) in enumerate(zip(sc, dc))
                if not (a == b or (math.isnan(a) and math.isnan(b)))
            ]
            assert not mism, (
                f"{name}.{c}: {len(mism)} float mismatches, first 5: {mism[:5]}"
            )
        else:
            mism = sc[sc.astype(str) != dc.astype(str)]
            assert mism.empty, (
                f"{name}.{c}: {len(mism)} mismatches, first: idx {mism.index[0]} "
                f"spark={sc[mism.index[0]]!r} duck={dc[mism.index[0]]!r}"
            )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, sf_dir, name):
    q = REGISTRY[name]
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    duck_pdf = duck.sql(q.oracle).df()
    _compare(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
    assert df.schema is not None


def test_parity_doc_query_names_exist():
    """Guard against doc rot: every backticked `q_*`/named query reference
    in PARITY.md must be a real registry entry."""
    import re

    text = open("PARITY.md").read()
    referenced = set(re.findall(r"`([a-z0-9_]+)`", text))
    known = set(REGISTRY)
    # names that look like queries (appear in the registry-name style)
    candidates = {
        n for n in referenced
        if n.startswith(("q", "dedup_", "sample_", "sketch_", "text_", "multimodal_",
                         "similarity_", "graph_", "kmeans_", "pipeline_", "doc_", "wordcount"))
        and not n.startswith(("q1", "q2")) or n in known
    }
    ghosts = {n for n in candidates if n not in known and "_" in n and not n.endswith((".py", ".md"))}
    # filter non-query identifiers referenced in prose (operators, files)
    ghosts = {g for g in ghosts if g.split("_")[0] in
              ("q", "dedup", "sample", "sketch", "text", "multimodal", "similarity",
               "graph", "kmeans", "pipeline", "doc") and g not in known}
    assert not ghosts, f"PARITY.md references unknown queries: {sorted(ghosts)}"
