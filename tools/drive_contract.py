"""Simulate the driver: fresh SparkSession (driver-style, no gearpump_spark
session config), import __spark_entry__, smoke entry(), then run every
queries() entry against its oracle_sql() on DuckDB at sf0.01 with an
order-insensitive value-hash compare (columns sorted by name)."""
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

# Driver-style session: plain defaults, 200 shuffle partitions, no UTC pin.
# SPARK_GRAFT_SIM_DRIVER_MEM sizes the heap for large-SF gate runs only —
# the default (unset -> Spark's 1g) keeps sf0.01 runs faithful to the real
# driver, but the sf1 gate runs 100x the data through the same JVM and the
# wedge-heavy tier (graph_triangle_count) legitimately needs a real heap
# there (r8: AGGREGATE_OUT_OF_MEMORY at sf1 under the 1g default).
_builder = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim")
    .config("spark.ui.enabled", "false")
)
_sim_mem = os.environ.get("SPARK_GRAFT_SIM_DRIVER_MEM")
if _sim_mem:
    _builder = _builder.config("spark.driver.memory", _sim_mem)
spark = _builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

t0 = time.time()
df = E.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}, {time.time()-t0:.1f}s")
assert len(rows) > 0

qs = E.queries()
oracles = E.oracle_sql()
# Optional targeted run (e.g. the sf1 gate over a round's additions):
# SPARK_GRAFT_ONLY=name1,name2 restricts the sweep to those queries.
_only = os.environ.get("SPARK_GRAFT_ONLY")
if _only:
    keep = {n.strip() for n in _only.split(",") if n.strip()}
    missing = keep - set(qs)
    if missing:
        raise SystemExit(f"SPARK_GRAFT_ONLY names not registered: {sorted(missing)}")
    qs = {n: f for n, f in qs.items() if n in keep}
print(f"queries: {len(qs)}, oracles: {len(oracles)}")

import duckdb

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for name in "region nation customer supplier part orders lineitem events documents embeddings".split():
    # driver fixtures are single files; synthesized sets (tools/make_sf1.py)
    # are Spark-written directories — glob those for DuckDB
    path = f"{SF}/{name}.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")


def value_hash(pdf):
    pdf = pdf[sorted(pdf.columns)]
    h = hashlib.sha256()
    for _, row in pdf.sort_values(by=list(pdf.columns), kind="mergesort").iterrows():
        h.update(repr(tuple(row)).encode())
    return h.hexdigest()[:16]


import pandas as pd

fails = []
for name, fn in sorted(qs.items()):
    t0 = time.time()
    try:
        spdf = fn(spark, SF).toPandas()
    except Exception as ex:
        fails.append((name, f"spark error: {ex}"))
        print(f"  {name}: SPARK ERROR {ex}")
        continue
    dt = time.time() - t0
    if name not in oracles:
        print(f"  {name}: rows-only, {len(spdf)} rows, {dt:.1f}s")
        continue
    dpdf = con.sql(oracles[name]).df()
    # normalize timestamps to naive us, ints to int64, floats exact
    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if pd.api.types.is_datetime64_any_dtype(df[c]):
                dt_ = df[c]
                if getattr(dt_.dtype, "tz", None) is not None:
                    dt_ = dt_.dt.tz_convert("UTC").dt.tz_localize(None)
                df[c] = dt_.astype("datetime64[us]")
            elif pd.api.types.is_integer_dtype(df[c]):
                df[c] = df[c].astype("int64")
            elif pd.api.types.is_object_dtype(df[c]):
                df[c] = df[c].astype(str)
        return df
    s_, d_ = norm(spdf), norm(dpdf)
    ok_rows = len(s_) == len(d_)
    ok_hash = ok_rows and value_hash(s_) == value_hash(d_)
    status = "OK" if ok_hash else "MISMATCH"
    if not ok_hash:
        fails.append((name, f"rows {len(s_)} vs {len(d_)}, hash mismatch"))
    print(f"  {name}: {status} ({len(s_)} rows, {dt:.1f}s)")
    # Drop blocks the finished query left behind. localCheckpoint blocks
    # are PINNED (truncated lineage cannot be recomputed, so the unified
    # memory manager will not evict them): at sf1 block sizes, ~36
    # queries' leftovers exhausted the 16g pool mid-sweep (r8:
    # UNABLE_TO_ACQUIRE_MEMORY in stage 734, then a dead JVM). A real
    # driver runs one query per session; a sweep must clean between.
    try:
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    except Exception:
        pass

print(f"\n{len(fails)} failures")
for f in fails:
    print("FAIL:", f)
sys.exit(1 if fails else 0)
