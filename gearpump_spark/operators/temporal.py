"""Temporal join/session operators the reference's users hand-roll inside
Task.onNext (the reference has no joins at all — SURVEY.md §2.F), expressed
as scalable DataFrame compositions.

Scale design notes (these run at 100 TB):
- `asof_join` is the union/sort/carry-forward formulation: ONE shuffle on
  the key, one sort within partitions, zero row blow-up. The naive
  formulation (theta-join on ts <= ts then argmax) explodes to
  O(left x right per key) intermediate rows; this one is O(left + right).
- `sessionize` is lag + cumulative-sum over a keyed window: one shuffle on
  the key, sessions assigned without any self-join.
- `range_join` keeps Catalyst's conditional join but pre-buckets both
  sides onto a time grid so the join condition gains an equality component
  (key, bucket) — without it, a pure inequality join degenerates to
  broadcast-nested-loop at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts for the same key (backward as-of join).

    Implementation: tag both sides, union on (key, ts), then
    last(right_struct, ignorenulls) over a keyed window ordered by
    (ts, side) — right rows sort before left rows at equal ts so a tie
    matches (<=). One shuffle, no row explosion.

    tolerance: optional max staleness (e.g. '3600 seconds'); matches older
    than left_ts - tolerance are nulled out.

    Ties: multiple right rows sharing (key, right_ts) resolve to the one
    with the greatest (right_ts, *right_cols) struct — deterministic under
    any partitioning (requires orderable right_cols types; no maps).
    """
    right_cols = right_cols or [c for c in right.columns if c not in (key, right_ts)]
    rstruct = F.struct(F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols])

    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(rstruct.alias("x")).schema["x"].dataType
        ).alias("__r"),
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("x"))
            .schema["x"].dataType
        ).alias("__l"),
        rstruct.alias("__r"),
    )
    # __r as final sort key: equal-(ts, side) right rows otherwise sort in
    # partition-dependent order and last() would pick an arbitrary one.
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side", "__r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance:
        too_old = F.col("__match.__rts") < F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
        merged = merged.withColumn(
            "__match", F.when(too_old, F.lit(None)).otherwise(F.col("__match"))
        )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("__match.__rts").alias(f"{right_ts}{suffix}"))
    out_cols += [F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_cols]
    return merged.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    bucket: str | None = None,
) -> DataFrame:
    """Join right rows whose right_ts falls in
    [left_ts + lower, left_ts + upper) for the same key.

    bucket (e.g. '1 hour'): bucketize both sides onto a grid no finer than
    the range width and join on (key, bucket) + the range predicate, giving
    the shuffle an equality component. The left side explodes one row per
    covered bucket — bounded by ceil(range/bucket)+1, a constant.
    """
    lo = F.col(left_ts) + F.expr(f"INTERVAL {lower}")
    hi = F.col(left_ts) + F.expr(f"INTERVAL {upper}")
    if bucket is None:
        return left.join(
            right,
            (left[key] == right[key]) & (F.col(right_ts) >= lo) & (F.col(right_ts) < hi),
        )
    from gearpump_spark.streaming.core import _duration_us

    # Both sides must land on the SAME epoch-anchored grid of width
    # `bucket`; date_trunc to a fixed unit would mis-align any bucket that
    # is not exactly that unit and silently drop in-range matches.
    bucket_us = _duration_us(bucket)

    def grid(col):
        us = F.unix_micros(col)
        return F.timestamp_micros(us - F.pmod(us, F.lit(bucket_us)))

    step = F.expr(f"INTERVAL {bucket}")
    l_b = left.withColumn("__bucket", F.explode(F.sequence(grid(lo), grid(hi), step)))
    r_b = right.withColumn("__bucket", grid(F.col(right_ts)))
    cond = (
        (l_b[key] == r_b[key])
        & (l_b["__bucket"] == r_b["__bucket"])
        & (r_b[right_ts] >= l_b[left_ts] + F.expr(f"INTERVAL {lower}"))
        & (r_b[right_ts] < l_b[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return l_b.join(r_b, cond).drop(l_b["__bucket"]).drop(r_b["__bucket"])


def sessionize(
    df: DataFrame, key: str, ts: str = "ts", gap: str = "30 minutes"
) -> DataFrame:
    """Assign batch session ids: a new session starts when the gap since
    the previous event of the same key exceeds `gap`. Adds `session_id`
    (0-based per key, ordered by ts).

    Streaming equivalent: F.session_window(ts, gap) under a watermark —
    same semantics, state-store managed. The reference cannot express
    sessions at all (merging windows rejected,
    experiments/beam/.../GroupByKeyTranslator.java:43-47).
    """
    from gearpump_spark.streaming.core import _duration_us

    gap_us = _duration_us(gap)
    w = Window.partitionBy(key).orderBy(ts)
    prev = F.lag(ts).over(w)
    new_session = (
        prev.isNull() | (F.unix_micros(F.col(ts)) - F.unix_micros(prev) > F.lit(gap_us))
    ).cast("long")
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - 1,
    )


def latest_by_key(df: DataFrame, key_cols: list[str], ts_col: str, tiebreak: str) -> DataFrame:
    """Upsert view / log compaction: the most recent row per key.

    The streaming-table duality primitive — a changelog stream compacts to
    its latest-value table (the reference has no table concept at all; its
    users keep a HashMap per task, Sum.scala:26-60). `max_by` runs as a
    single partial-aggregating pass: one shuffle of one row per key, no
    window sort. Ties on ts are broken by the highest `tiebreak` value so
    the result is deterministic under replay (requires tiebreak unique per
    (key, ts) — e.g. an event id).

    All non-key columns are selected through ONE max_by over a packed
    struct, so the output row is always an actual input row — independent
    per-column max_by calls could tear a row by resolving a full tie
    differently during partial aggregation.
    """
    ordering = F.struct(F.col(ts_col), F.col(tiebreak))
    others = [c for c in df.columns if c not in key_cols]
    packed = F.max_by(F.struct(*[F.col(c) for c in others]), ordering).alias("_row")
    return df.groupBy(*key_cols).agg(packed).select(*key_cols, "_row.*")


def scd2_history(
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    tiebreak: str,
) -> DataFrame:
    """Build a slowly-changing-dimension Type-2 history from a change
    stream: one output row per (key, attribute-state) RUN, with
    `valid_from` = first timestamp of the run, `valid_to` = start of the
    next run (NULL while current), `is_current` on the open row.

    Classic warehouse operator the reference has no analog for (its state
    API keeps only the latest value per key — NonWindowState,
    streaming/.../NonWindowState.scala); lakehouses get it from MERGE +
    manual close-out, here it is one declarative pipeline:

      1. window lag over (key ORDER BY ts, tiebreak) marks change points
         (attr differs from previous row, null-safe);
      2. cumulative sum of the change flag numbers the runs;
      3. groupBy (key, run) takes min(ts) = valid_from;
      4. lead(valid_from) over (key ORDER BY run) closes each version.

    Scale shape: ONE shuffle on the key (steps 1-2 and 4 reuse the same
    hash partitioning; step 3 is a partial-agg groupBy on a superset of
    the window key). No self-join, no row blow-up; ties broken totally by
    `tiebreak` so the history is deterministic under re-runs.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak)
    changed = F.lit(False)
    for a in attr_cols:
        prev = F.lag(F.col(a)).over(w)
        changed = changed | ~F.col(a).eqNullSafe(prev)
    # first row of each key has lag NULL on every attr -> eqNullSafe False
    # -> changed True, so run numbering starts at 1
    runs = updates.withColumn(
        "__run", F.sum(F.when(changed, 1).otherwise(0)).over(w)
    )
    versions = runs.groupBy(*key_cols, "__run").agg(
        *[F.first(a).alias(a) for a in attr_cols],
        F.min(ts_col).alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    wv = Window.partitionBy(*key_cols).orderBy("__run")
    return versions.select(
        *key_cols,
        *attr_cols,
        F.col("__run").alias("version"),
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
        "n_events",
    )
