"""Physical-layout operators: skew-aware joins and bucketed (co-located)
joins. These are the knobs a 100 TB deployment turns when the default
shuffle strategy hits its limits; on the test rig they are exercised for
correctness and plan shape.

Reference context: the reference's only layout controls are its
partitioners (SURVEY.md §2.A) — co-location by task index
(partitioner/CoLocationPartitioner.scala:23-27) and hash routing; it has no
skew story at all (one hot key = one hot actor). Spark gives AQE skew-join
splitting for free; the operators here cover the cases AQE cannot:
aggregation skew (salting changes the KEY, AQE only splits partitions) and
repeated joins on the same key (bucketing amortizes the shuffle to zero).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hot-key join: salt the skewed (left) side into n_salts sub-keys and
    replicate the right side once per salt, so one hot key spreads over
    n_salts tasks instead of melting one.

    Salt is derived from a hash of the full left row — deterministic, no
    rand() (reruns and retries produce identical partitioning). Cost: the
    right side is duplicated n_salts×; use only when right is small-ish but
    too big (or too skewed downstream) to broadcast outright.

    Join types that emit unmatched RIGHT rows (right/full outer) are
    rejected: the right side exists n_salts× pre-join, so each unmatched
    right row would surface n_salts times.
    """
    if how in ("right", "right_outer", "full", "full_outer", "outer"):
        raise ValueError(
            f"salted_join cannot preserve {how!r} semantics: the replicated "
            "right side would emit unmatched right rows once per salt"
        )
    l = left.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    )
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l.join(r, [key, "__salt"], how).drop("__salt")


def salted_aggregate(
    df: DataFrame,
    key: str,
    agg_col: str,
    n_salts: int = 16,
    out: str = "total",
) -> DataFrame:
    """Two-stage skew-safe SUM: aggregate on (key, salt) first — the hot
    key's rows combine across n_salts parallel tasks — then re-aggregate the
    n_salts partials per key. Works for any commutative monoid; the shape
    the reference's per-task HashMap state gets for free only because it
    never re-partitions by key volume.

    NOTE Spark's partial (map-side) aggregation already does this when
    upstream partitioning is row-random; explicit salting matters when the
    input is ALREADY partitioned by the hot key (e.g. right after a keyed
    join), where map-side partials collapse into the same hot reducer."""
    # Salt from a per-partition row counter, NOT hash(agg_col): a hot key
    # whose rows all carry the same value (flags, unit counts) would hash
    # to ONE salt and defeat the spreading entirely. The counter is
    # deterministic given partition contents (safe under task retry, which
    # recomputes whole partitions), and associativity of SUM makes the
    # salt assignment itself irrelevant to the result.
    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "__salt").agg(F.sum(agg_col).alias("__partial"))
    return partial.groupBy(key).agg(F.sum("__partial").alias(out))


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 8, sort_by: str | None = None
) -> None:
    """Persist hash-bucketed by key (CoLocationPartitioner at the storage
    layer): every future join/aggregation on `key` between tables bucketed
    the same way runs shuffle-free — the exchange is amortized into the
    write. At 100 TB, bucket fact tables on their join key once; every
    downstream query drops its biggest exchange."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.format("parquet").saveAsTable(table_name)


def bucketed_join(spark, left_table: str, right_table: str, key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables: Catalyst sees compatible
    HashClusteredDistribution on both sides and plans SortMergeJoin with
    ZERO Exchange nodes (verified in tests/test_plan_quality.py)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def merge_aggregate_state(
    base: DataFrame, delta: DataFrame, keys: list[str], merge_cols: dict[str, str]
) -> DataFrame:
    """Incremental materialized-view maintenance: merge a new batch's
    partial aggregates into the running state. merge_cols maps column →
    'sum'|'min'|'max' (any commutative monoid already reduced per key on
    both sides).

    This is the batch half of the streaming-table duality: state tables
    update by monoid merge, never full recompute — at 100 TB the delta
    touches only its own keys' partitions. Counts merge as 'sum'.
    """
    fns = {"sum": F.sum, "min": F.min, "max": F.max}
    aggs = [fns[how](c).alias(c) for c, how in merge_cols.items()]
    return base.unionByName(delta).groupBy(*keys).agg(*aggs)


def upsert_split(snapshot: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE INTO fast path for a SMALL update batch: the general
    full-outer-join form (queries/temporal.py q_upsert_merge) shuffles the
    whole snapshot on the merge key — Spark cannot broadcast a full-outer
    side. When the batch fits the broadcast threshold, split the merge:

      untouched = snapshot LEFT ANTI broadcast(update keys)   -- no shuffle
      merged    = untouched UNION ALL updates                 -- narrow

    The snapshot is read once and never exchanged; only the tiny key set
    replicates. Same result set as the full-outer form for key-unique
    inputs (asserted by test_upsert_split_matches_full_outer).

    ``updates`` must carry the snapshot's full schema (upserted rows
    replace wholesale — partial-column merges belong in
    merge_aggregate_state).
    """
    untouched = snapshot.join(F.broadcast(updates.select(key)), key, "left_anti")
    return untouched.unionByName(updates)


def merge_into(
    snapshot: DataFrame,
    updates: DataFrame,
    key: str,
    update_set: dict[str, Column] | None = None,
    delete_condition: Column | None = None,
    insert_not_matched: bool = True,
    on_duplicate_update_keys: str = "error",
) -> DataFrame:
    """Full Delta-style MERGE INTO semantics as ONE full-outer join plus a
    CASE projection — the three-clause form the lakehouse engines expose:

      WHEN MATCHED AND <delete_condition> THEN DELETE
      WHEN MATCHED THEN UPDATE SET <update_set>
      WHEN NOT MATCHED THEN INSERT *        (if insert_not_matched)

    ``update_set`` maps snapshot column -> expression over the aliased
    sides ``s`` (snapshot) and ``u`` (updates); unmapped columns keep the
    snapshot value. ``delete_condition`` is likewise an s/u expression; a
    NULL condition value never deletes (SQL three-valued logic folded to
    false, matching the lakehouse engines). ``updates`` must carry every
    snapshot column (INSERT * semantics).

    Scale: one shuffle of each side on the merge key (full-outer can't
    broadcast); output schema == snapshot schema, so the result writes
    back over the snapshot partitionwise. For small whole-row batches
    prefer upsert_split (zero snapshot shuffle).

    ``on_duplicate_update_keys``: ``"error"`` (default) raises at
    execution time when two update rows share a non-NULL merge key —
    the same runtime ambiguity error Delta/the lakehouse engines throw,
    because a duplicated source key would otherwise silently emit one
    output row PER update row (duplicating the snapshot row).
    ``"allow"`` opts into that multiplying behavior explicitly. The
    guard is a window count partitioned by the merge key, which reuses
    the exchange the full-outer join needs anyway — no extra shuffle.
    """
    sets = update_set or {}
    unknown = set(sets) - set(snapshot.columns)
    if unknown:
        raise ValueError(f"update_set targets not in snapshot schema: {sorted(unknown)}")
    if on_duplicate_update_keys not in ("error", "allow"):
        raise ValueError(
            "on_duplicate_update_keys must be 'error' or 'allow', got "
            f"{on_duplicate_update_keys!r}"
        )
    if on_duplicate_update_keys == "error":
        from pyspark.sql import Window

        n_per_key = F.count("*").over(Window.partitionBy(key))
        # assert_true yields NULL when the predicate holds and raises the
        # task otherwise; project it (window functions can't live in a
        # WHERE), then filter on the projected column — the filter
        # reference keeps Catalyst from pruning the check away. NULL keys
        # are exempt: they never match anything, so they can't be ambiguous.
        guard = F.coalesce(
            F.assert_true(
                F.col(key).isNull() | (n_per_key == 1),
                F.lit(
                    f"merge_into: multiple update rows share merge key {key!r}"
                    " — MERGE is ambiguous (pass"
                    " on_duplicate_update_keys='allow' to multiply matches)"
                ),
            ).cast("boolean"),
            F.lit(True),
        )
        updates = (
            updates.withColumn("_dup_guard", guard)
            .where(F.col("_dup_guard"))
            .drop("_dup_guard")
        )
    # presence markers, NOT key-null tests: a NULL-key snapshot row never
    # joins (SQL equality) and must pass through UNTOUCHED — Delta MERGE
    # semantics (r3 review finding: s.key IS NULL misclassified it as an
    # insert row and emitted the all-NULL update side)
    s = snapshot.withColumn("_s_present", F.lit(True)).alias("s")
    u = updates.withColumn("_u_present", F.lit(True)).alias("u")
    joined = s.join(u, F.col(f"s.{key}") == F.col(f"u.{key}"), "full_outer")
    matched = F.col("s._s_present").isNotNull() & F.col("u._u_present").isNotNull()
    only_u = F.col("s._s_present").isNull()
    delete = (
        matched & F.coalesce(delete_condition, F.lit(False))
        if delete_condition is not None
        else F.lit(False)
    )
    keep = (
        F.when(only_u, F.lit(insert_not_matched))
        .when(delete, F.lit(False))
        .otherwise(F.lit(True))
    )
    return joined.where(keep).select(
        *[
            F.when(only_u, F.col(f"u.{c}"))
            .when(matched, sets.get(c, F.col(f"s.{c}")))
            .otherwise(F.col(f"s.{c}"))
            .alias(c)
            for c in snapshot.columns
        ]
    )


def zorder_normalize(c: Column, lo: Column, hi: Column, bits: int = 16) -> Column:
    """Map a BIGINT dimension into [0, 2^bits) with pure-integer math:
    ((c - lo) * (2^bits - 1)) DIV max(hi - lo, 1). Exact BIGINT floor
    division (long / long in Spark is double division): num - num%span is
    exactly divisible, and a correctly-rounded double divide of it yields
    the integer quotient exactly while num < 2^53 (i.e. dim span <
    ~1.3e11 at bits=16 — any wider and the dim should be pre-bucketed)."""
    span = F.greatest(hi - lo, F.lit(1))
    num = ((c - lo) * F.lit((1 << bits) - 1)).cast("long")
    return ((num - num % span) / span).cast("long")


def zorder_key(cols: list[Column], bounds: list[tuple[Column, Column]], bits: int = 16) -> Column:
    """Morton (Z-order) interleave of N dimensions, each first normalized
    to [0, 2^bits) with integer arithmetic from its (min, max) bounds:

        xn = ((x - min) * (2^bits - 1)) DIV max(max - min, 1)

    then bit i of dimension d lands at output bit i*N + (N-1-d). All
    integer expressions (shiftleft/&/|), whole-stage-codegen'd — no UDF.

    Why: sorting 100 TB by ONE column gives perfect min/max file skipping
    on that column and none on any other; sorting by the interleaved code
    gives every dimension ~(1/2^(bits_used/N)) span per file. This is the
    layout trick behind Delta/Iceberg OPTIMIZE ZORDER BY; the reference
    engine has no analog (its partitioners route, they don't order).
    """
    n = len(cols)
    norm = [zorder_normalize(c, lo, hi, bits) for c, (lo, hi) in zip(cols, bounds)]
    out = F.lit(0).cast("long")
    for d, x in enumerate(norm):
        for i in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), i * n + (n - 1 - d))
            )
    return out


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_files: int = 32,
    bits: int = 16,
) -> DataFrame:
    """Rewrite `df`'s physical layout so files cluster on ALL of `cols`:
    compute per-dimension bounds (one tiny agg, broadcast back in-plan),
    Morton-interleave, then range-partition + sort by the code. Write the
    result with any sink and each file's min/max stats become selective on
    every listed dimension at once.

    Scale shape: one O(1)-row bounds aggregate, one range exchange over
    the code (sampled boundaries — acceptable here because layout, unlike
    query results, need not be bit-deterministic), in-partition sort.
    """
    dims = [F.col(c).cast("long") for c in cols]
    bounds_row = df.agg(
        *[f for c in cols for f in (F.min(F.col(c).cast("long")).alias(f"__min_{c}"),
                                    F.max(F.col(c).cast("long")).alias(f"__max_{c}"))]
    )
    with_bounds = df.crossJoin(F.broadcast(bounds_row))
    key = zorder_key(
        dims,
        [(F.col(f"__min_{c}"), F.col(f"__max_{c}")) for c in cols],
        bits=bits,
    )
    return (
        with_bounds.withColumn("__zkey", key)
        .drop(*[f"__{m}_{c}" for c in cols for m in ("min", "max")])
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
    )
