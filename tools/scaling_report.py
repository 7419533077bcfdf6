"""Empirical scaling check: run the BENCH headline queries at every
available scale factor (sf0.001 / sf0.01 / sf0.1 — a 100× data span) and
report per-query times plus the 10× ratios.

A query whose time grows ~linearly (ratio ≈ data ratio, often much less
while per-query fixed costs dominate) holds at scale; a superlinear ratio
flags an operator whose plan degrades with data size (e.g. a quadratic
candidate blow-up). Output: markdown to stdout — redirect into
docs/SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # single source of truth for the query set

SFS = ["sf0.001", "sf0.01", "sf0.1"]
BASE = "/root/testdata"


def main() -> None:
    from gearpump_spark.session import get_spark
    from gearpump_spark.queries import all_queries

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("scaling_report", cpus=cpus, shuffle_partitions=cpus)
    qs = all_queries()

    # warm codegen per plan shape at the smallest sf
    for name in HEADLINE:
        qs[name](spark, f"{BASE}/{SFS[0]}").write.mode("overwrite").format("noop").save()

    times: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for sf in SFS:
        for name in HEADLINE:
            best = float("inf")
            for _ in range(2):
                df = qs[name](spark, f"{BASE}/{sf}")
                t0 = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            times[name].append(best)

    print("# Scaling report (best-of-2, noop sink, local[%d])\n" % cpus)
    print("10× data per step; a ratio well under 10 means fixed costs still")
    print("dominate; a ratio near 10 is linear scaling; above 10 is a flag.\n")
    print("| query | sf0.001 | sf0.01 | sf0.1 | 0.001→0.01 | 0.01→0.1 |")
    print("|---|---|---|---|---|---|")
    for name in HEADLINE:
        a, b, c = times[name]
        print(
            f"| {name} | {a:.2f}s | {b:.2f}s | {c:.2f}s "
            f"| {b / a:.1f}× | {c / b:.1f}× |"
        )


if __name__ == "__main__":
    main()
