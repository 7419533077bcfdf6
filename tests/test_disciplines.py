"""r6 (r5 verdict #6): the two scale disciplines that were prose-only,
enforced mechanically.

1. Hub caps on Σdeg² wedge operators — the r5 Jaccard lesson: the uncapped
   common-neighbor wedge ran >20 min at sf1 and was killed. Every call
   site of a wedge-fanout operator inside the registered-query modules
   must pass an explicit degree cap.

2. Lazy localCheckpoint on multi-consumer subplans — the r5 perf theme:
   an expensive shared subplan consumed by several downstream legs
   recomputes once per leg unless pinned (dedup_semantic was 8×, the
   triangle estimator 3×). The known multi-consumer flagships must show a
   materialized shared scan (ExistingRDD) in their physical plan.
"""

from __future__ import annotations

import pathlib
import re

from gearpump_spark.queries import all_queries

QS = all_queries()
ROOT = pathlib.Path(__file__).resolve().parent.parent


def _query_sources() -> str:
    return "\n".join(
        p.read_text() for p in (ROOT / "gearpump_spark" / "queries").glob("*.py")
    )


def test_wedge_operators_capped_at_call_sites():
    """Every queries/-side call of a Σdeg² wedge operator passes an
    explicit max_degree cap (the operator default stays None = exact, so
    library users opt in knowingly — but OUR registered queries must
    model the 100 TB configuration)."""
    src = _query_sources()
    # graph_jaccard_neighbors implements its wedge inline — its hub cap is
    # the deg > 64 anti-join; regression = the filter disappearing.
    assert re.search(r"deg\.where\(F\.col\(\"d\"\) > 64\)", src), (
        "graph_jaccard_neighbors lost its degree-64 hub-center anti-join"
    )
    for fn in ("link_predict_common_neighbors",):
        # no \s* before the paren: prose mentions in docstrings write
        # "fn (..."; real call sites never put a space there (and the
        # repo is black-formatted, which enforces exactly that)
        for m in re.finditer(rf"{fn}\(", src):
            # crude but effective: the cap kwarg must appear within the
            # call's argument span (to the matching close paren)
            depth, i = 0, m.end() - 1
            while i < len(src):
                if src[i] == "(":
                    depth += 1
                elif src[i] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                i += 1
            span = src[m.start() : i]
            assert "max_degree" in span, (
                f"{fn} called without an explicit max_degree cap in a "
                "registered-query module — the r5 sf1 runaway; pass the "
                "cap (graph.py documents the super-node-exclusion trade)."
            )


def test_multi_consumer_flagships_pin_shared_subplan(spark):
    """The flagships whose expensive subplan feeds several consumers must
    carry a materialized shared scan. A regression back to recompute
    shows up as the ExistingRDD scan vanishing from the physical plan."""
    sf = "/root/testdata/sf0.001"
    for name in (
        "dedup_semantic",
        "graph_triangle_estimate",
        "graph_clustering_coeff",
        "graph_jaccard_neighbors",
        "similarity_mmr_rerank",
        "similarity_binary_rerank",
    ):
        df = QS[name](spark, sf)
        p = df._jdf.queryExecution().simpleString()
        assert "ExistingRDD" in p, (
            f"{name}: no materialized shared subplan (localCheckpoint) in "
            "the physical plan — the multi-consumer recompute bug of r4 "
            "is back (docs/BENCH_NOTES_r5.md)."
        )
