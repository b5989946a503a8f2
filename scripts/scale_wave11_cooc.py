"""Wave-11: the capped co-occurrence graph at ×100 — closing wave-10's
open item. Wave-10 measured the UNCAPPED co-purchase triangle count dying
at ×100 (9.966 B wedge rows ≈ 240 GB spill, predicted to three significant
figures by the Σ deg⁺² budget formula) and prescribed the mitigation
ladder: cut hub items / cap basket size explicitly. This wave measures the
wired mitigation (operators/knn_graph.py cooccurrence_edges) at the same
×100 relational blow-up.

Knob choice IS the point: under the disjoint-shard blow-up the capped
graph is exactly 100 disjoint copies of the x1 graph, so the wedge budget
is 100 × the x1 audit. Audited surface at sf0.1 (Σ indeg·outdeg under the
degree orientation — the REAL row count of triangle_count's middle-vertex
join; see SCALE.md wave-11): uncapped → 4.92 B join rows at ×100
(≈ 118 GB shuffle — the wave-10 death, now priced exactly), (df≤37,
cap=5) → 1.95 B (≈ 47 GB — marginal on this box), (df≤30, cap=4) →
0.33 B (≈ 8 GB — fits comfortably). The run below uses (30, 4): the
knobs exist precisely so the operator's volume can be fitted to a
shuffle budget BEFORE the job runs, instead of discovered in spill.

Usage: python scripts/scale_wave11_cooc.py   (reuses /tmp/scale100rel)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = "/root/testdata/sf0.1"
OUT = "/tmp/scale100rel"

MAX_DF = 30
MAX_BASKET = 4


def capped_triangles(spark, sf_dir: str):
    from vector_db_spark.io import load_table
    from vector_db_spark.operators.knn_graph import cooccurrence_edges, triangle_count

    li = load_table(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(
        li, "l_orderkey", "l_partkey", max_item_df=MAX_DF, max_basket_size=MAX_BASKET
    )
    return triangle_count(edges)


def main() -> None:
    from vector_db_spark.session import get_spark

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale_curve import warn_shapes
    from scale_wave10_rel import build

    spark = get_spark("scale-wave11")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    build(spark)
    print(f"# relational blow-up ready in {time.perf_counter() - t0:.1f}s", flush=True)

    for label, d in (("x1", SF1), ("x100", OUT)):
        df = capped_triangles(spark, d)
        shapes = warn_shapes(df)
        best, row = float("inf"), None
        for _ in range(2):
            s = time.perf_counter()
            row = capped_triangles(spark, d).collect()[0]
            best = min(best, time.perf_counter() - s)
        print(
            f"# cooccurrence_capped_triangles(df<={MAX_DF},cap={MAX_BASKET}) "
            f"{label}: {best:.2f}s row={tuple(row)} shapes={shapes}",
            flush=True,
        )


if __name__ == "__main__":
    main()
