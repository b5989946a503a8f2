"""Wave-10: blow up the RELATIONAL axis (lineitem/orders ×100) — the one
data axis waves 1-9 never scaled (they covered documents / embeddings /
events). Disjoint-shard semantics like scale_curve.py: per-copy key
offsets on l_orderkey / l_partkey / l_suppkey / o_orderkey / o_custkey,
so order universes, co-purchase graph structure, and KMV key spaces
replicate ×100 instead of densifying quadratically. Other tables are
hard-copied unchanged; queries measured here touch ONLY lineitem/orders
(dim-joining queries would dangle against the offset keys by design).

Builds /tmp/scale100rel then prints the x1-vs-x100 table via the same
measurement loop as scale_curve.py.

Usage: python scripts/scale_wave10_rel.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = "/root/testdata/sf0.1"
OUT = "/tmp/scale100rel"
COPIES = 100
STRIDE = 10_000_000

QUERIES = [
    "pricing_summary",             # TPC-H Q1 shape: one lineitem agg
    "kmv_orderkey_overlap",        # KMV sketch build over 60M rows
    "kmv_orderkey_difference",
    "part_cooccurrence_triangles", # wedge join over the co-purchase graph
    "association_rules",           # basket mining over lineitem
    "copurchase_ppr_expansion",    # PPR over lineitem-derived edges
]


def build(spark) -> None:
    from pyspark.sql import functions as F

    from vector_db_spark.io import TABLES, load_table

    if os.path.isdir(os.path.join(OUT, "lineitem.parquet")) and not os.path.isfile(
        os.path.join(OUT, "lineitem.parquet")
    ):
        print("# relational blow-up already present — reusing", flush=True)
        return
    os.makedirs(OUT, exist_ok=True)
    for t in TABLES:
        if t in ("lineitem", "orders"):
            continue
        src, dst = os.path.join(SF1, f"{t}.parquet"), os.path.join(OUT, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(src, dst)

    cp = spark.range(COPIES).select(F.col("id").cast("long").alias("__c"))
    off = F.col("__c") * STRIDE

    li = load_table(spark, SF1, "lineitem").crossJoin(F.broadcast(cp))
    li.select(
        (F.col("l_orderkey") + off).alias("l_orderkey"),
        (F.col("l_partkey") + off).alias("l_partkey"),
        (F.col("l_suppkey") + off).alias("l_suppkey"),
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
    ).repartition(64).write.mode("overwrite").parquet(
        os.path.join(OUT, "lineitem.parquet")
    )
    od = load_table(spark, SF1, "orders").crossJoin(F.broadcast(cp))
    od.select(
        (F.col("o_orderkey") + off).alias("o_orderkey"),
        (F.col("o_custkey") + off).alias("o_custkey"),
        "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(OUT, "orders.parquet")
    )


def main() -> None:
    from vector_db_spark.queries import all_queries
    from vector_db_spark.session import get_spark

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale_curve import warn_shapes  # shared audit helper

    spark = get_spark("scale-wave10")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    build(spark)
    print(f"# relational blow-up ready in {time.perf_counter() - t0:.1f}s", flush=True)

    qs = all_queries()
    for name in QUERIES:
        for label, d in (("x1", SF1), ("x100", OUT)):
            df = qs[name](spark, d)
            shapes = warn_shapes(df)
            best, n = float("inf"), 0
            for _ in range(2):
                s = time.perf_counter()
                n = qs[name](spark, d).count()
                best = min(best, time.perf_counter() - s)
            print(f"# {name} {label}: {best:.2f}s rows={n} shapes={shapes}", flush=True)


if __name__ == "__main__":
    main()
