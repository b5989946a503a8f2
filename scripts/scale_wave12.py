"""Wave-12 (+13): 100× curves for the round-6 promotions not yet curved,
plus the native first-seen form that retires the wave-7 Python-state floor.

Targets (VERDICT r6 items 2 & 8):

- blow-up A (scale_curve.build_blowup — documents/embeddings/events as
  100 disjoint shards): fuzzy_typo_pairs, percolate_alerts,
  late_interaction_search, mmr_diversified, range_join_user_activity,
  and stream_first_seen_native (wave-13: the dropDuplicatesWithinWatermark
  default vs the 110 s applyInPandasWithState floor measured in wave-7).
- blow-up B (/tmp/scale100scd): wave-10's lineitem/orders ×100 relational
  blow-up joined by a matching customer ×100 (same 10 M id stride, so
  o_custkey → c_custkey references stay consistent): scd2_customer_history.

Protocol identical to the earlier waves: min of 2 timed runs per scale,
warn-grade plan shapes compared across scales (a flip fails the wave).

    python scripts/scale_wave12.py [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF1 = "/root/testdata/sf0.1"
OUT_A = "/tmp/scale100"
REL = "/tmp/scale100rel"   # wave-10 blow-up (built by scale_wave10_rel.py)
OUT_B = "/tmp/scale100scd"
COPIES = 100
STRIDE = 10_000_000        # the wave-10 id stride — custkeys must match

QUERIES_A = [
    "fuzzy_typo_pairs",
    "percolate_alerts",
    "late_interaction_search",
    "mmr_diversified",
    "range_join_user_activity",
    "stream_first_seen_native",  # wave-13
]
QUERIES_B = ["scd2_customer_history"]


def build_scd_blowup(spark) -> None:
    """Symlink wave-10's relational blow-up and add customer ×100 with the
    SAME id stride its orders use, so every o_custkey resolves."""
    from pyspark.sql import functions as F

    from vector_db_spark.io import TABLES, load_table

    if not os.path.isdir(os.path.join(REL, "orders.parquet")):
        raise SystemExit(
            f"wave-10 blow-up missing at {REL} — run scripts/scale_wave10_rel.py first"
        )
    if os.path.isdir(os.path.join(OUT_B, "customer.parquet")):
        print("# scd blow-up already present — reusing", flush=True)
        return
    os.makedirs(OUT_B, exist_ok=True)
    for t in TABLES:
        if t == "customer":
            continue
        src = os.path.join(REL, f"{t}.parquet")
        dst = os.path.join(OUT_B, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(src, dst)
    cp = spark.range(COPIES).select(F.col("id").cast("long").alias("__c"))
    cust = load_table(spark, SF1, "customer").crossJoin(F.broadcast(cp))
    cust.select(
        (F.col("c_custkey") + F.col("__c") * STRIDE).alias("c_custkey"),
        F.concat(F.col("c_name"), F.lit("#"), F.col("__c").cast("string")).alias(
            "c_name"
        ),
        "c_nationkey",
        (F.col("c_acctbal") + F.col("__c")).alias("c_acctbal"),
        "c_mktsegment",
    ).repartition(16).write.mode("overwrite").parquet(
        os.path.join(OUT_B, "customer.parquet")
    )


def run(spark, qs, names, big_dir, runs) -> dict:
    """Timed consumer is count(rows) PLUS a hash-fold over every output
    column — a bare .count() lets Catalyst PRUNE expression-only work
    (a Window whose outputs nobody reads is removed entirely), which
    under-reports window/projection queries: wave-14 first measured
    ewma_purchase_values "flat at ×100" because the count never computed
    the EWMA; the hash-fold form shows the true 1.8×."""
    from pyspark.sql import functions as F

    from scale_curve import warn_shapes

    results = {}
    for name in names:
        row = {}
        for label, sf_dir in (("x1", SF1), ("x100", big_dir)):
            shapes = warn_shapes(qs[name](spark, sf_dir))
            best, n = float("inf"), 0
            for _ in range(runs):
                # query construction INSIDE the timer: streaming entries do
                # their work in run_to_memory during construction
                t0 = time.perf_counter()
                df = qs[name](spark, sf_dir)
                got = df.agg(
                    F.count("*").alias("n"),
                    F.sum(F.hash(*df.columns)).alias("h"),
                ).collect()[0]
                n = got.n
                best = min(best, time.perf_counter() - t0)
            row[label] = {"sec": round(best, 2), "rows": n, "warn_shapes": shapes}
            print(f"# {name} {label}: {best:.2f}s rows={n} shapes={shapes}", flush=True)
        row["ratio"] = round(row["x100"]["sec"] / max(row["x1"]["sec"], 1e-9), 2)
        row["shape_flip"] = row["x1"]["warn_shapes"] != row["x100"]["warn_shapes"]
        results[name] = row
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from scale_curve import build_blowup

    from vector_db_spark.queries import all_queries
    from vector_db_spark.session import get_spark

    spark = get_spark("scale-wave12")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    build_blowup(spark, OUT_A, copies=COPIES)
    build_scd_blowup(spark)
    print(f"# blow-ups ready in {time.perf_counter() - t0:.1f}s", flush=True)

    qs = all_queries()
    results = run(spark, qs, QUERIES_A, OUT_A, args.runs)
    results.update(run(spark, qs, QUERIES_B, OUT_B, args.runs))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
