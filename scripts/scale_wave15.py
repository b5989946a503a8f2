"""Wave-15: measurements for the round-8 guard work.

1. **incremental_dedup broadcast-vs-routed** (VERDICT r7 item 2): the
   operator now probes the incoming-batch size and drops every batch-side
   broadcast hint past ``max_broadcast_batch``. Measured here:

   - x1 small-batch PARITY + price: the sf0.1 mod-5 batch (1/5 of docs)
     through the default broadcast path vs forced-routed
     (``max_broadcast_batch=0``) — identical row counts, and the delta is
     what the broadcast hints are worth when the batch IS small.
   - x100 CORPUS-SHAPED batch: at the ×100 corpus (500 k docs), a mod-2
     split makes the incoming batch 250 k rows — 2.5× past the threshold,
     the backfill/merged-crawl shape the r7 verdict flagged. The guard
     auto-routes; before this round the same call would have force-
     broadcast a 250 k-doc shingle/band table into every task.

2. **percolate_scaled_subscriptions ×1 → ×100** (VERDICT r7 item 7): the
   registered subscription-scaled percolation row. Subscriptions derive
   from the corpus (1 per 64 docs), so ×100 docs ⇒ ×100 subscriptions
   (7 812, vocabulary 15 624 terms) — past percolate's 10 k literal-vocab
   threshold, flipping the SAME registered query from the map-side
   literal-intersect plan to the routed join plan automatically. The
   true matching-volume curve wave-14b measured script-only, now on the
   registered artifact.

Protocol identical to waves 10-14: min of N timed runs, full-evaluation
``agg(count, sum(hash(*)))`` consumer, warn-shape flip check across
scales (the percolate vocab-route flip is EXPECTED and asserted, not a
failure — it changes join hints, which are not warn shapes).

    python scripts/scale_wave15.py [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF1 = "/root/testdata/sf0.1"
OUT_A = "/tmp/scale100"


def _consume(df):
    from pyspark.sql import functions as F

    return df.agg(
        F.count("*").alias("n"), F.sum(F.hash(*df.columns)).alias("h")
    ).collect()[0]


def _timed(fn, runs):
    best, n = float("inf"), 0
    for _ in range(runs):
        t0 = time.perf_counter()
        got = _consume(fn())
        n = got.n
        best = min(best, time.perf_counter() - t0)
    return round(best, 2), n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--part", choices=["incdedup", "percolate", "all"], default="all")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from scale_curve import build_blowup

    from vector_db_spark.io import load_table
    from vector_db_spark.operators.dedup import incremental_dedup
    from vector_db_spark.queries import all_queries
    from vector_db_spark.session import get_spark

    spark = get_spark("scale-wave15")
    spark.sparkContext.setLogLevel("ERROR")
    build_blowup(spark, OUT_A, copies=100)

    results: dict[str, dict] = {}

    if args.part in ("incdedup", "all"):
        docs1 = load_table(spark, SF1, "documents")
        co1 = docs1.filter(F.col("doc_id") % 5 != 0)
        ba1 = docs1.filter(F.col("doc_id") % 5 == 0)
        sec_b, n_b = _timed(lambda: incremental_dedup(co1, ba1), args.runs)
        sec_r, n_r = _timed(
            lambda: incremental_dedup(co1, ba1, max_broadcast_batch=0), args.runs
        )
        assert n_b == n_r, (n_b, n_r)
        results["incdedup_x1_smallbatch"] = {
            "broadcast_sec": sec_b,
            "routed_sec": sec_r,
            "rows": n_b,
            "routed_over_broadcast": round(sec_r / max(sec_b, 1e-9), 2),
        }
        print(f"# incdedup x1: broadcast {sec_b}s / routed {sec_r}s rows={n_b}",
              flush=True)

        docs100 = load_table(spark, OUT_A, "documents")
        co100 = docs100.filter(F.col("doc_id") % 2 != 0)
        ba100 = docs100.filter(F.col("doc_id") % 2 == 0)
        n_batch = ba100.count()
        sec_c, n_c = _timed(lambda: incremental_dedup(co100, ba100), args.runs)
        results["incdedup_x100_corpus_shaped_batch"] = {
            "sec": sec_c,
            "rows": n_c,
            "batch_rows": n_batch,
            "auto_routed": n_batch > 100_000,
        }
        print(f"# incdedup x100 corpus-shaped: {sec_c}s rows={n_c} "
              f"batch={n_batch} (auto-routed)", flush=True)

    if args.part in ("percolate", "all"):
        q = all_queries()["percolate_scaled_subscriptions"]
        row = {}
        for label, sf_dir in (("x1", SF1), ("x100", OUT_A)):
            sec, n = _timed(lambda: q(spark, sf_dir), args.runs)
            row[label] = {"sec": sec, "rows": n}
            print(f"# percolate_scaled {label}: {sec}s matches={n}", flush=True)
        row["ratio"] = round(row["x100"]["sec"] / max(row["x1"]["sec"], 1e-9), 2)
        results["percolate_scaled_subscriptions"] = row

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
