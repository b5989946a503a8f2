"""Wave-16: measurements for the round-9 work.

1. **Bucketed vs unbucketed DedupIndex probe at ×100** (VERDICT r8 weak
   #1 closure): the signature stores are now written hash-clustered into
   ``n_buckets`` partition directories and the probe pushes
   ``__bucket IN (...)`` into each store scan. The win is the DAILY
   shape — a small batch probes a corpus-sized store: with pruning the
   scan reads only the buckets the batch's keys hash to; without it
   (an ``n_buckets=None`` index, byte-identical math) every probe scans
   the full store. Measured both ways, hash-asserted equal:

   - small batch (mod-500 ⇒ 1 000 docs vs the 400 k-doc corpus): the
     shape pruning exists for;
   - the registered mod-5 batch (100 k docs): probe keys hash to every
     bucket, pruning degenerates to the full scan — the "never worse"
     bound, expected ≈ parity.

2. **Maintenance epoch at ×100** (streaming/maintenance.py sink math,
   run inline): probe a 1 000-doc batch against the 400 k-doc index,
   accept the new rows, append their signatures under an epoch txn, then
   replay the committed epoch — the replay must be a marker-stat no-op.

Protocol identical to waves 10-15: min of N timed runs, full-evaluation
``agg(count, sum(hash(*)))`` consumer, blow-up reused from /tmp/scale100.

    python scripts/scale_wave16.py [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT_A = "/tmp/scale100"


def _consume(df):
    from pyspark.sql import functions as F

    return df.agg(
        F.count("*").alias("n"), F.sum(F.hash(*df.columns)).alias("h")
    ).collect()[0]


def _timed(fn, runs):
    best, n, h = float("inf"), 0, None
    for _ in range(runs):
        t0 = time.perf_counter()
        got = _consume(fn())
        n, h = got.n, got.h
        best = min(best, time.perf_counter() - t0)
    return round(best, 2), n, h


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from scale_curve import build_blowup

    from vector_db_spark.operators.dedup_index import DedupIndex
    from vector_db_spark.io import load_table
    from vector_db_spark.session import get_spark

    spark = get_spark("scale-wave16")
    spark.sparkContext.setLogLevel("ERROR")
    build_blowup(spark, OUT_A, copies=100)

    results: dict[str, dict] = {}

    docs = load_table(spark, OUT_A, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch_small = docs.filter(F.col("doc_id") % 500 == 0)  # 1/500, disjoint
    batch_big = docs.filter(F.col("doc_id") % 5 == 0)

    t0 = time.perf_counter()
    bidx = DedupIndex.build(
        spark, corpus, tempfile.mkdtemp(prefix="didx16b_") + "/index"
    )
    build_bucketed = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    fidx = DedupIndex.build(
        spark, corpus, tempfile.mkdtemp(prefix="didx16f_") + "/index",
        n_buckets=None,
    )
    build_flat = round(time.perf_counter() - t0, 2)

    n_small = batch_small.count()
    sec_bp, n_bp, h_bp = _timed(lambda: bidx.probe(batch_small), args.runs)
    sec_fp, n_fp, h_fp = _timed(lambda: fidx.probe(batch_small), args.runs)
    assert (n_bp, h_bp) == (n_fp, h_fp), ((n_bp, h_bp), (n_fp, h_fp))
    results["index_probe_x100_small_batch_pruned_vs_scan"] = {
        "batch_rows": n_small,
        "build_bucketed_sec": build_bucketed,
        "build_flat_sec": build_flat,
        "pruned_probe_sec": sec_bp,
        "fullscan_probe_sec": sec_fp,
        "rows": n_bp,
        "speedup": round(sec_fp / max(sec_bp, 1e-9), 2),
    }
    print(
        f"# probe x100 small batch ({n_small} docs): pruned {sec_bp}s / "
        f"full-scan {sec_fp}s ({round(sec_fp / max(sec_bp, 1e-9), 1)}x)",
        flush=True,
    )

    sec_bb, n_bb, h_bb = _timed(lambda: bidx.probe(batch_big), args.runs)
    sec_fb, n_fb, h_fb = _timed(lambda: fidx.probe(batch_big), args.runs)
    assert (n_bb, h_bb) == (n_fb, h_fb), ((n_bb, h_bb), (n_fb, h_fb))
    results["index_probe_x100_corpus_batch_never_worse"] = {
        "batch_rows": batch_big.count(),
        "bucketed_probe_sec": sec_bb,
        "flat_probe_sec": sec_fb,
        "rows": n_bb,
        "bucketed_over_flat": round(sec_bb / max(sec_fb, 1e-9), 2),
    }
    print(
        f"# probe x100 mod-5 batch: bucketed {sec_bb}s / flat {sec_fb}s "
        f"(never-worse ratio {round(sec_bb / max(sec_fb, 1e-9), 2)})",
        flush=True,
    )

    # maintenance epoch: probe -> accept -> txn append, then replay no-op
    t0 = time.perf_counter()
    verdicts = bidx.probe(batch_small).localCheckpoint(eager=True)
    accepted = batch_small.join(
        verdicts.filter(F.col("is_new")).select("doc_id"), "doc_id", "left_semi"
    ).localCheckpoint(eager=True)
    n_accepted = accepted.count()
    bidx.append(accepted, txn_id="wave16:0")
    epoch_sec = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    bidx.append(accepted, txn_id="wave16:0")  # committed epoch replay
    replay_sec = round(time.perf_counter() - t0, 4)
    results["maintenance_epoch_x100"] = {
        "batch_rows": n_small,
        "accepted_rows": n_accepted,
        "probe_accept_append_sec": epoch_sec,
        "replay_noop_sec": replay_sec,
    }
    print(
        f"# maintenance epoch x100: {epoch_sec}s ({n_accepted} accepted), "
        f"replay no-op {replay_sec}s",
        flush=True,
    )

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
