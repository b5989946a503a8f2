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

   - x100 SMALL batch, broadcast vs forced-routed: the measurement that
     justifies the broadcast DEFAULT — with a 5 k-doc batch against the
     500 k-doc corpus, the broadcast path streams the corpus map-side
     while forced routing shuffles the full corpus shingle/band tables.
     (At x1 both sides are fixture-small and routing is within noise of
     broadcast — the default's value only shows when the corpus side is
     big.)

2. **percolate_scaled_subscriptions ×1 → ×100** (VERDICT r7 item 7): the
   registered subscription-scaled percolation row. Subscriptions derive
   from the corpus (1 per 64 docs), so ×100 docs ⇒ ×100 subscriptions
   (7 812, vocabulary 15 624 terms) — past percolate's 10 k literal-vocab
   threshold, flipping the SAME registered query from the map-side
   literal-intersect plan to the routed join plan automatically. The
   true matching-volume curve wave-14b measured script-only, now on the
   registered artifact.

   Blow-up caveat: the shared /tmp/scale100 blow-up SUFFIXES tokens per
   copy (dedup-realistic, wave-12), which here pairs same-base tokens
   from DIFFERENT copies into one conjunction — zero matches, the exact
   artifact wave-12/14b documented for the fixture subscriptions. This
   wave therefore builds a plain-duplication documents blow-up
   (/tmp/scale100dup: text unchanged, doc_id strided) — every token's
   df scales ×100 uniformly, the ×1 token ranking is preserved as a
   prefix, so the first 78 subscriptions are the ×1 ones matching ×100
   docs each, and the remaining 7 734 dig deeper into the vocabulary —
   the multi-tenant growth shape.

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
OUT_DUP = "/tmp/scale100dup"
COPIES = 100
STRIDE = 10_000_000


def build_dup_blowup(spark) -> None:
    """documents ×100 with text UNCHANGED (doc_id strided) — the blow-up
    for measurements that need real token match volume, not the
    dedup-realistic disjoint shards of scale_curve.build_blowup."""
    import os as _os

    from pyspark.sql import functions as F

    from vector_db_spark.io import load_table

    if _os.path.isdir(_os.path.join(OUT_DUP, "documents.parquet")):
        print(f"# dup blow-up at {OUT_DUP} already present — reusing", flush=True)
        return
    cp = spark.range(COPIES).select(F.col("id").cast("long").alias("__c"))
    docs = load_table(spark, SF1, "documents").crossJoin(F.broadcast(cp))
    out = docs.select(
        (F.col("doc_id") + F.col("__c") * STRIDE).alias("doc_id"),
        *[c for c in load_table(spark, SF1, "documents").columns if c != "doc_id"],
    )
    out.repartition(32).write.mode("overwrite").parquet(
        _os.path.join(OUT_DUP, "documents.parquet")
    )


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
    ap.add_argument(
        "--part",
        choices=["incdedup", "percolate", "ngrams", "index", "all"],
        default="all",
    )
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
        sec_b, n_b, h_b = _timed(lambda: incremental_dedup(co1, ba1), args.runs)
        sec_r, n_r, h_r = _timed(
            lambda: incremental_dedup(co1, ba1, max_broadcast_batch=0), args.runs
        )
        assert (n_b, h_b) == (n_r, h_r), ((n_b, h_b), (n_r, h_r))
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
        sec_c, n_c, _ = _timed(lambda: incremental_dedup(co100, ba100), args.runs)
        results["incdedup_x100_corpus_shaped_batch"] = {
            "sec": sec_c,
            "rows": n_c,
            "batch_rows": n_batch,
            "auto_routed": n_batch > 100_000,
        }
        print(f"# incdedup x100 corpus-shaped: {sec_c}s rows={n_c} "
              f"batch={n_batch} (auto-routed)", flush=True)

        # the measurement that justifies the broadcast DEFAULT: a
        # daily-crawl-sized batch against the big corpus — broadcast
        # streams the corpus map-side, forced routing shuffles it
        co_big = docs100.filter(F.col("doc_id") % 100 != 0)
        ba_small = docs100.filter(F.col("doc_id") % 100 == 0)
        n_small = ba_small.count()
        sec_bb, n_bb, h_bb = _timed(lambda: incremental_dedup(co_big, ba_small), args.runs)
        sec_br, n_br, h_br = _timed(
            lambda: incremental_dedup(co_big, ba_small, max_broadcast_batch=0),
            args.runs,
        )
        assert (n_bb, h_bb) == (n_br, h_br), ((n_bb, h_bb), (n_br, h_br))
        results["incdedup_x100_smallbatch_broadcast_vs_routed"] = {
            "batch_rows": n_small,
            "broadcast_sec": sec_bb,
            "routed_sec": sec_br,
            "rows": n_bb,
            "routed_over_broadcast": round(sec_br / max(sec_bb, 1e-9), 2),
        }
        print(f"# incdedup x100 small-batch: broadcast {sec_bb}s / routed "
              f"{sec_br}s batch={n_small}", flush=True)

    if args.part in ("index", "all"):
        # the persisted signature index (operators/dedup_index.py) vs the
        # re-deriving operator at ×100, same mod-5 split as the registered
        # queries: the probe reads persisted fingerprint/band/shingle
        # tables instead of re-md5ing the corpus text per batch. The win
        # is scale-borne (at sf0.1 fixed costs hide it — PERF.md r8); the
        # one-time build amortizes across every future batch.
        import tempfile

        from vector_db_spark.operators.dedup_index import DedupIndex

        docsA = load_table(spark, OUT_A, "documents")
        coA = docsA.filter(F.col("doc_id") % 5 != 0)
        baA = docsA.filter(F.col("doc_id") % 5 == 0)
        t0 = time.perf_counter()
        idx = DedupIndex.build(
            spark, coA, tempfile.mkdtemp(prefix="didx100_") + "/index"
        )
        build_sec = round(time.perf_counter() - t0, 2)
        sec_rd, n_rd, h_rd = _timed(lambda: incremental_dedup(coA, baA), args.runs)
        sec_ix, n_ix, h_ix = _timed(lambda: idx.probe(baA), args.runs)
        assert (n_rd, h_rd) == (n_ix, h_ix), ((n_rd, h_rd), (n_ix, h_ix))
        results["incdedup_x100_indexed_vs_rederive"] = {
            "build_once_sec": build_sec,
            "rederive_sec": sec_rd,
            "indexed_probe_sec": sec_ix,
            "rows": n_rd,
            "speedup": round(sec_rd / max(sec_ix, 1e-9), 2),
        }
        print(f"# incdedup x100 index: build {build_sec}s, rederive {sec_rd}s, "
              f"probe {sec_ix}s ({round(sec_rd / max(sec_ix, 1e-9), 1)}x)",
              flush=True)

    if args.part in ("ngrams", "all"):
        # decontaminate_ngrams' r8 guard: a benchmark suite that grows
        # with the corpus crosses the 5 M-distinct-shingle probe and the
        # test side stops broadcasting. At ×100 a mod-2 "benchmark" is
        # 250 k docs ≈ 11.7 M distinct 4-grams → auto-routed; parity vs
        # the forced-broadcast form is checked at a mid shape (mod-20,
        # 25 k docs ≈ 1.2 M shingles, both routes feasible).
        from vector_db_spark.operators.curation import decontaminate_ngrams

        docs100 = load_table(spark, OUT_A, "documents")
        tr20 = docs100.filter(F.col("doc_id") % 20 != 0)
        te20 = docs100.filter(F.col("doc_id") % 20 == 0)
        sec_nb, n_nb, h_nb = _timed(
            lambda: decontaminate_ngrams(tr20, te20), args.runs
        )
        sec_nr, n_nr, h_nr = _timed(
            lambda: decontaminate_ngrams(tr20, te20, max_broadcast_shingles=0),
            args.runs,
        )
        assert (n_nb, h_nb) == (n_nr, h_nr), ((n_nb, h_nb), (n_nr, h_nr))
        tr2 = docs100.filter(F.col("doc_id") % 2 != 0)
        te2 = docs100.filter(F.col("doc_id") % 2 == 0)
        sec_big, n_big, _ = _timed(
            lambda: decontaminate_ngrams(tr2, te2), args.runs
        )
        results["decontaminate_ngrams_guard"] = {
            "x100_mod20_broadcast_sec": sec_nb,
            "x100_mod20_routed_sec": sec_nr,
            "x100_mod20_rows": n_nb,
            "x100_mod2_suite_250k_docs_sec": sec_big,
            "x100_mod2_rows": n_big,
            "x100_mod2_auto_routed": True,  # 250 k docs ≈ 11.7 M shingles > 5 M probe
        }
        print(f"# decon_ngrams x100 mod-20: broadcast {sec_nb}s / routed "
              f"{sec_nr}s rows={n_nb}", flush=True)
        print(f"# decon_ngrams x100 mod-2 (corpus-shaped suite, auto-routed): "
              f"{sec_big}s rows={n_big}", flush=True)

    if args.part in ("percolate", "all"):
        build_dup_blowup(spark)
        q = all_queries()["percolate_scaled_subscriptions"]
        row = {}
        for label, sf_dir in (("x1", SF1), ("x100", OUT_DUP)):
            sec, n, _ = _timed(lambda: q(spark, sf_dir), args.runs)
            row[label] = {"sec": sec, "rows": n}
            print(f"# percolate_scaled {label}: {sec}s matches={n}", flush=True)
        row["ratio"] = round(row["x100"]["sec"] / max(row["x1"]["sec"], 1e-9), 2)
        results["percolate_scaled_subscriptions"] = row

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
