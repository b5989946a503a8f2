"""Wave-16: measurements for the round-9 work.

1. **Bucketed vs unbucketed DedupIndex probe at ×100** (VERDICT r8 weak
   #1 closure, plus the two rules the first measurement forced): the
   stores are hash-clustered into corpus-derived ``n_buckets`` partition
   dirs and probes push ``__bucket IN (...)`` — but ONLY when it can
   pay: the naive always-prune form measured 0.62-0.84× at ×100 (a
   REGRESSION — collection jobs + 256-dir listing cost more than the
   1-2 s full scan they saved), which is why ``_read`` now carries the
   2·B saturation guard and the ``min_prune_bytes`` store-size gate.
   This wave measures the gated form at ×100 (expected ≈ parity with
   the flat index on every batch shape — the gate skips pruning on a
   fixture-small store) and the forced form (``min_prune_bytes=0``,
   documenting the overhead the gate removes). Hash-asserted equal in
   all regimes.

2. **Pruned vs unpruned at ×1000** — the store size where the mechanism
   pays: a ~5 M-doc corpus (documents-only suffixed blow-up at
   /tmp/scale1000docs) gives a >1 GiB shingle store, so the default
   gate turns pruning ON for it (and rightly leaves the smaller
   fingerprint/band stores unpruned). The same bucketed index is probed
   with pruning enabled (default) vs disabled (``min_prune_bytes``
   huge) — same files, same layout, the filter is the only difference.

3. **Maintenance epoch at ×100** (streaming/maintenance.py sink math,
   run inline): probe a 1 000-doc batch against the 400 k-doc index,
   accept the new rows, append their signatures under an epoch txn,
   replay the committed epoch (must be a marker-stat no-op), compact,
   and probe again.

Protocol identical to waves 10-15: min of N timed runs, full-evaluation
``agg(count, sum(hash(*)))`` consumer, blow-up reused from /tmp/scale100.

    python scripts/scale_wave16.py [--runs 2] [--part x100|x1000|epoch|all]
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


OUT_1000 = "/tmp/scale1000docs"
SF1 = "/root/testdata/sf0.1"
ID_STRIDE = 10_000_000


def build_docs_blowup_1000(spark) -> None:
    """documents-only ×1000 suffixed blow-up (same disjoint-shard text
    transform as scale_curve.build_blowup, copies=1000): ~5 M docs,
    enough shingle volume to push the store past the 1 GiB prune gate."""
    from pyspark.sql import functions as F

    from vector_db_spark.io import load_table

    if os.path.isdir(os.path.join(OUT_1000, "documents.parquet")):
        print(f"# x1000 docs blow-up at {OUT_1000} already present — reusing",
              flush=True)
        return
    cp = spark.range(1000).select(F.col("id").cast("int").alias("__c"))
    docs = load_table(spark, SF1, "documents").crossJoin(F.broadcast(cp))
    suffixed = F.array_join(
        F.transform(
            F.split(F.col("text"), r"\s+"),
            lambda x: F.concat(x, F.lit("_"), F.col("__c").cast("string")),
        ),
        " ",
    )
    docs.select(
        (F.col("doc_id") + F.col("__c").cast("long") * ID_STRIDE).alias("doc_id"),
        suffixed.alias("text"),
        "lang",
        "source",
        "n_chars",
    ).repartition(64).write.mode("overwrite").parquet(
        os.path.join(OUT_1000, "documents.parquet")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--part", choices=["x100", "x1000", "epoch", "all"], default="all"
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from scale_curve import build_blowup

    from vector_db_spark.operators.dedup_index import DedupIndex
    from vector_db_spark.io import load_table
    from vector_db_spark.session import get_spark

    spark = get_spark("scale-wave16")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    bidx = None

    if args.part in ("x100", "epoch", "all"):
        build_blowup(spark, OUT_A, copies=100)
        docs = load_table(spark, OUT_A, "documents")
        corpus = docs.filter(F.col("doc_id") % 5 != 0)
        batches = {
            "micro_40": docs.filter(F.col("doc_id") % 12_500 == 0),
            "mid_1000": docs.filter(F.col("doc_id") % 500 == 0),
            "corpus_100k": docs.filter(F.col("doc_id") % 5 == 0),
        }
        t0 = time.perf_counter()
        bpath = tempfile.mkdtemp(prefix="didx16b_") + "/index"
        bidx = DedupIndex.build(spark, corpus, bpath)
        build_bucketed = round(time.perf_counter() - t0, 2)

    if args.part in ("x100", "all"):
        t0 = time.perf_counter()
        fidx = DedupIndex.build(
            spark, corpus, tempfile.mkdtemp(prefix="didx16f_") + "/index",
            n_buckets=None,
        )
        build_flat = round(time.perf_counter() - t0, 2)
        results["index_build_x100"] = {
            "n_buckets_derived": bidx.n_buckets,
            "build_bucketed_sec": build_bucketed,
            "build_flat_sec": build_flat,
        }
        print(
            f"# build x100: bucketed (B={bidx.n_buckets}) {build_bucketed}s "
            f"/ flat {build_flat}s",
            flush=True,
        )
        forced = DedupIndex(spark, bpath, min_prune_bytes=0)
        for label, batch in batches.items():
            n_docs = batch.count()
            sec_bp, n_bp, h_bp = _timed(lambda: bidx.probe(batch), args.runs)
            sec_fp, n_fp, h_fp = _timed(lambda: fidx.probe(batch), args.runs)
            sec_xp, n_xp, h_xp = _timed(lambda: forced.probe(batch), args.runs)
            assert (n_bp, h_bp) == (n_fp, h_fp) == (n_xp, h_xp)
            results[f"index_probe_x100_{label}"] = {
                "batch_rows": n_docs,
                "gated_probe_sec": sec_bp,
                "flat_probe_sec": sec_fp,
                "forced_prune_sec": sec_xp,
                "rows": n_bp,
                "gated_over_flat": round(sec_bp / max(sec_fp, 1e-9), 2),
            }
            print(
                f"# probe x100 {label} ({n_docs} docs): gated {sec_bp}s / "
                f"flat {sec_fp}s / forced-prune {sec_xp}s",
                flush=True,
            )

    if args.part in ("x1000", "all"):
        build_docs_blowup_1000(spark)
        docs1k = load_table(spark, OUT_1000, "documents")
        corpus1k = docs1k.filter(F.col("doc_id") % 5 != 0)
        micro1k = docs1k.filter(F.col("doc_id") % 50_000 == 0)
        t0 = time.perf_counter()
        path1k = tempfile.mkdtemp(prefix="didx16k_") + "/index"
        idx1k = DedupIndex.build(spark, corpus1k, path1k)
        build_1k = round(time.perf_counter() - t0, 2)
        pruned = DedupIndex(spark, path1k)  # default gate: big store -> on
        unpruned = DedupIndex(spark, path1k, min_prune_bytes=1 << 62)
        store_gb = {
            s: round(pruned._size_of(p) / 2**30, 2)
            for p, s in ((pruned.shingles_path, "shingles"),
                         (pruned.bands_path, "bands"),
                         (pruned.fingerprints_path, "fingerprints"))
        }
        n_micro = micro1k.count()
        sec_p, n_p, h_p = _timed(lambda: pruned.probe(micro1k), args.runs)
        sec_u, n_u, h_u = _timed(lambda: unpruned.probe(micro1k), args.runs)
        assert (n_p, h_p) == (n_u, h_u), ((n_p, h_p), (n_u, h_u))

        # bytes-read selectivity: wall barely moves on page-cached local
        # NVMe (a 2 GB scan costs ~2 s), so the SCALE evidence is the
        # fraction of store bytes the pruned probe touches — replay each
        # probe side's bucket filter against the on-disk layout
        from vector_db_spark.functions.text import doc_fingerprint
        from vector_db_spark.operators.dedup import (
            band_keys, minhash_wide, shingle_table,
        )

        def selectivity(store_path, probe_df, key):
            B = pruned.n_buckets
            hit_b = {
                r[0]
                for r in probe_df.select(
                    F.pmod(F.xxhash64(F.col(key)), F.lit(B)).alias("b")
                ).distinct().collect()
            }
            dirs = [d for d in os.listdir(store_path)
                    if d.startswith("__bucket=")]

            def size(ds):
                t = 0
                for d in ds:
                    for root, _, names in os.walk(os.path.join(store_path, d)):
                        t += sum(
                            os.path.getsize(os.path.join(root, f))
                            for f in names if f.endswith(".parquet")
                        )
                return t

            hit = [d for d in dirs if int(d.split("=")[1]) in hit_b]
            return {
                "dirs_read": len(hit),
                "dirs_total": len(dirs),
                "mib_read": round(size(hit) / 2**20, 1),
                "mib_total": round(size(dirs) / 2**20, 1),
            }

        in_fp = micro1k.select(
            doc_fingerprint("text", pruned.prefix_tokens).alias("fingerprint")
        )
        in_sh = shingle_table(micro1k, "text", "doc_id", pruned.n)
        in_bands = band_keys(
            minhash_wide(in_sh, "doc_id", pruned.n_hashes),
            "doc_id",
            pruned.n_bands,
        )
        cand_docs = (
            pruned.bands(probe_keys=in_bands.select("band_key"))
            .select(F.col("doc_id").alias("doc_b"), "band", "band_key")
            .join(
                in_bands.select(F.col("doc_id").alias("doc_a"), "band", "band_key"),
                ["band", "band_key"],
            )
            .select("doc_b")
            .distinct()
        )
        sel = {
            "fingerprints": selectivity(
                pruned.fingerprints_path, in_fp, "fingerprint"
            ),
            "bands": selectivity(pruned.bands_path, in_bands, "band_key"),
            "shingles": selectivity(pruned.shingles_path, cand_docs, "doc_b"),
        }
        for s, v in sel.items():
            print(
                f"# x1000 selectivity {s}: {v['dirs_read']}/{v['dirs_total']}"
                f" dirs, {v['mib_read']}/{v['mib_total']} MiB read",
                flush=True,
            )
        results["index_probe_x1000_micro_pruned_vs_not"] = {
            "corpus_rows": corpus1k.count(),
            "batch_rows": n_micro,
            "n_buckets_derived": idx1k.n_buckets,
            "store_gb": store_gb,
            "build_once_sec": build_1k,
            "pruned_probe_sec": sec_p,
            "unpruned_probe_sec": sec_u,
            "rows": n_p,
            "speedup": round(sec_u / max(sec_p, 1e-9), 2),
            "selectivity": sel,
        }
        print(
            f"# probe x1000 micro ({n_micro} docs, B={idx1k.n_buckets}, "
            f"stores {store_gb}): pruned {sec_p}s / unpruned {sec_u}s "
            f"({round(sec_u / max(sec_p, 1e-9), 2)}x)",
            flush=True,
        )

    if args.part in ("epoch", "all"):
        # maintenance epoch: probe -> accept -> txn append -> replay no-op
        batch_small = batches["mid_1000"]
        n_small = batch_small.count()
        t0 = time.perf_counter()
        verdicts = bidx.probe(batch_small).localCheckpoint(eager=True)
        accepted = batch_small.join(
            verdicts.filter(F.col("is_new")).select("doc_id"),
            "doc_id",
            "left_semi",
        ).localCheckpoint(eager=True)
        n_accepted = accepted.count()
        bidx.append(accepted, txn_id="wave16:0")
        epoch_sec = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        bidx.append(accepted, txn_id="wave16:0")  # committed epoch replay
        replay_sec = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        bidx.compact()
        compact_sec = round(time.perf_counter() - t0, 2)
        sec_pc, _, _ = _timed(
            lambda: bidx.probe(batches["micro_40"]), args.runs
        )
        results["maintenance_epoch_x100"] = {
            "batch_rows": n_small,
            "accepted_rows": n_accepted,
            "probe_accept_append_sec": epoch_sec,
            "replay_noop_sec": replay_sec,
            "compact_sec": compact_sec,
            "micro_probe_after_compact_sec": sec_pc,
        }
        print(
            f"# maintenance epoch x100: {epoch_sec}s ({n_accepted} accepted), "
            f"replay no-op {replay_sec}s, compact {compact_sec}s, micro "
            f"probe after compact {sec_pc}s",
            flush=True,
        )

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
