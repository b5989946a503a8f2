"""Wave-4 scale sweep (VERDICT r5 item 6, plus the done-criteria of
items 1, 2, 7): the index-build/search families and the round-6 knob
derivations, measured at the existing 10x/100x disjoint-shard blow-ups
(scripts/scale_curve.py builds them; this script reuses the dirs).

Sections:

A. registry rows `ivf_search_kmeans`, `ivfpq_search_kmeans`,
   `bq_hamming_search` at x1 / x10 / x100 — wall (min-of-2), rows,
   warn-grade plan shapes (flip detection), covering the IVF probe /
   IVFPQ ADC / binary-quant Hamming scan paths the LSH-knob run missed.
B. `IVFIndex.split_cluster` exercised on the NATURALLY hottest k-means
   cluster of the 100x embeddings corpus (200k vectors): wall, size
   conservation, and exhaustive-probe == brute-force equivalence on a
   query sample before/after.
C. `embedding_near_dup` with DEFAULT arguments at x10/x100 — the
   corpus-derived LSH geometry (similarity.derive_lsh_geometry) doing
   its job without manual knobs (VERDICT item 2 done-criterion).
D. `tfidf_cosine_pairs_cut` at x100 — the budget-derived df ceiling
   bounding the posting join on the sharded corpus where the old
   relative cut degenerated to 7.3B rows / 645 s (item 1 criterion).
E. stochastic-greedy coverage at x100, cached vs materialize_dir
   (partitionBy __b) — per-round scan fraction under file-level
   partition pruning (item 7 criterion).

Usage: python scripts/scale_wave4.py [--skip A,B,...]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = "/root/testdata/sf0.1"
X10 = "/tmp/scale10"
X100 = "/tmp/scale100"

RESULTS: dict = {}


def warn_shapes(df) -> list[str]:
    from vector_db_spark.plans import audit_plan

    return sorted({f.code for f in audit_plan(df) if f.severity == "warn"})


def timed(fn, runs=2):
    best, out = float("inf"), None
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def section_a(spark):
    from vector_db_spark.queries import all_queries

    qs = all_queries()
    out = {}
    for name in ["ivf_search_kmeans", "ivfpq_search_kmeans", "bq_hamming_search"]:
        row = {}
        for label, d in (("x1", SF1), ("x10", X10), ("x100", X100)):
            df = qs[name](spark, d)
            shapes = warn_shapes(df)
            sec, n = timed(lambda: qs[name](spark, d).count())
            row[label] = {"sec": round(sec, 2), "rows": n, "warn_shapes": shapes}
            print(f"# A {name} {label}: {sec:.2f}s rows={n} shapes={shapes}", flush=True)
        row["ratio_100_over_10"] = round(row["x100"]["sec"] / max(row["x10"]["sec"], 1e-9), 2)
        row["shape_flip"] = len({tuple(row[k]["warn_shapes"]) for k in ("x1", "x10", "x100")}) > 1
        out[name] = row
    RESULTS["A_index_search"] = out


def section_b(spark):
    from pyspark.sql import functions as F

    from vector_db_spark.io import load_table
    from vector_db_spark.operators.ivf import IVFIndex
    from vector_db_spark.operators.knn import knn_join

    emb = load_table(spark, X100, "embeddings")
    path = tempfile.mkdtemp(prefix="wave4_ivf_") + "/index"
    t0 = time.perf_counter()
    idx = IVFIndex.build(spark, emb, k=10, path=path)
    build_s = time.perf_counter() - t0
    sizes = {int(r.cluster_id): int(r.cluster_size) for r in idx.cluster_sizes().collect()}
    hot = max(sizes, key=sizes.get)
    total = sum(sizes.values())
    queries = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).filter(F.col("query_id") < 5)
    k_all = len(sizes)
    before = {
        (r.query_id, r.neighbor_id)
        for r in idx.search(queries, k=5, n_probe=k_all).collect()
    }
    t0 = time.perf_counter()
    info = idx.split_cluster(hot, n_sub=4)
    split_s = time.perf_counter() - t0
    sizes_after = {int(r.cluster_id): int(r.cluster_size) for r in idx.cluster_sizes().collect()}
    after = {
        (r.query_id, r.neighbor_id)
        for r in idx.search(queries, k=5, n_probe=len(sizes_after)).collect()
    }
    brute = {
        (r.query_id, r.neighbor_id)
        for r in knn_join(queries, emb, 5, impl="batch", id_col="vec_id").collect()
    }
    RESULTS["B_split_cluster_x100"] = {
        "build_sec": round(build_s, 2),
        "split_sec": round(split_s, 2),
        "n_vectors": total,
        "hot_cluster": hot,
        "hot_size": sizes[hot],
        "hot_frac": round(sizes[hot] / total, 3),
        "new_sizes": info["sizes"],
        "conserved": sum(sizes_after.values()) == total,
        "exhaustive_probe_eq_brute_before": before == brute,
        "exhaustive_probe_eq_brute_after": after == brute,
    }
    print(f"# B split_cluster: build {build_s:.1f}s hot={hot}({sizes[hot]}) "
          f"split {split_s:.1f}s conserved={sum(sizes_after.values())==total} "
          f"probeall==brute: {before==brute}/{after==brute}", flush=True)
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def section_c(spark):
    from vector_db_spark.io import load_table
    from vector_db_spark.operators.dedup import embedding_near_dup_blocked
    from vector_db_spark.operators.similarity import derive_lsh_geometry

    out = {}
    for label, d in (("x10", X10), ("x100", X100)):
        emb = load_table(spark, d, "embeddings")
        n = emb.count()
        geom = derive_lsh_geometry(n, threshold=0.45)
        t0 = time.perf_counter()
        pairs = embedding_near_dup_blocked(
            emb, threshold=0.45, corpus_count=n
        ).count()
        sec = time.perf_counter() - t0
        out[label] = {"n": n, "geometry_L_h": list(geom), "sec": round(sec, 2), "pairs": pairs}
        print(f"# C embedding_near_dup default {label}: n={n} (L,h)={geom} "
              f"{sec:.2f}s pairs={pairs}", flush=True)
    out["ratio_100_over_10"] = round(out["x100"]["sec"] / max(out["x10"]["sec"], 1e-9), 2)
    RESULTS["C_near_dup_auto_geometry"] = out


def section_d(spark):
    import duckdb

    from vector_db_spark.queries import EXTRA_QUERIES
    from vector_db_spark.queries.text import _TFIDF_CUT_BUDGET

    t0 = time.perf_counter()
    rows = EXTRA_QUERIES["tfidf_cosine_pairs_cut"](spark, X100).count()
    sec = time.perf_counter() - t0
    # independent volume audit: the ceiling the budget derives at 100x and
    # the posting-join volume under it
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{X100}/documents.parquet/*.parquet')"
    )
    vol = con.execute("""
WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk FROM documents),
big AS (SELECT doc_id, tk[i] || ' ' || tk[i+1] AS tok FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM t)),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM big GROUP BY 1,2),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
hist AS (SELECT df AS dfv, count(*) AS c FROM df GROUP BY df),
cum AS (SELECT dfv, sum(c*dfv*dfv) OVER (ORDER BY dfv) AS cumv FROM hist),
ceil AS (SELECT coalesce(max(dfv), 0) AS d FROM cum WHERE cumv <= {b})
SELECT (SELECT d FROM ceil) AS ceiling,
       (SELECT coalesce(max(cumv), 0) FROM cum WHERE dfv <= (SELECT d FROM ceil)) AS join_volume,
       (SELECT sum(c*dfv*dfv) FROM hist) AS full_volume
""".format(b=_TFIDF_CUT_BUDGET)).fetchone()
    RESULTS["D_tfidf_budget_cut_x100"] = {
        "sec": round(sec, 2),
        "rows": rows,
        "budget": _TFIDF_CUT_BUDGET,
        "derived_ceiling": int(vol[0]),
        "join_volume": int(vol[1]),
        "full_volume": int(vol[2]),
    }
    print(f"# D tfidf_cut x100: {sec:.2f}s rows={rows} ceiling={vol[0]} "
          f"volume={vol[1]} (full {vol[2]})", flush=True)


def section_e(spark):
    from pyspark.sql import functions as F

    from vector_db_spark.functions.text import shingles, tokens
    from vector_db_spark.io import load_table
    from vector_db_spark.operators.selection import stochastic_greedy_max_coverage

    docs = load_table(spark, X100, "documents")
    inc = docs.select("doc_id", F.explode(shingles(tokens("text"), 3)).alias("g"))
    k = 25
    out = {}
    t0 = time.perf_counter()
    cached = stochastic_greedy_max_coverage(inc, k, eps=0.1)
    out["cached_sec"] = round(time.perf_counter() - t0, 2)
    mdir = tempfile.mkdtemp(prefix="wave4_inc_") + "/inc"
    t0 = time.perf_counter()
    disk = stochastic_greedy_max_coverage(inc, k, eps=0.1, materialize_dir=mdir)
    out["materialized_sec"] = round(time.perf_counter() - t0, 2)
    out["decisions_equal"] = cached == disk
    # per-round scan fraction: rows in one bucket vs the whole incidence
    back = spark.read.parquet(mdir)
    n_inc = back.count()
    one_bucket = back.filter(F.col("__b") == 0).count()
    out["incidence_rows"] = n_inc
    out["one_bucket_rows"] = one_bucket
    out["scan_fraction"] = round(one_bucket / max(n_inc, 1), 4)
    # wall of a pruned single-bucket pass vs a full pass over the files
    # count() on parquet is footer-served; aggregate the payload column so
    # the pruned vs full passes really read pages
    sec_b, _ = timed(
        lambda: back.filter(F.col("__b") == 0).agg(F.sum(F.length("g"))).collect(),
        runs=2,
    )
    sec_f, _ = timed(lambda: back.agg(F.sum(F.length("g"))).collect(), runs=2)
    out["bucket_scan_sec"] = round(sec_b, 2)
    out["full_scan_sec"] = round(sec_f, 2)
    print(f"# E coverage x100: cached {out['cached_sec']}s vs materialized "
          f"{out['materialized_sec']}s equal={out['decisions_equal']} "
          f"scan_frac={out['scan_fraction']} bucket {sec_b:.2f}s vs full {sec_f:.2f}s",
          flush=True)
    shutil.rmtree(os.path.dirname(mdir), ignore_errors=True)
    RESULTS["E_coverage_materialized_x100"] = out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    skip = set(args.skip.upper().split(",")) if args.skip else set()

    from vector_db_spark.session import get_spark

    spark = get_spark("scale-wave4")
    spark.sparkContext.setLogLevel("ERROR")
    for key, fn in (("A", section_a), ("B", section_b), ("C", section_c),
                    ("D", section_d), ("E", section_e)):
        if key in skip:
            continue
        try:
            fn(spark)
        except Exception as ex:  # keep later sections alive
            RESULTS[f"{key}_ERROR"] = f"{type(ex).__name__}: {ex}"
            print(f"# {key} ERROR {type(ex).__name__}: {ex}", flush=True)
    print(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()
