"""Wave-14b: a TRUE matching-volume curve for percolation at 100×.

Wave-12 noted an artifact: the 100-disjoint-shard blow-up suffixes every
token with its copy index, so the FIXTURE alert terms match zero blown-up
docs and the measured wall was scan-only. This follow-up restores the
matching volume by blowing up the SUBSCRIPTION side the same way the
corpus was blown up: the 4 fixture queries × 100 copy suffixes (terms
`hash` → `hash_7`), giving 100× docs × 100× stored queries with
within-copy matching — match volume scales ×100 exactly like a real
multi-tenant alerting deployment whose subscriptions grow with its
corpus.

    python scripts/scale_wave14b_percolate.py [--runs 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = "/root/testdata/sf0.1"
OUT_A = "/tmp/scale100"

BASE_QUERIES = [
    ("q_hash_join", ["hash", "join"]),
    ("q_stream3", ["stream", "window", "batch"]),
    ("q_sort", ["sort"]),
    ("q_missing", ["zzzznope"]),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from vector_db_spark.io import load_table
    from vector_db_spark.operators.hybrid import percolate
    from vector_db_spark.session import get_spark

    spark = get_spark("scale-wave14b")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(os.path.join(OUT_A, "documents.parquet")):
        raise SystemExit("blow-up missing — run scripts/scale_wave12.py first")

    for label, sf_dir, n_copies in (("x1", SF1, 1), ("x100", OUT_A, 100)):
        docs = load_table(spark, sf_dir, "documents")
        if n_copies == 1:
            stored_rows = BASE_QUERIES
        else:
            stored_rows = [
                (f"{q}_{c}", [f"{t}_{c}" for t in terms])
                for q, terms in BASE_QUERIES
                for c in range(n_copies)
            ]
        stored = spark.createDataFrame(stored_rows, "query_id string, terms array<string>")
        best, n = float("inf"), 0
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = percolate(docs, stored)
            got = df.agg(
                F.count("*").alias("n"), F.sum(F.hash(*df.columns)).alias("h")
            ).collect()[0]
            n = got.n
            best = min(best, time.perf_counter() - t0)
        print(
            f"# percolate {label}: {best:.2f}s matches={n} "
            f"({len(stored_rows)} subscriptions)",
            flush=True,
        )


if __name__ == "__main__":
    main()
