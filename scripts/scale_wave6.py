"""Wave-6: the derived-k fix for the wave-5 HNSW-export outlier, measured.

Wave-5 measured `hnsw_export_stats` at 73.98 s on the 100x embeddings
corpus: the export runs one Arrow build task per cluster over a FIXED
10-way clustering, so per-task build cost grows linearly with the corpus
while parallelism stays 10. The fix shipped in round 6 is corpus-derived
cluster counts (`IVFIndex.derive_k`, k ~ 4*sqrt(n)); this script measures
the fixed pipeline end to end at 100x (200k vectors):

1. IVF build with k=None (derived k=1789) via the fully-distributed
   pyspark.ml trainer — per-cluster size ~112;
2. per-partition HNSW export over that clustering (same m/ef as the
   registered query) — per-task work now O(sqrt n);
3. a probe-pruned search sanity pass on the result.

Usage: python scripts/scale_wave6.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

X100 = "/tmp/scale100"


def main() -> None:
    from pyspark.sql import functions as F

    from vector_db_spark.io import load_table
    from vector_db_spark.operators.hnsw_export import export_partition_hnsw
    from vector_db_spark.operators.ivf import IVFIndex
    from vector_db_spark.session import get_spark

    spark = get_spark("scale-wave6")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    emb = load_table(spark, X100, "embeddings")
    n = emb.count()
    k = IVFIndex.derive_k(n)
    out["n"], out["derived_k"] = n, k

    path = tempfile.mkdtemp(prefix="wave6_ivf_") + "/index"
    t0 = time.perf_counter()
    idx = IVFIndex.build(spark, emb, None, path, trainer="ml", max_iter=10)
    out["build_ml_sec"] = round(time.perf_counter() - t0, 2)
    sizes = idx.cluster_sizes().agg(
        F.count("*").alias("nc"), F.max("cluster_size").alias("mx"),
        F.expr("percentile(cluster_size, 0.5)").alias("med"),
    ).collect()[0]
    out["n_clusters"] = int(sizes.nc)
    out["max_cluster"] = int(sizes.mx)
    out["median_cluster"] = float(sizes.med)
    print(f"# build k=None(->{k}) trainer=ml: {out['build_ml_sec']}s "
          f"clusters={sizes.nc} max={sizes.mx} med={sizes.med}", flush=True)

    corpus = idx.corpus().select("cluster_id", "vec_id", "embedding")
    t0 = time.perf_counter()
    g = export_partition_hnsw(corpus, m=8, ef_construction=50)
    n_rows = g.count()
    out["hnsw_export_sec"] = round(time.perf_counter() - t0, 2)
    out["hnsw_rows"] = n_rows
    print(f"# hnsw export over derived-k clustering: {out['hnsw_export_sec']}s "
          f"rows={n_rows} (wave-5 fixed-10 baseline: 73.98s)", flush=True)

    queries = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).filter(F.col("query_id") < 10)
    t0 = time.perf_counter()
    hits = idx.search(queries, k=5, n_probe=40).count()
    out["search_nprobe40_sec"] = round(time.perf_counter() - t0, 2)
    out["search_rows"] = hits
    print(f"# search n_probe=40: {out['search_nprobe40_sec']}s rows={hits}", flush=True)

    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
