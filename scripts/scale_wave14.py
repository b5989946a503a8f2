"""Wave-14: 100× curves for the round-7 driver-tier promotions that had
none — after this, every driver-tier family has both a hard correctness
row AND a measured scale curve.

- blow-up A (documents/embeddings/events ×100, scale_curve.build_blowup):
  udtf_token_positions, ewma_purchase_values, decayed_event_type_scores,
  incremental_dedup, corpus_drift_js, sq8_search, jl_projection_audit,
  ann_lsh_multiprobe, node2vec_biased_walks, graph_skipgram_pairs.
- blow-up B (lineitem/orders/customer ×100, wave-12's scd dir):
  asof_nearest_order, copurchase_ktruss (mod-5 scoped co-purchase graph —
  the expensive one, run last).

Same protocol as waves 10-12: min of 2, warn-shape flip check.

    python scripts/scale_wave14.py [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT_A = "/tmp/scale100"
OUT_B = "/tmp/scale100scd"

QUERIES_A = [
    "udtf_token_positions",
    "ewma_purchase_values",
    "decayed_event_type_scores",
    "incremental_dedup",
    "corpus_drift_js",
    "sq8_search",
    "jl_projection_audit",
    "ann_lsh_multiprobe",
    "node2vec_biased_walks",
    "graph_skipgram_pairs",
]
QUERIES_B = ["asof_nearest_order", "copurchase_ktruss"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()

    from scale_curve import build_blowup
    from scale_wave12 import build_scd_blowup, run

    from vector_db_spark.queries import all_queries
    from vector_db_spark.session import get_spark

    spark = get_spark("scale-wave14")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    build_blowup(spark, OUT_A, copies=100)
    build_scd_blowup(spark)
    print(f"# blow-ups ready in {time.perf_counter() - t0:.1f}s", flush=True)

    qs = all_queries()
    only = set(args.queries.split(",")) if args.queries else None
    qa = [q for q in QUERIES_A if only is None or q in only]
    qb = [q for q in QUERIES_B if only is None or q in only]
    results = run(spark, qs, qa, OUT_A, args.runs)
    results.update(run(spark, qs, qb, OUT_B, args.runs))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
