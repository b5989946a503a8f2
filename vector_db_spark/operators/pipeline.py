"""Corpus-cleaning pipeline: the end-to-end shape of an LLM training-data
prep job, composed from this engine's filter/quality/dedup operators.

    metadata filter → quality floor → exact dedup → MinHash near-dup cut

Each stage is a DataFrame transform, so the whole pipeline is ONE lazy
Catalyst plan: the metadata and quality predicates sit below the dedup
shuffles (cheap map-side cuts happen first), the exact-dedup shuffle keys
on a 16-byte digest, and the near-dup stage only ever shuffles same-bucket
candidates (see operators/dedup.py). Nothing here collects to the driver.

Survivor semantics are deterministic and engine-reproducible:

- exact dedup keeps the **minimum id** per content fingerprint;
- the near-dup cut drops the **greater id of every qualifying pair**
  (greedy, single-pass — the standard production choice; a transitive
  union-find grouping would need an iterative computation, see
  ``operators.knn_graph.connected_components`` for that pattern).

The reference has no pipeline surface (single-vector CRUD only); this is
north-star extension glue, oracle-checked end-to-end via
``queries/text.py::corpus_clean_pipeline``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_db_spark.functions.text import (
    doc_fingerprint,
    quality_score,
    token_count,
)
from vector_db_spark.operators.dedup import near_dup_pairs_minhash


def clean_corpus(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str | None = None,
    lang_col: str = "lang",
    min_tokens: int = 0,
    quality_floor: float = 0.0,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Survivor rows of ``docs`` (original columns preserved) after the
    four cleaning stages. Stages with default thresholds are no-ops and
    add nothing to the plan."""
    d = docs
    if lang is not None:
        d = d.filter(F.col(lang_col) == lang)
    if min_tokens > 0:
        d = d.filter(token_count(text_col) >= min_tokens)
    if quality_floor > 0.0:
        d = d.filter(quality_score(text_col) >= quality_floor)

    # exact dedup: min id per full-content fingerprint
    fp = d.withColumn("__fp", doc_fingerprint(text_col))
    keep = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    d = fp.join(keep, ["__fp", id_col], "left_semi").drop("__fp")

    # near-dup cut on what's left: drop the greater id of each pair
    pairs = near_dup_pairs_minhash(
        d, text_col, id_col, threshold=jaccard_threshold
    )
    losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return d.join(losers, id_col, "left_anti")
