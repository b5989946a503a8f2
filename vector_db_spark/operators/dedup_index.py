"""Persisted incremental-dedup signature index.

``incremental_dedup`` (operators/dedup.py) re-derives the corpus-side
fingerprint, MinHash-band, and shingle tables on every call — two
map-side md5 passes over the whole corpus per incoming batch, fine for a
one-off but absurd as the daily shape of corpus maintenance. This module
is the upgrade path its docstring promises: the three corpus-side tables
are **built once, persisted as Parquet, and appended per accepted
batch** — exactly the reopen-from-path index lifecycle the IVF/PQ
operators already follow (S9/S10 in SURVEY §2; reference persists its
index artifacts the same build-once/reopen way, hnsw.py:232-247 via
save/load — here the artifact is columnar and engine-readable instead
of a pickle).

Layout at ``<path>/``:

- ``params.json`` — the signature geometry (n, n_hashes, n_bands,
  prefix_tokens, column names). Probes and appends MUST reuse the build
  geometry or band keys stop matching; reopening reads it back so a
  mismatched probe is impossible by construction.
- ``fingerprints`` — (id, fingerprint): the exact-dup probe table.
- ``bands`` — (id, band, band_key): the LSH candidate probe table.
- ``shingles`` — (id, shingle): what the exact-Jaccard verify reads.
  This is the corpus-sized artifact (≈ n× the token stream); the probe
  cuts it to candidate docs with a semi-join before any aggregation. At
  cluster scale, bucket it by the id column (``bucketBy`` + table
  catalog) so the candidate cut prunes file groups instead of scanning;
  the plan shape is identical.

Probe semantics are IDENTICAL to ``incremental_dedup`` (same oracle SQL
verifies both registered queries) — the index only removes the
re-derivation. The batch side keeps the r8 probed-broadcast guard:
past ``max_broadcast_batch`` incoming rows every batch-side hint drops
and the joins shuffle under Catalyst/AQE.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_db_spark.caching import tracked_cache
from vector_db_spark.functions.text import doc_fingerprint
from vector_db_spark.operators.dedup import (
    band_keys,
    jaccard_verify,
    minhash_wide,
    shingle_table,
)


class DedupIndex:
    """Reopen-from-path handle over a persisted dedup signature index."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, "params.json")) as f:
            p = json.load(f)
        self.text_col: str = p["text_col"]
        self.id_col: str = p["id_col"]
        self.n: int = p["n"]
        self.n_hashes: int = p["n_hashes"]
        self.n_bands: int = p["n_bands"]
        self.prefix_tokens: int | None = p["prefix_tokens"]

    # -- paths ------------------------------------------------------------

    @property
    def fingerprints_path(self) -> str:
        return os.path.join(self.path, "fingerprints")

    @property
    def bands_path(self) -> str:
        return os.path.join(self.path, "bands")

    @property
    def shingles_path(self) -> str:
        return os.path.join(self.path, "shingles")

    # -- build / append -----------------------------------------------------

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        corpus: DataFrame,
        path: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        *,
        n: int = 3,
        n_hashes: int = 8,
        n_bands: int = 4,
        prefix_tokens: int | None = None,
    ) -> "DedupIndex":
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "params.json"), "w") as f:
            json.dump(
                {
                    "text_col": text_col,
                    "id_col": id_col,
                    "n": n,
                    "n_hashes": n_hashes,
                    "n_bands": n_bands,
                    "prefix_tokens": prefix_tokens,
                },
                f,
            )
        idx = cls(spark, path)
        idx._write(corpus, mode="overwrite")
        return idx

    def _write(self, docs: DataFrame, *, mode: str) -> None:
        """Derive the three signature tables map-side and persist them.
        The shingle stream is cached for the span of the write (it feeds
        both the minhash signatures and the shingle store — without the
        cache the explode+md5 lineage runs twice)."""
        fp = doc_fingerprint(self.text_col, self.prefix_tokens)
        docs.select(self.id_col, fp.alias("fingerprint")).write.mode(mode).parquet(
            self.fingerprints_path
        )
        sh = tracked_cache(
            shingle_table(docs, self.text_col, self.id_col, self.n),
            "dedup_index.write.sh",
        )
        band_keys(
            minhash_wide(sh, self.id_col, self.n_hashes), self.id_col, self.n_bands
        ).write.mode(mode).parquet(self.bands_path)
        sh.write.mode(mode).parquet(self.shingles_path)

    def append(self, batch: DataFrame) -> None:
        """Add an accepted batch's signatures (the post-``probe`` step of
        corpus maintenance: keep the ``is_new`` rows, then index them).
        Parquet append — each batch lands as new files, no rewrite of
        existing data. Ids must stay disjoint with what is indexed (they
        share one id space in a real corpus)."""
        self._write(batch, mode="append")

    # -- tables -------------------------------------------------------------

    def fingerprints(self) -> DataFrame:
        return self.spark.read.parquet(self.fingerprints_path)

    def bands(self) -> DataFrame:
        return self.spark.read.parquet(self.bands_path)

    def shingles(self) -> DataFrame:
        return self.spark.read.parquet(self.shingles_path)

    # -- probe ----------------------------------------------------------------

    def probe(
        self,
        incoming: DataFrame,
        *,
        threshold: float = 0.5,
        max_broadcast_batch: int = 100_000,
    ) -> DataFrame:
        """``incremental_dedup`` against the PERSISTED corpus tables —
        one row per incoming document: ``(id, dup_exact_of, dup_near_of,
        near_jaccard, is_new)``, byte-identical to the re-deriving
        operator on the same data (shared oracle SQL). The corpus text is
        never touched: the exact probe reads the fingerprint store, the
        candidate probe reads the band store, and the Jaccard verify
        reads the shingle store cut to candidate docs."""
        id_col = self.id_col
        small = (
            incoming.select(id_col).limit(max_broadcast_batch + 1).count()
            <= max_broadcast_batch
        )
        hint = F.broadcast if small else (lambda d: d)
        fp = doc_fingerprint(self.text_col, self.prefix_tokens)
        in_fp = incoming.select(F.col(id_col), fp.alias("fingerprint"))
        exact = (
            self.fingerprints()
            .select(F.col(id_col).alias("__ex_id"), "fingerprint")
            .join(hint(in_fp), "fingerprint")
            .groupBy(id_col)
            .agg(F.min("__ex_id").alias("dup_exact_of"))
        )

        in_sh = tracked_cache(
            shingle_table(incoming, self.text_col, id_col, self.n),
            "dedup_index.probe.in_sh",
        )
        in_bands = band_keys(
            minhash_wide(in_sh, id_col, self.n_hashes), id_col, self.n_bands
        )
        cand = (
            self.bands()
            .select(F.col(id_col).alias("doc_b"), "band", "band_key")
            .join(
                hint(
                    in_bands.select(
                        F.col(id_col).alias("doc_a"), "band", "band_key"
                    )
                ),
                ["band", "band_key"],
            )
            .select("doc_a", "doc_b")
            .distinct()
        )
        near = jaccard_verify(
            in_sh.unionByName(self.shingles()), cand, id_col, threshold,
            broadcast=small,
        )
        w = Window.partitionBy("doc_a").orderBy(F.desc("jaccard"), F.asc("doc_b"))
        near_best = (
            near.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                F.col("doc_a").alias(id_col),
                F.col("doc_b").alias("dup_near_of"),
                F.col("jaccard").alias("near_jaccard"),
            )
        )
        return (
            incoming.select(id_col)
            .join(exact, id_col, "left")
            .join(near_best, id_col, "left")
            .select(
                id_col,
                "dup_exact_of",
                "dup_near_of",
                "near_jaccard",
                (
                    F.col("dup_exact_of").isNull() & F.col("dup_near_of").isNull()
                ).alias("is_new"),
            )
        )
