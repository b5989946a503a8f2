"""Streaming corpus maintenance: the daily shape the dedup signature
index exists for (operators/dedup_index.py), wired end to end.

Per micro-batch of arriving documents:

1. **probe** the batch against the persisted signature index — exact
   fingerprint dup, LSH-candidate near dup, exact-Jaccard verify; the
   corpus-sized stores are read bucket-pruned, never re-derived;
2. **accept** the ``is_new`` rows (duplicates are dropped, their
   verdicts optionally audited);
3. **append** the accepted rows to the corpus table and their
   signatures to the index — both **exactly-once under replay**.

This is the reference's per-document write path (insert → duplicate
check → persist; reference app.py POST /insert + store dedup) at
micro-batch scale, and the composition SURVEY §2.8 streaming + the
S9/S10 index lifecycle were building toward.

Exactly-once mechanics (the ``VersionedTable.append(txn_id)`` pattern,
``versioned_ingest_stream`` is the template): foreachBatch is
at-least-once — a crash between the sink's writes and the checkpoint's
epoch commit replays the epoch — so every write keys on the epoch:

- the accepted-documents corpus is a :class:`VersionedTable`;
  ``append(txn_id=f"{prefix}:{epoch}")`` no-ops on a replayed epoch
  (the txn is already in the manifest log);
- the signature index append is ``DedupIndex.append(txn_id=...)`` —
  dynamic-partition-overwrite of the epoch's own ``__txn`` partitions,
  so even a crash mid-way through the three store writes heals on
  replay instead of duplicating (dedup_index.py module docstring).

The probe itself is stateless (pure function of batch + index state),
so replaying it is merely redundant work, never a correctness issue —
same argument as ``query_serving_stream``.

The dedup verdicts additionally ride to an audit sink when
``audit_path`` is set — one row per incoming doc per epoch with its
``(dup_exact_of, dup_near_of, near_jaccard, is_new)`` verdict, the
table a curation dashboard reads. The audit sink is a VersionedTable
under the same epoch txn, so it shares the exactly-once guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_db_spark.operators.dedup_index import DedupIndex
from vector_db_spark.operators.versioned import VersionedTable


def dedup_maintenance_stream(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    corpus_path: str,
    *,
    schema: str,
    checkpoint_dir: str,
    audit_path: str | None = None,
    threshold: float = 0.5,
    txn_prefix: str = "dedup-maint",
    max_files_per_trigger: int = 1,
):
    """Run the probe → accept → append maintenance pipeline over files
    arriving in ``source_dir``. The index at ``index_path`` must exist
    (``DedupIndex.build`` on the seed corpus); ``corpus_path`` is the
    accepted-documents VersionedTable (created on first commit).
    Returns the StreamingQuery (caller awaits termination).

    Duplicate semantics within one epoch match ``DedupIndex.probe``
    (i.e. ``incremental_dedup``): batch docs are compared against the
    INDEXED corpus, not against each other — intra-batch duplicates of
    a never-seen document are all new this epoch and become indexed
    corpus members; the next epoch's copies then dedup against them.
    Smaller ``max_files_per_trigger`` tightens that window, exactly the
    trade the batch operator documents."""
    idx = DedupIndex(spark, index_path)
    corpus = VersionedTable(spark, corpus_path)
    audit = VersionedTable(spark, audit_path) if audit_path is not None else None
    id_col = idx.id_col

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        txn = f"{txn_prefix}:{epoch_id}"
        # replayed epoch with everything committed: the index commits
        # last (below), so its marker implies the corpus and audit txns
        # are in their logs too — one marker stat, no Spark job at all
        if idx.txn_committed(txn):
            return
        # pin the verdicts: their lineage reads the index stores that
        # idx.append mutates below, and they are consumed three times
        # (accept cut, audit write, index append) — localCheckpoint both
        # truncates the store-reading lineage and evaluates the probe
        # exactly once per epoch
        verdicts = idx.probe(batch_df, threshold=threshold).localCheckpoint(
            eager=True
        )
        accepted = batch_df.join(
            verdicts.filter(F.col("is_new")).select(id_col), id_col, "left_semi"
        )
        # the index append goes STRICTLY LAST: every other write is
        # derived from the probe's verdicts, and the verdicts are only
        # reproducible on replay while the index does not yet contain
        # this batch (once it does, an accepted doc would re-probe as an
        # exact dup of itself). Ordering corpus → audit → index means
        # any crash that forces the probe to re-run happened before the
        # index commit, so the re-probe sees the same index state; and
        # once the index committed, the early-exit above skips the probe
        # entirely. Each append is individually idempotent on the epoch
        # txn, and the index lags the corpus, never the reverse — it
        # never references unknown docs.
        corpus.append(accepted, txn_id=txn)
        if audit is not None:
            audit.append(
                verdicts.withColumn("epoch_id", F.lit(int(epoch_id))),
                txn_id=txn,
            )
        idx.append(accepted, txn_id=txn)

    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
