"""Sequence packing: lay documents end-to-end and cut fixed token-budget
training windows — the concat-and-chunk step every LLM pretraining
pipeline runs between "cleaned corpus" and "batched examples".

North-star extension (the reference has no training-data surface). The
strategy is the standard one: documents are hash-sharded (shards =
parallel writers; membership is content-hash-deterministic, so reruns and
engines agree — the same argument as ``stratified_sample_det``), laid out
in id order within their shard, and every ``budget`` tokens starts a new
pack. A document belongs to the pack containing its first token.

Scale posture: ONE shuffle (the per-shard window sort); everything else is
map-side hashing and arithmetic inside whole-stage codegen. No driver
loop, no UDF. At 100 TB the shard count bounds per-task sort volume —
shards are independent, so `n_shards` scales with the cluster, and the
window never sees more than corpus/n_shards rows. A greedy
close-bin-on-overflow packer is a sequential recurrence per shard (not
window-expressible); concat-and-chunk is what production pretraining
pipelines actually use — documents straddle pack boundaries and the
tokenizer-side chunker splits them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_db_spark.functions.text import token_count


def _hash_shard(id_col: str, n_shards: int, salt: str = ":pack") -> F.Column:
    """Deterministic engine-reproducible shard: first md5 byte mod shards
    (md5 hex → int via instr arithmetic — reproducible in any SQL engine,
    unlike seeded ``rand`` or engine-private hash functions)."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    byte = (F.instr(F.lit("0123456789abcdef"), F.substring(h, 1, 1)) - 1) * 16 + (
        F.instr(F.lit("0123456789abcdef"), F.substring(h, 2, 1)) - 1
    )
    return F.pmod(byte, F.lit(n_shards)).cast("int")


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    budget: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """(id, shard, n_tokens, start_offset, pack_id): the packing manifest.

    ``start_offset`` is the document's first-token position in its shard's
    concatenated token stream; ``pack_id = start_offset // budget`` is the
    training window that starts it. Downstream, a writer groups by
    ``(shard, pack_id)`` to emit packed examples — that groupBy reuses the
    (shard, id-order) layout this window already established, so the
    manifest → writer path costs no extra shuffle."""
    d = df.select(
        F.col(id_col),
        _hash_shard(id_col, n_shards).alias("shard"),
        token_count(text_col).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return d.select(
        id_col,
        "shard",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset"),
    ).withColumn("pack_id", F.floor(F.col("start_offset") / budget))
