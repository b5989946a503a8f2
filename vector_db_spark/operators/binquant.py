"""Binary quantization: 1-bit-per-dimension sign codes + Hamming search.

North-star extension (the reference stores raw float32 vectors,
``/root/reference/src/vector_db/storage.py``; this is the FAISS
``IndexBinaryFlat`` / "binary quantization" analog popular for
billion-scale first-pass retrieval): threshold each dimension to one bit
(sign test — the identity-rotation SimHash, the right default for
centered/normalized embeddings), pack 32 bits per word, search by Hamming
distance = popcount(XOR), then re-rank a bounded candidate set exactly.

Scale posture:

- **encode** is a pure projection — threshold + pack are native
  expressions (``transform``/``aggregate``), no UDF, no shuffle; the
  at-rest codes are 32× smaller than float32, so the first-pass scan
  reads 1/32 the bytes.
- **search** first-pass is ``bit_count(a XOR b)`` over dim/32 ints per
  pair — whole-stage codegen, integer-only, ~2 instructions per word vs
  64 float ops; the per-query window sees only candidate rows.
- **re-rank** touches float vectors for exactly ``k·refine`` candidates
  per query (two broadcast joins) — the corpus float column is read for
  the candidate row-group subset only, never scanned wholesale.

All math is deterministic (strict ``>`` threshold, id tie-breaks), so a
SQL oracle reproduces the candidate set and the final ranking exactly —
the unpacked bit-disagreement count in SQL equals the packed
popcount-XOR by construction, which cross-checks the packing itself.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_db_spark.functions.distance import METRICS
from vector_db_spark.operators.topk import top_k_per_group

WORD_BITS = 32  # 32-bit words: overflow-free in every engine's BIGINT math


def binarize_expr(vec_col: Column | str, *, dim: int, threshold: float = 0.0) -> Column:
    """float vector → ``array<bigint>`` of ceil(dim/32) packed sign words.

    Bit j of the vector maps into word ``j // 32`` MSB-first
    (``acc*2 + bit`` fold in 64-bit math — a 32-bit word never touches
    the accumulator's sign bit, so ANSI overflow checks stay happy in
    every engine), missing tail dims pad as 0 bits. Strict
    ``x > threshold`` so the 0.0 boundary is unambiguous.
    """
    v = (F.col(vec_col) if isinstance(vec_col, str) else vec_col).cast("array<double>")
    n_words = math.ceil(dim / WORD_BITS)
    pad = n_words * WORD_BITS - dim
    bits = F.transform(v, lambda x: (x > threshold).cast("bigint"))
    if pad:
        bits = F.concat(bits, F.array_repeat(F.lit(0).cast("bigint"), pad))
    # bits let-bound so the threshold pass runs once per row, not once per
    # packed word (the O(L²) trap documented at text.winnow_fingerprints)
    return F.element_at(
        F.transform(
            F.array(bits),
            lambda bb: F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda w: F.aggregate(
                    F.slice(bb, w * WORD_BITS + 1, WORD_BITS),
                    F.lit(0).cast("bigint"),
                    lambda acc, b: acc * 2 + b,
                ),
            ),
        ),
        1,
    )


def hamming_expr(a: Column | str, b: Column | str) -> Column:
    """popcount(XOR) summed over packed words — int-only, codegen-fused."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def bq_encode(
    df: DataFrame,
    *,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    word_col: str = "words",
    threshold: float = 0.0,
) -> DataFrame:
    """(id, words) — the 32×-compressed at-rest table."""
    return df.select(
        F.col(id_col), binarize_expr(vec_col, dim=dim, threshold=threshold).alias(word_col)
    )


def bq_search(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    dim: int,
    refine: int = 4,
    metric: str = "euclidean",
    threshold: float = 0.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    round_to: int = 6,
) -> DataFrame:
    """Two-phase binary search: Hamming top-``k*refine`` candidates over
    packed sign codes, then exact ``metric`` re-rank of the candidates.

    Returns ``(query_id, neighbor_id, dist, rank)`` — same contract as
    :func:`~vector_db_spark.operators.knn.knn_join`. The first pass scans
    only the codes projection; float vectors are fetched for candidates
    via a broadcast semi-structure (candidate set is k·refine·n_queries
    rows — tiny by construction).
    """
    if metric not in METRICS:
        raise ValueError(f"unknown metric {metric!r}; choose from {sorted(METRICS)}")
    codes = bq_encode(
        corpus, dim=dim, vec_col=vec_col, id_col=id_col, threshold=threshold
    )
    qcodes = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("__qv"),
        binarize_expr(query_vec_col, dim=dim, threshold=threshold).alias("__qw"),
    )
    scored = codes.crossJoin(F.broadcast(qcodes.select("query_id", "__qw"))).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        hamming_expr("words", "__qw").alias("hamming"),
    )
    cands = top_k_per_group(
        scored,
        ["query_id"],
        [F.col("hamming").asc(), F.col("neighbor_id").asc()],
        k * refine,
    ).select("query_id", "neighbor_id", "hamming")
    # exact re-rank: candidates ⋈ float vectors (broadcast the tiny side)
    exact = (
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
        .join(F.broadcast(cands), "neighbor_id")
        .join(F.broadcast(qcodes.select("query_id", "__qv")), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(METRICS[metric](F.col("__qv"), F.col("__cv")), round_to).alias(
                "dist"
            ),
            "hamming",
        )
    )
    return top_k_per_group(
        exact, ["query_id"], [F.col("dist").asc(), F.col("neighbor_id").asc()], k
    )


class BQIndex:
    """Persisted binary-quantization index: the packed sign codes as an
    at-rest Parquet table (32× smaller than the float column), plus a
    one-row meta table (dim, threshold) so reopening needs no corpus scan.

    The search first pass reads ONLY ``(id, words)`` from the codes table
    (plan-pinned in tests/test_binquant.py: the float column never appears
    in the codes FileScan's ReadSchema); the float vectors are touched for
    the k·refine candidate rows alone, fetched from whatever table owns
    them via a broadcast candidate probe."""

    def __init__(self, spark, path: str, *, dim: int, threshold: float,
                 id_col: str = "vec_id", word_col: str = "words"):
        self.spark = spark
        self.path = path
        self.dim = dim
        self.threshold = threshold
        self.id_col = id_col
        self.word_col = word_col

    @property
    def _codes_path(self) -> str:
        return self.path.rstrip("/") + "/codes"

    @classmethod
    def build(
        cls,
        spark,
        corpus: DataFrame,
        path: str,
        *,
        dim: int,
        threshold: float = 0.0,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "BQIndex":
        codes = bq_encode(
            corpus, dim=dim, vec_col=vec_col, id_col=id_col, threshold=threshold
        )
        codes.write.mode("overwrite").parquet(path.rstrip("/") + "/codes")
        spark.createDataFrame(
            [(int(dim), float(threshold), id_col)],
            "dim int, threshold double, id_col string",
        ).write.mode("overwrite").parquet(path.rstrip("/") + "/meta")
        return cls(spark, path, dim=dim, threshold=threshold, id_col=id_col)

    @classmethod
    def open(cls, spark, path: str) -> "BQIndex":
        meta = spark.read.parquet(path.rstrip("/") + "/meta").collect()[0]
        return cls(
            spark, path, dim=int(meta.dim), threshold=float(meta.threshold),
            id_col=meta.id_col,
        )

    def codes(self) -> DataFrame:
        return self.spark.read.parquet(self._codes_path)

    def search(
        self,
        queries: DataFrame,
        corpus: DataFrame,
        k: int = 10,
        *,
        refine: int = 4,
        metric: str = "euclidean",
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
        vec_col: str = "embedding",
        round_to: int = 6,
    ) -> DataFrame:
        """Hamming first pass over the PERSISTED codes scan, exact re-rank
        against ``corpus`` (the table owning the float vectors). Same
        result contract as :func:`bq_search` over the same rows."""
        qcodes = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("__qv"),
            binarize_expr(query_vec_col, dim=self.dim, threshold=self.threshold).alias(
                "__qw"
            ),
        )
        scored = self.codes().crossJoin(
            F.broadcast(qcodes.select("query_id", "__qw"))
        ).select(
            "query_id",
            F.col(self.id_col).alias("neighbor_id"),
            hamming_expr(self.word_col, "__qw").alias("hamming"),
        )
        cands = top_k_per_group(
            scored,
            ["query_id"],
            [F.col("hamming").asc(), F.col("neighbor_id").asc()],
            k * refine,
        ).select("query_id", "neighbor_id", "hamming")
        exact = (
            corpus.select(
                F.col(self.id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
            )
            .join(F.broadcast(cands), "neighbor_id")
            .join(F.broadcast(qcodes.select("query_id", "__qv")), "query_id")
            .select(
                "query_id",
                "neighbor_id",
                F.round(METRICS[metric](F.col("__qv"), F.col("__cv")), round_to).alias(
                    "dist"
                ),
                "hamming",
            )
        )
        return top_k_per_group(
            exact, ["query_id"], [F.col("dist").asc(), F.col("neighbor_id").asc()], k
        )
