"""SQ8 scalar quantization: per-dimension affine uint8 compression.

North-star extension (the reference stores raw float32 vectors,
``/root/reference/src/vector_db/storage.py``; this is the FAISS
``ScalarQuantizer/QT_8bit`` analog): train per-dimension ``[min, max]``
ranges, encode each float vector into an ``array<smallint>`` of 0..255
codes — 4× smaller than float32 at rest *and on the scan* — then search
asymmetrically: the stored side stays quantized and is decoded on the fly
inside the codegen'd distance expression against the full-precision query.

Scale posture:

- **train** is one aggregation: ``posexplode`` to (dim, x) rows — partial
  min/max combine map-side, the shuffle carries ``dim`` rows per partition,
  and the collect is bounded at ``dim`` rows (like centroid collects).
- **encode** is pure map-side: the trained ranges are baked in as literal
  arrays (2·dim doubles) inside a ``transform`` expression — no join, no
  shuffle, whole-stage codegen.
- **search** scans only the codes column (Parquet column pruning: 1/4 the
  bytes of the float column) and never materializes decoded vectors — the
  decode is an expression fused into the distance fold.

Everything is deterministic double math (clamp → ×255 → +0.5 → floor), so
a SQL oracle reproduces codes and distances bit-for-bit up to the usual
rounded-distance comparison.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_db_spark.operators.knn import knn_join


@dataclass(frozen=True)
class SQModel:
    """Per-dimension affine ranges. ``spans[i] == 0`` (constant dimension)
    encodes to 0 and decodes back to ``mins[i]`` exactly."""

    mins: tuple[float, ...]
    maxs: tuple[float, ...]

    @property
    def dim(self) -> int:
        return len(self.mins)

    def _lits(self) -> tuple[Column, Column]:
        mins = F.array(*[F.lit(float(m)) for m in self.mins])
        spans = F.array(
            *[F.lit(float(mx) - float(mn)) for mn, mx in zip(self.mins, self.maxs)]
        )
        return mins, spans

    def encode_expr(self, vec_col: Column | str) -> Column:
        """float vector → array<smallint> of 0..255 codes (map-side)."""
        v = (F.col(vec_col) if isinstance(vec_col, str) else vec_col).cast(
            "array<double>"
        )
        mins, spans = self._lits()
        return F.transform(
            v,
            lambda x, i: F.floor(
                F.when(
                    F.element_at(spans, i + 1) > 0.0,
                    F.least(
                        F.greatest(
                            (x - F.element_at(mins, i + 1)) / F.element_at(spans, i + 1),
                            F.lit(0.0),
                        ),
                        F.lit(1.0),
                    ),
                ).otherwise(F.lit(0.0))
                * 255.0
                + 0.5
            ).cast("smallint"),
        )

    def decode_expr(self, code_col: Column | str) -> Column:
        """codes → array<double> reconstruction (fuses into downstream
        distance expressions — never materialized as a stored column)."""
        c = F.col(code_col) if isinstance(code_col, str) else code_col
        mins, spans = self._lits()
        return F.transform(
            c,
            lambda code, i: F.element_at(mins, i + 1)
            + code.cast("double") * F.element_at(spans, i + 1) / 255.0,
        )


def sq_train(df: DataFrame, vec_col: str = "embedding") -> SQModel:
    """Per-dimension min/max over the corpus. One shuffle of ``dim`` rows
    (map-side partial min/max); the collect is bounded at ``dim`` rows."""
    stats = (
        df.select(F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x"))
        .groupBy("dim")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .orderBy("dim")
        .collect()  # bounded: dim rows of 2 doubles
    )
    return SQModel(
        mins=tuple(r.mn for r in stats), maxs=tuple(r.mx for r in stats)
    )


def sq_encode(
    df: DataFrame,
    model: SQModel,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    code_col: str = "codes",
) -> DataFrame:
    """(id, codes) — the at-rest table. Write this partitioned however the
    read path prunes; the float column is not carried."""
    return df.select(F.col(id_col), model.encode_expr(vec_col).alias(code_col))


def sq_search(
    codes: DataFrame,
    queries: DataFrame,
    model: SQModel,
    k: int = 10,
    *,
    metric: str = "euclidean",
    id_col: str = "vec_id",
    code_col: str = "codes",
) -> DataFrame:
    """Asymmetric SQ search: full-precision queries vs decode-on-the-fly
    corpus codes. Columns: (query_id, neighbor_id, dist, rank).

    Uses the JVM-side SQL strategy so the decode expression stays inside
    whole-stage codegen fused with the distance fold — the scan reads only
    the (id, codes) columns."""
    corpus = codes.select(
        F.col(id_col), model.decode_expr(code_col).alias("embedding")
    )
    return knn_join(
        queries, corpus, k, metric=metric, id_col=id_col, impl="sql"
    )
