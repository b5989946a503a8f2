"""Density clustering (DBSCAN) over a pluggable ε-neighbor pair source.

DBSCAN (Ester et al., KDD '96) re-expressed as pure dataflow over an
edge list: given the ε-pairs, core/border/noise and the cluster labels
are one degree aggregation, one component propagation, and one keyed
min — every step an equi-join or groupBy, no point-vs-point geometry
left. The geometry lives entirely in the PAIR SOURCE, which is the
honest place for the scale decision:

- **exact ε-pairs are Ω(n²) in high dimension** — there is no complete
  blocking for euclidean ε when ε exceeds the per-coordinate spread
  (this corpus: per-dim σ ≈ 0.12 vs useful ε ≈ 1.16, so a grid of side
  ε is ONE cell per axis — grid/cell DBSCAN partitioning degenerates).
  Brute pairs stay a test oracle.
- **the production shape is a blocked candidate graph + exact verify**:
  :func:`epsilon_pairs_blocked` multi-assigns each vector to its
  ``n_probe`` nearest centroids (broadcast k×dim), equi-joins on shared
  cluster (Σ cluster² candidate volume — the SemDeDup/IVF bound, with
  ``IVFIndex.split_cluster`` as the hot-partition answer), then keeps
  exact distance ≤ ε. Cross-block ε-edges outside the probe overlap are
  the documented recall trade — identical in kind to IVF n_probe search
  and to how practical systems run DBSCAN at scale (neighbor-graph /
  partitioned variants).

Determinism contract (what the DuckDB oracle checks value-exactly):
cluster labels are the MIN member id of each core-connected component
(classic DBSCAN's border tie-break is arrival-order-dependent; here a
border point joins the minimum-labelled adjacent core cluster — a
deterministic refinement, noted divergence). Distances are rounded to
6dp before the ε comparison so both engines binarize identically.

Reference: the reference has no density clustering; nearest analogue is
its IVF k-means bucketing (reference ivf.py:49-85). This operator is
part of the LLM-pipeline extension surface (corpus structure discovery,
outlier/noise mining for curation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_db_spark.functions.distance import euclidean
from vector_db_spark.operators.knn_graph import components_from_edges

NOISE = -1


def epsilon_pairs_blocked(
    points: DataFrame,
    centroids: DataFrame,
    eps: float,
    *,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(va, vb) with va < vb, exact distance ≤ eps, candidates blocked by
    shared membership in either point's ``n_probe`` nearest centroids.

    One broadcast argmin ranking (k×dim literals), one self-equi-join on
    cluster_id, one exact verify — candidate volume Σ_c |c|², never n².
    ``centroids`` is ``(cluster_id, centroid array<double>)``."""
    ranked = (
        points.select(id_col, vec_col)
        .crossJoin(F.broadcast(centroids))
        .withColumn("__cd", F.round(euclidean(vec_col, "centroid"), 6))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__cd").asc(), F.col("cluster_id").asc())
    member = (
        ranked.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_probe)
        .select(id_col, vec_col, "cluster_id")
    )
    a = member.select(
        F.col(id_col).alias("va"), F.col(vec_col).alias("__veca"), "cluster_id"
    )
    b = member.select(
        F.col(id_col).alias("vb"), F.col(vec_col).alias("__vecb"), "cluster_id"
    )
    return (
        a.join(b, "cluster_id")
        .filter(F.col("va") < F.col("vb"))
        .filter(F.round(euclidean("__veca", "__vecb"), 6) <= eps)
        .select("va", "vb")
        .distinct()
    )


def epsilon_pairs_brute(
    points: DataFrame,
    eps: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs ε-join — O(n²) TEST ORACLE for the blocked form
    (the complete ε-graph DBSCAN textbook semantics assume). Never on a
    registered scale path."""
    a = points.select(F.col(id_col).alias("va"), F.col(vec_col).alias("__veca"))
    b = points.select(F.col(id_col).alias("vb"), F.col(vec_col).alias("__vecb"))
    return (
        a.crossJoin(b)
        .filter(F.col("va") < F.col("vb"))
        .filter(F.round(euclidean("__veca", "__vecb"), 6) <= eps)
        .select("va", "vb")
    )


def dbscan_from_pairs(
    points: DataFrame,
    pairs: DataFrame,
    min_pts: int,
    *,
    id_col: str = "vec_id",
    max_iter: int = 50,
) -> DataFrame:
    """(id, cluster_label, role) — DBSCAN given the ε-pair list.

    Precondition: ``pairs`` rows are unique with ``va < vb`` and no
    self-pairs (both bundled pair sources guarantee it) — duplicates
    would inflate degrees and mint spurious cores.

    - **core**: |closed ε-neighborhood| ≥ min_pts (degree + self);
    - clusters: connected components of the core-core subgraph, labelled
      by min member id (:func:`components_from_edges`, hash-min rounds
      with pointer shortcutting — O(log n) rounds, two joins + one agg
      each);
    - **border**: non-core with ≥ 1 core ε-neighbor — joins the minimum
      adjacent core label (deterministic tie-break);
    - **noise**: everything else, ``cluster_label = -1``.

    Pure edge-list dataflow: scales with the pair volume the caller's
    blocking admitted, not with n².
    """
    ids = points.select(id_col).distinct()
    und = pairs.select(F.col("va").alias("s"), F.col("vb").alias("t")).union(
        pairs.select(F.col("vb").alias("s"), F.col("va").alias("t"))
    )
    deg = und.groupBy("s").agg(F.count("*").alias("__deg"))
    core = deg.filter(F.col("__deg") + 1 >= min_pts).select("s")
    core_edges = (
        und.join(core.withColumnRenamed("s", "t"), "t")
        .join(core, "s")
        .select("s", "t")
    )
    comp = components_from_edges(
        core_edges, "s", "t", nodes=core, max_iter=max_iter
    ).select(F.col("id").alias("s"), F.col("component").alias("cluster_label"))
    border = (
        und.join(comp.withColumnRenamed("s", "t"), "t")
        .join(core, "s", "left_anti")
        .groupBy("s")
        .agg(F.min("cluster_label").alias("cluster_label"))
    )
    labelled = comp.withColumn("role", F.lit("core")).union(
        border.withColumn("role", F.lit("border"))
    )
    return (
        ids.join(labelled, ids[id_col] == labelled.s, "left")
        .select(
            id_col,
            F.coalesce("cluster_label", F.lit(NOISE)).alias("cluster_label"),
            F.coalesce("role", F.lit("noise")).alias("role"),
        )
    )


def dbscan_cluster_stats(assignment: DataFrame) -> DataFrame:
    """(cluster_label, size, n_core, n_border) per cluster, plus the
    noise row (label -1, all counted as neither core nor border) — the
    label-exact projection the registry query emits."""
    return assignment.groupBy("cluster_label").agg(
        F.count("*").alias("size"),
        F.sum(F.when(F.col("role") == "core", 1).otherwise(0)).alias("n_core"),
        F.sum(F.when(F.col("role") == "border", 1).otherwise(0)).alias("n_border"),
    )
