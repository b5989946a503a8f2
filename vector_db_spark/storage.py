"""The Node-table storage surface on Parquet.

Re-expresses the reference's ``NodeStorage`` ABC (``/root/reference/src/
vector_db/storage.py:15-51``: save / get / get_embedding / get_all_ids /
size / delete / add) and its three backends (in-memory dict, two-layer
memmap, SQLite+memmap) as operations on an immutable Parquet-backed
DataFrame:

- The memmap's hot/cold column-group split (storage.py:135-181) is Parquet
  column pruning — ``select("id","embedding")`` never reads content bytes.
- The preallocated capacity bound (storage.py:183-186) disappears: appends
  are new Parquet files; 100 TB is just more files.
- The "embedding all zeros = free slot" heuristic (storage.py:183-196),
  which misclassifies a legitimate zero vector, is NOT replicated —
  deletions are explicit anti-join rewrites (or Delta deletes when
  available).
- Content/metadata truncation at 10 KB / 5 KB (storage.py:217-222) is NOT
  replicated — Parquet strings are unbounded.
- ``get_next_id`` = max+1 (storage.py:276-280) has a distributed equivalent
  for batch appends: ``max(id) + row_number over the new batch``.

Schema (SURVEY.md §1.5): ``id long, embedding array<float>, content string,
metadata map<string,string>``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

NODE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


class NodeTable:
    """A vector corpus at a Parquet path, with the reference's CRUD surface.

    Writes rewrite or append immutable files; reads are plain DataFrames so
    every downstream operator gets Catalyst pushdown. Nothing here ever
    collects the corpus.
    """

    def __init__(self, spark: SparkSession, path: str, dim: int | None = None):
        self.spark = spark
        self.path = path
        self.dim = dim
        # instance-local merged-schema cache: mergeSchema reads every part
        # footer, and df() sits on every hot-path op — merge once, reuse
        # until this instance writes (external writers bypass the cache;
        # reopen the NodeTable to observe their columns)
        self._schema_cache: T.StructType | None = None

    # -- reads ---------------------------------------------------------------

    def df(self) -> DataFrame:
        # mergeSchema: batches may carry EVOLVED columns beyond NODE_SCHEMA
        # (appended after the table was created); the union schema surfaces
        # them with nulls for pre-evolution files. Core column types stay
        # stable because every write path normalizes them via _validate.
        if self._schema_cache is not None:
            return self.spark.read.schema(self._schema_cache).parquet(self.path)
        out = self.spark.read.option("mergeSchema", "true").parquet(self.path)
        self._schema_cache = out.schema
        return out

    def exists(self) -> bool:
        """Filesystem-level presence of data files (no read attempt — a
        present-but-unreadable table must raise, not look absent)."""
        if not os.path.isdir(self.path):
            return False
        return any(
            f.endswith(".parquet") or f.startswith("part-")
            for f in os.listdir(self.path)
        )

    def get(self, node_id: int) -> DataFrame:
        """Point lookup (reference storage.py:232-252)."""
        return self.df().filter(F.col("id") == node_id)

    def get_embedding(self, node_id: int) -> DataFrame:
        """Embedding-only projection (storage.py:254-259) — column pruning
        means the content/metadata pages are never read."""
        return self.df().select("id", "embedding").filter(F.col("id") == node_id)

    def all_ids(self) -> DataFrame:
        return self.df().select("id")

    def size(self) -> int:
        return self.df().count()

    def filter_by_metadata(self, filter_dict: dict[str, str]) -> DataFrame:
        """Equality-conjunction metadata filter (reference
        services/storage_service.py:106-128): all pairs must match."""
        df = self.df()
        for k, v in filter_dict.items():
            df = df.filter(F.col("metadata")[k] == v)
        return df

    # -- writes --------------------------------------------------------------

    def _validate(self, nodes: DataFrame) -> DataFrame:
        """Dimension check on write (reference mmap_vector_store.py:100-107),
        plus core-schema normalization: the four NODE_SCHEMA columns must be
        present and are cast to their canonical types (so mergeSchema reads
        never see type drift); EVOLVED extra columns pass through intact."""
        missing = [f.name for f in NODE_SCHEMA.fields if f.name not in nodes.columns]
        if missing:
            raise ValueError(f"nodes batch is missing core columns {missing}")
        nodes = nodes.withColumns(
            {f.name: F.col(f.name).cast(f.dataType) for f in NODE_SCHEMA.fields}
        )
        # evolved columns must keep a stable type across batches: a clash
        # would poison every later mergeSchema read (and a silent cast
        # could null out data) — fail THIS write instead
        core = {f.name for f in NODE_SCHEMA.fields}
        extras = {f.name: f.dataType for f in nodes.schema.fields if f.name not in core}
        if extras and self.exists():
            persisted = {f.name: f.dataType for f in self.df().schema.fields}
            for name, dt in extras.items():
                if name in persisted and persisted[name] != dt:
                    raise ValueError(
                        f"evolved column {name!r} arrives as {dt.simpleString()} "
                        f"but the table already stores it as "
                        f"{persisted[name].simpleString()}; changing an evolved "
                        "column's type is not supported"
                    )
        if self.dim is not None:
            nodes = nodes.withColumn(
                "__dim_ok",
                F.col("embedding").isNull() | (F.size("embedding") == self.dim),
            )
            bad = nodes.filter(~F.col("__dim_ok")).limit(1).collect()
            if bad:
                raise ValueError(
                    f"embedding dimension mismatch: expected {self.dim}, "
                    f"got {len(bad[0]['embedding'])} for id {bad[0]['id']}"
                )
            nodes = nodes.drop("__dim_ok")
        return nodes

    def init(self, nodes: DataFrame) -> None:
        self._validate(nodes).write.mode("overwrite").parquet(self.path)
        self._schema_cache = None

    def append(self, nodes: DataFrame) -> None:
        """Append-only insert (reference save at storage.py:198-230). Caller
        guarantees new ids; use :meth:`upsert` otherwise."""
        self._validate(nodes).write.mode("append").parquet(self.path)
        self._schema_cache = None

    # Past this many id-less rows the numbering routes through the
    # distributed row-number (operators/packing.global_row_number) instead
    # of a single-task global window — same guard pattern as knn/pq: one
    # limit(threshold+1).count() probe, never a full count.
    LARGE_ID_BATCH = 100_000

    def append_with_ids(self, nodes: DataFrame, *, batch_count: int | None = None) -> None:
        """Assign ids ``max(existing)+row_number`` to id-less rows — the
        distributed form of get_next_id (storage.py:276-280).

        Ingest-shaped batches (≤ LARGE_ID_BATCH rows) take one global
        window over the NEW BATCH only — a single task, fine at that
        size. Larger batches route through ``global_row_number`` (range
        repartition + per-partition offsets), so a corpus-sized id-less
        load never funnels through one task; the order key is a content
        digest (ties only between identical rows, whose numbering is
        interchangeable — the id block is ``start..start+n-1`` either
        way). ``batch_count``: callers that already counted the batch
        (insert_documents counts it to report n inserted) pass it here so
        the size probe doesn't re-evaluate the batch lineage — which can
        embed every document a second time."""
        max_id = self.df().agg(F.max("id")).collect()[0][0]
        # explicit None test: `or -1` would misread a legitimate max id of
        # 0 as "empty table" and hand out a duplicate id 0
        start = (max_id if max_id is not None else -1) + 1
        if batch_count is not None:
            small = batch_count <= self.LARGE_ID_BATCH
        else:
            small = (
                nodes.limit(self.LARGE_ID_BATCH + 1).count() <= self.LARGE_ID_BATCH
            )
        if small:
            w = Window.orderBy(F.monotonically_increasing_id())
            withids = nodes.withColumn(
                "id", F.row_number().over(w) + F.lit(start - 1)
            )
        else:
            from vector_db_spark.operators.packing import global_row_number

            keyed = nodes.withColumn(
                "__ord", F.md5(F.to_json(F.struct(*nodes.columns)))
            )
            withids = (
                global_row_number(keyed, ["__ord"], out_col="__rowno")
                .withColumn("id", (F.col("__rowno") + F.lit(start)).cast("long"))
                .drop("__ord", "__rowno")
            )
        core = [f.name for f in NODE_SCHEMA.fields]
        extras = [c for c in withids.columns if c not in core]
        self.append(withids.select(core + extras))

    def upsert(self, nodes: DataFrame) -> None:
        """INSERT OR REPLACE (reference storage.py:377-400 SQLite path; L4
        idempotent insert at hnsw.py:152-155): anti-join out the replaced
        ids, union the new rows, rewrite. With a Delta/Iceberg sink this is
        a MERGE; on plain Parquet it is a rewrite."""
        nodes = self._validate(nodes)
        # a batch with duplicate ids would append BOTH rows after the
        # anti-join and permanently break id uniqueness (get() returning 2
        # rows, delete/append id arithmetic on a non-unique key). There is
        # no deterministic "last write wins" on an unordered DataFrame, so
        # reject loudly — same contract as VersionedTable.merge.
        dup = (
            nodes.groupBy("id").agg(F.count("*").alias("__n")).filter(F.col("__n") > 1)
        )
        dup_rows = dup.limit(5).collect()
        if dup_rows:
            raise ValueError(
                "upsert batch contains duplicate ids (no deterministic "
                f"last-write order on a DataFrame): {[r['id'] for r in dup_rows]}"
            )
        existing = self.df()
        # allowMissingColumns: either side may carry evolved columns the
        # other predates — absent cells become null, nothing is dropped
        merged = existing.join(nodes.select("id"), "id", "left_anti").unionByName(
            nodes, allowMissingColumns=True
        )
        self._rewrite(merged)

    def delete(self, node_ids: list[int]) -> None:
        """Tombstone-free delete (reference storage.py:286-306 zeroes the
        slot; here the row is simply absent after rewrite)."""
        self._rewrite(self.df().filter(~F.col("id").isin(node_ids)))

    def _rewrite(self, df: DataFrame) -> None:
        tmp = self.path.rstrip("/") + ".tmp"
        df.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.option("mergeSchema", "true").parquet(tmp)
        final.write.mode("overwrite").parquet(self.path)
        self._schema_cache = None
        # best-effort cleanup of the staging dir
        try:
            import shutil

            shutil.rmtree(tmp)
        except OSError:
            pass
