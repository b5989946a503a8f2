"""NodeTable CRUD tests — the reference's storage test surface
(tests/services/test_storage_service.py:15-151,
tests/inference/test_mmap_vector_store.py:29-385) on Parquet."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_spark.storage import NODE_SCHEMA, NodeTable


def _nodes(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in e], c, m) for i, e, c, m in rows], NODE_SCHEMA
    )


@pytest.fixture
def table(spark, tmp_path):
    t = NodeTable(spark, str(tmp_path / "nodes"), dim=4)
    t.init(
        _nodes(
            spark,
            [
                (1, [1, 0, 0, 0], "Red Apple", {"color": "red", "kind": "fruit"}),
                (2, [0, 1, 0, 0], "Green Apple", {"color": "green", "kind": "fruit"}),
                (3, [0, 0, 1, 0], "Red Car", {"color": "red", "kind": "car"}),
            ],
        )
    )
    return t


def test_roundtrip_and_reopen(spark, table):
    """Write → reopen → identical contents (persistence across 'restarts')."""
    reopened = NodeTable(spark, table.path)
    rows = {r.id: r for r in reopened.df().collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].content == "Red Apple"
    assert rows[1].metadata == {"color": "red", "kind": "fruit"}
    assert rows[2].embedding == [0.0, 1.0, 0.0, 0.0]


def test_point_lookup_and_projection(table):
    assert table.get(2).collect()[0].content == "Green Apple"
    emb = table.get_embedding(3).collect()
    assert len(emb) == 1 and emb[0].embedding == [0.0, 0.0, 1.0, 0.0]
    assert table.get(99).count() == 0  # missing id → empty, not error
    assert table.size() == 3


def test_metadata_filter_conjunction(table):
    """Reference semantics: ALL pairs must match ('Green Apple' excluded when
    filtering color=red — test_search_api.py:149-172)."""
    ids = {r.id for r in table.filter_by_metadata({"color": "red"}).collect()}
    assert ids == {1, 3}
    ids = {r.id for r in table.filter_by_metadata({"color": "red", "kind": "fruit"}).collect()}
    assert ids == {1}
    assert table.filter_by_metadata({"color": "blue"}).count() == 0


def test_append_and_next_id(spark, table):
    newbies = _nodes(spark, [(-1, [1, 1, 0, 0], "Blue Bike", {"color": "blue"})]).drop("id")
    table.append_with_ids(newbies.select(F.lit(None).cast("long").alias("id"), "*").drop("id"))
    assert table.size() == 4
    assert {r.id for r in table.all_ids().collect()} == {1, 2, 3, 4}


def test_upsert_replaces(spark, table):
    table.upsert(_nodes(spark, [(2, [9, 9, 9, 9], "Ripe Apple", {"color": "yellow"})]))
    assert table.size() == 3
    assert table.get(2).collect()[0].content == "Ripe Apple"


def test_delete(spark, table):
    table.delete([1, 3])
    assert {r.id for r in table.df().collect()} == {2}


def test_dim_validation(spark, table):
    with pytest.raises(ValueError, match="dimension mismatch"):
        table.append(_nodes(spark, [(9, [1, 2, 3], "short", {})]))


def test_zero_vector_is_not_a_free_slot(spark, table):
    """The reference misclassifies all-zero embeddings as free slots
    (storage.py:183-196); we deliberately don't."""
    table.append(_nodes(spark, [(10, [0, 0, 0, 0], "zero", {})]))
    assert table.get(10).count() == 1
    table.delete([2])
    assert table.get(10).count() == 1  # survives an unrelated rewrite


def test_schema_evolution_append_and_upsert(spark, table):
    """An evolved-schema batch (new 'lang' column) flows through append
    AND upsert without column loss; pre-evolution rows read the new
    column as null (VERDICT r4 item 7)."""
    evolved = spark.createDataFrame(
        [
            (10, [1.0, 1.0, 0.0, 0.0], "Yellow Pear", {"kind": "fruit"}, "en"),
            (2, [0.0, 2.0, 0.0, 0.0], "Grüner Apfel", {"kind": "fruit"}, "de"),
        ],
        "id long, embedding array<float>, content string, "
        "metadata map<string,string>, lang string",
    )
    table.upsert(evolved)
    got = {r.id: r for r in table.df().collect()}
    assert set(got) == {1, 2, 3, 10}
    assert "lang" in table.df().columns
    assert got[10].lang == "en"
    assert got[2].lang == "de" and got[2].content == "Grüner Apfel"
    assert got[1].lang is None and got[3].lang is None  # pre-evolution rows

    # a second evolution (another new column) appends cleanly on top
    evolved2 = spark.createDataFrame(
        [(11, [0.0, 0.0, 1.0, 1.0], "Old Bike", {"kind": "vehicle"}, 1987)],
        "id long, embedding array<float>, content string, "
        "metadata map<string,string>, year int",
    )
    table.append(evolved2)
    got = {r.id: r for r in table.df().collect()}
    assert got[11].year == 1987 and got[11].lang is None
    assert got[10].lang == "en" and got[10].year is None
    # core surface still works post-evolution
    assert table.get(11).count() == 1
    assert table.size() == 5
    table.delete([10])
    assert {r.id for r in table.all_ids().collect()} == {1, 2, 3, 11}


def test_missing_core_column_raises(spark, table):
    bad = spark.createDataFrame(
        [(20, [1.0, 0.0, 0.0, 0.0], "No Meta")],
        "id long, embedding array<float>, content string",
    )
    with pytest.raises(ValueError, match="missing core columns"):
        table.append(bad)


def test_evolved_column_type_clash_raises_and_preserves_corpus(spark, table):
    """Two batches evolving the SAME column with different types: the
    second write must fail loudly (a silent append would poison every
    later mergeSchema read), and the table must stay fully readable."""
    b1 = spark.createDataFrame(
        [(20, [1.0, 0.0, 0.0, 0.0], "tagged int", {"k": "v"}, 7)],
        "id long, embedding array<float>, content string, "
        "metadata map<string,string>, tag int",
    )
    table.append(b1)
    b2 = spark.createDataFrame(
        [(21, [0.0, 1.0, 0.0, 0.0], "tagged str", {"k": "v"}, "seven")],
        "id long, embedding array<float>, content string, "
        "metadata map<string,string>, tag string",
    )
    with pytest.raises(ValueError, match="evolved column 'tag'"):
        table.append(b2)
    with pytest.raises(ValueError, match="evolved column 'tag'"):
        table.upsert(b2)
    # corpus intact and readable, including the first evolution
    got = {r.id: r for r in table.df().collect()}
    assert set(got) == {1, 2, 3, 20}
    assert got[20].tag == 7


def test_exists_is_a_filesystem_check(spark, tmp_path):
    t = NodeTable(spark, str(tmp_path / "nope"))
    assert not t.exists()
    t.init(_nodes(spark, [(1, [1, 0, 0, 0], "x", {})]))
    assert t.exists()


def test_append_with_ids_large_batch_routes_distributed(spark, table, monkeypatch):
    """Past LARGE_ID_BATCH rows the id assignment goes through the
    range-repartitioned global_row_number — no single-task global window
    — and value parity holds: the id block is max+1..max+n and every row
    survives."""
    from vector_db_spark.storage import NodeTable

    monkeypatch.setattr(NodeTable, "LARGE_ID_BATCH", 10)
    batch = _nodes(
        spark,
        [(-1, [float(i), 1.0, 0.0, 0.0], f"doc {i}", {"i": str(i)}) for i in range(25)],
    ).drop("id")
    table.append_with_ids(batch)
    rows = table.df().collect()
    assert len(rows) == 3 + 25
    new = [r for r in rows if r.id > 3]
    assert sorted(r.id for r in new) == list(range(4, 29))
    # every batch row present exactly once, content intact
    assert sorted(r.content for r in new) == sorted(f"doc {i}" for i in range(25))
    # plan shape: the distributed path range-partitions instead of a
    # single-task Window over monotonically_increasing_id
    from vector_db_spark.operators.packing import global_row_number
    import pyspark.sql.functions as F

    keyed = batch.withColumn("__ord", F.md5(F.to_json(F.struct(*batch.columns))))
    plan = global_row_number(keyed, ["__ord"], out_col="__rowno")._jdf.queryExecution().executedPlan().toString()
    # global_row_number localCheckpoints its range-partitioned input, so
    # the executed plan is Scan ExistingRDD (the materialized ranged
    # layout) + a map-only numbering pass — crucially NO Window node (the
    # single-task global-sort shape this guard exists to avoid)
    assert "Window" not in plan
    assert "MapInPandas" in plan and "ExistingRDD" in plan


def test_append_with_ids_max_id_zero_not_treated_as_empty(spark, tmp_path):
    """A table whose max id is 0 must hand out 1 next — the falsy-zero
    `or -1` idiom would mint a duplicate id 0."""
    from vector_db_spark.storage import NodeTable

    t = NodeTable(spark, str(tmp_path / "zero"), dim=4)
    t.init(_nodes(spark, [(0, [1.0, 0.0, 0.0, 0.0], "first", {})]))
    t.append_with_ids(
        _nodes(spark, [(-1, [0.0, 1.0, 0.0, 0.0], "second", {})]).drop("id")
    )
    ids = sorted(r.id for r in t.all_ids().collect())
    assert ids == [0, 1]


def test_upsert_rejects_duplicate_batch_ids(spark, table):
    """Two rows with one id in a single upsert batch would both survive the
    anti-join and permanently break id uniqueness — there is no
    deterministic last-write order on a DataFrame, so the batch is
    rejected loudly (same contract as VersionedTable.merge)."""
    batch = _nodes(
        spark,
        [
            (7, [1, 1, 0, 0], "dup A", {"kind": "fruit"}),
            (7, [0, 0, 1, 1], "dup B", {"kind": "fruit"}),
        ],
    )
    with pytest.raises(ValueError, match="duplicate ids"):
        table.upsert(batch)
    # the table is untouched by the rejected batch
    assert table.size() == 3
