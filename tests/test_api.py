"""Service-facade integration tests — the reference's API test surface
(tests/integration/test_search_api.py, test_embed_api.py) without HTTP:
insert→search roundtrip, metadata-filter semantics, empty-filter
short-circuit, health, persistence across 'restarts'."""

from __future__ import annotations

import pytest

from vector_db_spark.api import VectorDBService


@pytest.fixture
def service(spark, tmp_path):
    svc = VectorDBService(spark, str(tmp_path / "svc"), dim=32)
    docs = spark.createDataFrame(
        [
            ("Red Apple", {"color": "red", "kind": "fruit"}),
            ("Green Apple", {"color": "green", "kind": "fruit"}),
            ("Red Car", {"color": "red", "kind": "car"}),
            ("Blue Bicycle", {"color": "blue", "kind": "vehicle"}),
        ],
        "content string, metadata map<string,string>",
    )
    assert svc.insert_documents(docs) == 4
    return svc


def test_insert_search_roundtrip(service):
    """Searching an inserted text returns it as the top hit at distance ~0
    (test_embed_api.py / test_search_api.py roundtrip)."""
    hits = service.search(["Red Apple"], top_k=2).collect()
    top = [h for h in hits if h.rank == 1][0]
    assert top.content == "Red Apple"
    assert top.distance < 1e-6


def test_metadata_filter_excludes_nonmatching(service):
    """Reference semantics (test_search_api.py:149-172): filtering
    color=red must exclude 'Green Apple' even for an apple query."""
    hits = service.search(["Green Apple"], top_k=4, metadata_filter={"color": "red"}).collect()
    contents = {h.content for h in hits}
    assert "Green Apple" not in contents
    assert contents <= {"Red Apple", "Red Car"}
    # conjunction: two pairs → only Red Apple
    hits = service.search(
        ["Apple"], top_k=4, metadata_filter={"color": "red", "kind": "fruit"}
    ).collect()
    assert {h.content for h in hits} == {"Red Apple"}


def test_empty_filter_returns_no_rows(service):
    """Empty candidate set short-circuits to zero rows, no error
    (app.py:186-192, test_search_api.py:175-185)."""
    assert service.search(["Apple"], metadata_filter={"color": "mauve"}).count() == 0


def test_health_and_index_lifecycle(service):
    h = service.health()
    assert h == {"status": "healthy", "storage_nodes": 4, "index": False}
    service.build_index(k=2)
    h = service.health()
    assert h["index"] and h["index_vectors"] == 4 and h["index_clusters"] <= 2
    # indexed search (filtered + unfiltered) still correct
    top = [r for r in service.search(["Red Car"], top_k=1, n_probe=2).collect() if r.rank == 1][0]
    assert top.content == "Red Car"
    hits = service.search(["Red Car"], top_k=4, n_probe=2, metadata_filter={"kind": "fruit"}).collect()
    assert {h.content for h in hits} == {"Red Apple", "Green Apple"}


def test_incremental_insert_updates_index(spark, service):
    """Inserting after build_index incrementally extends the index
    (reference insert path, app.py:149 → indexing_service.insert_node)."""
    service.build_index(k=2)
    more = spark.createDataFrame(
        [("Purple Plum", {"color": "purple", "kind": "fruit"})],
        "content string, metadata map<string,string>",
    )
    service.insert_documents(more)
    assert service.health()["index_vectors"] == 5
    top = [r for r in service.search(["Purple Plum"], top_k=1, n_probe=2).collect() if r.rank == 1][0]
    assert top.content == "Purple Plum"
    assert top.distance < 1e-6


def test_persistence_across_restart(spark, service):
    """A new service instance over the same path sees everything
    (test_embed_api.py:190-210 index-file persistence)."""
    service.build_index(k=2)
    svc2 = VectorDBService(spark, service.base_path, dim=32)
    assert svc2.health()["storage_nodes"] == 4
    top = [r for r in svc2.search(["Blue Bicycle"], top_k=1).collect() if r.rank == 1][0]
    assert top.content == "Blue Bicycle"


def test_refresh_index_after_drifting_inserts(spark, service):
    """Post-insert refresh: centroid table moves toward the new data and
    search still fills k with every document accounted for."""
    assert service.refresh_index() == {"max_shift": 0.0, "drifted": [], "moved": 0}
    service.build_index(k=2)
    many = spark.createDataFrame(
        [(f"zzz drift document {i}", {"kind": "drift"}) for i in range(20)],
        "content string, metadata map<string,string>",
    )
    service.insert_documents(many)
    stats = service.refresh_index(reassign_threshold=0.0)
    assert stats["max_shift"] > 0.0
    h = service.health()
    assert h["storage_nodes"] == 24 and h["index_vectors"] == 24
    hits = service.search(["Red Apple"], top_k=3)
    assert hits.count() == 3


def test_search_diversify_mmr(service):
    """diversify=λ: same arity contract, MMR pick order, and the first
    pick stays the pure-relevance winner (λ-weighted greedy degeneracy)."""
    plain = service.search(["Red Apple"], top_k=2).collect()
    div = service.search(["Red Apple"], top_k=2, diversify=0.5).collect()
    assert len(div) == 2
    assert sorted(r.rank for r in div) == [1, 2]
    top_plain = [r for r in plain if r.rank == 1][0]
    top_div = [r for r in div if r.rank == 1][0]
    assert top_div.id == top_plain.id  # first MMR pick = relevance argmax
    assert top_div.content == "Red Apple"
    # distances still true distances (self-match ~0)
    assert top_div.distance <= 1e-6


def test_delete_documents_removes_from_store_and_index(spark, tmp_path):
    from pyspark.sql import functions as F

    svc = VectorDBService(spark, str(tmp_path / "svc"), dim=8)
    docs = spark.createDataFrame(
        [(f"doc number {i}", {"k": str(i % 2)}) for i in range(30)],
        "content string, metadata map<string,string>",
    )
    svc.insert_documents(docs)
    svc.build_index(k=3)
    removed = svc.delete_documents([1, 2, 3, 999])
    assert removed == 3  # 999 never existed
    assert svc.nodes.size() == 27
    # the index agrees: deleted ids are unsearchable and membership matches
    idx = svc._index()
    assert idx.corpus().filter(F.col("id").isin([1, 2, 3])).count() == 0
    assert idx.corpus().count() == 27
    # search still works over the survivors
    q = svc.nodes.df().filter(F.col("id") == 5).select(
        F.col("id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = idx.search(q, k=3, n_probe=3)
    assert got.count() == 3


def test_insert_documents_preserves_evolved_columns(spark, service):
    """A docs batch carrying an extra column beyond (content, metadata)
    lands in the store with the column intact — and earlier rows read it
    as null (VERDICT r4 item 7, service path)."""
    docs = spark.createDataFrame(
        [("Purple Grape", {"kind": "fruit"}, "batch-7")],
        "content string, metadata map<string,string>, ingest_tag string",
    )
    assert service.insert_documents(docs) == 1
    rows = {r.content: r for r in service.nodes.df().collect()}
    assert rows["Purple Grape"].ingest_tag == "batch-7"
    assert rows["Red Apple"].ingest_tag is None
    # ids stayed dense max+1
    assert sorted(r.id for r in rows.values()) == [1, 2, 3, 4, 5]
