"""VersionedTable pins: snapshot isolation, time travel, copy-on-write
delete file pruning, rollback, commit-conflict handling, vacuum retention."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vector_db_spark.operators.versioned import CommitConflict, VersionedTable


@pytest.fixture()
def vt(spark, tmp_path):
    return VersionedTable(spark, str(tmp_path / "vtab"))


def _df(spark, lo, hi):
    return spark.createDataFrame([(i, f"r{i}") for i in range(lo, hi)], "id long, s string")


def test_append_and_time_travel(spark, vt):
    v0 = vt.append(_df(spark, 0, 100))
    v1 = vt.append(_df(spark, 100, 150))
    assert (v0, v1) == (0, 1)
    assert vt.read(v0).count() == 100
    assert vt.read(v1).count() == 150
    assert vt.read().count() == 150  # head
    hist = vt.history()
    assert [h["version"] for h in hist] == [0, 1]
    assert [h["n_rows"] for h in hist] == [100, 150]


def test_overwrite_replaces_snapshot_keeps_history(spark, vt):
    vt.append(_df(spark, 0, 50))
    v1 = vt.overwrite(_df(spark, 0, 10))
    assert vt.read(v1).count() == 10
    assert vt.read(0).count() == 50  # old snapshot still readable


def test_delete_where_rewrites_only_hit_files(spark, vt):
    # two separate appends -> two txn dirs; delete rows living only in one
    vt.append(_df(spark, 0, 100).coalesce(1))
    vt.append(_df(spark, 100, 200).coalesce(1))
    m_before = vt._snapshot(vt.current_version())
    v2 = vt.delete_where(F.col("id") >= 150)
    m_after = vt._snapshot(v2)
    assert vt.read().count() == 150
    # the first txn's file must carry over by reference (same path)
    first_files = [f for f in m_before["files"] if f in m_after["files"]]
    assert len(first_files) == 1
    # time travel still sees the pre-delete snapshot
    assert vt.read(v2 - 1).count() == 200


def test_delete_where_null_predicate_rows_survive(spark, vt):
    df = spark.createDataFrame([(1, "a"), (2, None), (3, "b")], "id long, s string")
    vt.append(df)
    vt.delete_where(F.col("s") == "a")  # NULL comparison -> NULL, must survive
    assert sorted(r.id for r in vt.read().collect()) == [2, 3]


def test_delete_where_no_match_is_metadata_only(spark, vt):
    vt.append(_df(spark, 0, 10))
    files_before = vt._snapshot(vt.current_version())["files"]
    v = vt.delete_where(F.col("id") > 999)
    assert vt._snapshot(v)["files"] == files_before


def test_rollback_restores_without_erasing(spark, vt):
    vt.append(_df(spark, 0, 100))
    vt.overwrite(_df(spark, 0, 1))  # the "bad" commit
    v2 = vt.rollback(0)
    assert vt.read().count() == 100
    assert vt.read(1).count() == 1  # bad version still inspectable
    assert vt.history()[-1]["op"] == "rollback:0" and v2 == 2


def test_commit_conflict_rebases_append_on_new_head(spark, vt):
    vt.append(_df(spark, 0, 10))
    # simulate a concurrent writer claiming version 1: head becomes a copy
    # of v0 (same files) committed by someone else
    import json

    m0 = vt._read_manifest(0)
    os.makedirs(vt.manifest_dir, exist_ok=True)
    with open(vt._manifest_path(1), "w") as fh:
        json.dump({**m0, "version": 1}, fh)
    v = vt.append(_df(spark, 10, 20))
    assert v == 2  # lost the race for v1, landed on v2
    # base re-derived from the NEW head: both batches visible
    assert vt.read(2).count() == 20
    assert sorted(r.id for r in vt.read(2).collect()) == list(range(20))


def test_append_retries_and_rebases_after_losing_race(spark, vt, monkeypatch):
    import json

    vt.append(_df(spark, 0, 10))
    real = vt._try_commit
    state = {"raced": False}

    def racing_commit(files, op, n_rows, **kw):
        if not state["raced"]:
            state["raced"] = True
            # a concurrent writer lands v1 (same snapshot re-committed)
            # in the window between head read and manifest claim
            with open(vt._manifest_path(1), "w") as fh:
                json.dump({**vt._read_manifest(0), "version": 1}, fh)
            raise CommitConflict("simulated lost race")
        return real(files, op, n_rows, **kw)

    monkeypatch.setattr(vt, "_try_commit", racing_commit)
    v = vt.append(_df(spark, 10, 20))
    assert state["raced"] and v == 2
    assert sorted(r.id for r in vt.read(2).collect()) == list(range(20))


def test_vacuum_keeps_retained_versions_readable(spark, vt):
    vt.append(_df(spark, 0, 100))
    vt.overwrite(_df(spark, 0, 10))
    vt.append(_df(spark, 10, 30))
    out = vt.vacuum(keep_last=2, min_age_seconds=0)
    assert out["removed_versions"] == 1 and out["removed_files"] >= 1
    assert vt.read(1).count() == 10 and vt.read(2).count() == 30
    with pytest.raises(FileNotFoundError):
        vt.read(0)


def test_readers_never_see_uncommitted_data(spark, vt):
    vt.append(_df(spark, 0, 10))
    # land a data dir with NO manifest (a writer mid-flight)
    orphan = _df(spark, 900, 1000)
    orphan.write.parquet(os.path.join(vt.data_dir, "txn-orphan"))
    assert vt.read().count() == 10  # invisible until a manifest commits


# --- txn-id idempotent appends & exactly-once streaming ingest ---------------


def test_append_txn_id_is_idempotent(spark, vt):
    v = vt.append(_df(spark, 0, 10), txn_id="batch:0")
    v_again = vt.append(_df(spark, 0, 10), txn_id="batch:0")  # the replay
    assert v_again == v
    assert vt.read().count() == 10
    assert len(vt.history()) == 1
    assert vt.append(_df(spark, 10, 20), txn_id="batch:1") == v + 1
    assert vt.read().count() == 20


def test_versioned_ingest_stream_exactly_once(spark, tmp_path):
    import time

    from vector_db_spark.streaming.ingest import versioned_ingest_stream

    src, tab = str(tmp_path / "src"), str(tmp_path / "tab")
    schema = "id long, s string"
    _df(spark, 0, 50).coalesce(1).write.parquet(src)
    time.sleep(1.1)  # distinct modTime -> deterministic file order
    _df(spark, 50, 80).coalesce(1).write.mode("append").parquet(src)

    def run(ckpt):
        q = versioned_ingest_stream(
            spark, src, tab, schema=schema,
            checkpoint_dir=str(tmp_path / ckpt), max_files_per_trigger=1,
        )
        q.awaitTermination()

    run("ckpt")
    vt = VersionedTable(spark, tab)
    assert vt.read().count() == 80
    n_versions = len(vt.history())
    assert n_versions == 2  # one atomic version per micro-batch

    # same checkpoint: source offsets already committed, nothing replays
    run("ckpt")
    assert vt.read().count() == 80 and len(vt.history()) == n_versions

    # WORST CASE: checkpoint lost entirely -> every epoch replays with the
    # same epoch ids; the txn log must absorb all of it
    run("ckpt-lost")
    assert vt.read().count() == 80 and len(vt.history()) == n_versions

    # snapshot-per-batch lineage: version 0 is exactly the first file
    assert vt.read(0).count() == 50


# --- merge (upsert) ----------------------------------------------------------


def test_merge_updates_and_inserts(spark, vt):
    vt.append(_df(spark, 0, 10))
    src = spark.createDataFrame(
        [(5, "UPDATED"), (6, "ALSO"), (100, "NEW")], "id long, s string"
    )
    vt.merge(src, "id")
    got = {r.id: r.s for r in vt.read().collect()}
    assert len(got) == 11
    assert got[5] == "UPDATED" and got[6] == "ALSO" and got[100] == "NEW"
    assert got[0] == "r0"  # untouched row intact
    # pre-merge snapshot still time-travels
    assert {r.s for r in vt.read(0).collect()} == {f"r{i}" for i in range(10)}


def test_merge_prunes_untouched_files(spark, vt):
    vt.append(_df(spark, 0, 100).coalesce(1))
    vt.append(_df(spark, 100, 200).coalesce(1))
    before = vt._snapshot(vt.current_version())["files"]
    src = spark.createDataFrame([(150, "X")], "id long, s string")
    v = vt.merge(src, "id")
    after = vt._snapshot(v)["files"]
    # file holding ids 0..99 carries over by reference
    assert sum(1 for f in before if f in after) == 1
    assert vt.read().count() == 200
    assert {r.s for r in vt.read().filter(F.col("id") == 150).collect()} == {"X"}


def test_merge_insert_only_and_update_only(spark, vt):
    vt.append(_df(spark, 0, 10))
    src = spark.createDataFrame([(5, "U"), (50, "N")], "id long, s string")
    vt.merge(src, "id", update=False)  # insert-only: 5 keeps r5
    got = {r.id: r.s for r in vt.read().collect()}
    assert got[5] == "r5" and got[50] == "N" and len(got) == 11
    vt.merge(
        spark.createDataFrame([(5, "U2"), (99, "NOPE")], "id long, s string"),
        "id",
        insert=False,
    )  # update-only: 99 not inserted
    got = {r.id: r.s for r in vt.read().collect()}
    assert got[5] == "U2" and 99 not in got and len(got) == 11


def test_merge_rejects_duplicate_source_keys(spark, vt):
    vt.append(_df(spark, 0, 5))
    src = spark.createDataFrame([(1, "a"), (1, "b")], "id long, s string")
    with pytest.raises(ValueError, match="duplicate merge keys"):
        vt.merge(src, "id")


def test_merge_into_empty_table_inserts(spark, vt):
    src = _df(spark, 0, 7)
    vt.merge(src, "id")
    assert vt.read().count() == 7


# --- zone maps (manifest-level data skipping) & compaction -------------------


def test_zone_map_pruning_skips_disjoint_files(spark, vt):
    vt.set_stats_cols(["id"])
    vt.append(_df(spark, 0, 100).coalesce(1))
    vt.append(_df(spark, 1000, 1100).coalesce(1))
    m = vt._snapshot(vt.current_version())
    assert len(m["files"]) == 2 and set(m["stats"]) == set(m["files"])
    # a range query inside the first file's zone plans ONE file
    assert len(vt.pruned_files("id", 10, 20)) == 1
    assert len(vt.pruned_files("id", 500, 600)) == 0
    assert len(vt.pruned_files("id", 50, 1050)) == 2
    got = vt.read_pruned("id", 10, 20).filter((F.col("id") >= 10) & (F.col("id") <= 20))
    assert got.count() == 11
    # disjoint range: pruned read is empty without touching data
    assert vt.read_pruned("id", 500, 600).count() == 0


def test_zone_maps_survive_merge_and_carry_over(spark, vt):
    vt.set_stats_cols(["id"])
    vt.append(_df(spark, 0, 100).coalesce(1))
    vt.append(_df(spark, 1000, 1100).coalesce(1))
    vt.merge(spark.createDataFrame([(1050, "X")], "id long, s string"), "id")
    m = vt._snapshot(vt.current_version())
    # every listed file still has stats: carried for untouched, fresh for rewritten
    assert set(m["stats"]) == set(m["files"])
    assert len(vt.pruned_files("id", 0, 50)) == 1


def test_files_without_stats_are_conservatively_read(spark, vt):
    vt.append(_df(spark, 0, 100).coalesce(1))  # before set_stats_cols
    vt.set_stats_cols(["id"])
    vt.append(_df(spark, 1000, 1100).coalesce(1))
    # stat-less file must always be kept
    assert len(vt.pruned_files("id", 5000, 6000)) == 1
    assert vt.read_pruned("id", 0, 10).count() >= 100


def test_compact_preserves_rows_and_history(spark, vt):
    vt.set_stats_cols(["id"])
    for lo in range(0, 500, 100):
        vt.append(_df(spark, lo, lo + 100).coalesce(2))
    v_pre = vt.current_version()
    n_files_pre = vt._read_manifest(v_pre)["n_files"]
    v = vt.compact(target_files=1)
    m = vt._read_manifest(v)
    snap = vt._snapshot(v)
    assert m["n_files"] == 1 < n_files_pre
    assert vt.read().count() == 500
    assert sorted(r.id for r in vt.read().collect()) == list(range(500))
    assert vt.read(v_pre).count() == 500  # pre-compaction snapshot intact
    # zone maps recomputed for the compacted file
    assert set(snap["stats"]) == set(snap["files"]) and len(snap["files"]) == 1


# --- schema evolution & version diff -----------------------------------------


def test_schema_evolution_appends_new_column(spark, vt):
    vt.append(_df(spark, 0, 10))
    evolved = spark.createDataFrame(
        [(100, "r100", 0.5)], "id long, s string, score double"
    )
    vt.append(evolved)
    out = vt.read()
    assert "score" in out.columns
    got = {r.id: r.score for r in out.collect()}
    assert got[100] == 0.5 and got[0] is None  # old rows read NULL


def test_diff_between_versions(spark, vt):
    vt.append(_df(spark, 0, 5))
    vt.merge(
        spark.createDataFrame([(2, "CHANGED"), (50, "NEW")], "id long, s string"), "id"
    )
    vt.delete_where(F.col("id") == 4)
    d = {(r.op, r.id) for r in vt.diff(0, vt.current_version(), ["id"]).collect()}
    assert d == {("U", 2), ("I", 50), ("D", 4)}


def test_diff_across_schema_evolution(spark, vt):
    vt.append(_df(spark, 0, 3))
    vt.append(spark.createDataFrame([(50, "n", 0.9)], "id long, s string, score double"))
    d = {(r.op, r.id) for r in vt.diff(0, vt.current_version(), ["id"]).collect()}
    # old rows now carry a NULL score column -> unchanged (null==null safe), new row is I
    assert d == {("I", 50)}


def test_vacuum_min_age_protects_inflight_writers(spark, vt):
    vt.append(_df(spark, 0, 10))
    vt.overwrite(_df(spark, 0, 5))
    # a writer mid-flight: data landed, manifest not yet committed
    _df(spark, 900, 950).write.parquet(os.path.join(vt.data_dir, "txn-inflight"))
    out = vt.vacuum(keep_last=1, min_age_seconds=3600)
    # nothing young enough to be an active write may be touched
    assert out["removed_files"] == 0
    assert os.path.isdir(os.path.join(vt.data_dir, "txn-inflight"))
    # once aged (simulated), reclamation proceeds
    out2 = vt.vacuum(keep_last=1, min_age_seconds=0)
    assert out2["removed_files"] >= 1
    assert vt.read().count() == 5


def test_delete_where_preserves_evolved_columns(spark, vt):
    """Regression (round-4 advice): the CoW pruning scan and survivor
    rewrite must read with mergeSchema — a plain read inferred the schema
    from whichever txn dir sorted first, so a delete after an evolved
    append could permanently drop the evolved column from survivors."""
    vt.append(_df(spark, 0, 10))
    vt.append(
        spark.createDataFrame(
            [(100, "r100", 0.5), (101, "r101", 0.7)],
            "id long, s string, score double",
        )
    )
    vt.delete_where(F.col("id") == 101)  # hits the evolved file
    out = vt.read()
    assert "score" in out.columns
    got = {r.id: r.score for r in out.collect()}
    assert got[100] == 0.5 and 101 not in got and got[0] is None


def test_merge_preserves_evolved_columns(spark, vt):
    vt.append(_df(spark, 0, 5))
    vt.append(spark.createDataFrame([(100, "r100", 0.5)], "id long, s string, score double"))
    # source predates the evolved column: updated/inserted rows align in NULL,
    # the untouched evolved row keeps its value
    vt.merge(spark.createDataFrame([(2, "CHANGED"), (200, "NEW")], "id long, s string"), "id")
    out = vt.read()
    assert "score" in out.columns
    got = {r.id: (r.s, r.score) for r in out.collect()}
    assert got[100] == ("r100", 0.5)
    assert got[2] == ("CHANGED", None) and got[200] == ("NEW", None)


def test_merge_hitting_evolved_file_keeps_score_column(spark, vt):
    vt.append(_df(spark, 0, 5))
    vt.append(spark.createDataFrame([(100, "r100", 0.5), (101, "r101", 0.7)], "id long, s string, score double"))
    # update a key INSIDE the evolved file: its survivors must keep score
    vt.merge(spark.createDataFrame([(101, "UPD")], "id long, s string"), "id")
    got = {r.id: (r.s, r.score) for r in vt.read().collect()}
    assert got[100] == ("r100", 0.5)   # survivor of the rewritten evolved file
    assert got[101] == ("UPD", None)   # updated from evolved-column-less source


def test_txn_idempotence_survives_vacuum(spark, vt):
    """Regression (round-4 advice): vacuum removed expired manifests along
    with their txn_id records, so a lost-checkpoint replay of a vacuumed
    epoch re-appended as a duplicate. txn ids now carry forward in
    _manifest/txns.json."""
    v0 = vt.append(_df(spark, 0, 10), txn_id="ingest-epoch-0")
    vt.append(_df(spark, 10, 20), txn_id="ingest-epoch-1")
    vt.append(_df(spark, 20, 30), txn_id="ingest-epoch-2")
    vt.vacuum(keep_last=1, min_age_seconds=0)  # expires epochs 0 and 1
    assert vt.txn_version("ingest-epoch-0") == v0  # still remembered
    # replaying the vacuumed epoch is a no-op
    assert vt.append(_df(spark, 0, 10), txn_id="ingest-epoch-0") == v0
    assert vt.read().count() == 30
    # a second vacuum keeps accumulating retired ids
    vt.append(_df(spark, 30, 40), txn_id="ingest-epoch-3")
    vt.vacuum(keep_last=1, min_age_seconds=0)
    assert vt.txn_version("ingest-epoch-2") is not None
    assert vt.append(_df(spark, 20, 30), txn_id="ingest-epoch-2") is not None
    assert vt.read().count() == 40


def test_checkpointed_manifests_bound_snapshot_reads(spark, tmp_path):
    """The million-file answer (round-4): delta manifests + periodic
    checkpoints. Opening any version must read ONE checkpoint plus at
    most checkpoint_interval delta manifests, regardless of how long the
    log is."""
    vt = VersionedTable(spark, str(tmp_path / "ck"), checkpoint_interval=10)
    one = spark.createDataFrame([(0, "x")], "id long, s string").coalesce(1)
    for i in range(25):
        vt.append(one)
    assert vt._ckpt_versions() == [10, 20]
    assert vt.read().count() == 25

    # a fresh handle (cold cache) reconstructs the head from ckpt-20 + 4 deltas
    cold = VersionedTable(spark, str(tmp_path / "ck"), checkpoint_interval=10)
    reads = []
    real = cold._read_manifest
    cold._read_manifest = lambda v: (reads.append(v), real(v))[1]
    snap = cold._snapshot(24)
    assert len(snap["files"]) == 25
    assert reads and min(reads) >= 21 and len(reads) <= 10 + 1
    # and an old version still reconstructs exactly (ckpt-10 + tail)
    reads.clear()
    assert len(cold._snapshot(13)["files"]) == 14
    assert min(reads) >= 11


def test_checkpoint_loss_is_recoverable(spark, tmp_path):
    """Checkpoints are derived data: deleting one only forces a longer
    delta replay, never a wrong answer."""
    vt = VersionedTable(spark, str(tmp_path / "ck"), checkpoint_interval=5)
    one = spark.createDataFrame([(0, "x")], "id long, s string").coalesce(1)
    for _ in range(12):
        vt.append(one)
    for c in vt._ckpt_versions():
        os.remove(vt._ckpt_path(c))
    cold = VersionedTable(spark, str(tmp_path / "ck"), checkpoint_interval=5)
    assert len(cold._snapshot(11)["files"]) == 12
    assert cold.read().count() == 12


def test_txn_lookup_reads_through_checkpoint(spark, tmp_path):
    """txn_version must find an epoch recorded BELOW the latest checkpoint
    without scanning the whole log (the cumulative txns map rides the
    checkpoint)."""
    vt = VersionedTable(spark, str(tmp_path / "ck"), checkpoint_interval=5)
    one = spark.createDataFrame([(0, "x")], "id long, s string").coalesce(1)
    for i in range(8):
        vt.append(one, txn_id=f"e{i}")
    cold = VersionedTable(spark, str(tmp_path / "ck"), checkpoint_interval=5)
    reads = []
    real = cold._read_manifest
    cold._read_manifest = lambda v: (reads.append(v), real(v))[1]
    assert cold.txn_version("e2") == 2  # below ckpt-5: served by the ckpt map
    assert min(reads, default=6) >= 6  # only the tail deltas were opened
    assert cold.txn_version("e7") == 7
    assert cold.append(one, txn_id="e2") == 2  # replay still a no-op


def test_vacuum_anchors_checkpoint_at_oldest_retained(spark, tmp_path):
    """After vacuum removes old deltas, every retained version must stay
    reconstructable — vacuum writes the anchor checkpoint first."""
    vt = VersionedTable(spark, str(tmp_path / "ck"), checkpoint_interval=100)
    one = spark.createDataFrame([(0, "x")], "id long, s string").coalesce(1)
    for _ in range(7):
        vt.append(one)
    vt.vacuum(keep_last=3, min_age_seconds=0)
    assert vt._versions() == [4, 5, 6]
    assert vt._ckpt_versions() == [4]  # anchored at oldest retained
    cold = VersionedTable(spark, str(tmp_path / "ck"))
    assert cold.read(4).count() == 5
    assert cold.read(6).count() == 7
    with pytest.raises(FileNotFoundError):
        cold.read(2)


def test_bloom_pruning_point_lookup(spark, vt):
    """Manifest blooms: an equality probe on an unclustered id must plan
    only the file(s) whose bloom admits the value; absent values prune to
    (near) zero files; files written before set_bloom_cols stay
    conservatively kept."""
    vt.set_bloom_cols(["id"], n_bits=4096, n_hashes=5)
    vt.append(_df(spark, 0, 100).coalesce(1))
    vt.append(_df(spark, 10000, 10100).coalesce(1))
    # present value: exactly the owning file survives pruning
    assert len(vt.pruned_files_eq("id", 50)) == 1
    assert len(vt.pruned_files_eq("id", 10050)) == 1
    got = vt.read_point("id", 10050).collect()
    assert len(got) == 1 and got[0].s == "r10050"
    # absent value: with 100 distinct/file in 4096 bits the fp chance per
    # file is ~(100*5/4096)^5 — both files must drop
    assert vt.pruned_files_eq("id", 555555) == []
    assert vt.read_point("id", 555555).count() == 0
    # undeclared column: no pruning, full file list
    assert len(vt.pruned_files_eq("s", "r50")) == 2


def test_bloom_carries_through_cow_and_checkpoint(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "b"), checkpoint_interval=2)
    vt.set_bloom_cols(["id"], n_bits=4096, n_hashes=5)
    vt.append(_df(spark, 0, 50).coalesce(1))
    vt.append(_df(spark, 1000, 1050).coalesce(1))   # v1 -> checkpoint
    vt.delete_where(F.col("id") == 1000)            # v2 rewrites file 2
    # untouched file's bloom carried by reference; rewritten file re-bloomed
    assert len(vt.pruned_files_eq("id", 10)) == 1
    assert len(vt.pruned_files_eq("id", 1049)) == 1
    assert vt.read_point("id", 1000).count() == 0
    # cold handle reconstructs blooms through ckpt + delta tail
    cold = VersionedTable(spark, str(tmp_path / "b"), checkpoint_interval=2)
    assert len(cold.pruned_files_eq("id", 10)) == 1
    assert cold.read_point("id", 1049).count() == 1


def test_bloom_files_without_filter_are_kept(spark, vt):
    vt.append(_df(spark, 0, 50).coalesce(1))        # before set_bloom_cols
    vt.set_bloom_cols(["id"], n_bits=4096, n_hashes=5)
    vt.append(_df(spark, 1000, 1050).coalesce(1))
    # pre-bloom file always kept (maybe), bloomed file prunes honestly
    assert len(vt.pruned_files_eq("id", 777777)) == 1
    assert len(vt.pruned_files_eq("id", 10)) == 1   # old file kept, new dropped
    assert vt.read_point("id", 10).count() == 1


def test_zorder_compact_enables_multidim_pruning(spark, tmp_path):
    """Z-order layout: after OPTIMIZE-style zorder compact on (x, y), a
    box probe must zone-prune on BOTH dimensions; a linear sort by x
    prunes only x. Rows and answers are unchanged — only the layout."""
    import random

    rng = random.Random(7)
    rows = [(i, rng.randrange(10000), rng.randrange(10000)) for i in range(20000)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    vt = VersionedTable(spark, str(tmp_path / "z"))
    vt.set_stats_cols(["x", "y"])
    vt.append(df.repartitionByRange(16, "x").sortWithinPartitions("x"))
    naive_x = set(vt.pruned_files("x", 1000, 1999))
    naive_y = set(vt.pruned_files("y", 1000, 1999))
    naive_kept = len(naive_x & naive_y)

    v = vt.compact(target_files=16, zorder_by=["x", "y"])
    assert vt._read_manifest(v)["op"] == "zorder"
    z_x = set(vt.pruned_files("x", 1000, 1999))
    z_y = set(vt.pruned_files("y", 1000, 1999))
    z_kept = len(z_x & z_y)
    # The robust qualitative claims (repartitionByRange samples its
    # boundaries, so exact file counts wobble ±1 run to run):
    # 1. the x-sorted layout CANNOT prune on y — its y zones span everything;
    assert len(naive_y) == 16
    # 2. z-order prunes on BOTH axes: the y probe must skip at least half
    #    the files, and the 1%-area box must plan at most 6 of 16;
    assert len(z_y) <= 8, len(z_y)
    assert z_kept <= 6, (z_kept, naive_kept)
    # 3. never worse than the linear layout's box plan
    assert z_kept <= naive_kept + 1
    # answers unchanged
    got = (
        vt.read()
        .filter((F.col("x").between(1000, 1999)) & (F.col("y").between(1000, 1999)))
        .count()
    )
    want = sum(1 for _, x, y in rows if 1000 <= x <= 1999 and 1000 <= y <= 1999)
    assert got == want
    assert vt.read().count() == 20000


def test_timestamp_as_of(spark, vt):
    import time

    v0 = vt.append(_df(spark, 0, 10))
    t_between = time.time()
    time.sleep(0.02)
    v1 = vt.append(_df(spark, 10, 30))
    assert vt.version_at(t_between) == v0
    assert vt.version_at(time.time()) == v1
    assert vt.read_asof(t_between).count() == 10
    assert vt.read_asof(time.time()).count() == 30
    with pytest.raises(ValueError, match="no version"):
        vt.version_at(0.0)


def test_merge_probe_is_zone_pruned(spark, vt):
    """With zone maps on the merge key, the matched-key probe must open
    only files whose key zone overlaps the source batch — a small merge
    into a key-clustered table never scans disjoint files."""
    vt.set_stats_cols(["id"])
    vt.append(_df(spark, 0, 100).coalesce(1))
    vt.append(_df(spark, 1000, 1100).coalesce(1))
    vt.append(_df(spark, 2000, 2100).coalesce(1))
    calls = []
    orig = vt._read_paths
    vt._read_paths = lambda paths: (calls.append(list(paths)), orig(paths))[1]
    v = vt.merge(
        spark.createDataFrame([(1005, "UPD"), (1500, "NEW")], "id long, s string"),
        "id",
    )
    vt._read_paths = orig
    # first read is the probe: only the middle file's zone overlaps
    # [1005, 1500]
    assert len(calls[0]) == 1 and "txn-" in calls[0][0]
    got = {r.id: r.s for r in vt.read(v).collect()}
    assert got[1005] == "UPD" and got[1500] == "NEW"
    assert got[0] == "r0" and got[2000] == "r2000"
    assert len(got) == 301


def test_appended_rows_change_feed(spark, vt):
    vt.append(_df(spark, 0, 10))                 # v0
    vt.append(_df(spark, 10, 30))                # v1
    vt.append(_df(spark, 30, 35))                # v2
    feed = vt.appended_rows(0)                   # (v0, v2]
    got = {(r.id, r._commit_version) for r in feed.collect()}
    assert {i for i, _ in got} == set(range(10, 35))
    assert {v for _, v in got} == {1, 2}
    assert vt.appended_rows(1).count() == 5
    assert vt.appended_rows(2).count() == 0      # empty feed, schema intact
    assert "_commit_version" in vt.appended_rows(2).columns


def test_appended_rows_refuses_rewrites(spark, vt):
    vt.append(_df(spark, 0, 10))
    vt.delete_where(F.col("id") == 3)
    vt.append(_df(spark, 10, 20))
    with pytest.raises(ValueError, match="append-only"):
        vt.appended_rows(0)
    # a range past the rewrite works
    assert vt.appended_rows(1).count() == 10


def test_appended_rows_spans_schema_evolution(spark, vt):
    vt.append(_df(spark, 0, 5))
    vt.append(spark.createDataFrame([(50, "n", 0.9)], "id long, s string, score double"))
    feed = vt.appended_rows(0)
    assert "score" in feed.columns and feed.count() == 1


def test_change_feed_drives_incremental_index_refresh(spark, vt, sf_smoke):
    """Composition: the append-only change feed is exactly what an
    incremental IVF refresh consumes — assigning ONLY the fed rows gives
    the same clusters a full re-assignment would give them."""
    from vector_db_spark.io import load_table
    from vector_db_spark.operators.ivf import assign_to_centroids

    emb = load_table(spark, sf_smoke, "embeddings").select("vec_id", "embedding")
    a = emb.filter(F.col("vec_id") < 300)
    b = emb.filter(F.col("vec_id").between(300, 399))
    vt.append(a)
    v_indexed = vt.current_version()
    vt.append(b)

    cents = [
        (0, [0.0] * 32),
        (1, [1.0] * 32),
        (2, [-1.0] * 32),
    ]
    feed = vt.appended_rows(v_indexed).select("vec_id", "embedding")
    inc = assign_to_centroids(feed, cents, id_col="vec_id", vec_col="embedding")
    full = assign_to_centroids(
        vt.read().select("vec_id", "embedding"), cents,
        id_col="vec_id", vec_col="embedding",
    ).filter(F.col("vec_id") >= 300)
    assert feed.count() == 100
    assert sorted(map(tuple, inc.select("vec_id", "cluster_id").collect())) == sorted(
        map(tuple, full.select("vec_id", "cluster_id").collect())
    )


def test_concurrent_writers_all_commits_land(spark, vt):
    """Two REAL threads racing appends through the O_EXCL protocol: every
    commit must land exactly once, versions are gapless, and the final
    snapshot is the union of all batches."""
    import threading

    errs = []

    def writer(base: int) -> None:
        try:
            for i in range(5):
                lo = base + i * 100
                vt.append(_df(spark, lo, lo + 100), retries=50)
        except Exception as e:  # pragma: no cover - failure surface
            errs.append(e)

    t1 = threading.Thread(target=writer, args=(0,))
    t2 = threading.Thread(target=writer, args=(10_000,))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs
    assert vt._versions() == list(range(10))  # gapless, all landed
    assert vt.read().count() == 1000
    ids = {r.id for r in vt.read().select("id").collect()}
    want = set(range(0, 500)) | set(range(10_000, 10_500))
    assert ids == want


def test_zorder_rejects_string_columns(spark, vt):
    vt.append(_df(spark, 0, 10))
    with pytest.raises(ValueError, match="zorder_by column 's'"):
        vt.compact(target_files=2, zorder_by=["id", "s"])


# --- round-5 self-review regression pins ---------------------------------------


def test_stale_base_commit_is_refused(spark, vt):
    """Lost-update guard: a commit whose file list was derived from an
    old snapshot must raise CommitConflict once the head moved — NOT
    silently diff away the interleaved commit's files."""
    vt.append(_df(spark, 0, 10))
    prev = vt.current_version()
    m = vt._snapshot(prev)
    vt.append(_df(spark, 10, 20))  # interleaved writer moves the head
    with pytest.raises(CommitConflict, match="stale"):
        vt._try_commit(m["files"], "delete", m["n_rows"], base_version=prev)
    # and the table still holds BOTH appends
    assert vt.read().count() == 20


def test_manifest_publish_leaves_no_tmp_litter(spark, vt):
    vt.append(_df(spark, 0, 5))
    vt.append(_df(spark, 5, 9))
    names = os.listdir(vt.manifest_dir)
    assert not [n for n in names if ".tmp-" in n]


def test_bloom_prunes_correctly_with_nulls_in_int_column(spark, vt):
    """An int64 column containing NULLs is float-coerced by pandas; the
    bloom must still be probed with the value the user looks up."""
    vt.set_bloom_cols(["id"], n_bits=4096, n_hashes=4)
    df = spark.createDataFrame(
        [(5, "five"), (None, "nothing"), (6, "six")], "id long, s string"
    )
    vt.append(df)
    got = vt.read_point("id", 5).collect()
    assert [r.s for r in got] == ["five"]
    # absent key still prunes everything
    assert vt.pruned_files_eq("id", 10**9) == []


def test_date_zone_maps_survive_process_restart(spark, tmp_path):
    """Date zones are persisted as strings; a fresh instance (no warm
    snapshot cache) must still prune and never raise str-vs-date."""
    import datetime as dt

    vt = VersionedTable(spark, str(tmp_path / "dz"))
    vt.set_stats_cols(["d"])
    df = spark.createDataFrame(
        [(i, dt.date(2024, 1, 1 + i)) for i in range(8)], "id long, d date"
    )
    vt.append(df.repartitionByRange(4, "d"))
    fresh = VersionedTable(spark, str(tmp_path / "dz"))  # cold cache
    pruned = fresh.pruned_files("d", dt.date(2024, 1, 1), dt.date(2024, 1, 2))
    assert 0 < len(pruned) < len(fresh._snapshot(fresh.current_version())["files"])
    rows = fresh.read_pruned("d", dt.date(2024, 1, 1), dt.date(2024, 1, 2)).filter(
        F.col("d").between("2024-01-01", "2024-01-02")
    )
    assert rows.count() == 2


def test_merge_into_emptied_snapshot_appends(spark, vt):
    """merge() after a delete-all must behave as insert-all, not crash on
    a zero-path read (read() itself raises on an empty version — that
    pre-existing contract is unchanged)."""
    vt.append(_df(spark, 0, 10))
    vt.delete_where(F.lit(True))
    with pytest.raises(ValueError, match="empty"):
        vt.read()
    vt.merge(_df(spark, 0, 4), "id")
    assert vt.read().count() == 4


def test_bloom_geometry_change_keeps_old_bitmaps_correct(spark, vt):
    vt.set_bloom_cols(["id"], n_bits=2048, n_hashes=3)
    vt.append(_df(spark, 0, 50))
    vt.set_bloom_cols(["id"], n_bits=16384, n_hashes=5)
    vt.append(_df(spark, 50, 100))
    # keys from BOTH eras resolve through their own bitmap geometry
    assert vt.read_point("id", 7).count() == 1
    assert vt.read_point("id", 77).count() == 1
    assert vt.pruned_files_eq("id", 10**9) == []


def test_delete_where_in_path_with_space(spark, tmp_path):
    """input_file_name() returns percent-encoded URIs; the relpath must
    decode them or deletes silently duplicate rows instead of deleting."""
    vt = VersionedTable(spark, str(tmp_path / "my table" / "t"))
    vt.append(_df(spark, 0, 10))
    vt.delete_where(F.col("id") < 3)
    got = sorted(r.id for r in vt.read().collect())
    assert got == list(range(3, 10))


def test_rollback_to_reclaimed_files_raises(spark, vt):
    """A rollback target whose data files are gone (vacuum won the race)
    must fail the rollback, not commit a head pointing at vanished data.
    (Rolling back past vacuumed MANIFESTS already raises at the snapshot
    read — this pins the files-gone-manifest-present window.)"""
    vt.append(_df(spark, 0, 10))
    vt.overwrite(_df(spark, 0, 5))
    m0 = vt._snapshot(0)
    os.remove(os.path.join(vt.path, m0["files"][0]))  # simulate vacuum
    with pytest.raises(ValueError, match="vacuumed"):
        vt.rollback(0)


def test_per_file_row_counts_ride_the_manifest(spark, vt):
    vt.append(_df(spark, 0, 20).repartition(4))
    m = vt._snapshot(vt.current_version())
    assert all(
        isinstance(m["stats"].get(f, {}).get("__rows"), int) for f in m["files"]
    )
    assert sum(m["stats"][f]["__rows"] for f in m["files"]) == 20


def test_merge_persists_source_only_evolved_column(spark, vt):
    """A merge batch carrying a NEW column must evolve the schema forward
    (as append+mergeSchema would), not silently project it away: updated
    and inserted rows keep their values, untouched rows read as NULL."""
    vt.append(_df(spark, 0, 10))
    src = spark.createDataFrame(
        [(5, "upd5", 0.9), (100, "new100", 0.1)], "id long, s string, score double"
    )
    vt.merge(src, "id")
    got = {r.id: (r.s, r.score) for r in vt.read().collect()}
    assert got[5] == ("upd5", 0.9)
    assert got[100] == ("new100", 0.1)
    assert got[0] == ("r0", None)  # untouched row: evolved column is NULL
    assert len(got) == 11


def test_rollback_retries_after_losing_race(spark, vt, monkeypatch):
    """Rollback is base-independent like overwrite: a lost commit race must
    retry verbatim, not abort an operational restore."""
    import json

    vt.append(_df(spark, 0, 10))
    vt.overwrite(_df(spark, 0, 5))
    real = vt._try_commit
    state = {"raced": False}

    def racing_commit(files, op, n_rows, **kw):
        if not state["raced"]:
            state["raced"] = True
            with open(vt._manifest_path(2), "w") as fh:
                json.dump({**vt._read_manifest(1), "version": 2}, fh)
            raise CommitConflict("simulated lost race")
        return real(files, op, n_rows, **kw)

    monkeypatch.setattr(vt, "_try_commit", racing_commit)
    v = vt.rollback(0)
    assert state["raced"] and v == 3
    assert sorted(r.id for r in vt.read().collect()) == list(range(10))
