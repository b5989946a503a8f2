"""DBSCAN over ε-pair lists (operators/density.py).

Pins: exact agreement with a pure-Python textbook DBSCAN (min-label
border tie-break) on crafted geometry and on random point sets; the
core/border/noise role laws; and blocked == brute pairs when the
blocking is complete (single cluster ⇒ no candidate is ever missed).
"""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from vector_db_spark.operators.density import (
    NOISE,
    dbscan_cluster_stats,
    dbscan_from_pairs,
    epsilon_pairs_blocked,
    epsilon_pairs_brute,
)


def ref_dbscan(pts: dict[int, tuple], eps: float, min_pts: int):
    """Textbook DBSCAN with deterministic min-label rules: clusters =
    core-connected components labelled by min member id; border joins
    its minimum adjacent core cluster."""
    ids = sorted(pts)
    nbr = {i: set() for i in ids}
    for a, b in itertools.combinations(ids, 2):
        d = round(math.dist(pts[a], pts[b]), 6)
        if d <= eps:
            nbr[a].add(b)
            nbr[b].add(a)
    core = {i for i in ids if len(nbr[i]) + 1 >= min_pts}
    label = {}
    for seed in sorted(core):
        if seed in label:
            continue
        comp, frontier = {seed}, [seed]
        while frontier:
            u = frontier.pop()
            for v in nbr[u] & core:
                if v not in comp:
                    comp.add(v)
                    frontier.append(v)
        lab = min(comp)
        for m in comp:
            label[m] = lab
    out = {}
    for i in ids:
        if i in core:
            out[i] = (label[i], "core")
        else:
            adj_cores = sorted(label[c] for c in nbr[i] & core)
            out[i] = (adj_cores[0], "border") if adj_cores else (NOISE, "noise")
    return out


def run_spark_dbscan(spark, pts, eps, min_pts):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in pts.items()],
        "vec_id long, embedding array<double>",
    )
    pairs = epsilon_pairs_brute(df, eps)
    got = dbscan_from_pairs(df, pairs, min_pts).collect()
    return {r.vec_id: (r.cluster_label, r.role) for r in got}


def test_two_blobs_and_noise(spark):
    """Two separated blobs + an isolated point + a border point."""
    pts = {
        0: (0.0, 0.0), 1: (0.1, 0.0), 2: (0.0, 0.1), 3: (0.1, 0.1),  # blob A
        10: (5.0, 5.0), 11: (5.1, 5.0), 12: (5.0, 5.1), 13: (5.1, 5.1),  # blob B
        20: (0.35, 0.0),   # border: within eps of blob-A cores only
        30: (9.0, 9.0),    # noise
    }
    got = run_spark_dbscan(spark, pts, eps=0.3, min_pts=4)
    want = ref_dbscan(pts, eps=0.3, min_pts=4)
    assert got == want
    assert got[30] == (NOISE, "noise")
    assert got[20][1] == "border" and got[20][0] == 0
    assert {got[i][0] for i in (0, 1, 2, 3)} == {0}
    assert {got[i][0] for i in (10, 11, 12, 13)} == {10}


def test_chain_merges_through_core_links(spark):
    """A chain of cores is ONE cluster (density-connectivity), while a
    border point shared by two clusters takes the min label."""
    pts = {i: (0.25 * i, 0.0) for i in range(7)}  # eps=0.3 links only ±1
    got = run_spark_dbscan(spark, pts, eps=0.3, min_pts=3)
    want = ref_dbscan(pts, eps=0.3, min_pts=3)
    assert got == want
    # interior points (two ε-neighbors) are core; the endpoints have
    # closed-neighborhood 2 < min_pts, so they are border — one chain
    # cluster labelled by the min CORE id (1), endpoints attached
    assert {v[0] for v in got.values()} == {1}
    assert got[0][1] == "border" and got[6][1] == "border"


@pytest.mark.parametrize("seed", [7, 42])
def test_random_agreement_with_reference(spark, seed):
    import random

    rng = random.Random(seed)
    pts = {i: (rng.uniform(0, 1), rng.uniform(0, 1)) for i in range(60)}
    got = run_spark_dbscan(spark, pts, eps=0.15, min_pts=4)
    want = ref_dbscan(pts, eps=0.15, min_pts=4)
    assert got == want


def test_role_laws(spark):
    import random

    rng = random.Random(3)
    pts = {i: (rng.uniform(0, 1), rng.uniform(0, 1)) for i in range(80)}
    eps, min_pts = 0.2, 5
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in pts.items()],
        "vec_id long, embedding array<double>",
    )
    pairs = epsilon_pairs_brute(df, eps)
    out = dbscan_from_pairs(df, pairs, min_pts)
    deg = {}
    for r in pairs.collect():
        deg[r.va] = deg.get(r.va, 0) + 1
        deg[r.vb] = deg.get(r.vb, 0) + 1
    for r in out.collect():
        if r.role == "core":
            assert deg.get(r.vec_id, 0) + 1 >= min_pts
            assert r.cluster_label != NOISE and r.cluster_label <= r.vec_id
        elif r.role == "border":
            assert deg.get(r.vec_id, 0) + 1 < min_pts
            assert r.cluster_label != NOISE
        else:
            assert r.cluster_label == NOISE
    stats = {r.cluster_label: r for r in dbscan_cluster_stats(out).collect()}
    assert sum(r.size for r in stats.values()) == len(pts)
    for lab, r in stats.items():
        if lab != NOISE:
            assert r.n_core >= 1 and r.n_core + r.n_border == r.size


def test_blocked_equals_brute_when_blocking_complete(spark):
    """With ONE centroid (every point in every probe set) the blocked
    pair source admits all candidates, so blocked == brute exactly."""
    import random

    rng = random.Random(11)
    pts = {i: tuple(rng.uniform(0, 1) for _ in range(4)) for i in range(50)}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in pts.items()],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [0.5, 0.5, 0.5, 0.5])], "cluster_id int, centroid array<double>"
    )
    blocked = epsilon_pairs_blocked(df, cents, 0.4, n_probe=1)
    brute = epsilon_pairs_brute(df, 0.4)
    assert sorted(map(tuple, blocked.collect())) == sorted(map(tuple, brute.collect()))


def test_blocked_is_subset_of_brute(spark):
    """Incomplete blocking may miss pairs but never invents one."""
    import random

    rng = random.Random(13)
    pts = {i: tuple(rng.uniform(0, 1) for _ in range(4)) for i in range(60)}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in pts.items()],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [0.25] * 4), (1, [0.75] * 4), (2, [0.25, 0.75, 0.25, 0.75])],
        "cluster_id int, centroid array<double>",
    )
    blocked = set(map(tuple, epsilon_pairs_blocked(df, cents, 0.4, n_probe=2).collect()))
    brute = set(map(tuple, epsilon_pairs_brute(df, 0.4).collect()))
    assert blocked <= brute
    assert blocked  # and it finds real pairs


def test_empty_pairs_all_noise(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [9.0, 9.0])], "vec_id long, embedding array<double>"
    )
    out = dbscan_from_pairs(df, epsilon_pairs_brute(df, 0.1), 2).collect()
    assert all(r.cluster_label == NOISE and r.role == "noise" for r in out)
