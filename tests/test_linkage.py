"""Fellegi-Sunter record linkage: blocking completeness on planted
corruption, score arithmetic, and the no-cross-join guarantee."""

import pytest
from pyspark.sql import functions as F

from vector_db_spark.operators.linkage import record_linkage


@pytest.fixture(scope="module")
def spark():
    from vector_db_spark.session import get_spark

    return get_spark("test-linkage", cpus=4)


def _tables(spark):
    a = spark.createDataFrame(
        [(1, "alice smith", "111", "NY"), (2, "bob jones", "222", "LA"),
         (3, "carol white", "333", "NY")],
        "id long, name string, phone string, city string",
    )
    b = spark.createDataFrame(
        [(11, "alice smyth", "111", "NY"),   # name typo, phone+city agree
         (12, "bob jones", "999", "LA"),     # phone damaged
         (13, "dave black", "444", "SF")],   # no counterpart
        "id long, name string, phone string, city string",
    )
    return a, b


def test_multi_pass_blocking_and_scoring(spark):
    a, b = _tables(spark)
    out = record_linkage(
        a, b,
        id_col="id",
        block_exprs=[
            (F.col("phone"), F.col("phone")),
            (F.concat_ws("|", "city", F.substring("name", 1, 4)),
             F.concat_ws("|", "city", F.substring("name", 1, 4))),
        ],
        exact_fields={"phone": (5.0, -2.0), "city": (2.0, -1.0)},
        fuzzy_fields={"name": (7.0, -3.0, 1)},
        threshold=10.0,
    )
    rows = {(r.id_a, r.id_b): r for r in out.collect()}
    # alice: phone block AND name block both find her; one pair emitted
    assert rows[(1, 11)].score == 5.0 + 2.0 + 7.0 == 14.0
    assert rows[(1, 11)].is_match
    # bob: found only by the name-prefix block; phone disagrees
    assert rows[(2, 12)].score == -2.0 + 2.0 + 7.0 == 7.0
    assert not rows[(2, 12)].is_match
    # dave shares no block with anyone
    assert not any(idb == 13 for (_, idb) in rows)


def test_blocking_required(spark):
    a, b = _tables(spark)
    with pytest.raises(ValueError, match="blocking"):
        record_linkage(a, b, id_col="id", block_exprs=[], threshold=1.0)


def test_no_cartesian_in_plan(spark):
    a, b = _tables(spark)
    out = record_linkage(
        a, b, id_col="id",
        block_exprs=[(F.col("phone"), F.col("phone"))],
        exact_fields={"city": (1.0, -1.0)},
        threshold=0.0,
    )
    from vector_db_spark.plans import audit_plan

    assert not [f for f in audit_plan(out) if f.code == "cartesian-product"]


def test_block_keys_and_exprs_conflict(spark):
    a, b = _tables(spark)
    with pytest.raises(ValueError, match="not both"):
        record_linkage(
            a, b, id_col="id",
            block_keys=["phone"],
            block_exprs=[(F.col("city"), F.col("city"))],
            threshold=0.0,
        )
