"""Bucketed co-located joins (operators/bucketing.py): Exchange-free plan
on co-bucketed tables, Exchange present without the layout, identical
answers either way. (The registered query's full plan shape — bucketed
scans, SelectedBucketsCount — is pinned in tests/test_plans.py.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_spark.io import load_table
from vector_db_spark.operators.bucketing import (
    colocated_join,
    joins_without_exchange,
    write_bucketed,
)


def test_cobucketed_join_has_no_exchange_and_matches_plain_join(spark, sf_smoke):
    orders = load_table(spark, sf_smoke, "orders")
    lineitem = load_table(spark, sf_smoke, "lineitem")
    write_bucketed(orders, "tb_orders", "o_orderkey", 8)
    write_bucketed(lineitem, "tb_lineitem", "l_orderkey", 8)

    j = colocated_join(
        spark, "tb_orders", "tb_lineitem",
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    assert joins_without_exchange(j)

    # the same sort-merge join WITHOUT the bucketed layout must shuffle
    plain = orders.hint("merge").join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    )
    assert not joins_without_exchange(plain)

    # layout changes the plan, never the answer
    assert j.count() == plain.count() > 0
    a = j.agg(F.round(F.sum("l_extendedprice"), 2).alias("s")).collect()[0]["s"]
    b = plain.agg(F.round(F.sum("l_extendedprice"), 2).alias("s")).collect()[0]["s"]
    assert a == b
