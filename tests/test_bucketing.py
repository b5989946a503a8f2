"""Bucketed co-located joins (operators/bucketing.py): Exchange-free plan
on co-bucketed tables, Exchange present without the layout, identical
answers either way."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_spark.io import load_table
from vector_db_spark.operators.bucketing import (
    bucketed_join,
    joins_without_exchange,
    write_bucketed,
)


def test_cobucketed_join_has_no_exchange_and_matches_plain_join(
    spark, sf_smoke, tmp_path
):
    orders = load_table(spark, sf_smoke, "orders")
    lineitem = load_table(spark, sf_smoke, "lineitem")
    write_bucketed(orders, "t_orders", str(tmp_path / "o"), key="o_orderkey")
    write_bucketed(lineitem, "t_lineitem", str(tmp_path / "l"), key="l_orderkey")

    j = bucketed_join(spark, "t_orders", "t_lineitem", "o_orderkey", "l_orderkey")
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


def test_bucketed_files_readable_without_catalog(spark, sf_smoke, tmp_path):
    orders = load_table(spark, sf_smoke, "orders")
    write_bucketed(orders, "t_orders2", str(tmp_path / "o2"), key="o_orderkey")
    raw = spark.read.parquet(str(tmp_path / "o2"))
    assert raw.count() == orders.count()
