"""Property tests for the round-1 late additions: argmin/argmax
aggregate, left outer join with zero-match groups, and the explicit
EXCEPT set operation (the oracle hash-exactness itself is covered by
tools/check_oracle.py; these pin the semantics independently)."""

from __future__ import annotations

from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.io.sources import load_table
from music_streaming_data_pipeline_v2_spark.plans.driver_queries import (
    REGISTRY,
    load_events,
)

from conftest import SF0001


def test_argmax_best_order_attains_group_max(spark):
    res = REGISTRY["argmax_order_by_nation"].fn(spark, SF0001)
    orders = load_table(spark, SF0001, "orders")
    customer = load_table(spark, SF0001, "customer")
    nation = load_table(spark, SF0001, "nation")
    best = (
        res.join(orders, res.best_orderkey == orders.o_orderkey)
        .select("n_name", "max_price", "best_orderkey", "o_totalprice", "o_custkey")
    )
    # the chosen order's price IS the group max (double equality is safe:
    # both sides come from the same parquet value)
    assert best.filter(F.col("o_totalprice") != F.col("max_price")).count() == 0
    # and the chosen order belongs to a customer of that nation
    wrong_nation = (
        best.join(customer, best.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey, "left")
        .filter(res.n_name != nation.n_name)
    )
    assert wrong_nation.count() == 0


def test_outer_counts_cover_all_customers(spark):
    res = REGISTRY["customer_order_counts_outer"].fn(spark, SF0001)
    customer = load_table(spark, SF0001, "customer")
    orders = load_table(spark, SF0001, "orders")
    agg = res.agg(
        F.sum("n_customers").alias("nc"),
        F.sum("total_orders").alias("no"),
        F.sum("n_inactive").alias("ni"),
    ).first()
    assert agg.nc == customer.count()  # every customer lands in one group
    # total_orders counts only orders whose custkey exists in customer
    matched = orders.join(
        customer, orders.o_custkey == customer.c_custkey, "left_semi"
    ).count()
    assert agg.no == matched
    inactive = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).count()
    assert agg.ni == inactive


def test_except_matches_anti_join_and_is_disjoint(spark):
    res = REGISTRY["except_entities"].fn(spark, SF0001)
    customer = load_table(spark, SF0001, "customer")
    events = load_events(spark, SF0001)
    anti = (
        customer.select(F.col("c_custkey").alias("entity_id"))
        .distinct()
        .join(events, F.col("entity_id") == events.user_id, "left_anti")
    )
    assert res.count() == anti.count()
    # EXCEPT output never intersects the subtracted side
    assert res.join(events, res.entity_id == events.user_id, "left_semi").count() == 0
    # and is duplicate-free (EXCEPT has distinct semantics)
    assert res.count() == res.distinct().count()
