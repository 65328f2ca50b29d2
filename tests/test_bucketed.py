"""Bucketed-layout joins: the write-once-shuffle layout eliminates the
per-join exchange (SCALE.md storage-layout argument, proven on the
physical plan)."""

from __future__ import annotations

import uuid

import pytest

from music_streaming_data_pipeline_v2_spark.io.sinks import write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    """orders + lineitem bucketed on the order key into a tmp external
    location; tables dropped afterwards."""
    suffix = uuid.uuid4().hex[:8]
    to, tl = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(
        orders, to, ["o_orderkey"], 8, path=str(tmp_path / "o")
    )
    write_bucketed(
        lineitem,
        tl,
        ["l_orderkey"],
        8,
        path=str(tmp_path / "l"),
    )
    yield to, tl
    spark.sql(f"DROP TABLE IF EXISTS {to}")
    spark.sql(f"DROP TABLE IF EXISTS {tl}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    to, tl = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # keep the small sides from broadcasting so the test sees the
        # layout's effect on the shuffle-join path (at real scale both
        # sides are facts and SMJ is the only option)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table(to)
            .join(
                spark.table(tl),
                spark.table(to)["o_orderkey"]
                == spark.table(tl)["l_orderkey"],
            )
            .groupBy("o_orderpriority")
            .count()
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in join_section
        # the ONLY exchange allowed is the final single-key aggregate's;
        # the join itself must read co-located buckets shuffle-free
        n_exchanges = join_section.count("Exchange hashpartitioning")
        assert n_exchanges == 1, join_section
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    to, tl = bucketed_pair
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    plain = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .groupBy("o_orderpriority")
        .count()
    )
    bucketed = (
        spark.table(to)
        .join(
            spark.table(tl),
            spark.table(to)["o_orderkey"] == spark.table(tl)["l_orderkey"],
        )
        .groupBy("o_orderpriority")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, bucketed.collect())
    )
