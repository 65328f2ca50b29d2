"""Round-6 continuation batch: rendezvous sharding, per-group caps,
phrase blocklists (operators/sharding.py, sampling.group_cap_sample,
quality.phrase_blocklist_gate)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators.quality import (
    phrase_blocklist_gate,
)
from music_streaming_data_pipeline_v2_spark.operators.sampling import (
    group_cap_sample,
)
from music_streaming_data_pipeline_v2_spark.operators.sharding import (
    rendezvous_assign,
    rendezvous_shard,
    shard_movement,
)

from conftest import SF001


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF001}/documents.parquet")


# ---------------------------------------------------------------------------
# Rendezvous sharding
# ---------------------------------------------------------------------------


def test_rendezvous_range_and_determinism(spark, docs):
    out = rendezvous_assign(docs, "doc_id", 5).select("doc_id", "shard")
    shards = [r["shard"] for r in out.select("shard").distinct().collect()]
    assert set(shards) <= set(range(5))
    # pure function of id: two independent evaluations agree row-for-row
    again = rendezvous_assign(docs, "doc_id", 5).select("doc_id", "shard")
    assert out.exceptAll(again).count() == 0


def test_rendezvous_single_shard(spark, docs):
    assert (
        rendezvous_assign(docs, "doc_id", 1)
        .filter(F.col("shard") != 0)
        .count()
        == 0
    )


def test_rendezvous_balance(spark, docs):
    # uniform weights → no shard holds more than 3× its fair share
    n = docs.count()
    counts = (
        rendezvous_assign(docs, "doc_id", 8)
        .groupBy("shard")
        .count()
        .collect()
    )
    assert len(counts) == 8
    assert max(r["count"] for r in counts) < 3 * n / 8


def test_rendezvous_minimal_disruption(spark, docs):
    # 8 → 9 should move ~1/9 of ids; modulo hashing moves ~8/9.
    row = shard_movement(docs, "doc_id", 8, 9).first()
    assert row["n_total"] == docs.count()
    assert 0 < row["n_moved"] < row["n_total"] * 0.3
    assert row["moved_permille"] == 1000 * row["n_moved"] // row["n_total"]
    # every mover's new shard is the ADDED worker 8: an id moves on
    # grow(N→N+1) iff the new worker's weight beats all N old ones
    moved_to = (
        docs.select(
            rendezvous_shard("doc_id", 8).alias("b"),
            rendezvous_shard("doc_id", 9).alias("c"),
        )
        .filter(F.col("b") != F.col("c"))
        .select("c")
        .distinct()
        .collect()
    )
    assert [r["c"] for r in moved_to] == [8]


def test_rendezvous_rejects_bad_n():
    with pytest.raises(ValueError):
        rendezvous_shard("doc_id", 0)


# ---------------------------------------------------------------------------
# group_cap_sample
# ---------------------------------------------------------------------------


def _naive_cap(df, group_col, id_col, cap, salt="c|"):
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .select(*df.columns)
    )


@pytest.mark.parametrize("cap,digits", [(1, 1), (7, 1), (15, 2), (24, 4)])
def test_group_cap_equals_naive_window(spark, docs, cap, digits):
    two_phase = group_cap_sample(
        docs, "source", "doc_id", cap, bucket_hex_digits=digits
    ).select("doc_id", "source")
    naive = _naive_cap(docs, "source", "doc_id", cap).select(
        "doc_id", "source"
    )
    assert two_phase.exceptAll(naive).count() == 0
    assert naive.exceptAll(two_phase).count() == 0


def test_group_cap_small_groups_kept_whole(spark, docs):
    # cap above every group size → identity
    out = group_cap_sample(docs, "source", "doc_id", 10_000)
    assert out.count() == docs.count()


def test_group_cap_exact_sizes(spark, docs):
    sizes = (
        group_cap_sample(docs, "source", "doc_id", 15, bucket_hex_digits=1)
        .groupBy("source")
        .count()
        .collect()
    )
    orig = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    for r in sizes:
        assert r["count"] == min(15, orig[r["source"]])


def test_group_cap_null_group(spark):
    rows = [(i, "g" if i % 3 else None) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = group_cap_sample(df, "grp", "id", 4, bucket_hex_digits=1)
    sizes = {
        r["grp"]: r["count"] for r in out.groupBy("grp").count().collect()
    }
    assert sizes["g"] == 4 and sizes[None] == 4
    naive = _naive_cap(df, "grp", "id", 4)
    assert out.exceptAll(naive).count() == 0
    assert naive.exceptAll(out).count() == 0


def test_group_cap_rejects_bad_params(spark, docs):
    with pytest.raises(ValueError):
        group_cap_sample(docs, "source", "doc_id", 0)
    with pytest.raises(ValueError):
        group_cap_sample(docs, "source", "doc_id", 5, bucket_hex_digits=0)


# ---------------------------------------------------------------------------
# phrase_blocklist_gate
# ---------------------------------------------------------------------------


def test_phrase_gate_boundaries_and_normalization(spark):
    rows = [
        (1, "the rat race is on"),          # hit
        (2, "a grat race happened"),        # boundary: no hit
        (3, "the rat racer won"),           # boundary: no hit
        (4, "RAT\t\n  RACE"),               # case + whitespace normalize
        (5, None),                          # null text
        (6, "rat race and dog days here"),  # two distinct phrases
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_blocked_phrases"], r["keep"])
        for r in phrase_blocklist_gate(
            df, ["rat race", "Dog   Days"]
        ).collect()
    }
    assert out[1] == (1, False)
    assert out[2] == (0, True)
    assert out[3] == (0, True)
    assert out[4] == (1, False)
    assert out[5] == (0, True)
    assert out[6] == (2, False)


def test_phrase_gate_rejects_empty(spark, docs):
    with pytest.raises(ValueError):
        phrase_blocklist_gate(docs, [])
    with pytest.raises(ValueError):
        phrase_blocklist_gate(docs, ["  "])


# ---------------------------------------------------------------------------
# dense_row_numbers
# ---------------------------------------------------------------------------


def test_dense_ids_match_global_window(spark, docs):
    from music_streaming_data_pipeline_v2_spark.operators.ids import (
        dense_row_numbers,
    )

    out = dense_row_numbers(
        docs, ["n_chars", "doc_id"], num_partitions=8
    ).select("doc_id", "seq")
    ref = docs.select(
        "doc_id",
        (F.row_number().over(Window.orderBy("n_chars", "doc_id")) - 1).alias(
            "seq"
        ),
    )
    assert out.exceptAll(ref).count() == 0
    assert ref.exceptAll(out).count() == 0


def test_dense_ids_start_and_density(spark, docs):
    from music_streaming_data_pipeline_v2_spark.operators.ids import (
        dense_row_numbers,
    )

    n = docs.count()
    out = dense_row_numbers(
        docs, ["doc_id"], seq_col="pos", start=100, num_partitions=4
    )
    stats = out.agg(
        F.min("pos").alias("lo"),
        F.max("pos").alias("hi"),
        F.countDistinct("pos").alias("d"),
    ).first()
    assert (stats["lo"], stats["hi"], stats["d"]) == (100, 100 + n - 1, n)


def test_dense_ids_rejects_empty_order(spark, docs):
    from music_streaming_data_pipeline_v2_spark.operators.ids import (
        dense_row_numbers,
    )

    with pytest.raises(ValueError):
        dense_row_numbers(docs, [])


# ---------------------------------------------------------------------------
# phrase_blocklist_join (relation-sized lists)
# ---------------------------------------------------------------------------


def _phrases_df(spark, phrases):
    return spark.createDataFrame([(p,) for p in phrases], "phrase string")


def test_phrase_join_equals_literal_gate(spark, docs):
    from music_streaming_data_pipeline_v2_spark.operators.quality import (
        phrase_blocklist_join,
    )

    phrases = ["fast table", "table table", "slow fast", "the part data"]
    a = phrase_blocklist_gate(docs, phrases).select(
        "doc_id", "n_blocked_phrases", "keep"
    )
    b = phrase_blocklist_join(docs, _phrases_df(spark, phrases)).select(
        "doc_id", "n_blocked_phrases", "keep"
    )
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    # non-vacuous: some doc matches some phrase
    assert b.filter(~F.col("keep")).count() > 0


def test_phrase_join_duckdb_parity(spark):
    import duckdb

    rows = [
        (1, "alpha beta gamma"),
        (2, "beta gamma delta beta gamma"),
        (3, "the beta  gamma\tdelta"),
        (4, "betagamma delta"),
        (5, None),
        (6, "gamma"),
    ]
    phrases = ["beta gamma", "gamma delta", "Beta   Gamma", "epsilon"]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from music_streaming_data_pipeline_v2_spark.operators.quality import (
        phrase_blocklist_join,
    )

    got = {
        r["doc_id"]: r["n_blocked_phrases"]
        for r in phrase_blocklist_join(
            df, _phrases_df(spark, phrases)
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d(doc_id BIGINT, text VARCHAR); "
        "CREATE TABLE p(phrase VARCHAR)"
    )
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    con.executemany("INSERT INTO p VALUES (?)", [(p,) for p in phrases])
    want = dict(
        con.execute(
            r"""
            WITH np AS (
                SELECT DISTINCT ARRAY_TO_STRING(LIST_FILTER(
                    STRING_SPLIT_REGEX(LOWER(TRIM(phrase)), '[ \t\n\r\f]+'),
                    x -> x <> ''), ' ') AS ph
                FROM p
                WHERE TRIM(phrase) <> ''
            )
            SELECT doc_id, CAST(COUNT(CASE WHEN CONTAINS(
                ' ' || ARRAY_TO_STRING(LIST_FILTER(
                    STRING_SPLIT_REGEX(LOWER(TRIM(text)), '[ \t\n\r\f]+'),
                    x -> x <> ''), ' ') || ' ',
                ' ' || ph || ' ') THEN 1 END) AS BIGINT)
            FROM d CROSS JOIN np
            GROUP BY doc_id
            """
        ).fetchall()
    )
    assert got == want


def test_phrase_join_boundaries(spark):
    from music_streaming_data_pipeline_v2_spark.operators.quality import (
        phrase_blocklist_join,
    )

    rows = [
        (1, "rat race"),            # exact doc == phrase
        (2, "x rat race"),          # at end
        (3, "rat race y"),          # at start
        (4, "rat racer"),           # boundary: no
        (5, "brat race"),           # boundary: no
        (6, "rat"),                 # shorter than phrase
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["keep"]
        for r in phrase_blocklist_join(
            df, _phrases_df(spark, ["rat race"])
        ).collect()
    }
    assert out == {1: False, 2: False, 3: False, 4: True, 5: True, 6: True}
