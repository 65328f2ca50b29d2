"""Source formats (S-family): declared-schema JSON/CSV, ORC round-trip,
and the column-pruning contract on Parquet scans."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import types as T

from music_streaming_data_pipeline_v2_spark.io import read_json, read_orc


def test_read_json_schema_and_permissive(spark, tmp_path):
    p = tmp_path / "data.jsonl"
    p.write_text(
        '{"user_id": "1", "value": 3.5}\n'
        'not json at all\n'
        '{"user_id": "2", "value": "bad-number"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    rows = sorted(
        read_json(spark, str(p), schema).collect(),
        key=lambda r: (r.user_id is None, r.user_id or ""),
    )
    assert (rows[0].user_id, rows[0].value) == ("1", 3.5)
    assert rows[1].user_id == "2" and rows[1].value is None  # coerce-null
    assert rows[2].user_id is None  # malformed line → all-null row


def test_read_json_corrupt_record_quarantine(spark, tmp_path):
    p = tmp_path / "data2.jsonl"
    p.write_text(
        '{"user_id": "1", "value": 3.5}\n'
        'not json at all\n'
        '{"user_id": "3", "value": 1.0}\n'
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    df = read_json(spark, str(p), schema, corrupt_col="_bad")
    good = df.filter("_bad IS NULL")
    quarantined = df.filter("_bad IS NOT NULL")
    assert sorted(r.user_id for r in good.collect()) == ["1", "3"]
    bad = quarantined.collect()
    # the raw line is preserved verbatim for replay
    assert len(bad) == 1 and bad[0]._bad == "not json at all"
    assert bad[0].user_id is None


def test_orc_round_trip(spark, tmp_path):
    df = spark.createDataFrame([Row(a=1, b="x"), Row(a=2, b="y")])
    path = str(tmp_path / "orc")
    df.write.mode("overwrite").orc(path)
    back = read_orc(spark, path)
    assert sorted((r.a, r.b) for r in back.collect()) == [(1, "x"), (2, "y")]


def test_parquet_scan_prunes_columns(spark):
    """SCALE.md claim: a 2-column projection reads a 2-column schema
    (ReadSchema pruned), not the full table."""
    df = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    # lineitem has 11 columns; project 2
    q = df.select("l_orderkey", "l_returnflag")
    plan = q._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = [c.split(":")[0] for c in m.group(1).split(",")]
    assert sorted(cols) == ["l_orderkey", "l_returnflag"]


def test_compact_partitions_reduces_files_preserves_rows(spark, tmp_path):
    """Small-file compaction: a fragmented partitioned table (many tiny
    files per partition, the micro-batch-sink pathology) compacts to one
    right-sized file per partition with identical content."""
    import glob

    from music_streaming_data_pipeline_v2_spark.io.sinks import compact_partitions

    path = str(tmp_path / "frag")
    df = spark.range(1000).selectExpr("id", "id % 4 AS part")
    # simulate 8 micro-batch appends → 8 small files per partition
    for i in range(8):
        df.filter(f"id % 8 = {i}").write.mode("append").partitionBy(
            "part"
        ).parquet(path)
    before = len(glob.glob(f"{path}/part=*/*.parquet"))
    assert before >= 32  # fragmented: ≥8 files in each of 4 partitions
    expected = sorted(
        (r.id, r.part) for r in spark.read.parquet(path).collect()
    )
    compact_partitions(spark, path, ["part"], target_rows_per_file=100_000)
    after_files = glob.glob(f"{path}/part=*/*.parquet")
    assert len(after_files) == 4  # one file per partition
    got = sorted((r.id, r.part) for r in spark.read.parquet(path).collect())
    assert got == expected


def test_compact_partitions_recovers_from_crash_states(spark, tmp_path):
    """compact_partitions must be re-runnable after dying at any point
    of the rename swap: a backup-only state (crash between the two
    renames) restores the live table; stale temp/backup leftovers are
    cleared instead of failing the next swap."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from music_streaming_data_pipeline_v2_spark.io.sinks import compact_partitions

    path = str(tmp_path / "t")
    df = spark.range(1000).withColumn("part", (F.col("id") % 4).cast("int"))
    df.write.mode("overwrite").partitionBy("part").parquet(path)

    # crash state A: between the renames — live data only at the backup
    os.rename(path, path + "._pre_compact")
    shutil.copytree(path + "._pre_compact", path + "._compacting")  # stale tmp too
    compact_partitions(spark, path, ["part"])
    assert spark.read.parquet(path).count() == 1000
    assert not os.path.exists(path + "._pre_compact")
    assert not os.path.exists(path + "._compacting")

    # crash state B: after the swap, before backup cleanup — stale
    # backup must not break the next run's rename
    shutil.copytree(path, path + "._pre_compact")
    compact_partitions(spark, path, ["part"])
    assert spark.read.parquet(path).count() == 1000
    assert not os.path.exists(path + "._pre_compact")


def test_write_partitioned_audited_single_pass_manifest(spark, tmp_path):
    from pyspark.sql import functions as F

    from music_streaming_data_pipeline_v2_spark.io.sinks import (
        write_partitioned_audited,
    )

    df = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, None, "2024-01-02"),
         (3, "c", "2024-01-01"), (4, None, "2024-01-03")],
        "id long, name string, date string",
    )
    out = str(tmp_path / "audited")
    # job-count probe: the audit must NOT add a second scan/action —
    # run the audited write under its own job group so the delta is
    # exactly this call's jobs (ADVICE r6: the old 'after >= before'
    # form could never fail)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    sc.setJobGroup("audited_write_probe", "single-pass audit check")
    try:
        manifest = write_partitioned_audited(
            df, out, partition_by=["date"], null_check_cols=["name", "id"]
        )
    finally:
        sc.setJobGroup(None, None)
    assert manifest["n_rows"] == 4
    assert manifest["null_name"] == 2
    assert manifest["null_id"] == 0
    assert manifest["min_date"] == "2024-01-01"
    assert manifest["max_date"] == "2024-01-03"
    # the write itself landed, partitioned, with all rows
    back = spark.read.parquet(out)
    assert back.count() == 4
    # partition-dir values read back type-inferred (DATE) — compare as strings
    got_dates = {
        r[0]
        for r in back.select(F.col("date").cast("string")).distinct().collect()
    }
    assert got_dates == {"2024-01-01", "2024-01-02", "2024-01-03"}
    # single-pass invariant, now falsifiable: the audited write runs
    # the write job (+ at most one commit bookkeeping job on some
    # codepaths), never a separate aggregate action over the input —
    # re-adding a df.count()-style audit would push this past 2
    probe_jobs = tracker.getJobIdsForGroup("audited_write_probe") or []
    assert 1 <= len(probe_jobs) <= 2, probe_jobs
