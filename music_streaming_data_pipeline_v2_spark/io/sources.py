"""Schema'd batch sources.

Reference equivalents:
- S1 CSV scan (reference dags/tasks/utils.py:18-29): pandas ``read_csv``
  with full inference. Here: ``spark.read.csv`` with an explicit
  StructType — no inference in the engine; malformed rows are PERMISSIVE-
  nulled and handled by the validation operators' coerce-and-drop pass.
- S2/S3 Parquet scans (utils.py:94-104, music-streaming-transform.py:42-50):
  ``spark.read.parquet``. Parquet carries its own schema; filters and
  column selections push down to the scan (verify with
  ``.explain('formatted')`` → PushedFilters / ReadSchema).

At 100 TB the same calls work unchanged: directory-partitioned layouts
(``date=.../``) get partition-pruned by Catalyst, and
``spark.sql.files.maxPartitionBytes`` controls split sizing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schemas import TESTDATA_TABLES


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    path_glob_filter: str | None = None,
) -> DataFrame:
    """CSV scan with a declared schema (S1).

    ``pathGlobFilter`` subsumes the reference's filename predicate
    (validate.py:186-189: ``endswith('.csv') and 'stream' in name``).
    """
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
    )
    if path_glob_filter:
        reader = reader.option("pathGlobFilter", path_glob_filter)
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan (S2/S3); schema comes from the files."""
    return spark.read.parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver test table from a scale-factor directory."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every test table and register each as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    multiline: bool = False,
    corrupt_col: str | None = None,
) -> DataFrame:
    """JSON-lines scan with a declared schema (no inference pass over
    the data — at 100 TB an inference pre-scan doubles the read).
    Malformed rows yield nulls (PERMISSIVE), handled by the validation
    layer's coerce-and-drop.

    ``corrupt_col``: capture each unparseable line's raw text in that
    column (Spark's ``columnNameOfCorruptRecord``) instead of silently
    nulling — the source-level twin of the streaming layer's
    quarantine path (X4): ``filter(col(corrupt_col).isNotNull())`` IS
    the quarantine relation, written wherever bad input goes for
    replay. The column must also be declared in ``schema`` (Spark
    requires it; this helper appends it when absent)."""
    reader = (
        spark.read.option("multiLine", str(multiline).lower())
        .option("mode", "PERMISSIVE")
    )
    if corrupt_col is not None:
        if corrupt_col not in schema.fieldNames():
            schema = T.StructType(
                [*schema.fields, T.StructField(corrupt_col, T.StringType())]
            )
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning properties as Parquet
    (schema from file metadata)."""
    return spark.read.orc(path)
