"""KV serving queries (reference §2.12 — queries/dynamo_query.txt:6-70).

The reference serves KPIs from DynamoDB with pk-equality + sk range
conditions. Over the engine's unified ``kv`` relation those become plain
DataFrame filters — and because they are deterministic predicates on two
string columns, Catalyst pushes them into the Parquet scan
(PushedFilters: EqualTo(pk), StringStartsWith(sk) / range), so a serving
lookup reads only matching row groups. At scale the kv table is written
partitioned by ``pk_bucket`` (hash prefix) and sorted by (pk, sk) within
files, making these partition-pruned point scans.

The three DynamoDB key-condition shapes:
- pk = :pk AND begins_with(sk, :prefix)   → ``sk.startswith(prefix)``
- pk = :pk AND sk = :sk                   → equality
- pk = :pk AND sk BETWEEN :lo AND :hi     → ``sk.between(lo, hi)``
  (DynamoDB BETWEEN is lexicographic and inclusive; so is Spark's.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def query_pk_prefix(kv: DataFrame, pk: str, sk_prefix: str) -> DataFrame:
    """pk equality + sk begins_with (dynamo_query.txt:6-9, 29-32, 51-55)."""
    return kv.filter((F.col("pk") == pk) & F.col("sk").startswith(sk_prefix))


def query_pk_sk(kv: DataFrame, pk: str, sk: str) -> DataFrame:
    """pk equality + sk exact (dynamo_query.txt:12-17, 58-63)."""
    return kv.filter((F.col("pk") == pk) & (F.col("sk") == sk))


def query_pk_sk_between(kv: DataFrame, pk: str, lo: str, hi: str) -> DataFrame:
    """pk equality + sk between, inclusive lexicographic range
    (dynamo_query.txt:42-47, 65-70)."""
    return kv.filter((F.col("pk") == pk) & F.col("sk").between(lo, hi))
