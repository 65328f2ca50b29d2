"""Schema validation and coerce-and-drop cleaning (reference P2-P5, F1-F7).

The reference validates with pandas, row-oriented on a single Airflow
worker (reference dags/tasks/validate.py:46-128). Here the same semantics
are DataFrame transforms — distributed, Catalyst-optimizable, zero UDFs:

- pandas ``dropna(subset=...)``            → ``df.na.drop(subset=...)``
- ``pd.to_numeric(errors='coerce')``       → ``try_cast`` (null on failure)
- ``pd.to_datetime(errors='coerce')``      → ``to_timestamp`` / ``try_cast``
- ``.between(13, 120)``                    → ``col.between(13, 120)``
- ``fillna(0).astype('int32')``            → ``coalesce(try_cast(...), 0)``
- ``.str.lower().str.strip()``             → ``lower(trim(col))``
- required-column check                    → ``validate_columns`` assertion

The coercion quirks are preserved deliberately so results match the
reference row-for-row (SURVEY.md §7 "hard parts" (a)):

- users: age must be numeric AND in [13,120] (validate.py:55); bad
  ``created_at`` rows are dropped (validate.py:58-60).
- songs: ``key``/``mode``/``time_signature`` coerce-null → 0
  (validate.py:84, 86, 93) while ``popularity``/``duration_ms``
  coerce-null → row dropped (validate.py:74-75).
- streams: unparseable ``listen_time`` → dropped (validate.py:114-121);
  an input that cleans to zero rows is a hard error (validate.py:124-125).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import coerce_numeric, coerce_numeric_fill0, coerce_timestamp


class SchemaError(ValueError):
    """A dataset is missing required columns (validate.py:36-44)."""


class EmptyResultError(ValueError):
    """All rows were dropped by validation (validate.py:124-125)."""


def validate_columns(df: DataFrame, required: list[str], name: str) -> None:
    """Required-column contract check (validate.py:36-44)."""
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise SchemaError(f"{name} missing required columns: {missing}")


_coerce_int = coerce_numeric
_coerce_int_fill0 = coerce_numeric_fill0


def validate_users(df: DataFrame) -> DataFrame:
    """Clean the users dimension (validate.py:46-63).

    Input may be raw strings (CSV); output matches schemas.USERS.
    """
    validate_columns(
        df, ["user_id", "user_name", "user_age", "user_country", "created_at"], "users"
    )
    age = F.col("user_age").cast("string").try_cast("double")
    created = coerce_timestamp("created_at")
    return (
        df.na.drop(subset=["user_id", "user_name", "user_age", "created_at"])
        .filter(age.between(13, 120))
        .select(
            F.col("user_id").cast("string").alias("user_id"),
            F.col("user_name").cast("string").alias("user_name"),
            age.cast("int").alias("user_age"),
            F.col("user_country").cast("string").alias("user_country"),
            created.alias("created_at"),
        )
        .na.drop(subset=["created_at"])
    )


def validate_songs(df: DataFrame) -> DataFrame:
    """Clean the songs dimension (validate.py:65-102)."""
    # the contract check must cover EVERY column the select below
    # references — a partial list lets a malformed input pass
    # validation and then die with an AnalysisException instead of the
    # SchemaError callers catch for the missing-columns path
    validate_columns(
        df,
        [
            "id", "track_id", "track_name", "album_name", "artists",
            "popularity", "duration_ms", "explicit", "track_genre",
            "danceability", "energy", "loudness", "speechiness",
            "acousticness", "instrumentalness", "liveness", "valence",
            "tempo",
        ],
        "songs",
    )
    pop = _coerce_int("popularity")
    dur = _coerce_int("duration_ms")
    floats = [
        "danceability",
        "energy",
        "loudness",
        "speechiness",
        "acousticness",
        "instrumentalness",
        "liveness",
        "valence",
        "tempo",
    ]
    return (
        df.na.drop(
            subset=["track_id", "track_name", "popularity", "duration_ms", "track_genre"]
        )
        .filter(pop.isNotNull() & dur.isNotNull())
        .select(
            _coerce_int("id").alias("id"),
            F.col("track_id").cast("string").alias("track_id"),
            F.col("track_name").cast("string").alias("track_name"),
            F.col("album_name").cast("string").alias("album_name"),
            F.col("artists").cast("string").alias("artists"),
            pop.alias("popularity"),
            dur.alias("duration_ms"),
            _coerce_int("explicit", "tinyint").alias("explicit"),
            *[F.col(c).cast("string").try_cast("float").alias(c) for c in floats[:2]],
            _coerce_int_fill0("key").alias("key"),
            F.col("loudness").cast("string").try_cast("float").alias("loudness"),
            _coerce_int_fill0("mode").alias("mode"),
            *[F.col(c).cast("string").try_cast("float").alias(c) for c in floats[3:]],
            _coerce_int_fill0("time_signature").alias("time_signature"),
            F.lower(F.trim(F.col("track_genre"))).alias("track_genre"),
        )
        .select(  # restore the reference column order (validate.py:78-99)
            "id", "track_id", "track_name", "album_name", "artists", "popularity",
            "duration_ms", "explicit", "danceability", "energy", "loudness",
            "speechiness", "acousticness", "instrumentalness", "liveness",
            "valence", "tempo", "key", "mode", "time_signature", "track_genre",
        )
    )


def validate_streams(df: DataFrame, check_nonempty: bool = True) -> DataFrame:
    """Clean a streams fact batch (validate.py:104-128).

    ``check_nonempty=True`` reproduces the empty-result guard
    (validate.py:124-125) — note it triggers a job; skip it inside
    streaming ``foreachBatch`` where the guard is per-micro-batch.
    """
    validate_columns(df, ["user_id", "track_id", "listen_time"], "streams")
    ts = coerce_timestamp("listen_time")
    out = (
        df.na.drop(subset=["user_id", "track_id", "listen_time"])
        .select(
            F.col("user_id").cast("string").alias("user_id"),
            F.col("track_id").cast("string").alias("track_id"),
            ts.alias("listen_time"),
        )
        .na.drop(subset=["listen_time"])
    )
    if check_nonempty and out.isEmpty():
        raise EmptyResultError("No valid data remaining after validation")
    return out


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Deequ-style column profile: per column, the table's exact row
    count, the column's null count, and its distinct non-null value
    count — the constraint-suggestion primitive (key uniqueness ⇔
    n_distinct = n_rows − n_nulls; null-rate drift; enum explosion)
    a pipeline checks before trusting a new partition. Extends the
    reference's row-level null gate (reference:
    dags/tasks/validate.py:50,70 — dropna over critical fields) to
    whole-table profiling.

    Returns ``(column_name, n_rows, n_nulls, n_distinct)``, one row
    per requested column, exact BIGINTs.

    Physical shape: ONE aggregate over one scan — Spark plans the
    multi-distinct aggregate via Expand (each input row fans out to
    |cols|+1 tagged rows, each partial-aggregated map-side), then the
    single profile row unpivots driver-side-free via ``stack``. That
    is a deliberate trade: one pass over 100 TB with a |cols|×
    row-expansion beats |cols| separate scans whenever the scan
    dominates (it does — the expansion never leaves the map stage
    for the non-distinct aggregates, and each distinct group
    shuffles only its own column's values). For very wide profiles
    at extreme scale, chunk ``cols`` across calls."""
    if not cols:
        raise ValueError("need at least one column to profile")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        aggs.append(F.count(c).cast("long").alias(f"_nn_{c}"))
        aggs.append(F.countDistinct(c).cast("long").alias(f"_nd_{c}"))
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', n_rows - `_nn_{c}`, `_nd_{c}`" for c in cols
    )
    return row.select(
        "n_rows",
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_nulls, n_distinct)"
        ),
    ).select("column_name", "n_rows", "n_nulls", "n_distinct")


#: Rule kinds ``check_constraints`` understands. Each is evaluated
#: from ONE profile pass (column_profile) plus, for the row-level
#: kinds, one boolean aggregate over the same scan — never a rescan
#: per rule.
CONSTRAINT_KINDS = (
    "unique",        # column is a key: n_distinct = n_rows - n_nulls, n_nulls = 0
    "complete",      # no nulls
    "null_rate_le",  # null fraction <= threshold (micro units)
    "distinct_ge",   # at least N distinct values
    "distinct_le",   # at most N distinct values (enum explosion gate)
)


def check_constraints(
    df: DataFrame, rules: list[tuple[str, str, int | None]]
) -> DataFrame:
    """Deequ-style constraint verification: evaluate ``rules`` —
    ``(column, kind, threshold)`` with kinds from
    ``CONSTRAINT_KINDS`` — against ONE ``column_profile`` pass and
    return one row per rule: ``(column_name, kind, threshold,
    observed, passed)``. ``observed`` is the exact BIGINT the rule
    compares (distinct count, null count, or null rate in micro
    units via integer division — nonnegative operands, so floor ≡
    truncation across engines); ``threshold`` echoes the rule input
    (NULL for the threshold-free kinds). The suggestion loop a
    pipeline runs each new partition: profile once, gate many.

    Scale shape: inherits ``column_profile``'s single Expand-planned
    scan; the rule evaluation itself is a |rules|-row map over the
    |cols|-row profile — metadata-sized, zero additional scans."""
    if not rules:
        raise ValueError("need at least one rule")
    for col, kind, thr in rules:
        if kind not in CONSTRAINT_KINDS:
            raise ValueError(f"unknown constraint kind {kind!r}")
        if kind in ("null_rate_le", "distinct_ge", "distinct_le") and (
            thr is None
        ):
            raise ValueError(f"{kind} needs a threshold, got None")
    cols = sorted({c for c, _, _ in rules})
    prof = column_profile(df, cols)
    spark = df.sparkSession
    rules_df = spark.createDataFrame(
        [(c, k, t) for c, k, t in rules],
        "column_name string, kind string, threshold long",
    )
    j = rules_df.join(F.broadcast(prof), "column_name")
    observed = (
        F.when(F.col("kind") == "unique", F.col("n_distinct"))
        .when(F.col("kind") == "complete", F.col("n_nulls"))
        .when(
            F.col("kind") == "null_rate_le",
            F.expr(
                "n_nulls * CAST(1000000 AS BIGINT)"
                " DIV GREATEST(n_rows, 1)"
            ),
        )
        .otherwise(F.col("n_distinct"))
    )
    passed = (
        F.when(
            F.col("kind") == "unique",
            (F.col("n_nulls") == 0)
            & (F.col("n_distinct") == F.col("n_rows")),
        )
        .when(F.col("kind") == "complete", F.col("n_nulls") == 0)
        .when(
            F.col("kind") == "null_rate_le",
            F.expr(
                "n_nulls * CAST(1000000 AS BIGINT)"
                " DIV GREATEST(n_rows, 1)"
            )
            <= F.col("threshold"),
        )
        .when(
            F.col("kind") == "distinct_ge",
            F.col("n_distinct") >= F.col("threshold"),
        )
        .otherwise(F.col("n_distinct") <= F.col("threshold"))
    )
    return j.select(
        "column_name",
        "kind",
        "threshold",
        observed.cast("long").alias("observed"),
        passed.alias("passed"),
    )
