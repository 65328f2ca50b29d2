"""Custom connector surface: a Spark 4 Python DataSource
(`pyspark.sql.datasource`) — the extension point for reading systems
Spark has no built-in source for (internal feed APIs, bespoke formats,
synthetic load generators) WITHOUT writing a JVM DSv2 connector.

The exemplar here is a deterministic synthetic-corpus generator:

- **batch reader with true filter pushdown**: ``pushFilters`` narrows
  the generation range for range/equality predicates on ``id`` — the
  pruned rows are never GENERATED, not generated-then-filtered (the
  Python-source analog of parquet predicate pushdown; enable
  ``spark.sql.python.filterPushdown.enabled``). Partitions split the
  surviving range evenly, so parallelism holds under pushdown.
- **simple streaming reader**: offset-tracked deterministic batches —
  ``read(start)`` advances ``rows_per_batch`` ids per micro-batch and
  ``readBetweenOffsets`` replays any committed window exactly
  (deterministic replay is what makes the source exactly-once safe
  under checkpoint recovery).

Every generated field is engine-portable arithmetic (md5 hex digits,
integer multiply-mod), so a DuckDB ``generate_series`` replays the
whole corpus — the registered query ``python_datasource_agg`` is
oracle-checked end to end, pushdown included.

Cloudpickle note: the classes are defined INSIDE the factory functions
so they serialize BY VALUE to executors — a module-top-level class
pickles by reference and dies on workers without this repo on their
import path (the multimodal kernel rule, applied to connectors).
"""

from __future__ import annotations

#: Generator constants — shared with the DuckDB oracle replay.
VALUE_MULT = 2654435761
VALUE_ADD = 40503
VALUE_MOD = 1000003
LANGS = ("en", "de", "fr", "es", "zh")


def _gen_row(i: int):
    """One synthetic row for id ``i`` — md5-bucketed, integer-exact.
    Self-contained (stdlib only): runs inside executor workers."""
    import hashlib

    h = hashlib.md5(f"ds|{i}".encode()).hexdigest()
    bucket = int(h[:2], 16)
    value = (i * 2654435761 + 40503) % 1000003
    lang = ("en", "de", "fr", "es", "zh")[bucket % 5]
    return (i, bucket, value, lang)


_SCHEMA = "id BIGINT, bucket INT, value BIGINT, lang STRING"


def make_synthetic_source():
    """Build (by value) the DataSource class for registration:
    ``spark.dataSource.register(make_synthetic_source())`` then
    ``spark.read.format("synthetic_docs").option("n", ...).load()``.

    Options: ``n`` (row count, ids 0..n-1, default 1000), ``parts``
    (batch partitions, default 4), ``rows_per_batch`` (streaming
    micro-batch size, default 100).
    """
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        InputPartition,
        LessThan,
        LessThanOrEqual,
        SimpleDataSourceStreamReader,
    )

    class _RangePartition(InputPartition):
        def __init__(self, lo: int, hi: int):
            self.lo, self.hi = lo, hi

    class _Reader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 1000))
            self.n_parts = max(1, int(options.get("parts", 4)))
            self.lo, self.hi = 0, self.n

        def pushFilters(self, filters):
            # Handle conjunctive range/equality predicates on `id` by
            # narrowing the generation window; everything else goes
            # back to Spark. A fully-handled filter is NOT yielded.
            ranged = (
                EqualTo,
                GreaterThan,
                GreaterThanOrEqual,
                LessThan,
                LessThanOrEqual,
            )
            for f in filters:
                attr = getattr(f, "attribute", None)
                if attr == ("id",) and isinstance(f, ranged):
                    v = f.value
                    if isinstance(f, EqualTo):
                        self.lo = max(self.lo, v)
                        self.hi = min(self.hi, v + 1)
                        continue
                    if isinstance(f, GreaterThan):
                        self.lo = max(self.lo, v + 1)
                        continue
                    if isinstance(f, GreaterThanOrEqual):
                        self.lo = max(self.lo, v)
                        continue
                    if isinstance(f, LessThan):
                        self.hi = min(self.hi, v)
                        continue
                    if isinstance(f, LessThanOrEqual):
                        self.hi = min(self.hi, v + 1)
                        continue
                yield f

        def partitions(self):
            lo, hi = self.lo, max(self.lo, self.hi)
            span = hi - lo
            p = min(self.n_parts, span) or 1
            step, rem = divmod(span, p)
            parts, cur = [], lo
            for k in range(p):
                end = cur + step + (1 if k < rem else 0)
                parts.append(_RangePartition(cur, end))
                cur = end
            return parts

        def read(self, partition):
            import hashlib

            for i in range(partition.lo, partition.hi):
                h = hashlib.md5(f"ds|{i}".encode()).hexdigest()
                bucket = int(h[:2], 16)
                value = (i * 2654435761 + 40503) % 1000003
                lang = ("en", "de", "fr", "es", "zh")[bucket % 5]
                yield (i, bucket, value, lang)

    class _StreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.n = int(options.get("n", 1000))
            self.batch = max(1, int(options.get("rows_per_batch", 100)))

        def initialOffset(self):
            return {"next": 0}

        def _rows(self, lo, hi):
            import hashlib

            for i in range(lo, hi):
                h = hashlib.md5(f"ds|{i}".encode()).hexdigest()
                bucket = int(h[:2], 16)
                value = (i * 2654435761 + 40503) % 1000003
                lang = ("en", "de", "fr", "es", "zh")[bucket % 5]
                yield (i, bucket, value, lang)

        def read(self, start):
            lo = int(start["next"])
            hi = min(lo + self.batch, self.n)
            # a LIST, not a generator: the prefetch cache copy.copy()s
            # the returned iterator, and generators don't pickle
            return iter(list(self._rows(lo, hi))), {"next": hi}

        def readBetweenOffsets(self, start, end):
            # deterministic replay of a committed window (recovery path)
            return self._rows(int(start["next"]), int(end["next"]))

        def commit(self, end):
            pass  # nothing to clean up: generation is stateless

    class SyntheticDocsDataSource(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_docs"

        def schema(self):
            return _SCHEMA

        def reader(self, schema):
            return _Reader(self.options)

        def simpleStreamReader(self, schema):
            return _StreamReader(self.options)

    return SyntheticDocsDataSource


def register_synthetic(spark) -> None:
    """Register (or re-register) the connector on this session and
    enable Python-source filter pushdown so range predicates on ``id``
    reach ``pushFilters`` instead of running as post-scan filters."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(make_synthetic_source())


def make_jsonl_sink():
    """Build (by value) the write side of the connector surface: a
    JSONL directory sink with WRITE-AUDIT-PUBLISH commit semantics —
    ``df.write.format("jsonl_manifest").option("path", d).save()``.

    Tasks stage ``_staging/part-<pid>.jsonl`` and return a commit
    message carrying (filename, rows, bytes); ONLY the driver-side
    ``commit`` publishes: staged files move into the directory and a
    ``_MANIFEST.json`` records every published file with its row count
    (the audit a downstream reader checks — a torn or speculative
    duplicate task's file is never listed, so it is never read).
    ``abort`` removes the staging directory, leaving any previous
    publish intact. This is the two-phase-commit shape every
    production sink needs (and what parquet's _SUCCESS-only protocol
    approximates without per-file audit counts).
    """
    import dataclasses

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    @dataclasses.dataclass
    class _Staged(WriterCommitMessage):
        filename: str
        n_rows: int
        n_bytes: int

    class _Writer(DataSourceWriter):
        def __init__(self, options, overwrite: bool):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("jsonl_manifest requires option 'path'")
            self.overwrite = overwrite

        def write(self, iterator):
            import json
            import os

            from pyspark import TaskContext

            ctx = TaskContext.get()
            # task-attempt-unique staging name: speculative/retried
            # attempts stage DIFFERENT files and only the committed
            # attempt's message reaches commit()
            name = f"part-{ctx.partitionId()}-{ctx.taskAttemptId()}.jsonl"
            staging = os.path.join(self.path, "_staging")
            os.makedirs(staging, exist_ok=True)
            tmp = os.path.join(staging, name)
            n = 0
            with open(tmp, "w", encoding="utf-8") as fh:
                for row in iterator:
                    fh.write(json.dumps(row.asDict(), default=str) + "\n")
                    n += 1
            return _Staged(name, n, os.path.getsize(tmp))

        def commit(self, messages):
            import json
            import os
            import shutil

            staging = os.path.join(self.path, "_staging")
            manifest = {"files": [], "n_rows": 0, "n_bytes": 0}
            for m in messages:
                if m is None:
                    continue
                src = os.path.join(staging, m.filename)
                dst = os.path.join(self.path, m.filename)
                shutil.move(src, dst)
                manifest["files"].append(
                    {"name": m.filename, "n_rows": m.n_rows,
                     "n_bytes": m.n_bytes}
                )
                manifest["n_rows"] += m.n_rows
                manifest["n_bytes"] += m.n_bytes
            shutil.rmtree(staging, ignore_errors=True)
            # Publish the NEW manifest before deleting anything
            # (ADVICE r7): the reverse order has a crash window where
            # the OLD manifest still lists just-deleted parts, so
            # manifest-driven readers — the sink's primary contract —
            # break on missing files. Manifest-first, the worst crash
            # leaves extra unlisted parts: manifest readers are
            # unaffected, listing readers see the pre-cleanup state
            # they always tolerated. Temp-file + rename keeps the
            # manifest swap itself atomic (no torn JSON).
            mpath = os.path.join(self.path, "_MANIFEST.json")
            tmp_mpath = mpath + ".tmp"
            with open(tmp_mpath, "w") as fh:
                json.dump(manifest, fh, indent=1, sort_keys=True)
            os.replace(tmp_mpath, mpath)
            if self.overwrite:
                # honor mode('overwrite') for directory-listing
                # readers too, not just manifest-driven ones: a
                # replaced _MANIFEST.json alone leaves the previous
                # write's .jsonl parts on disk, and a plain listing
                # then serves a mix of stale and new files. Remove
                # every published part the new manifest doesn't list.
                keep = {f["name"] for f in manifest["files"]}
                for name in os.listdir(self.path):
                    if name.endswith(".jsonl") and name not in keep:
                        os.remove(os.path.join(self.path, name))

        def abort(self, messages):
            import os
            import shutil

            shutil.rmtree(
                os.path.join(self.path, "_staging"), ignore_errors=True
            )

    class JsonlManifestSink(DataSource):
        @classmethod
        def name(cls):
            return "jsonl_manifest"

        def writer(self, schema, overwrite):
            return _Writer(self.options, overwrite)

    return JsonlManifestSink


def register_jsonl_sink(spark) -> None:
    """Register the manifest-committed JSONL sink on this session."""
    spark.dataSource.register(make_jsonl_sink())
