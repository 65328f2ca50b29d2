"""Round-8 operator tests: span REMOVAL (the action side of the r7
contamination-span report) — conservation, floor/margin semantics, and
a pure-Python fuzz reference structurally independent of both the
Spark plan and the DuckDB oracle."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators.text import (
    contamination_spans,
    remove_contaminated_spans,
)


def _toks(s: str) -> list[str]:
    return [t for t in s.split() if t]


def _ref_remove(doc_rows, eval_texts, n, margin, floor):
    """Reference: explicit removed-position SET per doc (never islands
    arithmetic), then run-splitting by scanning survivor indices."""
    eval_grams = set()
    for t in eval_texts:
        tok = _toks(t)
        for i in range(len(tok) - n + 1):
            eval_grams.add(tuple(tok[i : i + n]))
    out = []
    for did, t in doc_rows:
        tok = _toks(t)
        starts = [
            i
            for i in range(len(tok) - n + 1)
            if tuple(tok[i : i + n]) in eval_grams
        ]
        removed: set[int] = set()
        spans = []
        if starts:
            lo = hi = starts[0]
            for p in starts[1:]:
                if p - hi <= n:
                    hi = p
                else:
                    spans.append((lo, hi))
                    lo = hi = p
            spans.append((lo, hi))
        for lo, hi in spans:
            for x in range(max(lo - margin, 0), hi + n - 1 + margin + 1):
                if x < len(tok):
                    removed.add(x)
        surv = [i for i in range(len(tok)) if i not in removed]
        segs: list[list[int]] = []
        for i in surv:
            if segs and i - segs[-1][-1] == 1:
                segs[-1].append(i)
            else:
                segs.append([i])
        k = 0
        for seg in segs:
            if spans and len(seg) < floor:
                continue
            out.append(
                (
                    did,
                    f"{did}#{k}",
                    k,
                    len(seg),
                    " ".join(tok[i] for i in seg),
                )
            )
            k += 1
    return sorted(out)


def _run(spark, doc_rows, eval_rows, **kw):
    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    got = remove_contaminated_spans(docs, ev, **kw).collect()
    return sorted(
        (r.doc_id, r.segment_id, r.seg_index, r.n_tokens, r.text)
        for r in got
    )


def test_remove_spans_fuzz_vs_reference(spark):
    rng = random.Random(20260817)
    vocab = [f"w{i}" for i in range(10)]
    for n, margin, floor in [(3, 0, 1), (3, 1, 2), (4, 2, 3), (2, 0, 2)]:
        eval_rows = [
            (100 + i, " ".join(rng.choices(vocab, k=rng.randrange(3, 12))))
            for i in range(8)
        ]
        doc_rows = []
        for i in range(25):
            body = rng.choices(vocab, k=rng.randrange(0, 25))
            if rng.random() < 0.6 and eval_rows:
                # plant a real eval window so spans actually fire
                src = _toks(eval_rows[rng.randrange(len(eval_rows))][1])
                if len(src) >= n:
                    s = rng.randrange(len(src) - n + 1)
                    at = rng.randrange(len(body) + 1)
                    body[at:at] = src[s : s + n]
            doc_rows.append((i, " ".join(body)))
        want = _ref_remove(
            doc_rows, [t for _, t in eval_rows], n, margin, floor
        )
        got = _run(
            spark,
            doc_rows,
            eval_rows,
            n=n,
            margin=margin,
            min_segment_tokens=floor,
        )
        assert got == want, (n, margin, floor)


def test_remove_spans_token_conservation(spark):
    """At margin=0, floor=1: surviving tokens + the span report's
    covered_tokens = the doc's token count, per doc — the two
    operators are two views of one partition of positions."""
    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(8)]
    n = 3
    eval_rows = [
        (900 + i, " ".join(rng.choices(vocab, k=6))) for i in range(5)
    ]
    doc_rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randrange(1, 30))))
        for i in range(40)
    ]
    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    surv = (
        remove_contaminated_spans(docs, ev, n=n)
        .groupBy("doc_id")
        .agg(F.sum("n_tokens").alias("kept"))
    )
    rep = contamination_spans(ev, docs, n=n).select(
        "doc_id", "covered_tokens"
    )
    orig = {did: len(_toks(t)) for did, t in doc_rows}
    joined = {
        r.doc_id: (r.kept or 0) + (r.covered_tokens or 0)
        for r in surv.join(rep, "doc_id", "left").collect()
    }
    for did, total in joined.items():
        assert total == orig[did], did
    # fully-removed docs appear in the report but not the survivors
    for r in rep.collect():
        assert joined.get(r.doc_id, r.covered_tokens) >= r.covered_tokens


def test_remove_spans_floor_and_clean_exemption(spark):
    # doc 1: contaminated middle; 1-token debris dies under floor=2.
    # doc 2: clean and SHORTER than the floor — passes through anyway.
    docs = [(1, "a x y z b c d"), (2, "q")]
    ev = [(9, "x y z")]
    got = _run(spark, docs, ev, n=3, min_segment_tokens=2)
    assert got == [
        (1, "1#0", 0, 3, "b c d"),
        (2, "2#0", 0, 1, "q"),
    ]
    # margin=1 eats into the left neighbor and the right segment
    got = _run(spark, docs, ev, n=3, margin=1, min_segment_tokens=2)
    assert got == [(1, "1#0", 0, 2, "c d"), (2, "2#0", 0, 1, "q")]


def test_remove_spans_empty_and_null_docs(spark):
    docs = [(1, ""), (2, "   "), (3, None), (4, "a b")]
    got = _run(spark, docs, [(9, "x y z")], n=3)
    assert got == [(4, "4#0", 0, 2, "a b")]


# ---------------------------------------------------------------------------
# mad_outlier_stats
# ---------------------------------------------------------------------------


def _ref_mad(rows, k=3):
    """Pure-Python reference: sort-based lower medians."""
    from collections import defaultdict

    groups = defaultdict(list)
    for g, v in rows:
        if v is not None:
            groups[g].append(round(v * 100))
    out = {}
    for g, vs in groups.items():
        vs.sort()
        n = len(vs)
        med = vs[(n + 1) // 2 - 1]
        devs = sorted(abs(v - med) for v in vs)
        mad = devs[(n + 1) // 2 - 1]
        n_out = sum(1 for d in devs if d > k * mad)
        out[g] = (n, med, mad, n_out)
    return out


def test_mad_outlier_stats_fuzz_vs_reference(spark):
    import random

    from music_streaming_data_pipeline_v2_spark.operators.aggregates import (
        mad_outlier_stats,
    )

    rng = random.Random(42)
    rows = []
    for i in range(500):
        g = f"g{i % 4}"
        if rng.random() < 0.05:
            rows.append((g, None))
        elif rng.random() < 0.05:
            rows.append((g, rng.uniform(500.0, 900.0)))  # planted outliers
        else:
            rows.append((g, rng.uniform(0.0, 50.0)))
    rows += [("gnull", None)] * 3  # all-NULL group: absent from output
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = {
        r.event_type: (r.n_values, r.median_centi, r.mad_centi, r.n_outliers)
        for r in mad_outlier_stats(df, "event_type", "value").collect()
    }
    assert got == _ref_mad(rows)
    assert "gnull" not in got


def test_mad_outlier_stats_edges(spark):
    import pytest

    from music_streaming_data_pipeline_v2_spark.operators.aggregates import (
        mad_outlier_stats,
    )

    # single value: med = value, mad = 0, every other value an outlier
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 1.0), ("b", 1.0), ("b", 9.0)],
        "event_type string, value double",
    )
    got = {
        r.event_type: (r.n_values, r.median_centi, r.mad_centi, r.n_outliers)
        for r in mad_outlier_stats(df, "event_type", "value").collect()
    }
    # b: values [100,100,900]; med 100; devs [0,0,800]; mad 0; 800 > 0 → 1
    assert got == {"a": (1, 100, 0, 0), "b": (3, 100, 0, 1)}
    with pytest.raises(ValueError, match="k >= 1"):
        mad_outlier_stats(df, "event_type", "value", k=0)


def test_mad_from_counts_cells_are_additive(spark):
    """(group, value) count cells SUM across disjoint batches, so the
    MAD readout over summed per-batch cells equals the whole-input
    operator — the hist_ingest/vocab-cells additivity contract applied
    to the robust-stats family."""
    import random

    from music_streaming_data_pipeline_v2_spark.operators.aggregates import (
        mad_from_counts,
        mad_outlier_stats,
    )

    rng = random.Random(11)
    rows = [
        (f"g{i % 3}", round(rng.uniform(0.0, 30.0), 2))
        for i in range(300)
    ] + [("g0", 400.0), ("g1", None)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    want = sorted(
        tuple(r) for r in mad_outlier_stats(df, "event_type", "value").collect()
    )

    def cells(part):
        return (
            part.filter(F.col("value").isNotNull())
            .select(
                F.col("event_type").alias("_by"),
                F.round(F.col("value") * 100).cast("long").alias("_v"),
            )
            .groupBy("_by", "_v")
            .agg(F.count("*").cast("long").alias("_cnt"))
        )

    h = F.pmod(F.hash("value"), F.lit(2))
    merged = (
        cells(df.filter(h == 0))
        .unionByName(cells(df.filter(h == 1)))
        .groupBy("_by", "_v")
        .agg(F.sum("_cnt").alias("_cnt"))
    )
    got = sorted(
        tuple(r)
        for r in mad_from_counts(merged)
        .withColumnRenamed("_by", "event_type")
        .collect()
    )
    assert got == want


# ---------------------------------------------------------------------------
# benford_digit_audit
# ---------------------------------------------------------------------------


def test_benford_digit_audit_exact(spark):
    from music_streaming_data_pipeline_v2_spark.operators.quality import (
        BENFORD_MICRO,
        benford_digit_audit,
    )

    # centi-scaled magnitudes: 1.23 -> 123 (digit 1), -0.95 -> 95
    # (digit 9, abs), 0.002 -> 0 (excluded), None excluded
    rows = [
        ("a", 1.23), ("a", 1.99), ("a", -0.95), ("a", 0.002),
        ("a", None), ("b", 30.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = {
        (r.event_type, r.digit): (
            r.n_obs, r.n_total, r.expected_micro, r.dev_micro
        )
        for r in benford_digit_audit(df, "event_type", "value").collect()
    }
    p = dict(BENFORD_MICRO)
    # group a: 3 ranked values, digits 1,1,9
    assert len(got) == 18  # 9 digits x 2 groups — zero digits present
    assert got[("a", 1)] == (2, 3, 3 * p[1], 2_000_000 - 3 * p[1])
    assert got[("a", 9)] == (1, 3, 3 * p[9], 1_000_000 - 3 * p[9])
    assert got[("a", 5)] == (0, 3, 3 * p[5], -3 * p[5])
    # group b: one value 30.0 -> 3000 -> digit 3
    assert got[("b", 3)] == (1, 1, p[3], 1_000_000 - p[3])
    # per group, deviations sum to zero exactly (masses sum to 1e6)
    for g in ("a", "b"):
        assert sum(got[(g, d)][3] for d in range(1, 10)) == 0


def test_mad_clipped_means_vs_reference(spark):
    import random

    from music_streaming_data_pipeline_v2_spark.operators.aggregates import (
        mad_clipped_means,
    )

    rng = random.Random(99)
    rows = [
        ("g", round(rng.uniform(0.0, 20.0), 2)) for _ in range(80)
    ] + [("g", 900.0), ("g", -500.0), ("g", None), ("h", 4.0)]
    ref = _ref_mad(rows)  # (n, med, mad, n_out) per group
    want = {}
    for g, (n, med, mad, _) in ref.items():
        lo, hi = med - 3 * mad, med + 3 * mad
        vs = [round(v * 100) for gg, v in rows if gg == g and v is not None]
        cv = [min(max(v, lo), hi) for v in vs]
        clipped = sum(1 for v in vs if v > hi or v < lo)
        want[g] = (n, clipped, lo, hi, sum(cv) / (n * 100.0))
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = {
        r.event_type: (
            r.n_values, r.n_clipped, r.lo_centi, r.hi_centi, r.clipped_mean
        )
        for r in mad_clipped_means(df, "event_type", "value").collect()
    }
    assert got == want
    # the planted extremes were clamped, not dropped
    assert got["g"][1] >= 2
    # single-value group: fences collapse to the value, nothing clips
    assert got["h"] == (1, 0, 400, 400, 4.0)
