"""Independent pure-Python references for the round-7 text operators —
the unigram-brute-force stance: the Spark implementation and the DuckDB
oracle share a DESIGN, so a third, structurally different reference
guards against shared-design bugs."""

from __future__ import annotations

import random
from collections import Counter

from music_streaming_data_pipeline_v2_spark.operators.text import (
    contamination_spans,
    ngram_clipped_precision,
)


def _toks(s: str) -> list[str]:
    return [t for t in s.split() if t]


def _ref_spans(train_texts, test_rows, n):
    """Reference: materialize every train gram, scan each test doc's
    gram starts, union the [p, p+n-1] intervals by sweeping."""
    train_grams = set()
    for t in train_texts:
        tok = _toks(t)
        for i in range(len(tok) - n + 1):
            train_grams.add(tuple(tok[i : i + n]))
    out = {}
    for did, t in test_rows:
        tok = _toks(t)
        starts = [
            i
            for i in range(len(tok) - n + 1)
            if tuple(tok[i : i + n]) in train_grams
        ]
        if not starts:
            continue
        spans = []
        lo = hi = starts[0]
        for p in starts[1:]:
            if p - hi <= n:
                hi = p
            else:
                spans.append(hi - lo + n)
                lo = hi = p
        spans.append(hi - lo + n)
        out[did] = (len(spans), max(spans), sum(spans))
    return out


def test_contamination_spans_fuzz_vs_reference(spark):
    rng = random.Random(20260816)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(4):
        train_rows = [
            (i, " ".join(rng.choices(vocab, k=rng.randrange(3, 20))))
            for i in range(15)
        ]
        test_rows = [
            (100 + i, " ".join(rng.choices(vocab, k=rng.randrange(3, 30))))
            for i in range(15)
        ]
        n = rng.choice([2, 3])
        train = spark.createDataFrame(train_rows, "doc_id long, text string")
        test = spark.createDataFrame(test_rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (
                r["n_spans"],
                r["longest_span"],
                r["covered_tokens"],
            )
            for r in contamination_spans(train, test, n=n).collect()
        }
        want = _ref_spans([t for _, t in train_rows], test_rows, n)
        assert got == want, (trial, n)
        assert want  # non-vacuous: the small vocab guarantees overlap


def _ref_clipped(cand: str, ref: str, n: int):
    ct, rt = _toks(cand), _toks(ref)
    out = {"len_cand": len(ct), "len_ref": len(rt)}
    for o in range(1, n + 1):
        cg = Counter(tuple(ct[i : i + o]) for i in range(len(ct) - o + 1))
        rg = Counter(tuple(rt[i : i + o]) for i in range(len(rt) - o + 1))
        matched = sum(min(c, rg[g]) for g, c in cg.items())
        total = sum(cg.values())
        out[f"matched_{o}"] = matched
        out[f"total_{o}"] = total
        out[f"p_{o}"] = matched / total if total else None
    return out


def test_clipped_precision_fuzz_vs_reference(spark):
    rng = random.Random(7_2026)
    vocab = [f"t{i}" for i in range(8)]
    rows = [
        (
            i,
            " ".join(rng.choices(vocab, k=rng.randrange(1, 25))),
            " ".join(rng.choices(vocab, k=rng.randrange(1, 25))),
        )
        for i in range(40)
    ]
    pairs = spark.createDataFrame(
        rows, "pair_id long, cand string, ref string"
    )
    got = {
        r["pair_id"]: r for r in ngram_clipped_precision(pairs, n=2).collect()
    }
    for pid, cand, ref in rows:
        want = _ref_clipped(cand, ref, 2)
        r = got[pid]
        for k, v in want.items():
            assert r[k] == v, (pid, k, r[k], v)
