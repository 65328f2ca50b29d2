"""Context-window chunking and sequence packing for LLM training data.

Two standard shapes a training-data pipeline applies between curation
and tokenizer sharding (north-star extension, SURVEY.md §7 phase 6):

- **Chunking**: split each document into fixed-token windows with
  overlap (the context-length split every pretraining/RAG pipeline
  performs). Map-only — ``sequence``+``slice`` explode, no shuffle, no
  UDF; scales linearly with bytes scanned.
- **Packing**: concat-and-split assignment of documents to fixed token
  budgets (GPT-style example packing): documents are laid end-to-end in
  a deterministic order and each one is assigned the bin its first
  token lands in. One window cumsum per stratum — the shuffle is on
  the stratum key, and strata (sources/shards) parallelize across the
  cluster. A global (unstratified) pack would serialize through one
  task; at scale you pack per shard, which is exactly what the
  stratum column expresses.

Tokenization uses the explicit class ``[ \\t\\n\\r\\f]+`` so Spark
(Java regex) and any oracle engine (RE2 etc.) split identically —
Java's ``\\s`` includes vertical tab, RE2's does not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


#: The engine-portable whitespace class — the ONE source of truth for
#: every operator whose token boundaries must replay identically in
#: the DuckDB oracles (chunking/packing here; n-grams, contamination
#: postings, and winnowing in operators/text.py). Java's \\s and
#: DuckDB's whitespace semantics differ at the edges; this explicit
#: class behaves identically in both.
ENGINE_SAFE_WS = "[ \t\n\r\f]+"


def engine_safe_tokens(col: str | Column = "text") -> Column:
    """Whitespace tokens with the engine-portable separator class."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), ENGINE_SAFE_WS), lambda t: t != F.lit(""))


def lineify_tokens(col: str | Column = "text", width: int = 10) -> Column:
    """Rewrite flat text as synthetic newline-separated 'lines' of
    ``width`` tokens each — the deterministic line-ification both
    engines replay identically (the line_dedup_docs oracle's l CTE),
    used to exercise line-granular operators over corpora whose text
    carries no newlines of its own. '' for token-free input."""
    toks = engine_safe_tokens(col)
    return F.when(
        F.size(toks) >= 1,
        F.array_join(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.ceil(F.size(toks) / F.lit(float(width))).cast("int"),
                ),
                lambda i: F.array_join(
                    F.slice(toks, (i - 1) * width + 1, width), " "
                ),
            ),
            "\n",
        ),
    ).otherwise(F.lit(""))


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode documents into overlapping fixed-size token windows.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_tokens)``
    with ``stride = chunk_tokens - overlap``; starts run
    ``0, stride, …`` up to the last start that leaves more than
    ``overlap`` tokens (so no chunk is a pure suffix of the previous
    one), and an empty/short document yields exactly one chunk.
    Returns (id, chunk_id, n_chunk_tokens, chunk_text).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = engine_safe_tokens(text_col)
    d = df.select(F.col(id_col).alias("doc_id"), toks.alias("_w")).withColumn(
        "_n", F.size("_w")
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("_n") - overlap - 1, F.lit(0)),
        F.lit(stride),
    )
    d = d.select("doc_id", "_w", "_n", F.explode(starts).alias("_start"))
    piece = F.slice("_w", F.col("_start") + 1, F.lit(chunk_tokens))
    return d.select(
        "doc_id",
        (F.col("_start") / stride).cast("long").alias("chunk_id"),
        F.size(piece).alias("n_chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 256,
    stratum_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-split packing: assign each document the bin its first
    token lands in when documents are concatenated in ``order_col``
    order within each stratum and split every ``budget`` tokens.

    Deterministic (pure function of content + ordering), exact integer
    arithmetic, one window shuffle per stratum. Returns
    (stratum, doc_id, n_tokens, bin_id, bin_offset).
    """
    d = df.select(
        F.col(stratum_col).alias("stratum"),
        F.col(order_col).alias("doc_id"),
        F.size(engine_safe_tokens(text_col)).cast("long").alias("n_tokens"),
    )
    start = F.sum("n_tokens").over(
        Window.partitionBy("stratum")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ) - F.col("n_tokens")
    # bin_id via INTEGER division: floor(start / budget) is a DOUBLE
    # division, which silently rounds once a stratum's cumulative
    # token count passes 2^53 — DIV stays exact at any scale (and
    # matches the oracle's BIGINT `//`)
    return d.withColumn("_start", start).select(
        "stratum",
        "doc_id",
        "n_tokens",
        F.expr(f"_start DIV {int(budget)}").alias("bin_id"),
        (F.col("_start") % budget).alias("bin_offset"),
    )


def pack_bins_nfd(
    df: DataFrame,
    budget: int = 256,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Next-fit-decreasing bin packing: documents sorted by token count
    descending (ties by id) are scanned once per stratum; a document
    opens a new bin whenever it would overflow the current one. Unlike
    ``pack_sequences`` (concat-and-split, which SPLITS documents
    across bin boundaries), NFD keeps every document whole — the
    packing trainers use when examples must not be cut — at the cost
    of bounded slack per bin. Decreasing order is the classical
    1.5×-ish-of-optimal heuristic (next-fit alone is 2×); a document
    longer than the budget still gets a bin of its own.

    Returns ``(stratum, doc_id, n_tokens, bin_id, bin_fill)`` where
    ``bin_fill`` is the bin's occupancy immediately after placement.

    Physical shape: the scan is a true recurrence (each placement
    depends on the previous placement's fill), so no window frame
    expresses it — the ewma_by_entity playbook applies: hash-
    repartition by stratum, sort within partitions by (stratum,
    n_tokens desc, id), and run ONE pandas kernel per PARTITION via
    ``mapInPandas`` (never one per stratum — per-group kernel
    invocation overhead dominates tiny groups). Strata parallelize
    across the cluster; the per-stratum scan is the same bound as any
    ordered window. The kernel is pickle-self-contained (no
    module-level references — driver workers may not have this repo
    importable)."""
    if budget < 1:
        raise ValueError("budget must be >= 1")
    d = df.select(
        F.col(stratum_col).cast("string").alias("stratum"),
        F.col(id_col).alias("doc_id"),
        F.size(engine_safe_tokens(text_col)).cast("long").alias("n_tokens"),
    )
    # the kernel's declared output schema must carry the CALLER'S id
    # type — hardcoding `long` breaks Arrow serialization for string
    # (or any non-long) document ids
    id_type = d.schema["doc_id"].dataType.simpleString()
    n_part = (
        num_partitions or d.sparkSession.sparkContext.defaultParallelism
    )
    arranged = d.repartition(n_part, "stratum").sortWithinPartitions(
        F.asc("stratum"), F.desc("n_tokens"), F.asc("doc_id")
    )
    budget_ = int(budget)

    def kernel(batches):
        import pandas as pd

        chunks = list(batches)
        if not chunks:
            return
        # Arrow batches can split a stratum; concat the whole
        # partition before scanning (the ewma_by_entity pattern)
        pdf = pd.concat(chunks, ignore_index=True)
        bins, fills = [], []
        cur = object()  # sentinel unequal to any stratum value
        b = 0
        fill = 0
        for s, n in zip(pdf["stratum"].to_numpy(), pdf["n_tokens"].to_numpy()):
            n = int(n)
            if s != cur:
                cur, b, fill = s, 0, 0
            if fill > 0 and fill + n > budget_:
                b += 1
                fill = 0
            fill += n
            bins.append(b)
            fills.append(fill)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        yield pdf

    return arranged.mapInPandas(
        kernel,
        f"stratum string, doc_id {id_type}, n_tokens long, bin_id long, "
        "bin_fill long",
    )
