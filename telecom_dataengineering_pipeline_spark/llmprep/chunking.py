"""Document chunking for training-data pipelines.

Splits each document into fixed-size token windows with overlap (the
standard pre-training / RAG ingestion shape: chunk_size tokens, stride <
chunk_size so consecutive chunks share a tail). Everything is JVM column
expressions: one `tokens()` projection per doc, chunk starts generated with
``sequence(0, n_tok−1, stride)`` and exploded, window content via
``slice`` — chunk rows stay co-partitioned with their document, so
downstream per-chunk ops (dedup, quality, embedding) inherit the layout.

Scale: output is ~n_tokens/stride rows per doc with no shuffle at all —
chunking is a pure map stage, and at 100 TB it pipelines into the parquet
writer without a exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 100,
    stride: int = 80,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per (doc, chunk): chunk_idx, token count, md5 of the chunk
    text. Empty documents produce no chunks.

    ``carry_cols``: per-doc columns of ``docs`` propagated unchanged onto
    every chunk row — chunking is a pure map stage, so riding functional
    metadata (language, split) through it is free, while re-attaching it
    downstream would cost a doc-keyed join against a second execution of
    the (possibly expensive) ``docs`` subtree."""
    reserved = {"doc_id", "toks", "n_tok", "start", "chunk_idx", "n_tokens", "chunk_md5"}
    bad = reserved.intersection(carry_cols)
    if bad:
        raise ValueError(
            f"carry_cols collide with chunker-internal columns: {sorted(bad)}"
        )
    base = docs.select(
        F.col(id_col).alias("doc_id"), *carry_cols, tokens(text_col).alias("toks")
    ).withColumn("n_tok", F.size(F.filter(F.col("toks"), lambda t: t != "")))
    starts = base.filter(F.col("n_tok") > 0).select(
        "doc_id",
        *carry_cols,
        "toks",
        "n_tok",
        F.explode(
            F.sequence(F.lit(0), F.col("n_tok") - 1, F.lit(stride))
        ).alias("start"),
    )
    piece = F.slice(F.col("toks"), F.col("start") + 1, chunk_size)
    return starts.select(
        "doc_id",
        *carry_cols,
        (F.col("start") / stride).cast("int").alias("chunk_idx"),
        F.least(F.lit(chunk_size), F.col("n_tok") - F.col("start")).alias("n_tokens"),
        F.md5(F.concat_ws(" ", piece)).alias("chunk_md5"),
    )


def duplicate_chunk_groups(
    docs: DataFrame,
    chunk_size: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sub-document exact dedup: NON-overlapping token chunks whose content
    hash appears more than once across the corpus — the boilerplate-
    paragraph / repeated-snippet sweep that runs below document granularity
    (doc-level dedup misses a header duplicated into thousands of otherwise
    distinct documents).

    Rides the chunking spine with stride == chunk_size, then one hash agg on
    the chunk hash: n_occurrences, distinct docs, and a deterministic
    canonical occurrence (min (doc, idx) struct — no window, plain
    partial-aggregatable MIN). At 100 TB this is the same shape as exact
    doc dedup: shuffle keyed by content hash, combiner-reduced map-side.
    """
    chunks = chunk_documents(docs, chunk_size, stride=chunk_size, text_col=text_col, id_col=id_col)
    return (
        chunks.groupBy("chunk_md5")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
            F.min(F.struct("doc_id", "chunk_idx")).alias("_c"),
        )
        .filter(F.col("n_occurrences") > 1)
        .select(
            "chunk_md5",
            "n_occurrences",
            "n_docs",
            F.col("_c.doc_id").alias("canonical_doc"),
            F.col("_c.chunk_idx").alias("canonical_idx"),
        )
    )


def chunk_dup_coverage(
    docs: DataFrame,
    chunk_size: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicate-chunk coverage: the fraction of a doc's
    non-overlapping chunks whose content hash appears anywhere else in the
    corpus — the doc-level signal a curation filter thresholds on (docs
    that are mostly boilerplate get dropped; docs with one shared header
    survive). One window over the chunk-hash partitioning plus one per-doc
    aggregate; nothing quadratic."""
    chunks = chunk_documents(docs, chunk_size, stride=chunk_size, text_col=text_col, id_col=id_col)
    w = Window.partitionBy("chunk_md5")
    tagged = chunks.withColumn("_n", F.count(F.lit(1)).over(w))
    dup = F.when(F.col("_n") > 1, 1).otherwise(0)
    return (
        tagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum(dup).cast("bigint").alias("n_dup_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_dup_chunks",
            F.round(F.col("n_dup_chunks") / F.col("n_chunks"), 4).alias("dup_chunk_ratio"),
        )
    )


def cdc_chunk_documents(
    docs: DataFrame,
    divisor: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking (the Rabin/LBFS/rsync boundary trick at
    token granularity): a chunk boundary falls AFTER every token whose
    engine-neutral 32-bit hash ≡ 0 (mod ``divisor``) — so boundaries are
    a function of CONTENT, not position. That is the property fixed-size
    chunking lacks: insert one sentence near the top of a document and
    every fixed-size chunk after it shifts (all hashes change, dedup
    misses everything downstream), while CDC chunks RE-ALIGN at the next
    content boundary and the rest of the document deduplicates again.
    Expected chunk length is ``divisor`` tokens.

    Pure map stage, zero shuffle, zero Python: boundary positions come
    from ONE `filter` over the indexed token array, chunk extents from
    zipping the boundary list with itself shifted — all higher-order
    column expressions; chunk rows stay co-partitioned with their
    document. Pair with :func:`duplicate_chunk_groups`'s hash aggregate
    for the actual dedup sweep.

    Returns one row per chunk: (doc_id, chunk_idx, start_tok 1-based,
    n_tokens, chunk_md5). Empty documents produce no chunks."""
    if divisor < 1:
        raise ValueError("divisor must be >= 1")
    from .text import token_hash32

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(tokens(text_col), lambda t: t != "").alias("toks"),
    ).filter(F.size("toks") > 0)
    n = F.size("toks")
    # 1-based positions whose token closes a chunk (the last token always
    # does, whatever its hash — otherwise the tail would vanish)
    ends = F.array_union(
        F.filter(
            F.transform(
                F.col("toks"),
                lambda t, i: F.when(
                    token_hash32(t) % divisor == 0, i + 1
                ).otherwise(F.lit(None)),
            ),
            lambda e: e.isNotNull(),
        ),
        F.array(n),
    )
    # starts = 1, then each previous end + 1 (zip_with over the shifted list)
    spans = F.expr(
        "transform(_ends, (e, i) -> struct("
        "CASE WHEN i = 0 THEN 1 ELSE _ends[i - 1] + 1 END AS s, e AS e))"
    )
    rows = (
        base.withColumn("_ends", ends)
        .select("doc_id", "toks", F.posexplode(spans).alias("chunk_idx", "sp"))
    )
    piece = F.slice(F.col("toks"), F.col("sp.s"), F.col("sp.e") - F.col("sp.s") + 1)
    return rows.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("sp.s").cast("int").alias("start_tok"),
        (F.col("sp.e") - F.col("sp.s") + 1).cast("int").alias("n_tokens"),
        F.md5(F.concat_ws(" ", piece)).alias("chunk_md5"),
    )
