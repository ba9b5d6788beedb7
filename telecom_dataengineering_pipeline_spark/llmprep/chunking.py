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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 100,
    stride: int = 80,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per (doc, chunk): chunk_idx, token count, md5 of the chunk
    text. Empty documents produce no chunks."""
    base = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks")
    ).withColumn("n_tok", F.size(F.filter(F.col("toks"), lambda t: t != "")))
    starts = base.filter(F.col("n_tok") > 0).select(
        "doc_id",
        "toks",
        "n_tok",
        F.explode(
            F.sequence(F.lit(0), F.col("n_tok") - 1, F.lit(stride))
        ).alias("start"),
    )
    piece = F.slice(F.col("toks"), F.col("start") + 1, chunk_size)
    return starts.select(
        "doc_id",
        (F.col("start") / stride).cast("int").alias("chunk_idx"),
        F.least(F.lit(chunk_size), F.col("n_tok") - F.col("start")).alias("n_tokens"),
        F.md5(F.concat_ws(" ", piece)).alias("chunk_md5"),
    )
