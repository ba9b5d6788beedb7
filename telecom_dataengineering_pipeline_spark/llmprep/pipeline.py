"""The end-to-end training-set builder: every llmprep stage composed.

documents → exact dedup (keep canonical fingerprint member) → near-dup
removal (MinHash+LSH pairs; drop the higher id of each pair) → quality
filter → chunking → deterministic split assignment → per-(split, language)
summary.

Shuffle budget of the whole pipeline at 100 TB:
- fingerprint canonicalization: one exchange on the fingerprint;
- near-dup: the MinHash pipeline's banded equi-joins (no all-pairs);
- quality / language / chunking / split: pure map stages, zero exchanges;
- summary: one final keyed aggregation over chunk counts.
Nothing collects to the driver; the survivor set and chunk stream are both
writable as partitioned parquet at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .chunking import chunk_documents
from .dedup import minhash_near_dup_pairs
from .sampling import split_assign
from .text import normalized_fingerprint, predicted_lang, quality_metrics, tokens


def training_set_survivors(
    docs: DataFrame,
    jaccard_threshold: float = 0.5,
    min_quality: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
    engine_neutral_hash: bool = True,
) -> DataFrame:
    """Documents that survive exact dedup, near-dup removal, and the quality
    floor — with predicted language attached."""
    w = Window.partitionBy("_fp")
    canonical = (
        docs.withColumn("_fp", normalized_fingerprint(text_col))
        .withColumn("_canon", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("_canon"))
        .drop("_fp", "_canon")
    )
    near_dup2 = (
        minhash_near_dup_pairs(
            docs, text_col, id_col,
            threshold=jaccard_threshold,
            engine_neutral_hash=engine_neutral_hash,
        )
        .select(F.col("doc2").alias(id_col))
        .distinct()
    )
    q = quality_metrics(text_col)
    return (
        canonical.join(near_dup2, id_col, "left_anti")
        .filter(q["quality_score"] >= min_quality)
        .withColumn("pred_lang", predicted_lang(tokens(text_col)))
    )


def training_set_summary(
    docs: DataFrame,
    chunk_size: int = 100,
    stride: int = 80,
    jaccard_threshold: float = 0.5,
    min_quality: float = 0.6,
    engine_neutral_hash: bool = True,
) -> DataFrame:
    """Per-(split, predicted language) corpus stats for the final training
    set: document, chunk, and token counts."""
    survivors = training_set_survivors(
        docs, jaccard_threshold, min_quality, engine_neutral_hash=engine_neutral_hash
    )
    # Split assignment is a pure hash-of-id map and chunking is a pure map
    # stage, so both ride the SAME single pass over the survivor stream
    # (split/pred_lang carried onto the chunk rows). The former shape —
    # chunk stats joined back onto a separately split-assigned survivor
    # relation — executed the whole survivor subtree (exact-dup window,
    # MinHash verify joins, anti-join, quality/langid maps) TWICE: Spark
    # does not dedupe shared subtrees, and a doc-keyed join re-attached
    # what a carried column gets for free.
    assigned = split_assign(survivors.select("doc_id", "pred_lang", "text"))
    chunks = chunk_documents(
        assigned, chunk_size, stride, carry_cols=("pred_lang", "split")
    )
    per_doc = chunks.groupBy("doc_id", "split", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_chunks"), F.sum("n_tokens").alias("n_tokens")
    )
    return per_doc.groupBy("split", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chunks").alias("n_chunks"),
        F.sum("n_tokens").alias("n_tokens"),
    )
