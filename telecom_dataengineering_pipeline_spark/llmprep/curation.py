"""Corpus-curation operators: decontamination, sequence packing,
repetition quality, vocabulary statistics.

The second tier of a training-data pipeline, after dedup/quality/chunking
(``llmprep/dedup.py``, ``text.py``, ``chunking.py``):

- **Decontamination** — n-gram overlap of evaluation-split documents
  against the train split (the standard "did the benchmark leak into
  training data" check). Same shingle-hash equi-join spine as the dedup
  family: the train side collapses to a distinct shingle-hash set (one
  groupBy), the test side joins against it — no all-pairs anywhere, and
  the join key is a 64-bit hash, never the string.
- **Sequence packing** — assign chunk rows to fixed-token context windows
  (the pre-training batch-building step). Packing is inherently
  sequential, so a single global cumsum would serialize onto one task; we
  pack within deterministic salted groups (hash(doc) mod G) — each group
  is an independent ordered fill, groups pack in parallel, and the
  assignment is a pure function of (doc_id, chunk_idx), reproducible on
  any engine and any cluster size.
- **Repetition metrics** — within-document duplicate n-gram ratios
  (Gopher-style quality signals). Pure per-doc aggregation over the
  non-distinct shingle stream; rides the doc partitioning, one exchange.
- **Vocabulary stats** — corpus token/document frequencies + top-k
  (wordcount with a TakeOrderedAndProject tail; the df side feeds IDF
  and stopword discovery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import split_assign
from .text import tokens
from ..lineage import lineage_cut


def _shingle_stream_all(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(doc_id, shingle) word n-grams WITH multiplicity (repetition analysis
    needs repeats) — the non-distinct mode of the one shared shingle spine."""
    from .dedup import shingle_stream

    return shingle_stream(docs, text_col, id_col, n, distinct=False)


def decontamination_overlap(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    salt: str = "split_v1",
    train_pct: int = 90,
    val_pct: int = 5,
    groups: DataFrame | None = None,
    group_col: str = "group_id",
) -> DataFrame:
    """Per eval-split (val/test) document: how much of it appears verbatim
    (at n-gram granularity) in the train split.

    Returns (doc_id, split, n_shingles, n_contaminated, contamination_ratio)
    for every non-train document. At 100 TB the train shingle set is the
    big side — it stays a distinct-hash relation (narrow: one long per
    shingle) and the join is hash-partitioned on the shingle; the eval side
    is a few percent of the corpus by construction.

    ``groups`` (a ``(doc_id, group_id)`` dup-cluster relation) switches the
    split to :func:`~.sampling.leakage_safe_split`: near-duplicate clusters
    are co-assigned, so the dup-driven slice of contamination this audit
    exists to surface disappears by construction and what remains is REAL
    cross-document leakage worth reading.
    """
    from .dedup import shingle_stream

    if groups is None:
        assigned = split_assign(
            docs, id_col=id_col, salt=salt, train_pct=train_pct, val_pct=val_pct
        )
    else:
        from .sampling import leakage_safe_split

        assigned = leakage_safe_split(
            docs, groups, id_col=id_col, group_col=group_col,
            salt=salt, train_pct=train_pct, val_pct=val_pct,
        )
    stream = shingle_stream(assigned, text_col, id_col, n)
    sided = stream.join(assigned.select(F.col(id_col).alias("doc_id"), "split"), "doc_id")
    train_set = (
        sided.filter(F.col("split") == "train")
        .select(F.xxhash64("shingle").alias("shingle_h"))
        .distinct()
    )
    ev = sided.filter(F.col("split") != "train").select(
        "doc_id", "split", F.xxhash64("shingle").alias("shingle_h")
    )
    hits = ev.join(train_set.withColumn("_hit", F.lit(1)), "shingle_h", "left")
    return hits.groupBy("doc_id", "split").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count("_hit").alias("n_contaminated"),
        F.round(
            F.count("_hit").cast("double") / F.count(F.lit(1)), 6
        ).alias("contamination_ratio"),
    )


def split_leakage_audit(
    docs: DataFrame,
    groups: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    salt: str = "split_v1",
    train_pct: int = 90,
    val_pct: int = 5,
    group_col: str = "group_id",
) -> DataFrame:
    """End-to-end contract of the group-keyed split, per eval split: run
    :func:`~.sampling.leakage_safe_split` and
    :func:`decontamination_overlap` over the SAME assignment (both are
    pure functions of ``md5(salt || group)``, so the assignment is
    identical by construction) and roll up

    - ``n_dup_straddle_docs`` — eval docs with a same-group mate in
      train. ZERO by construction under the group-keyed split; COMPUTED
      (not a literal) so a break anywhere in the split keying turns the
      column non-zero and reddens the value gate.
    - ``n_leaky_docs`` / ``n_contaminated`` — what remains after the
      dup-driven slice is gone: REAL cross-document n-gram leakage.

    Grain note: docs too short to produce an n-gram (< n tokens) carry
    no contamination evidence and are excluded on both engines, so
    ``n_eval_docs`` counts eval docs WITH shingles.

    Scale shape: the split + anchor joins touch the narrow
    ``(doc_id, group)`` relation; the decon join is the hash join on the
    distinct train-shingle set; output is ≤ 2 rows."""
    from .sampling import leakage_safe_split

    assigned = leakage_safe_split(
        docs, groups, id_col=id_col, group_col=group_col,
        salt=salt, train_pct=train_pct, val_pct=val_pct,
    )
    decon = decontamination_overlap(
        docs, text_col, id_col, n, salt, train_pct, val_pct,
        groups=groups, group_col=group_col,
    )
    g = (
        groups.select(
            F.col(id_col).alias("doc_id"),
            F.col(group_col).cast("string").alias("__grp"),
        )
        .groupBy("doc_id")
        .agg(F.min("__grp").alias("__grp"))  # same reduction as the split
    )
    anchored = (
        assigned.select(F.col(id_col).alias("doc_id"), "split")
        .join(g, "doc_id", "left")
        .withColumn(
            "__anchor", F.coalesce(F.col("__grp"), F.col("doc_id").cast("string"))
        )
    )
    train_anchors = (
        anchored.filter(F.col("split") == "train").select("__anchor").distinct()
    )
    straddle = (
        anchored.filter(F.col("split") != "train")
        .join(train_anchors.withColumn("__t", F.lit(1)), "__anchor", "left")
        .select("doc_id", "__t")
    )
    joined = decon.join(straddle, "doc_id")
    return joined.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval_docs"),
        F.sum(F.col("__t").isNotNull().cast("int")).cast("long").alias(
            "n_dup_straddle_docs"
        ),
        F.sum((F.col("n_contaminated") > 0).cast("int")).cast("long").alias(
            "n_leaky_docs"
        ),
        F.sum("n_shingles").cast("long").alias("n_shingles"),
        F.sum("n_contaminated").cast("long").alias("n_contaminated"),
        F.round(
            F.sum("n_contaminated").cast("double") / F.sum("n_shingles"), 6
        ).alias("contamination_ratio"),
    )


def pack_sequences(
    chunks: DataFrame,
    context_len: int = 512,
    n_groups: int = 16,
    salt: str = "pack_v1",
) -> DataFrame:
    """Assign chunk rows to fixed-token context windows.

    Input: (doc_id, chunk_idx, n_tokens) from ``chunk_documents``. Each
    chunk lands in pack group g = hash(salt‖doc_id) mod n_groups; within a
    group, chunks fill contiguous windows in (doc_id, chunk_idx) order:
    window boundary = cumulative tokens div context_len. Deterministic on
    any engine/cluster; groups pack in parallel (one window partition per
    group, sized corpus/n_groups — pick n_groups ≈ executor count at
    scale). Returns one row per (group, sequence) with fill statistics.
    """
    from .text import token_hash32

    g = F.pmod(
        token_hash32(F.concat(F.lit(salt + "_"), F.col("doc_id").cast("string"))),
        F.lit(n_groups),
    ).cast("int")
    w = (
        Window.partitionBy("pack_group")
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    assigned = (
        chunks.withColumn("pack_group", g)
        .withColumn("_cum", F.sum("n_tokens").over(w))
        .withColumn(
            "seq_idx", ((F.col("_cum") - F.col("n_tokens")) / F.lit(context_len)).cast("int")
        )
    )
    return assigned.groupBy("pack_group", "seq_idx").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.min("doc_id").alias("first_doc_id"),
        F.max("doc_id").alias("last_doc_id"),
    )


def repetition_metrics(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Within-document repetition (Gopher-style quality signals): per doc,
    the fraction of n-gram occurrences that are repeats of an already-seen
    n-gram, and the share taken by the single most repeated n-gram.

    Two keyed aggregations, both on the doc partitioning: (doc, shingle)
    counts, then per-doc totals. Boilerplate-heavy docs (repeated headers,
    templated rows) score high and get filtered before training.
    """
    per_shingle = (
        _shingle_stream_all(docs, text_col, id_col, n)
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return per_shingle.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_shingles"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.round(
            (F.sum("cnt") - F.count(F.lit(1))).cast("double") / F.sum("cnt"), 6
        ).alias("dup_ngram_ratio"),
        F.round(F.max("cnt").cast("double") / F.sum("cnt"), 6).alias("top_ngram_share"),
    )


def vocab_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 100
) -> DataFrame:
    """Corpus vocabulary: top-k tokens by total frequency with document
    frequency attached (IDF feed / stopword discovery). The wordcount agg
    is map-side combined; top-k runs as TakeOrderedAndProject, never a
    global sort of the vocabulary."""
    ex = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("tok"))
        .filter(F.col("tok") != "")
    )
    counts = ex.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf"),
        F.count_distinct("doc_id").cast("bigint").alias("df"),
    )
    return counts.orderBy(F.col("tf").desc(), F.col("tok").asc()).limit(k)


def pair_merge_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 100
) -> DataFrame:
    """Top-k adjacent token pairs by corpus frequency — the counting step of
    one BPE-style tokenizer-training merge round (the most frequent pair is
    the next merge candidate), with document frequency attached.

    Rides the shared shingle spine in bigram mode WITH multiplicity
    (``shingle_stream(n=2, distinct=False)``): one posexplode per document,
    pair assembly via lead() inside the per-doc partitioning, then a single
    map-side-combined count agg. Top-k is TakeOrderedAndProject — at 100 TB
    the pair vocabulary never undergoes a global sort, and only k rows
    reach the driver's side of the limit."""
    from .dedup import shingle_stream

    pairs = shingle_stream(docs, text_col, id_col, n=2, distinct=False).withColumnRenamed(
        "shingle", "pair"
    )
    counts = pairs.groupBy("pair").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf"),
        F.count_distinct("doc_id").cast("bigint").alias("df"),
    )
    return counts.orderBy(F.col("tf").desc(), F.col("pair").asc()).limit(k)


def source_mixing_weights(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    token_budget: int = 1_000_000,
) -> DataFrame:
    """Per-source sampling weights for corpus mixing (the multi-source
    temperature-sampling step of batch construction).

    weight_s = sqrt(tokens_s) / Σ sqrt(tokens) — temperature α=0.5
    up-weights small sources relative to proportional sampling. sqrt (not
    an arbitrary pow) because IEEE-754 requires it correctly rounded, so
    Spark and any oracle engine agree bit-for-bit. ``epochs_at_budget`` =
    how many passes over source s a ``token_budget``-token mix implies —
    the overfitting-risk signal for small high-weight sources.

    One hash agg on source + a whole-frame window over the (tiny,
    #sources-row) aggregate — the corpus-sized scan never shuffles twice.
    """
    per_source = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(tokens(text_col))).cast("bigint").alias("n_tokens"),
    )
    total = Window.partitionBy()
    weight = F.sqrt(F.col("n_tokens")) / F.sum(F.sqrt(F.col("n_tokens"))).over(total)
    return per_source.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(weight, 6).alias("mix_weight"),
        F.round(F.lit(token_budget) * weight / F.col("n_tokens"), 6).alias("epochs_at_budget"),
    )


FUNNEL_STAGES: tuple[str, ...] = ("length", "lang_allowed", "repetition", "langid_agree")
FUNNEL_ALLOWED_LANGS: tuple[str, ...] = ("en", "es", "de", "fr")


def filter_funnel(
    docs: DataFrame,
    min_chars: int = 100,
    max_chars: int = 500,
) -> DataFrame:
    """Sequential quality-gate funnel with first-fail attribution: each
    document is charged to the FIRST gate it fails (length bounds → allowed
    language → repetition via distinct-token ratio → language-ID agreement
    with the claimed ``lang``), so per-stage drop counts sum to total drops.

    Returns one row per stage: (stage_idx, stage, n_in, n_dropped, n_out).
    The corpus scan is a single pure-map pass into a 4-group count; the
    funnel arithmetic runs on the 4-row aggregate (whole-frame window over
    post-agg rows, not data).
    """
    from .text import distinct_token_ratio, predicted_lang, tokens as _toks

    toks = _toks("text")
    fails = [
        ~F.col("n_chars").between(min_chars, max_chars),
        ~F.col("lang").isin(*FUNNEL_ALLOWED_LANGS),
        distinct_token_ratio(toks) < 0.3,
        predicted_lang(toks) != F.col("lang"),
    ]
    first_fail = F.lit(len(fails))  # sentinel: passed every gate
    for idx in range(len(fails) - 1, -1, -1):
        first_fail = F.when(fails[idx], F.lit(idx)).otherwise(first_fail)
    drops = (
        docs.select(first_fail.alias("stage_idx"))
        .filter(F.col("stage_idx") < len(fails))
        .groupBy("stage_idx")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_dropped"))
    )
    spark = docs.sparkSession
    stages = spark.createDataFrame(
        list(enumerate(FUNNEL_STAGES)), "stage_idx INT, stage STRING"
    )
    total = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    prior = (
        Window.partitionBy()
        .orderBy("stage_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    funnel = (
        stages.join(drops, "stage_idx", "left")
        .withColumn("n_dropped", F.coalesce("n_dropped", F.lit(0)).cast("bigint"))
        .crossJoin(F.broadcast(total))
        .withColumn(
            "n_in",
            (F.col("n_total") - F.coalesce(F.sum("n_dropped").over(prior), F.lit(0))).cast(
                "bigint"
            ),
        )
    )
    return funnel.select(
        "stage_idx",
        "stage",
        "n_in",
        "n_dropped",
        (F.col("n_in") - F.col("n_dropped")).cast("bigint").alias("n_out"),
    )


def cluster_representatives(docs: DataFrame, groups: DataFrame) -> DataFrame:
    """Pick one surviving document per duplicate cluster (the step after
    transitive grouping: keep the best copy, drop the rest).

    ``groups`` is (doc_id, group_id) from ``connected_dup_groups``; docs
    absent from it are singletons (their own group). Representative =
    longest text, ties to the lowest doc_id — a deterministic total order.
    Implemented as ONE hash aggregation via the max-struct trick (no
    window, no second shuffle): max((n_chars, -doc_id)) picks the winner
    while count(*) rides along in the same agg.
    """
    labeled = (
        docs.select("doc_id", "n_chars")
        .join(groups, "doc_id", "left")
        .withColumn("group_id", F.coalesce("group_id", F.col("doc_id")))
    )
    best = F.max(F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("_neg")))
    return (
        labeled.groupBy("group_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            best.alias("_best"),
        )
        .select(
            "group_id",
            (-F.col("_best._neg")).cast("bigint").alias("rep_doc_id"),
            F.col("_best.n_chars").cast("bigint").alias("rep_chars"),
            "n_members",
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-k characteristic terms per document by tf·idf.

    idf = ln((N+1)/(df+1)) (smoothed, always > 0); ties broken by token so
    the ranking is total. Two keyed aggregations (per-(doc, token) tf and
    per-token df) plus one window for the per-doc top-k — the window's
    rank-filter prunes map-side via WindowGroupLimit when k is a literal.
    N rides in as a broadcast 1-row aggregate, not a driver-side collect.
    """
    ex = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("tok"))
        .filter(F.col("tok") != "")
    )
    tf = ex.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    scored = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1).cast("double") / (F.col("df") + 1)),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "tok", "tf", "df", "tfidf")
    )


def source_overlap_matrix(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Cross-source duplication matrix: for each (unordered) source pair,
    how many near-dup document pairs straddle it — the "which feeds are
    re-hosting each other" curation signal that decides source-level drops
    before doc-level dedup even runs.

    ``pairs`` is (doc1, doc2, ...) from any dedup-family generator. Two
    broadcast-sized joins attach sources (the doc→source map is narrow);
    sources are sorted within the pair so A↔B and B↔A accumulate together.
    """
    src = docs.select("doc_id", "source")
    labeled = (
        pairs.join(src.withColumnRenamed("doc_id", "doc1").withColumnRenamed("source", "_s1"), "doc1")
        .join(src.withColumnRenamed("doc_id", "doc2").withColumnRenamed("source", "_s2"), "doc2")
    )
    return (
        labeled.select(
            F.least("_s1", "_s2").alias("source_a"),
            F.greatest("_s1", "_s2").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_dup_pairs"))
    )


def unigram_logprob_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document mean unigram log-probability — the cheap perplexity
    proxy: docs whose tokens are globally rare (garbled text, wrong-language
    fragments, binary spew) score very negative and get filtered.

    p(tok) = tf_corpus / total_tokens over the corpus itself (add-nothing
    MLE; every observed token has tf ≥ 1 so log is finite). The token→tf
    join shuffles the token stream by token here (exact, general); at
    100 TB swap in ``F.broadcast(tf)`` when the vocabulary fits executor
    memory (it usually does — vocab grows ~sublinearly in corpus size), or
    pre-stage tf as a bucketed table — the expression layer is unchanged
    either way. Per-token
    log-probs are rounded to 9 dp and summed as DECIMAL — floating-point
    addition is order-dependent and a corpus-sized sum would drift across
    engines, while the decimal sum is exact, so the score is reproducible
    bit-for-bit on any engine/partitioning (same convention as the decimal
    revenue sums in the relational tier).
    """
    ex = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("tok"))
        .filter(F.col("tok") != "")
    )
    tf = ex.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    total = tf.agg(F.sum("tf").cast("bigint").alias("n_total"))
    logp = (
        F.round(F.log(F.col("tf").cast("double") / F.col("n_total")), 9)
        .cast("decimal(18,9)")
        .alias("logp")
    )
    scored = ex.join(tf, "tok").crossJoin(F.broadcast(total)).select("doc_id", logp)
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.round((F.sum("logp") / F.count(F.lit(1))).cast("double"), 6).alias("mean_logprob"),
    )


def sampling_manifest(
    docs: DataFrame,
    token_budget: int = 10_000,
    text_col: str = "text",
    source_col: str = "source",
    salt: str = "sample_v1",
) -> DataFrame:
    """Turn temperature mixing weights into an actual sampled corpus:
    per-source acceptance rate = min(1, budget·w_s / tokens_s), membership
    decided by a salted hash bucket per document (NOT rand() — the manifest
    is a pure function of doc_id, identical on any engine, cluster size, or
    re-run, so a resumed/backfilled job samples the same corpus).

    One corpus pass builds (doc, source, tokens, bucket); per-source totals
    broadcast back (the source table is tiny); the filter is map-side.
    Returns per-source fill stats — the audit table a sampling job emits.
    """
    from .text import token_hash32

    per_doc = docs.select(
        F.col("doc_id"),
        F.col(source_col).alias("source"),
        F.size(tokens(text_col)).alias("n_tok"),
        F.pmod(
            token_hash32(F.concat(F.lit(salt + "_"), F.col("doc_id").cast("string"))),
            F.lit(1_000_000),
        ).alias("bucket"),
    )
    per_source = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
    )
    total = Window.partitionBy()
    weight = F.sqrt(F.col("n_tokens")) / F.sum(F.sqrt(F.col("n_tokens"))).over(total)
    rates = per_source.select(
        "source",
        "n_docs",
        F.least(F.lit(1.0), F.lit(token_budget) * weight / F.col("n_tokens")).alias("rate"),
    )
    joined = per_doc.join(F.broadcast(rates), "source")
    return (
        joined.groupBy("source", "n_docs", "rate")
        .agg(
            F.count(F.when(F.col("bucket") < F.col("rate") * 1_000_000, 1))
            .cast("bigint")
            .alias("n_sampled"),
            F.coalesce(
                F.sum(
                    F.when(F.col("bucket") < F.col("rate") * 1_000_000, F.col("n_tok"))
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_tokens_sampled"),
        )
        .select(
            "source",
            "n_docs",
            F.round(F.col("rate"), 6).alias("rate"),
            "n_sampled",
            "n_tokens_sampled",
        )
    )


def dedup_effective_stats(
    docs: DataFrame, groups: DataFrame, source_col: str = "source"
) -> DataFrame:
    """Per-source corpus accounting AFTER keep-best dedup: how many
    documents (and characters) each source actually contributes once every
    near-dup cluster collapses to its representative — the "what did dedup
    cost each feed" audit. A doc survives iff it is its cluster's
    representative (clusters may span sources, so a rep in one source can
    eliminate copies in another).

    Reuses ``cluster_representatives``; the survivor set is a narrow id
    join back to the corpus, then one groupBy(source).
    """
    reps = cluster_representatives(docs, groups).select(
        F.col("rep_doc_id").alias("doc_id"), F.lit(1).alias("_kept")
    )
    labeled = docs.select("doc_id", F.col(source_col).alias("source"), "n_chars").join(
        reps, "doc_id", "left"
    )
    kept = F.col("_kept").isNotNull()
    return labeled.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count(F.when(kept, 1)).cast("bigint").alias("n_kept"),
        F.count(F.when(~kept, 1)).cast("bigint").alias("n_dropped"),
        F.coalesce(F.sum(F.when(kept, F.col("n_chars"))), F.lit(0))
        .cast("bigint")
        .alias("chars_kept"),
        F.coalesce(F.sum(F.when(~kept, F.col("n_chars"))), F.lit(0))
        .cast("bigint")
        .alias("chars_dropped"),
    )


def quality_verdicts(
    docs: DataFrame,
    min_tokens: int = 10,
    max_tokens: int = 1000,
    min_avg_word: float = 2.0,
    max_avg_word: float = 12.0,
    min_stopword: float = 0.02,
    min_distinct: float = 0.3,
    max_symbol: float = 0.1,
) -> DataFrame:
    """Per-document boolean rule battery (Gopher/C4-style keep/drop
    verdicts) — the row-level companion to :func:`filter_funnel`'s
    corpus-level first-fail attribution. Downstream jobs filter on ``keep``
    or slice per-rule false columns for drop forensics.

    Pure map over the corpus: every rule is a column expression on one
    tokenizer pass, no shuffle, no UDF — the whole battery fuses into the
    scan stage at any scale.
    """
    from .text import distinct_token_ratio, stopword_ratio, tokens as _toks

    c = F.col("text")
    toks = _toks(c)
    n_tok = F.size(toks)
    nonspace = F.length(F.regexp_replace(F.lower(F.trim(c)), r"\s+", ""))
    avg_word = nonspace.cast("double") / F.greatest(n_tok, F.lit(1))
    symbols = F.length(F.regexp_replace(F.lower(F.trim(c)), r"[a-z0-9\s]", ""))
    symbol_ratio = symbols.cast("double") / F.greatest(F.length(c), F.lit(1))
    rules = {
        "r_token_count": (n_tok >= min_tokens) & (n_tok <= max_tokens),
        "r_avg_word_len": (avg_word >= min_avg_word) & (avg_word <= max_avg_word),
        "r_stopword": stopword_ratio(toks) >= min_stopword,
        "r_distinct_tokens": distinct_token_ratio(toks) >= min_distinct,
        "r_symbol_ratio": symbol_ratio <= max_symbol,
    }
    keep = None
    for expr in rules.values():
        keep = expr if keep is None else (keep & expr)
    return docs.select(
        "doc_id",
        *[expr.alias(name) for name, expr in rules.items()],
        keep.alias("keep"),
    )


def bigram_logprob_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document mean bigram log-probability with add-1 smoothing —
    the stronger perplexity proxy: unigram scoring only sees rare WORDS,
    bigram scoring also flags rare SEQUENCES (shuffled text, boilerplate
    keyword stuffing, wrong-order spans) whose individual tokens are
    common. log p(w2|w1) = log((c(w1,w2)+1) / (c(w1)+V)).

    Bigram pairs come from slicing each doc's own token array
    (``arrays_zip(t[0:n-1], t[1:n-1])``) — a pure map stage, no
    positional self-join. Count joins shuffle the pair stream by its key;
    at 100 TB broadcast the count tables when the vocabulary fits (it
    usually does). Per-pair log-probs round to 9 dp and sum as DECIMAL —
    the engine/partitioning-exact convention of the unigram scorer.
    Documents with fewer than two tokens have no bigrams and drop out.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(tokens(text_col), lambda t: t != "").alias("t"),
    )
    n = F.size(F.col("t"))
    prs = base.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("t"), 1, F.greatest(n - 1, F.lit(0))),
                F.expr("slice(t, 2, greatest(size(t) - 1, 0))"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
    big = prs.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    ex = base.select(F.explode("t").alias("tok"))
    uni = ex.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    vocab = ex.agg(F.countDistinct("tok").cast("bigint").alias("V"))
    logp = (
        F.round(
            F.log((F.col("c12") + 1).cast("double") / (F.col("c1") + F.col("V"))), 9
        )
        .cast("decimal(18,9)")
        .alias("logp")
    )
    scored = (
        prs.join(big, ["w1", "w2"])
        .join(uni.withColumnRenamed("tok", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", logp)
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round((F.sum("logp") / F.count(F.lit(1))).cast("double"), 6).alias(
            "mean_bigram_logprob"
        ),
    )


def kn_bigram_logprob_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Per-document mean bigram log-probability under an ABSOLUTE-
    DISCOUNT Kneser–Ney model trained on the corpus itself — the
    standard LM-quality filter one notch above :func:`bigram_logprob_
    scores`' add-1 smoothing: add-1 over-penalizes bigrams with frequent
    first tokens, while KN redistributes exactly ``discount`` mass per
    seen successor and backs off to the CONTINUATION unigram (how many
    distinct contexts a word follows — the "san francisco" insight:
    "francisco" is frequent but follows almost nothing).

        p(w2|w1) = max(c(w1w2) − D, 0)/ch(w1)
                 + (D·N1+(w1·)/ch(w1)) · N1+(·w2)/N1+(··)

    with ch(w1) = Σ_w2 c(w1w2) (history counts, so rows at document ends
    never leak into denominators) and D = ``discount``.

    Scale shape: the corpus tokenizes ONCE behind a lazy lineage cut;
    bigrams come from the arrays_zip slice (pure map stage); the three
    count relations (pair, history, continuation) are one groupBy each
    off the SAME pair stream, and the scoring joins shuffle the pair
    stream by its keys — broadcast the vocab-sized history/continuation
    tables at 100 TB. Scoring the training corpus keeps every scored
    bigram seen, so p > 0 with no epsilon.

    Determinism: counts are exact LONGs; p is ONE fixed-shape double
    expression; per-pair ln rounds to 9 dp and DECIMAL-sums (the module
    convention). Docs with fewer than two non-empty tokens emit
    (n_bigrams = 0, NULL mean/ppl) via a doc-grain left join — the
    Pettitt one-row-per-key lesson. Returns (doc_id, n_bigrams,
    mean_kn_logprob, kn_perplexity)."""
    if not 0 < discount < 1:
        raise ValueError("kn_bigram_logprob_scores needs 0 < discount < 1")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(tokens(text_col), lambda t: t != "").alias("t"),
    ).transform(lineage_cut)
    n = F.size(F.col("t"))
    prs = base.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("t"), 1, F.greatest(n - 1, F.lit(0))),
                F.expr("slice(t, 2, greatest(size(t) - 1, 0))"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
    big = prs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c12")
    ).transform(lineage_cut)
    hist = big.groupBy("w1").agg(
        F.sum("c12").cast("bigint").alias("ch"),
        F.count(F.lit(1)).cast("bigint").alias("n1f"),
    )
    cont = big.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("n1b"))
    nbb = big.agg(F.count(F.lit(1)).cast("bigint").alias("B"))
    d = F.lit(float(discount))
    p = (
        F.greatest(F.col("c12").cast("double") - d, F.lit(0.0))
        / F.col("ch").cast("double")
        + (d * F.col("n1f").cast("double") / F.col("ch").cast("double"))
        * (F.col("n1b").cast("double") / F.col("B").cast("double"))
    )
    logp = F.round(F.log(p), 9).cast("decimal(18,9)").alias("logp")
    scored = (
        prs.join(big, ["w1", "w2"])
        .join(hist, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(nbb))
        .select("doc_id", logp)
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("logp").alias("_slp"),
    )
    grain = base.select("doc_id")
    # double-divide (NOT decimal-divide) so both engines share the shape
    avg = F.col("_slp").cast("double") / F.col("n_bigrams").cast("double")
    return grain.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias("n_bigrams"),
        F.round(avg, 6).alias("mean_kn_logprob"),
        F.round(F.exp(-avg), 6).alias("kn_perplexity"),
    )


def decontamination_source_attribution(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    n: int = 3,
    salt: str = "split_v1",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """WHERE the leakage comes from: per (eval split, train source), the
    volume of eval-document shingles that also appear in that train
    source's shingle vocabulary.

    :func:`decontamination_overlap` answers *how contaminated* each eval
    doc is; this answers *which train feeds to quarantine first* — the
    actionable half of the audit a curation team runs before re-pulling a
    source. A shingle present in several train sources is attributed to
    each (the quarantine decision is per source, so shared phrases count
    against every source that carries them).

    Scale shape: the train side collapses to a DISTINCT (shingle_hash,
    source) relation — narrow (one long + one low-cardinality string per
    row, ~#sources × the plain shingle set in the worst case) — and the
    join is hash-partitioned on the shingle hash, exactly the
    decontamination_overlap spine. The eval side is a few percent of the
    corpus by construction. No all-pairs anywhere.

    Returns (split, train_source, n_hits, n_eval_docs, n_shingles):
    occurrence hits, distinct eval docs touched, distinct shingles shared.
    """
    from .dedup import shingle_stream

    assigned = split_assign(
        docs, id_col=id_col, salt=salt, train_pct=train_pct, val_pct=val_pct
    )
    stream = shingle_stream(assigned, text_col, id_col, n)
    sided = stream.join(
        assigned.select(
            F.col(id_col).alias("doc_id"), "split", F.col(source_col).alias("_src")
        ),
        "doc_id",
    )
    train_dict = (
        sided.filter(F.col("split") == "train")
        .select(F.xxhash64("shingle").alias("shingle_h"), F.col("_src").alias("train_source"))
        .distinct()
    )
    ev = sided.filter(F.col("split") != "train").select(
        "doc_id", "split", F.xxhash64("shingle").alias("shingle_h")
    )
    return (
        ev.join(train_dict, "shingle_h")
        .groupBy("split", "train_source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.countDistinct("doc_id").cast("long").alias("n_eval_docs"),
            F.countDistinct("shingle_h").cast("long").alias("n_shingles"),
        )
    )


def dedup_quality_bias(
    docs: DataFrame,
    groups: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "group_id",
) -> DataFrame:
    """Does near-duplication correlate with document quality? Per
    dup-group-size band — 'unique' (no near-dup), 'pair' (group of 2),
    'cluster' (3+) — the mean quality-filter features of the member docs.

    The audit a curation team runs before deciding keep-one-per-group
    policy: if large dup clusters skew low-quality (boilerplate, spam
    farms), aggressive dedup doubles as a quality filter; if they skew
    high-quality (popular reference texts), keep-one needs a
    quality-aware representative choice (see cluster_representatives).

    ``groups`` is a (doc_id, group_id) relation covering only docs that
    near-dup with something (connected_dup_groups output); docs absent
    from it band as 'unique' via a left join. Contract: one row per doc —
    a malformed multi-group relation is reduced DETERMINISTICALLY (min
    group per doc) before anything else, so the left join can never fan
    the corpus out and the band counts always partition it (same rule as
    leakage_safe_split, ADVICE r11). Group sizes come from one hash agg
    on the (narrow) reduced relation; the corpus is scanned once for the
    per-doc features. Means fold through DECIMAL(10,6) sums (registry
    convention — order-independent, cross-engine exact).
    """
    from .text import distinct_token_ratio, tokens as _toks

    g = (
        groups.select(F.col(id_col).alias("doc_id"), group_col)
        .groupBy("doc_id")
        .agg(F.min(group_col).alias(group_col))
        # The group relation feeds BOTH the size agg and the corpus join;
        # cut the lineage once so an expensive upstream (iterative CC) is
        # computed once, not per consumer (house shared-subtree rule).
        .transform(lineage_cut)
    )
    sizes = g.groupBy(group_col).agg(F.count(F.lit(1)).alias("_gsz"))
    labeled = (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
        .join(g, "doc_id", "left")
        .join(sizes, group_col, "left")
    )
    band = (
        F.when(F.col("_gsz").isNull(), F.lit("unique"))
        .when(F.col("_gsz") == 2, F.lit("pair"))
        .otherwise(F.lit("cluster"))
    )
    toks = _toks("_t")
    featured = labeled.select(
        band.alias("band"),
        F.col(group_col),
        F.size(toks).cast("long").alias("_ntok"),
        F.round(distinct_token_ratio(toks), 6).cast("decimal(10,6)").alias("_dtr"),
        F.length("_t").cast("long").alias("_nch"),
    )
    n = F.count(F.lit(1))
    return featured.groupBy("band").agg(
        n.cast("long").alias("n_docs"),
        F.countDistinct(group_col).cast("long").alias("n_groups"),
        F.round(F.sum("_ntok").cast("double") / n, 6).alias("mean_tokens"),
        F.round(F.sum("_dtr").cast("double") / n, 6).alias("mean_distinct_ratio"),
        F.round(F.sum("_nch").cast("double") / n, 6).alias("mean_chars"),
    )


def token_budget_schedule(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    budget_factor: float = 2.0,
    max_epochs: float = 2.0,
) -> DataFrame:
    """Exact water-filling token allocation across sources under a repeat
    cap — the step after :func:`source_mixing_weights` that turns mixing
    weights into an actually-runnable sampling schedule.

    Target: allocate a budget B = ``budget_factor`` × total corpus tokens
    proportionally to the temperature weights w_s = sqrt(tokens_s)/Σsqrt,
    but never schedule any source past ``max_epochs`` passes (the
    overfitting cap small high-weight sources would otherwise blow
    through). The optimum is the classic water-filling solution
    alloc_s = min(cap_s, λ·w_s) with λ chosen so Σ alloc = B (or every
    source capped when B exceeds Σ cap).

    λ is found in CLOSED FORM, not iteratively: sort sources by
    r_s = cap_s/w_s (monotone in tokens_s, so the sort key is the exact
    BIGINT token count), and for each boundary "first k sources capped"
    solve λ_k = (B − Σ_{j≤k} cap_j)/Σ_{j>k} w_j; exactly one bracket
    r_k ≤ λ_k ≤ r_{k+1} holds (f(λ) = Σ min(cap, λw) is continuous and
    increasing). All of it runs as window functions over the per-source
    aggregate — a #sources-row frame, so the whole-frame windows are
    bounded by construction and the corpus is scanned exactly once.

    Returns per source: doc/token counts, mix_weight, cap_tokens,
    alloc_tokens, epochs (= alloc/tokens), capped flag, and budget_fill
    (= Σ alloc / B, < 1 only when every source hit its cap).

    Assumes every source has ≥1 token (a zero-token source has no
    defined temperature weight; filter empty docs upstream — the filter
    funnel's length gate — before scheduling).
    """
    per_source = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(tokens(text_col))).cast("long").alias("n_tokens"),
    )
    whole = Window.partitionBy()
    ordered = Window.partitionBy().orderBy("n_tokens", "source")
    budget = F.lit(budget_factor) * F.sum("n_tokens").over(whole)
    weight = F.sqrt(F.col("n_tokens")) / F.sum(F.sqrt(F.col("n_tokens"))).over(whole)
    cap = F.lit(max_epochs) * F.col("n_tokens")
    staged = per_source.select(
        "source", "n_docs", "n_tokens",
        budget.alias("_b"), weight.alias("_w"), cap.alias("_cap"),
        (cap / weight).alias("_r"),
    )
    c_prev = F.coalesce(
        F.sum("_cap").over(ordered.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0.0)
    )
    sw = F.sum("_w").over(ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    lam = (F.col("_b") - c_prev) / sw
    r_prev = F.lag("_r").over(ordered)
    valid = (lam <= F.col("_r")) & (r_prev.isNull() | (r_prev <= lam))
    bracketed = staged.select(
        "*", F.when(valid, lam).alias("_lam_k")
    )
    lam_star = F.min("_lam_k").over(whole)
    alloc = F.when(lam_star.isNull(), F.col("_cap")).otherwise(
        F.least(F.col("_cap"), lam_star * F.col("_w"))
    )
    alloc_d = F.round(alloc, 2).cast("decimal(18,2)")
    return bracketed.select(
        "source", "n_docs", "n_tokens",
        F.round("_w", 6).alias("mix_weight"),
        F.round("_cap", 2).alias("cap_tokens"),
        F.round(alloc, 2).alias("alloc_tokens"),
        F.round(alloc / F.col("n_tokens"), 6).alias("epochs"),
        (lam_star.isNull() | (F.col("_r") <= lam_star)).alias("capped"),
        F.round(F.sum(alloc_d).over(whole).cast("double") / F.col("_b"), 6).alias(
            "budget_fill"
        ),
    )


def ngram_novelty_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-document novelty: the fraction of its distinct n-gram shingles
    whose FIRST corpus appearance (min doc_id) is this document — the
    curriculum/ordering signal ("how much does doc k add that docs < k
    didn't already say"). A fully-boilerplate late document scores ~0;
    the corpus's first document scores exactly 1.

    Two hash shuffles over the narrow shingle-hash stream: min(doc_id)
    per shingle, join back, per-doc rollup. The shingle relation is one
    long + one long per row — the corpus text never re-shuffles.

    Documents shorter than ``n`` tokens have no shingles and no row in
    the output (nothing to grade — mirrored exactly by the oracle's
    empty generate_series).
    """
    from .dedup import shingle_stream

    stream = shingle_stream(docs, text_col, id_col, n).select(
        "doc_id", F.xxhash64("shingle").alias("shingle_h")
    )
    first_seen = stream.groupBy("shingle_h").agg(F.min("doc_id").alias("_first"))
    return (
        stream.join(first_seen, "shingle_h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum((F.col("_first") == F.col("doc_id")).cast("long"))
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(F.col("n_novel").cast("double") / F.col("n_shingles"), 6).alias(
                "novelty_ratio"
            ),
        )
    )


def contamination_weighted_mixing(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Mixing weights with a leakage penalty: down-weight train sources in
    proportion to their share of eval-set contamination, then
    renormalize — the curation action :func:`decontamination_source_attribution`
    exists to inform, closed into one schedule.

    adj_weight_s ∝ mix_weight_s × (1 − hits_s / Σhits); sources with no
    attributed hits keep their temperature weight (penalty 0). The
    attribution spine is the corpus-scale work; the reweighting is
    whole-frame window math over the #sources-row aggregate.
    """
    from .text import tokens as _toks

    attr = decontamination_source_attribution(
        docs, text_col=text_col, id_col=id_col, source_col=source_col
    )
    hits = attr.groupBy(F.col("train_source").alias("source")).agg(
        F.sum("n_hits").cast("long").alias("n_hits")
    )
    per_source = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(_toks(text_col))).cast("long").alias("n_tokens"),
    )
    whole = Window.partitionBy()
    joined = per_source.join(hits, "source", "left").withColumn(
        "n_hits", F.coalesce("n_hits", F.lit(0))
    )
    weight = F.sqrt(F.col("n_tokens")) / F.sum(F.sqrt(F.col("n_tokens"))).over(whole)
    # Zero-contamination corpus: share 0 everywhere (not NULL/NaN from 0/0).
    share = F.coalesce(
        F.col("n_hits").cast("double")
        / F.nullif(F.sum("n_hits").over(whole), F.lit(0)).cast("double"),
        F.lit(0.0),
    )
    adj_raw = weight * (F.lit(1.0) - share)
    return joined.select(
        "source",
        "n_tokens",
        "n_hits",
        F.round(weight, 6).alias("mix_weight"),
        F.round(share, 6).alias("contamination_share"),
        F.round(adj_raw / F.sum(adj_raw).over(whole), 6).alias("adj_weight"),
    )


def quality_drift_by_source(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Which feed is degrading: per source, the Jensen–Shannon divergence
    of its quality-gate distribution against the whole corpus — the
    per-source refinement of the corpus-level drift rim
    (``quality/monitors.py::js_divergence``), read weekly by a curation
    team to catch a source whose quality profile shifts before it
    pollutes the mix.

    The category is the INTEGER number of passed quality gates (0-3:
    length in [10, 1000] tokens, stopword ratio in [0.05, 0.6], distinct
    ratio ≥ 0.3 — exactly the composite quality_score × 3), so the
    category key is exact on every engine (no double→string formatting
    hazard). Each source's P is compared against the corpus-wide Q
    (which includes the source itself — the standard member-vs-whole
    drift convention; a small source can never look drifted merely
    because the rest moved without it).

    One corpus scan map-reduces to (source, gates) counts; the grid is
    sources × gate-levels (bounded: ≤ 4·#sources rows) built by a
    broadcast cross of two tiny aggregates. JSD terms follow the
    registry determinism recipe: each p·ln(p/m) rounded to 9 dp, summed
    as DECIMAL(28,9), one double division at the end.

    Returns (source, n_docs, n_categories, jsd_nats, jsd_bits, status).
    """
    import math as _math

    toks = tokens(text_col)
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin("the", "a", "of", "and", "to", "in", "is", "on", "for", "with"))
    )
    ntok = F.size(toks)
    sw = stop_hits.cast("double") / F.greatest(ntok, F.lit(1))
    dr = F.size(F.array_distinct(toks)).cast("double") / F.greatest(ntok, F.lit(1))
    gates = (
        ntok.between(10, 1000).cast("int")
        + (sw >= 0.05).cast("int") * (sw <= 0.6).cast("int")
        + (dr >= 0.3).cast("int")
    )
    scored = docs.select(F.col(source_col).alias("source"), gates.alias("gates"))
    per_sc = scored.groupBy("source", "gates").agg(
        F.count(F.lit(1)).cast("long").alias("_a")
    )
    per_cat = scored.groupBy("gates").agg(F.count(F.lit(1)).cast("long").alias("_b"))
    sources = scored.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("_n"))
    grid = sources.crossJoin(F.broadcast(per_cat))
    cells = grid.join(per_sc, ["source", "gates"], "left").withColumn(
        "_a", F.coalesce("_a", F.lit(0))
    )
    w_src = Window.partitionBy("source")
    na = F.col("_n").cast("double")
    nb = F.sum("_b").over(w_src).cast("double")
    p = F.col("_a").cast("double") / na
    q = F.col("_b").cast("double") / nb
    m = (p + q) / F.lit(2.0)
    t_p = F.when(
        F.col("_a") > 0, F.round(p * F.log(p / m), 9).cast("decimal(28,9)")
    ).otherwise(F.lit(0).cast("decimal(28,9)"))
    t_q = F.round(q * F.log(q / m), 9).cast("decimal(28,9)")  # _b > 0 by grid
    agg = (
        cells.select("source", F.col("_n"), t_p.alias("_tp"), t_q.alias("_tq"))
        .groupBy("source")
        .agg(
            F.max("_n").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_categories"),
            F.sum("_tp").alias("_stp"),
            F.sum("_tq").alias("_stq"),
        )
    )
    jsd = (F.col("_stp").cast("double") + F.col("_stq").cast("double")) / F.lit(2.0)
    bits = jsd / F.lit(_math.log(2.0))
    status = (
        F.when(bits < 0.05, "stable")
        .when(bits < 0.2, "moderate_shift")
        .otherwise("major_shift")
    )
    return agg.select(
        "source",
        "n_docs",
        "n_categories",
        F.round(jsd, 6).alias("jsd_nats"),
        F.round(bits, 6).alias("jsd_bits"),
        status.alias("status"),
    )
