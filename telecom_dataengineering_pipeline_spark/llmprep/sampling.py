"""Deterministic dataset splitting and stratified sampling.

Training-data pipelines need split assignment that is (a) stable across
runs and cluster sizes — no ``rand()``, which reshuffles with partitioning —
and (b) a pure map over the id: train/val/test membership is a function of
``md5(salt || id)``, so any engine (and any re-run over late-arriving data)
agrees on every row's split. Stratified sampling ranks rows per stratum by
the same deterministic hash, giving a reproducible "random" top-k per group
with one shuffle (the window partition).

Scale: split assignment is shuffle-free; stratified sampling shuffles once
on the stratum key, and the rank-filter prunes map-side via
WindowGroupLimit when k is a literal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import token_hash32


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "split_v1",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Adds ``split_bucket`` (0..99) and ``split`` (train/val/test)."""
    bucket = F.pmod(
        token_hash32(F.concat(F.lit(salt + "_"), F.col(id_col).cast("string"))),
        F.lit(100),
    ).cast("int")
    return df.withColumn("split_bucket", bucket).withColumn(
        "split",
        F.when(F.col("split_bucket") < train_pct, F.lit("train"))
        .when(F.col("split_bucket") < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def stratified_sample_flag(
    df: DataFrame,
    stratum_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "sample_v1",
) -> DataFrame:
    """Adds ``sampled`` — true for a deterministic pseudo-random k rows per
    stratum (hash order, id tie-break)."""
    h = token_hash32(F.concat(F.lit(salt + "_"), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(id_col).asc())
    return df.withColumn("sampled", F.row_number().over(w) <= k)


def shuffle_manifest(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuffle_v1",
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic global training-order shuffle, expressed as a sharded
    manifest: (id, shard, pos_in_shard).

    A literal global ``row_number`` would funnel the corpus through ONE
    window partition; instead the hash splits the corpus into ``n_shards``
    independent pseudo-random shards and each shard orders internally by the
    same hash — the layout training jobs actually consume (one input shard
    per reader, deterministic order within). Scale knob: n_shards rises with
    corpus size (100 TB → thousands), keeping every window partition
    bounded; assignment and order are functions of md5(salt || id) so every
    engine and every re-run agrees.
    """
    h = token_hash32(F.concat(F.lit(salt + "_"), F.col(id_col).cast("string")))
    shard = F.pmod(h, F.lit(n_shards)).cast("int")
    with_keys = df.select(F.col(id_col), h.alias("_h"), shard.alias("shard"))
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return with_keys.select(
        id_col,
        "shard",
        F.row_number().over(w).cast("long").alias("pos_in_shard"),
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "wsample_v1",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis 2006): each row gets priority ``u^(1/w)`` with ``u`` a
    hash-derived uniform in (0,1); the k highest priorities are a true
    weight-proportional sample. The reservoir algorithm's streaming form
    degenerates on Spark to exactly this top-k — which runs as
    TakeOrderedAndProject (per-partition heads, no global sort), so the
    sample costs one scan at any corpus size. No ``rand()``: the priority
    is a pure function of (salt, id, weight), so re-runs, engines, and
    late-arriving re-ingests agree on the sample. Rows with
    non-positive weight are excluded (zero mass)."""
    u = (
        token_hash32(F.concat(F.lit(salt + "_"), F.col(id_col).cast("string"))) + 1
    ).cast("double") / F.lit(float(2**32 + 1))
    w = F.col(weight_col).cast("double")
    pri = F.pow(u, F.lit(1.0) / w)
    return (
        df.filter(w > 0)
        .withColumn("priority", pri)
        .orderBy(F.col("priority").desc(), F.col(id_col).asc())
        .limit(k)
    )


def capped_sample_per_key(
    df: DataFrame,
    key_col: str,
    n_per_key: int,
    id_col: str = "doc_id",
    salt: str = "cap",
    engine_neutral_hash: bool = False,
) -> DataFrame:
    """Keep at most ``n_per_key`` rows per key, chosen DETERMINISTICALLY
    by hash priority — the domain-cap guard every web-scale corpus build
    applies so no single source dominates the mixture (and the
    per-entity cap under GDPR-style data-minimization budgets). No
    ``rand()``: the priority is a salted hash of the row id, so reruns,
    retries, and different partitionings all keep the SAME rows.

    One partitioned window per key (keys are the partition — never a
    global window) with a row_number cap; skewed giant keys are exactly
    the rows being cut, and WindowGroupLimit pushes the top-n filter
    map-side before the shuffle on modern Spark.

    ``engine_neutral_hash=True`` swaps the xxhash64 priority for the
    md5-derived 32-bit hash (``token_hash32``) any SQL engine reproduces
    — same determinism contract, used by the cross-engine value gate;
    the default stays on the cheaper JVM xxhash64 spine."""
    if n_per_key < 1:
        raise ValueError("capped_sample_per_key needs n_per_key >= 1")
    if engine_neutral_hash:
        from .text import token_hash32

        pri = token_hash32(
            F.concat(F.lit(salt + "_"), F.col(id_col).cast("string"))
        )
    else:
        pri = F.xxhash64(
            F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))
        )
    w = Window.partitionBy(key_col).orderBy(pri.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_key)
        .drop("_rn")
    )


def stratified_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    total_n: int,
) -> DataFrame:
    """Stratified-sample design table — before drawing a sample, decide
    how many units each stratum GETS: proportional allocation
    (n_h ∝ N_h) and Neyman allocation (n_h ∝ N_h·σ_h — oversample the
    volatile strata, the variance-optimal design). The planning
    companion to the drawing operators in this module (hash-priority
    sampling executes a design; this computes one).

    Both allocations integerize by largest remainder (exact total
    preserved; quota ties break on the stratum name), so Σ alloc =
    ``total_n`` exactly in both engines.

    Scale shape: one stratum-keyed map-side-combined aggregate (N, Σv,
    Σv² per stratum) collapses the population; every derived column —
    shares, quotas, remainder ranks — folds over the |strata| relation
    in one window partitioning. The population is touched once.

    Determinism: counts/sums are exact DECIMALs; σ_h is a fixed-shape
    double from the exact sums (rounded to 9 before the Neyman weight
    products); floors and remainder ranks are integer-exact. NULL
    values are excluded from σ but still counted in N_h (allocation is
    about population size; pass a complete-case relation to change
    that). Returns one row per stratum: (stratum, n_pop, sd,
    alloc_proportional, alloc_neyman)."""
    if total_n < 1:
        raise ValueError("stratified_allocation needs total_n >= 1")
    g = F.coalesce(F.col(stratum_col).cast("string"), F.lit("__null__"))
    v = F.col(value_col).cast("decimal(24,6)")
    cells = df.select(g.alias("stratum"), v.alias("_v")).groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("n_pop"),
        F.count("_v").cast("long").alias("_nv"),
        F.sum("_v").alias("_s"),
        F.sum(F.col("_v") * F.col("_v")).alias("_ss"),
    )
    nv = F.col("_nv").cast("double")
    s, ss = F.col("_s").cast("double"), F.col("_ss").cast("double")
    sd = F.when(
        F.col("_nv") > 1,
        F.sqrt(
            F.greatest(F.lit(0.0), (ss - s * s / nv) / (nv - F.lit(1.0)))
        ),
    ).otherwise(F.lit(0.0))
    cells = cells.withColumn("_sd", F.round(sd, 9))
    w = Window.partitionBy()
    cells = cells.withColumn("_tot", F.sum("n_pop").over(w).cast("long")).withColumn(
        "_wsum",
        F.sum(
            F.round(F.col("n_pop").cast("double") * F.col("_sd"), 9).cast(
                "decimal(28,9)"
            )
        ).over(w),
    )

    def _largest_remainder(quota: "F.Column", tag: str) -> "F.Column":
        base = F.floor(quota).cast("long")
        rem = quota - base.cast("double")
        wrem = Window.orderBy(F.round(rem, 9).desc(), F.col("stratum").asc())
        short = (F.lit(total_n) - F.sum(base).over(w)).cast("long")
        rk = F.row_number().over(wrem).cast("long")
        return (base + F.when(rk <= short, 1).otherwise(0)).cast("long").alias(tag)

    quota_p = (
        F.lit(float(total_n))
        * F.col("n_pop").cast("double")
        / F.col("_tot").cast("double")
    )
    wgt = F.round(F.col("n_pop").cast("double") * F.col("_sd"), 9)
    quota_n = F.when(
        F.col("_wsum").cast("double") > 0,
        F.lit(float(total_n)) * wgt / F.col("_wsum").cast("double"),
    ).otherwise(quota_p)
    out = cells.select(
        "stratum",
        "n_pop",
        F.round(F.col("_sd"), 6).alias("sd"),
        _largest_remainder(quota_p, "alloc_proportional"),
        _largest_remainder(quota_n, "alloc_neyman"),
    )
    return out


def leakage_safe_split(
    df: DataFrame,
    groups: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "group_id",
    salt: str = "split_v1",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Split assignment that cannot leak near-duplicates across the
    train/eval boundary: the bucket is a pure function of
    ``md5(salt || group_id)`` — the doc's dup-group representative (from
    :func:`~..dedup.connected_dup_groups` /
    ``entity_resolution_clusters``; the doc's own id for docs outside
    ``groups``) — so every member of a duplicate cluster lands in the
    SAME split. A per-doc hash split sends ~2·p·(1−p) of every dup pair
    across the train/eval boundary (exactly the contamination
    ``decontamination_overlap`` exists to catch after the fact); keying
    the hash by the group prevents it by construction. Same bucket
    formula as :func:`split_assign`, so singletons' assignments are
    IDENTICAL to the per-doc split — only clustered docs move (onto
    their representative's bucket).

    Scale shape: one left join of the corpus against the
    ``(doc_id, group_id)`` relation — pair-derived, far smaller than the
    corpus; broadcast when it fits, shuffle equi-join otherwise (AQE's
    call) — then the same shuffle-free bucket map as
    :func:`split_assign`. Adds ``split_bucket`` and ``split``.

    ``groups`` contract: one row per doc. A malformed multi-group
    relation is reduced DETERMINISTICALLY (min group per doc) before the
    join, so output cardinality always equals input cardinality — the
    left join can never fan the corpus out (ADVICE r11)."""
    g = (
        groups.select(
            F.col(id_col).alias("__grp_doc"), F.col(group_col).alias("__grp")
        )
        .groupBy("__grp_doc")
        .agg(F.min("__grp").alias("__grp"))
    )
    joined = df.join(g, df[id_col] == g["__grp_doc"], "left").drop("__grp_doc")
    anchor = F.coalesce(F.col("__grp"), F.col(id_col))
    bucket = F.pmod(
        token_hash32(F.concat(F.lit(salt + "_"), anchor.cast("string"))),
        F.lit(100),
    ).cast("int")
    return (
        joined.withColumn("split_bucket", bucket)
        .withColumn(
            "split",
            F.when(F.col("split_bucket") < train_pct, F.lit("train"))
            .when(F.col("split_bucket") < train_pct + val_pct, F.lit("val"))
            .otherwise(F.lit("test")),
        )
        .drop("__grp")
    )
