"""Embedding similarity search.

- ``cosine_topk``: brute-force exact top-k for a bounded query set — the
  baseline. Query side is broadcast (queries are small by construction);
  corpus side streams through executors once; ranking is a per-query window.
- ``sign_lsh_buckets``: random-hyperplane-style sign buckets (here: signs of
  leading dimensions — deterministic and engine-neutral). At 100 TB this is
  the candidate-pruning stage: join on bucket, then exact-rank candidates,
  trading recall for a ~2^bits fan-in reduction. IVF-style coarse centroids
  would slot in the same join shape.

Dot products use higher-order array functions (JVM, codegen) — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (excluding self)."""
    emb = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    norm = emb.withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    q = norm.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    joined = norm.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    sim = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        joined.select("query_id", "vec_id", F.round(sim, 6).alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
    )


def sign_lsh_buckets(
    embeddings: DataFrame,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector the sign-pattern bucket of its first ``bits`` dims."""
    parts = [
        F.when(F.element_at(F.col(vec_col), i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(bits)
    ]
    return embeddings.select(
        F.col(id_col).alias("vec_id"), F.concat(*parts).alias("bucket")
    )


def bucketed_ann_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's sign bucket; exact
    cosine ranking within the bucket. The equi-join on bucket is the only
    shuffle — this is the shape that survives a 100×-corpus scale-up."""
    emb = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    buckets = sign_lsh_buckets(embeddings, bits, id_col, vec_col)
    base = emb.join(buckets, "vec_id").withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("bucket").alias("qbucket"),
    )
    joined = base.join(
        F.broadcast(q), (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id"))
    )
    sim = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        joined.select("query_id", "vec_id", F.round(sim, 6).alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
    )


def ivf_assign(
    embeddings: DataFrame,
    centroid_mod: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization with deterministic centroids (every
    ``centroid_mod``-th vector — stands in for k-means training, which is an
    offline job at scale). Assign every vector to its max-cosine centroid.

    The assignment is a broadcast join (centroids are tiny by construction)
    + per-vector argmax — one pass over the corpus, no shuffle of the
    corpus itself."""
    emb = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    cents = emb.filter(F.col("vec_id") % centroid_mod == 0).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    scored = emb.join(F.broadcast(cents)).withColumn(
        "c_cos", _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("c_cos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "v", "nrm", F.col("cid").alias("cell"))
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    centroid_mod: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: rank only vectors sharing the query's cell (nprobe=1).
    The cell equi-join is the only shuffle — same shape as the sign-LSH
    variant, but with data-adaptive cells."""
    assigned = ivf_assign(embeddings, centroid_mod, id_col, vec_col)
    q = assigned.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("cell").alias("qcell"),
    )
    joined = assigned.join(
        F.broadcast(q), (F.col("cell") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id"))
    )
    sim = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        joined.select("query_id", "vec_id", F.round(sim, 6).alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
    )


def ivf_probe_cells(
    embeddings: DataFrame,
    query_ids: list[int],
    nprobe: int = 2,
    centroid_mod: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The query side of multi-probe IVF: each query's top-``nprobe`` cells
    by centroid cosine. Only |queries|×|centroids| scores are ranked — a
    broadcast-sized relation regardless of corpus size."""
    emb = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    cents = emb.filter(F.col("vec_id") % centroid_mod == 0).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    q = emb.filter(F.col("vec_id").isin(query_ids))
    scored = q.join(F.broadcast(cents)).withColumn(
        "c_cos", _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("c_cos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= nprobe)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            F.col("cid").alias("probe_cell"),
        )
    )


def ivf_topk_multiprobe(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    centroid_mod: int = 100,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN with the standard recall knob: rank vectors in the query's
    ``nprobe`` nearest cells instead of one. Cells partition the corpus, so
    probing 2 cells exactly doubles candidates — recall rises while the
    equi-join shape (the thing that scales) is unchanged."""
    assigned = ivf_assign(embeddings, centroid_mod, id_col, vec_col)
    probes = ivf_probe_cells(embeddings, query_ids, nprobe, centroid_mod, id_col, vec_col)
    joined = assigned.join(
        F.broadcast(probes),
        (F.col("cell") == F.col("probe_cell")) & (F.col("vec_id") != F.col("query_id")),
    )
    sim = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        joined.select("query_id", "vec_id", F.round(sim, 6).alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
    )


def _nearest_centroid(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """Max-cosine centroid per vector: broadcast the (tiny) centroid table,
    score, keep the argmax (ties to the lower centroid id)."""
    scored = emb.join(F.broadcast(cents)).withColumn(
        "c_cos", _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("c_cos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "v", "nrm", F.col("cid").alias("cell"), "c_cos")
    )


def ivf_kmeans_assign(
    embeddings: DataFrame,
    centroid_mod: int = 100,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization with LEARNED centroids: spherical k-means
    (cosine assignment, per-dimension mean update), Lloyd-iterated ``iters``
    times from the deterministic seed centroids ``ivf_assign`` uses.

    Each round is one broadcast-join assignment pass over the corpus plus a
    (cell, dim)-keyed aggregation whose output is k×dims rows — the update
    never shuffles vectors, only per-dimension partial sums (map-side
    combined). Per-dimension means sum 7-dp-rounded DECIMALs, so the learned
    centroids — and therefore the final assignment — are bit-identical on
    any engine and any partitioning (float summation order would drift).
    At scale this is the standard big-data k-means shape: assignments stay
    on executors, only k×dims aggregates move.
    """
    emb = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    cents = emb.filter(F.col("vec_id") % centroid_mod == 0).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    for _ in range(iters):
        assigned = _nearest_centroid(emb, cents)
        upd = (
            assigned.select("cell", F.posexplode("v").alias("dim", "val"))
            .groupBy("cell", "dim")
            .agg(
                (
                    F.sum(F.round(F.col("val"), 7).cast("decimal(20,7)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("c")
            )
        )
        cents = (
            upd.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("_dc"))
            .select(
                F.col("cell").alias("cid"),
                F.transform(F.col("_dc"), lambda s: s.getField("c")).alias("cv"),
            )
            .withColumn("cn", F.sqrt(_dot(F.col("cv"), F.col("cv"))))
        )
    return _nearest_centroid(emb, cents)


def ivf_kmeans_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    centroid_mod: int = 100,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k over the LEARNED (spherical-k-means) coarse quantizer:
    train cells with ``ivf_kmeans_assign``, then rank only vectors sharing
    the query's learned cell — the trained-quantizer version of
    ``ivf_topk``. Same single cell-equi-join shuffle; training cost is
    ``iters`` extra corpus passes, amortized across every query batch at
    scale (train once, search many)."""
    assigned = ivf_kmeans_assign(embeddings, centroid_mod, iters, id_col, vec_col)
    q = assigned.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("cell").alias("qcell"),
    )
    joined = assigned.join(
        F.broadcast(q), (F.col("cell") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id"))
    )
    sim = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        joined.select("query_id", "vec_id", F.round(sim, 6).alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
    )


def norm_profile(
    embeddings: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label embedding-norm distribution — the drift monitor an
    embedding pipeline runs per batch (collapsed norms => dead encoder;
    drifting means => distribution shift vs the indexed corpus).

    One pure-map pass (norms are a codegen'd array fold) into one hash agg.
    Mean-of-norms aggregates DECIMAL-cast rounded norms (exact,
    order-independent) and divides once at the end — the registry's
    cross-engine determinism convention.
    """
    nrm = F.round(F.sqrt(_dot(_as_double(F.col(vec_col)), _as_double(F.col(vec_col)))), 6)
    rows = embeddings.select(
        F.col(label_col).alias("label"),
        F.col(id_col).alias("vec_id"),
        F.size(vec_col).alias("dims"),
        nrm.alias("nrm"),
    )
    return (
        rows.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.min("dims").cast("int").alias("min_dims"),
            F.max("dims").cast("int").alias("max_dims"),
            F.min("nrm").alias("min_norm"),
            F.max("nrm").alias("max_norm"),
            (
                F.sum(F.col("nrm").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_norm"),
        )
        .select(
            "label", "n_vecs", "min_dims", "max_dims", "min_norm", "max_norm",
            F.round("avg_norm", 6).alias("avg_norm"),
        )
    )


def centroid_outliers(
    embeddings: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bottom_k: int = 5,
) -> DataFrame:
    """Per-label semantic outliers: cosine of every vector to its own
    label's centroid, keeping the ``bottom_k`` least-central vectors per
    label — the mislabeled-example / noisy-cluster sweep a curation
    pipeline runs over embedded training data.

    Centroid update is the k-means shape: posexplode to (label, dim)
    partial sums — map-side combined, only labels×dims aggregate rows ever
    shuffle, vectors themselves move zero times. Means sum 7-dp-rounded
    DECIMALs (order-independent, engine-exact); the tiny centroid table
    broadcasts back onto the corpus for a codegen'd zip_with/aggregate
    cosine, and bottom-k resolves as a WindowGroupLimit per label."""
    emb = embeddings.select(
        F.col(label_col).alias("label"),
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("v"),
    )
    cent = (
        emb.select("label", F.posexplode("v").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg(
            (
                F.sum(F.round(F.col("val"), 7).cast("decimal(20,7)")).cast("double")
                / F.count(F.lit(1))
            ).alias("c")
        )
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("_dc"))
        .select(
            "label",
            F.transform(F.col("_dc"), lambda s: s.getField("c")).alias("cv"),
        )
        .withColumn("cn", F.sqrt(_dot(F.col("cv"), F.col("cv"))))
    )
    # Zero-norm guard: 0/0 is NaN, which sorts LAST ascending in Spark — a
    # degenerate (all-zero) vector would silently vanish from the bottom-k
    # instead of surfacing. nullif makes the cosine NULL and the explicit
    # nulls-first ordering ranks it as the most-outlier row.
    scored = emb.join(F.broadcast(cent), "label").select(
        "label",
        "vec_id",
        F.round(
            _dot(F.col("v"), F.col("cv"))
            / F.nullif(F.sqrt(_dot(F.col("v"), F.col("v"))) * F.col("cn"), F.lit(0.0)),
            6,
        ).alias("cosine_to_centroid"),
    )
    w = Window.partitionBy("label").orderBy(
        F.col("cosine_to_centroid").asc_nulls_first(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= bottom_k)
        .select("label", "rank", "vec_id", "cosine_to_centroid")
    )
