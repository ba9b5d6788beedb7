"""Mergeable frequency sketches (count-min) for corpus-scale token/entity
frequency estimation.

A 100 TB corpus has a vocabulary too large to count exactly per pipeline
stage; a count-min sketch (Cormode & Muthukrishnan 2005) compresses the
whole frequency distribution into a fixed ``depth × width`` grid of
counters with one-sided error (estimates only over-count, by at most
``ε·N`` with ``ε = e/width`` at confidence ``1 − e^-depth``). On Spark the
sketch IS a tiny DataFrame of ``(rw, cl, cnt)`` cells:

- **build** = one explode (``depth`` cells per item) + one map-side-combined
  hash aggregate — a single pass, no driver state;
- **merge** across corpus shards/days = union + re-aggregate (counters are
  additive — the property that makes the sketch distributable);
- **estimate** = broadcast the d×w cell table onto the probe items and take
  the per-item minimum across rows.

Hashes are the engine-neutral md5-derived 32-bit family used across the
llmprep tier (``llmprep/text.py token_hash32``), so DuckDB reproduces the
exact sketch — construction and estimates are oracle-checkable, not just
plausible. The complement of the HLL cardinality sketch in
``quality/monitors.py`` (A9): HLL answers "how many distinct", CMS answers
"how often each".
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import token_hash32


def _cms_col(item: Column, row: int, width: int) -> Column:
    """Column index of ``item`` in sketch row ``row``: md5-derived 32-bit
    hash of the row-salted item, mod width. Independent-enough hash family
    via the salt; reproducible verbatim in DuckDB."""
    return token_hash32(F.concat(F.lit(f"cms_{row}_"), item.cast("string"))) % F.lit(
        width
    )


def cms_build(
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch over one item per input row (pre-exploded stream):
    returns the ``(rw, cl, cnt)`` cell table, at most ``depth × width``
    rows regardless of corpus size. ``weight_col`` makes it a weighted
    sketch (e.g. byte counts instead of occurrences)."""
    it = F.col(item_col)
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("rw"), _cms_col(it, j, width).alias("cl")
                )
                for j in range(depth)
            ]
        )
    ).alias("cell")
    w = F.col(weight_col) if weight_col else F.lit(1)
    return (
        items.select(cells, w.cast("bigint").alias("_w"))
        .groupBy("cell.rw", "cell.cl")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical geometry: counters are additive,
    so shard/day/source sketches combine by cell-wise sum — the property
    that lets each executor (or each day's job) sketch independently."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("rw", "cl").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch for each candidate item: min over the item's
    ``depth`` cells. The cell table (≤ d×w rows) broadcasts onto the probe
    side — estimating any number of candidates costs one broadcast join,
    never a shuffle of the sketch."""
    it = F.col(item_col)
    probes = candidates.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("rw"), _cms_col(it, j, width).alias("cl")
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(item_col, "cell.rw", "cell.cl")
    return (
        probes.join(F.broadcast(sketch), ["rw", "cl"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count"))
    )


def cms_heavy_hitters(
    items: DataFrame,
    candidates: DataFrame,
    item_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Top-k candidates by sketch-estimated frequency (estimate desc, item
    asc tiebreak): the bounded-memory answer to "which of these items are
    hot in the corpus" — the full stream is seen once, and only the d×w
    cells plus the candidate set are ever held."""
    sketch = cms_build(items, item_col, depth, width)
    est = cms_estimate(sketch, candidates, item_col, depth, width)
    return est.orderBy(F.col("cms_count").desc(), F.col(item_col).asc()).limit(k)


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007) — the cardinality member of the
# mergeable-sketch family (CMS answers "how often", HLL answers "how many
# distinct"). Spark's approx_count_distinct is HLL too but its registers
# are engine-internal; this construction uses the same md5-derived 32-bit
# hash family as the CMS, so DuckDB rebuilds the EXACT register table and
# the estimate itself is oracle-checkable. Registers max-merge across
# shards (the distributable property); integer-scaled harmonic sums keep
# the estimate arithmetic bit-identical across engines.
# ---------------------------------------------------------------------------

_HLL_B = 5  # 2^5 = 32 registers; relative error ~1.04/sqrt(32) ≈ 18%
_HLL_REM_BITS = 32 - _HLL_B  # remainder width -> rho ∈ [1, 28]


def hll_registers(
    df: DataFrame, col: str, b: int = _HLL_B, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Per-(group, bucket) max leading-zero rank: ``(*group_cols, bucket,
    M)``. One pass, map-side-combined max; merge shards with another
    groupBy-max."""
    m = 1 << b
    rem_bits = 32 - b
    h = token_hash32(F.concat(F.lit("hll_"), F.col(col).cast("string")))
    hashed = df.select(*group_cols, h.alias("_h"))
    # bucket = low b bits; remainder = the top 32−b bits; rho = leading
    # zeros within the remainder + 1, via binary-string length (exact in
    # both engines, no float log2 edge cases)
    rem = F.expr(f"_h div {m}")
    rho = F.when(rem > 0, F.lit(rem_bits + 1) - F.length(F.bin(rem))).otherwise(
        F.lit(rem_bits + 1)
    )
    return (
        hashed.select(
            *group_cols,
            (F.col("_h") % m).cast("int").alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("M"))
    )


def hll_alpha(b: int = _HLL_B) -> float:
    m = 1 << b
    return {4: 0.673, 5: 0.697, 6: 0.709}.get(b, 0.7213 / (1.0 + 1.079 / m))


def hll_const(b: int = _HLL_B) -> float:
    """The Python-computed α·m²·2^(rem_bits+1) numerator, exposed so the
    DuckDB oracle can embed the IDENTICAL double (multiplication order
    matters at the ulp level)."""
    m = 1 << b
    return hll_alpha(b) * m * m * float(1 << (32 - b + 1))


def hll_estimate_expr(b: int = _HLL_B):
    """Aggregate expressions turning grouped registers into the estimate.
    Returns (z_int_agg, estimate_fn): the harmonic sum is kept as an exact
    scaled integer (Σ 2^(rem_bits+1−M), empty registers contribute the full
    2^(rem_bits+1)) so both engines divide the same integers with the same
    literals — bit-identical doubles out."""
    m = 1 << b
    rem_bits = 32 - b
    top = rem_bits + 1
    z_nonempty = F.sum(
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({top} - M AS INT))")
    ).cast("long")
    n_buckets = F.count(F.lit(1)).cast("long")

    def estimate(z_col, cnt_col):
        z_int = z_col + (F.lit(m) - cnt_col) * F.lit(1 << top)
        zeros = F.lit(m) - cnt_col
        e_raw = F.lit(hll_const(b)) / z_int
        corrected = F.when(
            (e_raw <= 2.5 * m) & (zeros > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
        ).otherwise(e_raw)
        return F.round(corrected, 4)

    return z_nonempty, n_buckets, estimate


class StreamingSketchLoop:
    """Continuous frequency tracking: each micro-batch's CMS cells APPEND
    to a txnlog table (exactly-once by batch id), and the live sketch is
    the cell-wise sum of everything appended — the additive-counter
    property means the merge is just a groupBy, no rebuild, no state
    store. The sketch table time-travels with the log (frequency profile
    as-of any batch), stays ≤ batches × depth × width rows between
    OPTIMIZE compactions, and one ``optimize()`` collapses it back to
    ≤ depth × width with identical sums."""

    def __init__(
        self,
        table,
        item_col: str,
        depth: int = 4,
        width: int = 256,
    ) -> None:
        self.table = table
        self.item_col = item_col
        self.depth, self.width = depth, width

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        cells = cms_build(batch_df, self.item_col, self.depth, self.width)
        txn = f"cms-{batch_id}"
        if self.table.exists():
            self.table.append(cells, app_txn_id=txn)
        else:
            self.table.create_or_replace(cells, app_txn_id=txn)

    def sketch(self, spark, version: int | None = None) -> DataFrame:
        """The merged sketch as of a txnlog version (default: latest)."""
        return (
            self.table.read(spark, version)
            .groupBy("rw", "cl")
            .agg(F.sum("cnt").alias("cnt"))
        )

    def heavy_hitters(
        self, spark, candidates: DataFrame, k: int = 20, version: int | None = None
    ) -> DataFrame:
        est = cms_estimate(
            self.sketch(spark, version), candidates, self.item_col, self.depth, self.width
        )
        return est.orderBy(
            F.col("cms_count").desc(), F.col(self.item_col).asc()
        ).limit(k)


class StreamingHllLoop:
    """Continuous cardinality tracking — the max-merge sibling of
    :class:`StreamingSketchLoop`: each micro-batch's HLL registers append
    to a txnlog table (exactly-once by batch id) and the live register set
    is the per-bucket MAX of everything appended. Max is idempotent as
    well as commutative/associative, so replays cannot inflate the
    estimate even before the txn-id guard kicks in — the
    "how many distinct so far" counter for an unbounded ingest stream,
    with time travel giving the cardinality curve as-of any batch."""

    def __init__(self, table, item_col: str, b: int = _HLL_B) -> None:
        self.table = table
        self.item_col = item_col
        self.b = b

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        regs = hll_registers(batch_df, self.item_col, self.b)
        txn = f"hll-{batch_id}"
        if self.table.exists():
            self.table.append(regs, app_txn_id=txn)
        else:
            self.table.create_or_replace(regs, app_txn_id=txn)

    def registers(self, spark, version: int | None = None) -> DataFrame:
        return (
            self.table.read(spark, version)
            .groupBy("bucket")
            .agg(F.max("M").alias("M"))
        )

    def estimate(self, spark, version: int | None = None) -> float:
        z_agg, cnt_agg, est = hll_estimate_expr(self.b)
        row = (
            self.registers(spark, version)
            .agg(z_agg.alias("z"), cnt_agg.alias("cnt"))
            .select(est(F.col("z"), F.col("cnt")).alias("e"))
            .first()
        )
        return float(row["e"])


def hll_set_ops(
    df_a: DataFrame, df_b: DataFrame, col: str, b: int = _HLL_B
) -> DataFrame:
    """Distinct-count set algebra on HLL sketches (the Theta-sketch use
    case on the HLL machinery already here): |A|, |B|, |A∪B| from the
    MERGED registers — union is exact sketch algebra, a per-bucket MAX,
    which is why HLL shards from different machines/days compose — and
    |A∩B| / Jaccard by inclusion-exclusion on the three estimates (the
    standard HLL trade: intersection error grows when the overlap is small
    relative to either set).

    One register pass per side + one bucket-grain merge; everything
    downstream is m-bucket-sized. Deterministic: same integer-register +
    Python-literal-constant recipe as the registered HLL profile, so the
    whole thing is DuckDB-oracle-expressible. NULLs are excluded up front
    (COUNT(DISTINCT) semantics — and a NULL key would otherwise mint a
    phantom bucket=NULL register that the bucket equi-join can't merge);
    an empty side estimates 0.0, not NULL."""
    ra = hll_registers(
        df_a.filter(F.col(col).isNotNull()), col, b
    ).withColumnRenamed("M", "Ma")
    rb = hll_registers(
        df_b.filter(F.col(col).isNotNull()), col, b
    ).withColumnRenamed("M", "Mb")
    # Sketch union = bucketwise max; full outer keeps buckets only one
    # side populated.
    merged = ra.join(rb, "bucket", "full_outer").select(
        "bucket",
        F.greatest(
            F.coalesce(F.col("Ma"), F.lit(0)), F.coalesce(F.col("Mb"), F.lit(0))
        ).alias("Mu"),
        F.col("Ma"),
        F.col("Mb"),
    )
    z_expr, cnt_expr, estimate = hll_estimate_expr(b)

    def est_over(m_col: str):
        side = merged.filter(F.col(m_col).isNotNull()).select(
            F.col(m_col).alias("M")
        )
        agg = side.agg(z_expr.alias("z"), cnt_expr.alias("c"))
        # Zero register rows (empty side) → z is NULL: that's cardinality
        # 0, not unknown.
        return agg.select(
            F.coalesce(estimate(F.col("z"), F.col("c")), F.lit(0.0)).alias("e")
        )

    est_a = est_over("Ma").withColumnRenamed("e", "est_a")
    est_b = est_over("Mb").withColumnRenamed("e", "est_b")
    est_u = (
        merged.select(F.col("Mu").alias("M"))
        .agg(z_expr.alias("z"), cnt_expr.alias("c"))
        .select(
            F.coalesce(estimate(F.col("z"), F.col("c")), F.lit(0.0)).alias(
                "est_union"
            )
        )
    )
    # 1-row estimate frames: broadcast-anchored like every other scalar
    # crossJoin in the codebase (AQE would pick it anyway; the hint makes
    # the plan shape explicit and test-pinnable).
    out = est_a.crossJoin(F.broadcast(est_b)).crossJoin(F.broadcast(est_u))
    inter = F.greatest(
        F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 4),
        F.lit(0.0),
    )
    return out.select(
        "est_a",
        "est_b",
        "est_union",
        inter.alias("est_intersection"),
        F.coalesce(F.round(inter / F.col("est_union"), 6), F.lit(0.0)).alias(
            "jaccard_est"
        ),
    )
