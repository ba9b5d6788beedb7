"""Count-min sketch, weighted sampling, bitext mutual-NN: the structural
properties the oracle's value-match can't express — CMS one-sided error and
shard additivity, sample determinism and weight-proportionality, mutual-NN
symmetry — plus the broadcast shape of the sketch probe."""

from __future__ import annotations

from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.llmprep.sampling import weighted_sample_topk
from telecom_dataengineering_pipeline_spark.llmprep.sketches import (
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
    cms_merge,
)
from telecom_dataengineering_pipeline_spark.llmprep.similarity import bitext_mutual_nn
import pytest


def _tokens(spark, rows):
    return spark.createDataFrame([(t,) for t in rows], "tok STRING")


def test_cms_never_underestimates_and_is_tight_when_sparse(spark):
    """One-sided error: estimate >= true count always; with far fewer
    distinct items than cells, collisions are unlikely and estimates are
    exact."""
    stream = _tokens(spark, ["a"] * 5 + ["b"] * 3 + ["c"] * 1)
    sketch = cms_build(stream, "tok", depth=4, width=256)
    est = {
        r["tok"]: r["cms_count"]
        for r in cms_estimate(
            sketch, _tokens(spark, ["a", "b", "c", "zz"]), "tok", depth=4, width=256
        ).collect()
    }
    true = {"a": 5, "b": 3, "c": 1, "zz": 0}
    assert all(est[t] >= true[t] for t in true)  # one-sided, including absent
    assert est == true  # sparse regime: exact


def test_cms_merge_equals_single_pass_sketch(spark):
    """Counters are additive: sketching two shards independently and
    merging must equal sketching the concatenated stream — the property
    that makes per-executor/per-day sketching sound."""
    s1 = _tokens(spark, ["a", "a", "b"])
    s2 = _tokens(spark, ["a", "c", "c"])
    merged = cms_merge(
        cms_build(s1, "tok", depth=4, width=64), cms_build(s2, "tok", depth=4, width=64)
    )
    single = cms_build(_tokens(spark, ["a", "a", "b", "a", "c", "c"]), "tok", depth=4, width=64)
    as_set = lambda df: {(r["rw"], r["cl"], r["cnt"]) for r in df.collect()}
    assert as_set(merged) == as_set(single)


def test_cms_estimate_broadcasts_the_sketch(spark):
    """The probe join must broadcast the (<= d*w rows) cell table — a
    shuffled sketch join would defeat the fixed-size design."""
    stream = _tokens(spark, ["a", "b"] * 10)
    sketch = cms_build(stream, "tok", depth=4, width=64)
    plan = cms_estimate(sketch, _tokens(spark, ["a"]), "tok", 4, 64)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_cms_heavy_hitters_orders_by_estimate_then_item(spark):
    stream = _tokens(spark, ["x"] * 9 + ["y"] * 9 + ["z"] * 2)
    out = cms_heavy_hitters(stream, _tokens(spark, ["x", "y", "z"]).distinct(), "tok", k=2)
    rows = [(r["tok"], r["cms_count"]) for r in out.collect()]
    assert rows == [("x", 9), ("y", 9)]  # tie broken by item asc, k enforced


def test_weighted_sample_deterministic_and_excludes_zero_weight(spark):
    df = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(1, 200)], "doc_id LONG, w DOUBLE"
    )
    a = [r["doc_id"] for r in weighted_sample_topk(df, "w", k=20).collect()]
    b = [r["doc_id"] for r in weighted_sample_topk(df, "w", k=20).collect()]
    assert a == b  # no rand(): identical across runs
    zero_weight = {i for i in range(1, 200) if i % 7 == 0}
    assert not (set(a) & zero_weight)  # zero-mass rows can never be drawn


def test_weighted_sample_favors_heavy_rows(spark):
    """Weight-proportionality, statistically: with weights 100 vs 1, the
    heavy stratum should dominate a k=50 sample from 100+100 rows."""
    rows = [(i, 100.0) for i in range(100)] + [(i, 1.0) for i in range(100, 200)]
    df = spark.createDataFrame(rows, "doc_id LONG, w DOUBLE")
    picked = [r["doc_id"] for r in weighted_sample_topk(df, "w", k=50).collect()]
    heavy = sum(1 for i in picked if i < 100)
    assert heavy >= 40  # E-S with w=100 vs 1: heavy side wins overwhelmingly


def test_bitext_mutual_nn_keeps_only_mutual_pairs(spark):
    """Vectors engineered so src 1 and tgt 11 are mutual best matches,
    while src 2's best (tgt 11) prefers src 1 back — src 2 emits nothing."""
    rows = [
        (1, 0, [1.0, 0.0, 0.0]),
        (2, 0, [0.8, 0.6, 0.0]),
        (11, 1, [0.99, 0.1, 0.0]),
        (12, 1, [0.0, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id LONG, label INT, embedding ARRAY<DOUBLE>")
    got = {(r["src_id"], r["tgt_id"]) for r in bitext_mutual_nn(emb, 0, 1).collect()}
    assert (1, 11) in got
    assert all(s != 2 for s, _ in got)  # non-mutual src excluded
    # symmetry: every emitted tgt appears exactly once (it has one best src)
    tgts = [t for _, t in got]
    assert len(tgts) == len(set(tgts))


def test_hll_registers_merge_and_accuracy(spark):
    """HLL: shard registers max-merge to the single-pass registers; the
    estimate lands within a few standard errors of truth; the small-range
    correction branch engages for tiny sets and stays positive."""
    from pyspark.sql import functions as F

    from telecom_dataengineering_pipeline_spark.llmprep.sketches import (
        hll_estimate_expr,
        hll_registers,
    )

    df = spark.createDataFrame([(f"item_{i}",) for i in range(1000)], "v STRING")
    regs = hll_registers(df, "v")
    a = hll_registers(spark.createDataFrame([(f"item_{i}",) for i in range(600)], "v STRING"), "v")
    b = hll_registers(spark.createDataFrame([(f"item_{i}",) for i in range(400, 1000)], "v STRING"), "v")
    merged = a.unionByName(b).groupBy("bucket").agg(F.max("M").alias("M"))
    assert sorted(map(tuple, regs.collect())) == sorted(map(tuple, merged.collect()))

    z_agg, cnt_agg, est = hll_estimate_expr()
    one = regs.agg(z_agg.alias("z"), cnt_agg.alias("cnt")).select(
        est(F.col("z"), F.col("cnt")).alias("e")
    ).first()["e"]
    # m=32 -> stderr ~18%; allow 3 sigma
    assert 0.46 * 1000 <= one <= 1.54 * 1000

    tiny = hll_registers(spark.createDataFrame([("a",), ("b",), ("c",)], "v STRING"), "v")
    t = tiny.agg(z_agg.alias("z"), cnt_agg.alias("cnt")).select(
        est(F.col("z"), F.col("cnt")).alias("e")
    ).first()["e"]
    assert 0 < t <= 12  # linear-counting branch, small answer for 3 items


def test_streaming_cms_loop_merges_batches_and_time_travels(spark, tmp_path):
    """Continuous CMS: per-batch cells appended through the txnlog sum to
    the single-pass sketch over all data; retried batches no-op; the
    sketch time-travels; OPTIMIZE compacts without changing sums."""
    from telecom_dataengineering_pipeline_spark.llmprep.sketches import (
        StreamingSketchLoop,
        cms_build,
    )
    from telecom_dataengineering_pipeline_spark.sources.txnlog import TxnLogTable

    batches = [
        [("a",)] * 5 + [("b",)] * 2,
        [("a",)] * 3 + [("c",)] * 4,
        [("b",)] * 6,
    ]
    loop = StreamingSketchLoop(TxnLogTable(str(tmp_path / "cms")), "tok")
    for i, rows in enumerate(batches):
        loop.process_batch(spark.createDataFrame(rows, "tok STRING"), i)

    all_rows = spark.createDataFrame([r for b in batches for r in b], "tok STRING")
    single = {(r["rw"], r["cl"]): r["cnt"] for r in cms_build(all_rows, "tok").collect()}
    merged = {(r["rw"], r["cl"]): r["cnt"] for r in loop.sketch(spark).collect()}
    assert merged == single

    # retry no-op
    loop.process_batch(spark.createDataFrame(batches[2], "tok STRING"), 2)
    assert {(r["rw"], r["cl"]): r["cnt"] for r in loop.sketch(spark).collect()} == single

    # heavy hitters over the live sketch (CMS never under-counts)
    cands = spark.createDataFrame([("a",), ("b",), ("c",), ("zzz",)], "tok STRING")
    hh = {r["tok"]: r["cms_count"] for r in loop.heavy_hitters(spark, cands, k=4).collect()}
    assert hh["a"] >= 8 and hh["b"] >= 8 and hh["c"] >= 4

    # time travel: version 0 sees only batch 0
    v0 = {(r["rw"], r["cl"]): r["cnt"] for r in loop.sketch(spark, version=0).collect()}
    b0 = {(r["rw"], r["cl"]): r["cnt"] for r in cms_build(
        spark.createDataFrame(batches[0], "tok STRING"), "tok").collect()}
    assert v0 == b0

    # OPTIMIZE compacts the cell table; sums unchanged
    loop.table.optimize(spark, target_files=1)
    assert {(r["rw"], r["cl"]): r["cnt"] for r in loop.sketch(spark).collect()} == single


@pytest.mark.slow
def test_streaming_hll_loop_tracks_cardinality_curve(spark, tmp_path):
    """Continuous HLL: per-batch registers max-merge through the txnlog to
    the single-pass registers; the estimate is monotone along the version
    history; replays and re-appends of the same batch change nothing."""
    from pyspark.sql import functions as F

    from telecom_dataengineering_pipeline_spark.llmprep.sketches import (
        StreamingHllLoop,
        hll_registers,
    )
    from telecom_dataengineering_pipeline_spark.sources.txnlog import TxnLogTable

    batches = [
        [(f"u{i}",) for i in range(0, 300)],
        [(f"u{i}",) for i in range(200, 600)],  # overlap must not inflate
        [(f"u{i}",) for i in range(600, 700)],
    ]
    loop = StreamingHllLoop(TxnLogTable(str(tmp_path / "hll")), "v")
    for i, rows in enumerate(batches):
        loop.process_batch(spark.createDataFrame(rows, "v STRING"), i)

    all_df = spark.createDataFrame([r for b in batches for r in b], "v STRING")
    single = {r["bucket"]: r["M"] for r in hll_registers(all_df, "v").collect()}
    merged = {r["bucket"]: r["M"] for r in loop.registers(spark).collect()}
    assert merged == single

    e0, e1, e2 = (loop.estimate(spark, version=v) for v in range(3))
    assert e0 <= e1 <= e2  # cardinality curve is monotone
    assert 0.46 * 700 <= e2 <= 1.54 * 700  # 3 sigma at m=32

    loop.process_batch(spark.createDataFrame(batches[1], "v STRING"), 1)  # replay
    assert loop.estimate(spark) == e2


def test_hll_set_ops_union_intersection_jaccard(spark):
    from pyspark.sql import functions as F

    from telecom_dataengineering_pipeline_spark.llmprep.sketches import (
        hll_registers,
        hll_set_ops,
    )

    # A = 0..5999, B = 4000..9999 → |A|=6000 |B|=6000 |A∪B|=10000 |A∩B|=2000
    a = spark.range(0, 6000).select(F.col("id").cast("string").alias("k"))
    bdf = spark.range(4000, 10000).select(F.col("id").cast("string").alias("k"))
    r = hll_set_ops(a, bdf, "k", b=12).collect()[0]
    assert abs(r["est_a"] - 6000) / 6000 < 0.05
    assert abs(r["est_b"] - 6000) / 6000 < 0.05
    assert abs(r["est_union"] - 10000) / 10000 < 0.05
    assert abs(r["est_intersection"] - 2000) / 2000 < 0.3  # IE error amplifies
    assert abs(r["jaccard_est"] - 0.2) < 0.07
    # Determinism: integer registers + literal constants, bit-identical.
    r2 = hll_set_ops(a, bdf, "k", b=12).collect()[0]
    assert tuple(r) == tuple(r2)
    # The union IS sketch algebra: merged registers == registers of A∪B.
    both = a.unionAll(bdf)
    direct = {
        x["bucket"]: x["M"] for x in hll_registers(both, "k", b=12).collect()
    }
    ra = {x["bucket"]: x["M"] for x in hll_registers(a, "k", b=12).collect()}
    rb = {x["bucket"]: x["M"] for x in hll_registers(bdf, "k", b=12).collect()}
    merged = {
        bk: max(ra.get(bk, 0), rb.get(bk, 0)) for bk in set(ra) | set(rb)
    }
    assert merged == direct
