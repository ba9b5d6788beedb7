"""Property-based checks (hypothesis) for the operators whose semantics
have the most edge cases: as-of join tie/ordering behavior and MERGE
keep-latest resolution. Each example is verified against a brute-force
Python reference on small generated relations — shapes the fixed test
fixtures can't enumerate (duplicate timestamps, all-ties keys, empty
sides, single-key pileups)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.operators.asof import asof_join
from telecom_dataengineering_pipeline_spark.operators.merge import merge_upsert

# tiny domains force collisions: few keys, few timestamps
_key = st.integers(min_value=0, max_value=3)
_ts = st.integers(min_value=0, max_value=8)
_val = st.integers(min_value=-5, max_value=5)

_left_rows = st.lists(st.tuples(_key, _ts), min_size=0, max_size=12)
_right_rows = st.lists(st.tuples(_key, _ts, _val), min_size=0, max_size=12)


def _ref_asof(left, right):
    """Per left row: latest right_ts <= left_ts for the key; among rows
    tied on that ts, the one with the MAX value struct (the documented
    deterministic winner)."""
    out = []
    for k, lts in left:
        cands = [(rts, v) for (rk, rts, v) in right if rk == k and rts <= lts]
        if cands:
            best_ts = max(rts for rts, _ in cands)
            win = max(v for rts, v in cands if rts == best_ts)
        else:
            win = None
        out.append((k, lts, win))
    return sorted(out, key=lambda t: (t[0], t[1], t[2] is None, t[2]))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(left=_left_rows, right=_right_rows)
def test_asof_join_matches_bruteforce(spark, left, right):
    # left rows need a unique id so duplicate (k, ts) rows survive the join
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)] or [(99, -1, -1)],
        "k LONG, ts LONG, lid LONG",
    )
    rdf = spark.createDataFrame(right or [(98, -1, 0)], "k LONG, ts LONG, px LONG")
    out = asof_join(ldf, rdf, key="k", left_ts="ts", right_ts="ts", value_cols=["px"])
    got = sorted(
        ((r["k"], r["ts"], r["px"]) for r in out.collect()),
        key=lambda t: (t[0], t[1], t[2] is None, t[2]),
    )
    want = _ref_asof(
        [(k, t) for (k, t) in left] or [(99, -1)],
        right or [(98, -1, 0)],
    )
    assert got == want


def _ref_merge(target, source):
    """Source-wins keep-latest per key; within a side, max (version, v)
    wins (the struct tie-break dedup_keep_latest applies)."""
    best = {}
    for ver, rows in ((1, target), (2, source)):
        for k, v in rows:
            cur = best.get(k)
            cand = (ver, v)
            if cur is None or cand > cur:
                best[k] = cand
    return sorted((k, ver, v) for k, (ver, v) in best.items())


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    target=st.lists(st.tuples(_key, _val), min_size=0, max_size=10),
    source=st.lists(st.tuples(_key, _val), min_size=0, max_size=10),
)
def test_merge_upsert_matches_bruteforce(spark, target, source):
    tdf = spark.createDataFrame(
        [(k, 1, v) for k, v in target] or [(99, 1, 0)], "k LONG, version INT, v LONG"
    )
    sdf = spark.createDataFrame(
        [(k, 2, v) for k, v in source] or [(98, 2, 0)], "k LONG, version INT, v LONG"
    )
    out = merge_upsert(
        tdf, sdf, keys=["k"], order_by=[F.col("version").desc(), F.col("v").desc()]
    )
    got = sorted((r["k"], r["version"], r["v"]) for r in out.collect())
    want = _ref_merge(target or [(99, 0)], source or [(98, 0)])
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    base=st.dictionaries(_key, _val, min_size=1, max_size=4),
    batches=st.lists(
        st.lists(st.tuples(_key, _val), min_size=1, max_size=6),
        min_size=1,
        max_size=3,
    ),
)
def test_txnlog_merge_sequence_matches_reference(spark, tmp_path_factory, base, batches):
    """A create + N successive MERGEs through the transaction log equals the
    in-memory keep-latest fold, for arbitrary overlapping key batches —
    exercising file-granular COW, stats pruning, and carry-by-reference
    under randomized interleavings. The base holds one row per key: MERGE
    (like SQL MERGE INTO) assumes and maintains the unique-key invariant —
    an earlier draft of this test caught exactly that contract edge."""
    from pyspark.sql import functions as F

    from telecom_dataengineering_pipeline_spark.sources.txnlog import TxnLogTable

    t = TxnLogTable(
        str(tmp_path_factory.mktemp("prop_txnlog") / "t"), stat_cols=("k",)
    )
    best = {}
    ver = 0
    t.create_or_replace(
        spark.createDataFrame(
            [(k, 0, v) for k, v in base.items()], "k LONG, version INT, v LONG"
        )
    )
    for k, v in base.items():
        best[k] = (0, v)
    for batch in batches:
        ver += 1
        t.merge_keep_latest(
            spark,
            spark.createDataFrame(
                [(k, ver, v) for k, v in batch], "k LONG, version INT, v LONG"
            ),
            keys=["k"],
            order_by=[F.col("version").desc(), F.col("v").desc()],
        )
        for k, v in batch:
            cand = (ver, v)
            if k not in best or cand > best[k]:
                best[k] = cand
    got = sorted((r["k"], r["version"], r["v"]) for r in t.read(spark).collect())
    want = sorted((k, ver_, v) for k, (ver_, v) in best.items())
    assert got == want
