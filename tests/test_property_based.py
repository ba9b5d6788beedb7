"""Property-based checks (hypothesis) for the operators whose semantics
have the most edge cases: as-of join tie/ordering behavior and MERGE
keep-latest resolution. Each example is verified against a brute-force
Python reference on small generated relations — shapes the fixed test
fixtures can't enumerate (duplicate timestamps, all-ties keys, empty
sides, single-key pileups)."""

from __future__ import annotations

import pytest
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
@pytest.mark.slow
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
@pytest.mark.slow
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
@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# Bloom filter: membership is never a false negative, for ANY key set and
# any probe set; false positives exist but composition with the exact join
# is lossless. Reference = Python set arithmetic.
# ---------------------------------------------------------------------------

_keys = st.lists(st.integers(min_value=-1000, max_value=1000), min_size=0, max_size=30)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
@given(members=_keys, probes=_keys)
def test_bloom_never_false_negative(spark, members, probes):
    from telecom_dataengineering_pipeline_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    dim = spark.createDataFrame([(k,) for k in members] or [(None,)], "k LONG").filter(
        F.col("k").isNotNull()
    )
    words = bloom_build(dim, "k", m_bits=256, k=3)
    probe_df = spark.createDataFrame(
        [(p,) for p in probes] or [(None,)], "p LONG"
    ).filter(F.col("p").isNotNull())
    passed = {
        r["p"]
        for r in probe_df.filter(
            bloom_might_contain(F.col("p"), words, m_bits=256, k=3)
        ).collect()
    }
    member_set = set(members)
    # every true member among the probes passes — no false negative, ever
    assert (member_set & set(probes)) <= passed


# ---------------------------------------------------------------------------
# Histogram quantile sketch: estimate within one bucket width of the true
# percentile; merge of any split equals single-pass. Reference = sorted
# Python list.
# ---------------------------------------------------------------------------

_vals = st.lists(
    st.floats(min_value=0.0, max_value=100.0, allow_nan=False), min_size=1, max_size=60
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
@given(vals=_vals, cut=st.integers(min_value=0, max_value=60), p=st.sampled_from([0.25, 0.5, 0.9]))
def test_quantile_sketch_bound_and_merge(spark, vals, cut, p):
    from telecom_dataengineering_pipeline_spark.quality.quantile_sketch import (
        histogram_sketch,
        merge_histogram_sketches,
        quantile_estimates,
    )

    lo, hi, nb = 0.0, 100.0, 25
    width = (hi - lo) / nb
    df = spark.createDataFrame([("g", v) for v in vals], "grp STRING, v DOUBLE")
    sk = histogram_sketch(df, "v", lo, hi, nb, ["grp"])
    est = quantile_estimates(sk, [p], lo, hi, nb, ["grp"]).collect()[0]["quantile_est"]
    # true percentile (nearest-rank, either convention) is inside the same
    # or adjacent bucket: the estimate can be off by at most one width
    s = sorted(vals)
    import math

    rank_lo = s[max(0, math.ceil(p * len(s)) - 1)]
    assert abs(est - rank_lo) <= 2 * width

    cut = min(cut, len(vals))
    a = histogram_sketch(
        spark.createDataFrame([("g", v) for v in vals[:cut]] or [("g", None)], "grp STRING, v DOUBLE"),
        "v", lo, hi, nb, ["grp"],
    )
    b = histogram_sketch(
        spark.createDataFrame([("g", v) for v in vals[cut:]] or [("g", None)], "grp STRING, v DOUBLE"),
        "v", lo, hi, nb, ["grp"],
    )
    merged = {
        (r["grp"], r["bucket"]): r["n"]
        for r in merge_histogram_sketches([a, b], ["grp"]).collect()
    }
    single = {(r["grp"], r["bucket"]): r["n"] for r in sk.collect()}
    assert merged == single


# ---------------------------------------------------------------------------
# Morton key: bijective on distinct coordinate pairs and monotone along
# each axis with the other held fixed (the properties per-dimension
# pruning relies on). Reference = Python bit interleave.
# ---------------------------------------------------------------------------


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
        min_size=1, max_size=40, unique=True,
    )
)
def test_morton_key_matches_reference_interleave(spark, pairs):
    from telecom_dataengineering_pipeline_spark.sources.writers import morton_key

    df = spark.createDataFrame(pairs, "a INT, b INT")
    bounds = {"a": (0, 65535), "b": (0, 65535)}
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", morton_key(["a", "b"], bounds).alias("z")).collect()
    }

    def ref(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in got.items():
        assert z == ref(a, b)
    # bijective on distinct pairs
    assert len(set(got.values())) == len(got)


# ---------------------------------------------------------------------------
# snapshot_diff vs a brute-force dict compare on random keyed states.
# ---------------------------------------------------------------------------

_state = st.dictionaries(
    st.integers(0, 15), st.one_of(st.none(), st.text(alphabet="xyz", max_size=2)),
    max_size=12,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
@given(old=_state, new=_state)
def test_snapshot_diff_matches_dict_compare(spark, old, new):
    from telecom_dataengineering_pipeline_spark.operators.diff import snapshot_diff

    odf = spark.createDataFrame(list(old.items()) or [(99, "zz")], "k LONG, v STRING")
    ndf = spark.createDataFrame(list(new.items()) or [(98, "zz")], "k LONG, v STRING")
    old = old or {99: "zz"}
    new = new or {98: "zz"}
    got = {r["k"]: r["change_type"] for r in snapshot_diff(odf, ndf, ["k"]).collect()}
    want = {}
    for k in set(old) | set(new):
        if k not in old:
            want[k] = "added"
        elif k not in new:
            want[k] = "removed"
        elif old[k] != new[k]:
            want[k] = "changed"
    assert got == want


# ---------------------------------------------------------------------------
# Txnlog DML model check: random sequences over the FULL DML family (COW +
# MOR + optimize + restore) must read back exactly what a plain dict model
# says, after every single operation — the strongest correctness artifact
# for the table format's interacting features (vectors accumulating over
# files, rewrites materializing them, restore rolling them back).
# ---------------------------------------------------------------------------

_dml_op = st.one_of(
    st.tuples(st.just("append"), st.lists(st.tuples(st.integers(0, 9), _val), min_size=1, max_size=4)),
    st.tuples(st.just("delete_mor"), st.integers(0, 9)),
    st.tuples(st.just("delete_cow"), st.integers(0, 9)),
    st.tuples(st.just("update_mor"), st.integers(0, 9), st.integers(1, 5)),
    st.tuples(st.just("merge_mor"), st.lists(st.tuples(st.integers(0, 9), _val), min_size=1, max_size=3)),
    st.tuples(st.just("optimize")),
    st.tuples(st.just("restore"), st.integers(1, 3)),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
@given(ops=st.lists(_dml_op, min_size=1, max_size=6))
def test_txnlog_dml_sequences_match_dict_model(spark, tmp_path_factory, ops):
    from telecom_dataengineering_pipeline_spark.sources.txnlog import TxnLogTable

    t = TxnLogTable(str(tmp_path_factory.mktemp("dmlseq") / "t"), stat_cols=("k",))
    model = {k: 0 for k in range(5)}
    t.create_or_replace(
        spark.createDataFrame(sorted(model.items()), "k long, v long").coalesce(2)
    )
    history = {t.version(): dict(model)}

    def check():
        got = {r["k"]: r["v"] for r in t.read(spark).collect()}
        assert got == model

    for op in ops:
        kind = op[0]
        if kind == "append":
            fresh = [(k, v) for k, v in op[1] if k not in model]
            # de-dup within the batch too (keys stay unique by construction)
            fresh = list({k: (k, v) for k, v in fresh}.values())
            if fresh:
                t.append(spark.createDataFrame(fresh, "k long, v long"))
                model.update(dict(fresh))
            else:
                continue  # no commit happened
        elif kind == "delete_mor":
            v0 = t.version()
            t.delete_where_mor(spark, [("k", "=", op[1])])
            model.pop(op[1], None)
            if t.version() == v0:
                check()
                continue  # no-op delete: nothing recorded in history
        elif kind == "delete_cow":
            v0 = t.version()
            t.delete_where(spark, [("k", "=", op[1])])
            model.pop(op[1], None)
            if t.version() == v0:
                check()
                continue
        elif kind == "update_mor":
            v0 = t.version()
            t.update_where_mor(
                spark, [("k", "=", op[1])], {"v": F.col("v") + op[2]}
            )
            if op[1] in model:
                model[op[1]] += op[2]
            if t.version() == v0:
                check()
                continue
        elif kind == "merge_mor":
            src = list({k: (k, v) for k, v in op[1]}.values())
            t.merge_keep_latest_mor(
                spark,
                spark.createDataFrame(src, "k long, v long"),
                keys=("k",),
                order_by=[F.col("v").desc()],
            )
            for k, v in src:
                # keep-latest by v desc with k-unique target: winner is max
                model[k] = max(model.get(k, v), v)
        elif kind == "optimize":
            t.optimize(spark, target_files=1)
        elif kind == "restore":
            candidates = sorted(history)
            target = candidates[max(0, len(candidates) - 1 - op[1])]
            t.restore(target)
            model = dict(history[target])
        history[t.version()] = dict(model)
        check()


# Extend the DML model with RENAME interleavings: the mapping must stay
# exact through any combination of vectors, rewrites, and restores. The
# model tracks the CURRENT logical name of the value column; reads are
# validated under it after every operation.

_dml_op_cm = st.one_of(
    _dml_op,
    st.tuples(st.just("rename")),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
@given(ops=st.lists(_dml_op_cm, min_size=2, max_size=6))
def test_txnlog_dml_with_renames_matches_dict_model(spark, tmp_path_factory, ops):
    from telecom_dataengineering_pipeline_spark.sources.txnlog import TxnLogTable

    t = TxnLogTable(str(tmp_path_factory.mktemp("dmlcm") / "t"), stat_cols=("k",))
    model = {k: 0 for k in range(5)}
    t.create_or_replace(
        spark.createDataFrame(sorted(model.items()), "k long, v long").coalesce(2)
    )
    vname = "v"
    history = {t.version(): (dict(model), vname)}

    def check():
        got = {r["k"]: r[vname] for r in t.read(spark).collect()}
        assert got == model
        assert t.read(spark).columns == ["k", vname]

    for op in ops:
        kind = op[0]
        if kind == "rename":
            nxt = "v2" if vname == "v" else "v"
            t.rename_column(vname, nxt)
            vname = nxt
        elif kind == "append":
            fresh = list({k: (k, v) for k, v in op[1] if k not in model}.values())
            if not fresh:
                continue
            t.append(spark.createDataFrame(fresh, f"k long, {vname} long"))
            model.update(dict(fresh))
        elif kind == "delete_mor":
            v0 = t.version()
            t.delete_where_mor(spark, [("k", "=", op[1])])
            model.pop(op[1], None)
            if t.version() == v0:
                check()
                continue
        elif kind == "delete_cow":
            v0 = t.version()
            t.delete_where(spark, [("k", "=", op[1])])
            model.pop(op[1], None)
            if t.version() == v0:
                check()
                continue
        elif kind == "update_mor":
            v0 = t.version()
            t.update_where_mor(
                spark, [("k", "=", op[1])], {vname: F.col(vname) + op[2]}
            )
            if op[1] in model:
                model[op[1]] += op[2]
            if t.version() == v0:
                check()
                continue
        elif kind == "merge_mor":
            src = list({k: (k, v) for k, v in op[1]}.values())
            t.merge_keep_latest_mor(
                spark,
                spark.createDataFrame(src, f"k long, {vname} long"),
                keys=("k",),
                order_by=[F.col(vname).desc()],
            )
            for k, v in src:
                model[k] = max(model.get(k, v), v)
        elif kind == "optimize":
            t.optimize(spark, target_files=1)
        elif kind == "restore":
            candidates = sorted(history)
            target = candidates[max(0, len(candidates) - 1 - op[1])]
            t.restore(target)
            model, vname = dict(history[target][0]), history[target][1]
        history[t.version()] = (dict(model), vname)
        check()


# Extend the model with the MAINTENANCE surface: checkpoint (+ restart),
# expire_log, shallow clone, vacuum(0), interleaved with the full DML
# family. The interactions most likely to hide a resurrection bug —
# restore-across-expiry (the restore target set shrinks to retained
# versions), clone-of-a-checkpointed-table, vacuum-right-after-clone —
# all occur under random interleavings, and the table is re-read against
# the dict model after every action. checkpoint swaps in a FRESH instance
# so reconstruction-from-checkpoint itself is model-checked.

_maint_op = st.one_of(
    st.tuples(st.just("append"), st.lists(st.tuples(st.integers(0, 9), _val), min_size=1, max_size=4)),
    st.tuples(st.just("delete_mor"), st.integers(0, 9)),
    st.tuples(st.just("update_mor"), st.integers(0, 9), st.integers(1, 5)),
    st.tuples(st.just("merge_mor"), st.lists(st.tuples(st.integers(0, 9), _val), min_size=1, max_size=3)),
    st.tuples(st.just("optimize")),
    st.tuples(st.just("restore"), st.integers(1, 3)),
    st.tuples(st.just("checkpoint")),
    st.tuples(st.just("expire")),
    st.tuples(st.just("clone")),
    st.tuples(st.just("vacuum")),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
@given(ops=st.lists(_maint_op, min_size=2, max_size=6))
def test_txnlog_maintenance_sequences_match_dict_model(spark, tmp_path_factory, ops):
    from telecom_dataengineering_pipeline_spark.sources.txnlog import TxnLogTable

    root = tmp_path_factory.mktemp("maintseq")
    path = str(root / "t")
    t = TxnLogTable(path, stat_cols=("k",), checkpoint_interval=0)
    model = {k: 0 for k in range(5)}
    t.create_or_replace(
        spark.createDataFrame(sorted(model.items()), "k long, v long").coalesce(2)
    )
    history = {t.version(): dict(model)}
    clones = 0

    def check():
        got = {r["k"]: r["v"] for r in t.read(spark).collect()}
        assert got == model

    for op in ops:
        kind = op[0]
        if kind == "append":
            fresh = list({k: (k, v) for k, v in op[1] if k not in model}.values())
            if not fresh:
                continue
            t.append(spark.createDataFrame(fresh, "k long, v long"))
            model.update(dict(fresh))
        elif kind == "delete_mor":
            v0 = t.version()
            t.delete_where_mor(spark, [("k", "=", op[1])])
            model.pop(op[1], None)
            if t.version() == v0:
                check()
                continue
        elif kind == "update_mor":
            v0 = t.version()
            t.update_where_mor(spark, [("k", "=", op[1])], {"v": F.col("v") + op[2]})
            if op[1] in model:
                model[op[1]] += op[2]
            if t.version() == v0:
                check()
                continue
        elif kind == "merge_mor":
            src = list({k: (k, v) for k, v in op[1]}.values())
            t.merge_keep_latest_mor(
                spark,
                spark.createDataFrame(src, "k long, v long"),
                keys=("k",),
                order_by=[F.col("v").desc()],
            )
            for k, v in src:
                model[k] = max(model.get(k, v), v)
        elif kind == "optimize":
            t.optimize(spark, target_files=1)
        elif kind == "restore":
            candidates = sorted(history)
            target = candidates[max(0, len(candidates) - 1 - op[1])]
            t.restore(target)
            model = dict(history[target])
        elif kind == "checkpoint":
            t.checkpoint()
            # restart: reconstruction must go through the checkpoint
            t = TxnLogTable(path, stat_cols=("k",), checkpoint_interval=0)
        elif kind == "expire":
            t.checkpoint()
            expired = set(t.expire_log())
            # restore-across-expiry: expired versions leave the candidate
            # set — restoring to them is no longer possible, to the
            # retained ones it still must be exact.
            for v in expired:
                history.pop(v, None)
        elif kind == "clone":
            clones += 1
            c = t.clone_shallow(str(root / f"clone{clones}"))
            got = {r["k"]: r["v"] for r in c.read(spark).collect()}
            assert got == model
            # vacuum-right-after-clone (no intervening source commits):
            # every file the clone references is still live in the source
            # snapshot, so source vacuum must not break the clone.
            t.vacuum(0.0)
            got = {r["k"]: r["v"] for r in c.read(spark).collect()}
            assert got == model
            history = {t.version(): dict(model)}
        elif kind == "vacuum":
            t.vacuum(0.0)
            # aggressive vacuum sacrifices time travel: only the current
            # version remains a valid restore target.
            history = {t.version(): dict(model)}
        history[t.version()] = dict(model)
        check()


# Extend the model once more with the ROUND-5 METADATA SURFACES interleaved
# with DML, renames, and the maintenance family: generated-column rules
# (set/drop + fill/validate/recompute through every DML path),
# clustering-spec evolution (metadata-only, reads must be unaffected across
# mixed layouts), and the distributed merge_delete_mor. The interactions
# this hunts: a rule set over rows made stale while the rule was OFF must
# be REJECTED; RESTORE must roll the rule/spec/colmap back with the file
# set; RENAME under an active rule that references the column must refuse;
# recompute-on-update must hold through MOR vectors, optimize rewrites,
# and checkpoint restarts. The dict model tracks (v, tag) per key plus the
# current value-column name and rule state, all versioned for restore.

_gencl_op = st.one_of(
    st.tuples(st.just("append"), st.lists(st.tuples(st.integers(0, 9), _val), min_size=1, max_size=3), st.booleans()),
    st.tuples(st.just("update_mor"), st.integers(0, 9), st.integers(1, 5)),
    st.tuples(st.just("delete_mor"), st.integers(0, 9)),
    st.tuples(st.just("merge_delete"), st.lists(st.integers(0, 9), min_size=1, max_size=4)),
    st.tuples(st.just("merge_mor"), st.lists(st.tuples(st.integers(0, 9), _val), min_size=1, max_size=3)),
    st.tuples(st.just("set_gen")),
    st.tuples(st.just("drop_gen")),
    st.tuples(st.just("set_cluster"), st.integers(0, 2)),
    st.tuples(
        st.just("add_default"),
        st.sampled_from(["d", "d2"]),
        st.sampled_from([7, 9]),
    ),
    st.tuples(st.just("rename_default")),
    st.tuples(st.just("drop_default")),
    st.tuples(st.just("cdf_span"), st.integers(1, 4)),
    st.tuples(st.just("rename")),
    st.tuples(st.just("restore"), st.integers(1, 3)),
    st.tuples(st.just("optimize")),
    st.tuples(st.just("checkpoint")),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
@given(ops=st.lists(_gencl_op, min_size=3, max_size=7))
def test_txnlog_generated_clustering_sequences_match_dict_model(
    spark, tmp_path_factory, ops
):
    import pytest

    from telecom_dataengineering_pipeline_spark.sources.txnlog import (
        ConstraintViolation,
        TxnLogTable,
    )

    path = str(tmp_path_factory.mktemp("genclseq") / "t")
    t = TxnLogTable(path, stat_cols=("k",), checkpoint_interval=0)
    # model: k -> (v, tag); invariant under an ACTIVE rule: tag == k + v.
    # has_d: whether a defaulted column exists; its CURRENT logical name is
    # dname (renames follow it), its default literal is dval, its PHYSICAL
    # storage name is d_phys (the add-time name — forever), and tombstones
    # holds physical names whose drop makes them unaddable (resurrection
    # guard). Writes never provide the column, so every row must read dval
    # whenever it exists.
    model = {k: (0, k) for k in range(5)}
    vname, rule, has_d = "v", False, False
    dname, dval, d_phys = "d", 7, "d"
    tombstones: set = set()
    t.create_or_replace(
        spark.createDataFrame(
            sorted((k, v, tag) for k, (v, tag) in model.items()),
            "k long, v long, tag long",
        ).coalesce(2)
    )
    history = {
        t.version(): (dict(model), vname, rule, has_d, dname, dval, d_phys, frozenset())
    }

    def valid():
        return all(tag == k + v for k, (v, tag) in model.items())

    def check():
        rows = t.read(spark).collect()
        got = {r["k"]: (r[vname], r["tag"]) for r in rows}
        assert got == model
        cols = ["k", vname, "tag"] + ([dname] if has_d else [])
        assert t.read(spark).columns == cols
        if has_d:
            # the default is total: filled on every write path, coalesced
            # over every pre-add file, through restores and restarts
            assert all(r[dname] == dval for r in rows)
        # stats-pruned read across mixed clustering generations stays exact
        got3 = {
            r["k"]: (r[vname], r["tag"])
            for r in t.read(spark, where=[("k", "=", 3)]).collect()
        }
        assert got3 == {k: kv for k, kv in model.items() if k == 3}

    for op in ops:
        kind = op[0]
        if kind == "append":
            fresh = list({k: (k, v) for k, v in op[1] if k not in model}.values())
            if not fresh:
                continue
            if rule and not op[2]:
                # fill path: the generated column is ABSENT from the frame
                t.append(
                    spark.createDataFrame(fresh, f"k long, {vname} long")
                )
            else:
                # validate path (rule on) / plain 3-col write (rule off)
                t.append(
                    spark.createDataFrame(
                        [(k, v, k + v) for k, v in fresh],
                        f"k long, {vname} long, tag long",
                    )
                )
            model.update({k: (v, k + v) for k, v in fresh})
        elif kind == "update_mor":
            v0 = t.version()
            t.update_where_mor(
                spark, [("k", "=", op[1])], {vname: F.col(vname) + op[2]}
            )
            if op[1] in model:
                v, tag = model[op[1]]
                nv = v + op[2]
                # an active rule recomputes tag; without it tag goes STALE
                model[op[1]] = (nv, op[1] + nv if rule else tag)
            if t.version() == v0:
                check()
                continue
        elif kind == "delete_mor":
            v0 = t.version()
            t.delete_where_mor(spark, [("k", "=", op[1])])
            model.pop(op[1], None)
            if t.version() == v0:
                check()
                continue
        elif kind == "merge_delete":
            v0 = t.version()
            keys = sorted(set(op[1]))
            t.merge_delete_mor(
                spark,
                spark.createDataFrame([(k,) for k in keys], "k long"),
                keys=("k",),
            )
            for k in keys:
                model.pop(k, None)
            if t.version() == v0:
                check()
                continue
        elif kind == "merge_mor":
            src = list({k: (k, v) for k, v in op[1]}.values())
            if rule:
                sdf = spark.createDataFrame(src, f"k long, {vname} long")
            else:
                sdf = spark.createDataFrame(
                    [(k, v, k + v) for k, v in src],
                    f"k long, {vname} long, tag long",
                )
            # (v, tag) ordering makes the winner deterministic even when a
            # stale-tag target row ties a source row on v
            t.merge_keep_latest_mor(
                spark,
                sdf,
                keys=("k",),
                order_by=[F.col(vname).desc(), F.col("tag").desc()],
            )
            for k, v in src:
                cand = [(v, k + v)]
                if k in model:
                    cand.append(model[k])
                model[k] = max(cand)
        elif kind == "set_gen":
            if rule:
                with pytest.raises(ValueError, match="already generated"):
                    t.set_generated_column(spark, "tag", f"k + {vname}")
            elif valid():
                t.set_generated_column(spark, "tag", f"k + {vname}")
                rule = True
            else:
                # rows made stale while the rule was off must be rejected
                with pytest.raises(ConstraintViolation):
                    t.set_generated_column(spark, "tag", f"k + {vname}")
                check()
                continue  # no commit happened
        elif kind == "drop_gen":
            if rule:
                t.drop_generated_column_rule("tag")
                rule = False
            else:
                with pytest.raises(ValueError, match="no such generated"):
                    t.drop_generated_column_rule("tag")
                check()
                continue
        elif kind == "set_cluster":
            t.set_clustering(([], ["k"], ["tag"])[op[1]])
        elif kind == "add_default":
            name, val = op[1], op[2]
            # Guard priority mirrors add_column's own: already-exists,
            # then the drop tombstone (physical resurrection guard), then
            # the physical-name collision (the renamed column's storage
            # name is taken even though no logical column bears it).
            if has_d and name == dname:
                with pytest.raises(ValueError, match="already exists"):
                    t.add_column(spark, name, "long", str(val))
                check()
                continue
            if name in tombstones:
                with pytest.raises(ValueError, match="previously dropped"):
                    t.add_column(spark, name, "long", str(val))
                check()
                continue
            if has_d and name == d_phys:
                with pytest.raises(ValueError, match="physical storage name"):
                    t.add_column(spark, name, "long", str(val))
                check()
                continue
            if has_d:
                continue  # a legal SECOND defaulted column: out of model scope
            # drop-then-re-add under a DIFFERENT name/default is legal —
            # a brand-new physical column, no resurrection possible
            t.add_column(spark, name, "long", str(val))
            has_d, dname, dval, d_phys = True, name, val, name
        elif kind == "rename_default":
            if not has_d:
                with pytest.raises(ValueError, match="no such column"):
                    t.rename_column("d", "d2")
                check()
                continue
            nxt = "d2" if dname == "d" else "d"
            # renaming a column that HAS a default: the default (and its
            # physical identity) follow the logical name — including a
            # rename BACK onto its own physical storage name
            t.rename_column(dname, nxt)
            dname = nxt
        elif kind == "drop_default":
            if not has_d:
                with pytest.raises(ValueError, match="no such column"):
                    t.drop_column("d")
                check()
                continue
            t.drop_column(dname)
            tombstones.add(d_phys)  # tombstone is PHYSICAL, not logical
            has_d = False
        elif kind == "cdf_span":
            # CDF-align versions across whatever happened in the span —
            # renames, defaults added/dropped/re-added, restores, MOR and
            # COW DML, optimize rewrites. Invariants: (a) the feed emits
            # under the AFTER version's logical names; (b) applying
            # deletes-then-inserts to the FROM version's model yields the
            # current model, with delete rows carrying the FROM values;
            # (c) the defaulted column reads in the feed exactly as reads
            # at each endpoint did — inserts show the live default, and
            # deletes show the FROM default only while the physical column
            # is the SAME one (a drop+re-add is a different column, so
            # pre-span rows rightly read NULL under the new physical).
            candidates = sorted(history)
            va = candidates[max(0, len(candidates) - 1 - op[1])]
            m_a, _, _, hd_a, _, dv_a, dp_a, _ = history[va]
            cdf = t.table_changes(spark, va, t.version()).collect()
            dels = [r for r in cdf if r["_change_type"] == "delete"]
            ins = [r for r in cdf if r["_change_type"] == "insert"]
            work = dict(m_a)
            for r in dels:
                assert work.pop(r["k"]) == (r[vname], r["tag"])
            for r in ins:
                assert r["k"] not in work
                work[r["k"]] = (r[vname], r["tag"])
            assert work == model
            if has_d:
                for r in ins:
                    assert r[dname] == dval
                exp_del = dv_a if (hd_a and dp_a == d_phys) else None
                for r in dels:
                    assert r[dname] == exp_del
            check()
            continue  # no commit happened
        elif kind == "rename":
            nxt = "v2" if vname == "v" else "v"
            if rule:
                # the rule's SQL references the value column: refuse
                with pytest.raises(ValueError, match="generated column"):
                    t.rename_column(vname, nxt)
                check()
                continue
            t.rename_column(vname, nxt)
            vname = nxt
        elif kind == "restore":
            candidates = sorted(history)
            target = candidates[max(0, len(candidates) - 1 - op[1])]
            t.restore(target)
            snap = history[target]
            model = dict(snap[0])
            vname, rule, has_d, dname, dval, d_phys = snap[1:7]
            tombstones = set(snap[7])
        elif kind == "optimize":
            t.optimize(spark, target_files=1)
        elif kind == "checkpoint":
            t.checkpoint()
            t = TxnLogTable(path, stat_cols=("k",), checkpoint_interval=0)
        history[t.version()] = (
            dict(model), vname, rule, has_d, dname, dval, d_phys, frozenset(tombstones)
        )
        check()


# ---------------------------------------------------------------------------
# Interop append-chain models (VERDICT r8 item 5): the r8 multi-commit
# Delta appends and multi-snapshot Iceberg appends (+ r9 position deletes)
# were covered only by directed tests. These models interleave appends,
# schema-mismatch attempts, positional deletes, validator runs, and
# time-travel reads, checking the replayed rows against a plain multiset
# model after every operation — the defaults×rename×CDF precedent found a
# real bug with exactly this shape.
# ---------------------------------------------------------------------------

_ice_rows = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 99)), min_size=1, max_size=4
)

_ice_op = st.one_of(
    st.tuples(st.just("append"), _ice_rows),
    st.tuples(st.just("append_bad_schema")),
    st.tuples(st.just("append_bad_types")),
    st.tuples(st.just("delete"), st.integers(0, 9)),
    st.tuples(st.just("eq_delete"), st.integers(0, 9)),
    st.tuples(st.just("validate")),
    st.tuples(st.just("time_travel"), st.integers(0, 7)),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
@given(ops=st.lists(_ice_op, min_size=2, max_size=5))
def test_iceberg_chain_matches_multiset_model(spark, tmp_path_factory, ops):
    from telecom_dataengineering_pipeline_spark.sources.iceberg_export import (
        append_iceberg_snapshot,
        delete_iceberg_rows,
        delete_iceberg_rows_equality,
        export_iceberg_snapshot,
        read_iceberg_snapshot,
        validate_iceberg_metadata,
    )
    from telecom_dataengineering_pipeline_spark.sources.txnlog import TxnLogTable

    base = tmp_path_factory.mktemp("iceseq")
    t = TxnLogTable(str(base / "src"), stat_cols=("k",))
    model = [(0, 10), (1, 11), (2, 12)]
    t.create_or_replace(spark.createDataFrame(model, "k long, v long").coalesce(2))
    dest = str(base / "ice")
    info = export_iceberg_snapshot(t, spark, dest)
    history = {info["snapshot_id"]: sorted(model)}

    def check(snapshot_id=None, want=None):
        got = sorted(
            (r["k"], r["v"])
            for r in read_iceberg_snapshot(spark, dest, snapshot_id=snapshot_id).collect()
        )
        assert got == (sorted(model) if want is None else want)

    for op in ops:
        kind = op[0]
        if kind == "append":
            rows = list(op[1])
            info = append_iceberg_snapshot(
                spark.createDataFrame(rows, "k long, v long"), spark, dest
            )
            model.extend(rows)
            history[info["snapshot_id"]] = sorted(model)
        elif kind == "append_bad_schema":
            with pytest.raises(ValueError, match="append schema"):
                append_iceberg_snapshot(
                    spark.createDataFrame([(1,)], "k long"), spark, dest
                )
        elif kind == "append_bad_types":
            with pytest.raises(ValueError, match="column types mismatch"):
                append_iceberg_snapshot(
                    spark.createDataFrame([(1, "nope")], "k long, v string"),
                    spark,
                    dest,
                )
        elif kind == "eq_delete":
            key = op[1]
            if any(k == key for k, _ in model):
                info = delete_iceberg_rows_equality(
                    spark, dest, f"k = {key}", ["k"]
                )
                model = [(k, v) for k, v in model if k != key]
                history[info["snapshot_id"]] = sorted(model)
            else:
                with pytest.raises(ValueError, match="matched no rows"):
                    delete_iceberg_rows_equality(spark, dest, f"k = {key}", ["k"])
        elif kind == "delete":
            key = op[1]
            if any(k == key for k, _ in model):
                info = delete_iceberg_rows(spark, dest, f"k = {key}")
                model = [(k, v) for k, v in model if k != key]
                history[info["snapshot_id"]] = sorted(model)
            else:
                with pytest.raises(ValueError, match="matched no rows"):
                    delete_iceberg_rows(spark, dest, f"k = {key}")
        elif kind == "validate":
            summary = validate_iceberg_metadata(dest, spark)
            assert summary["n_files"] >= 1
        elif kind == "time_travel":
            sids = sorted(history)
            sid = sids[op[1] % len(sids)]
            check(snapshot_id=sid, want=history[sid])
        check()


_delta_op = st.one_of(
    st.tuples(st.just("append"), _ice_rows),
    st.tuples(st.just("append_bad_schema")),
    st.tuples(st.just("validate")),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
@given(ops=st.lists(_delta_op, min_size=2, max_size=5))
def test_delta_chain_matches_multiset_model(spark, tmp_path_factory, ops):
    from telecom_dataengineering_pipeline_spark.sources.delta_export import (
        append_delta_snapshot,
        export_delta_snapshot,
        read_delta_snapshot,
        validate_delta_log,
    )
    from telecom_dataengineering_pipeline_spark.sources.txnlog import TxnLogTable

    base = tmp_path_factory.mktemp("deltaseq")
    t = TxnLogTable(str(base / "src"), stat_cols=("k",))
    model = [(0, 10), (1, 11), (2, 12)]
    t.create_or_replace(spark.createDataFrame(model, "k long, v long").coalesce(2))
    dest = str(base / "delta")
    export_delta_snapshot(t, spark, dest)

    def check():
        got = sorted((r["k"], r["v"]) for r in read_delta_snapshot(spark, dest).collect())
        assert got == sorted(model)

    for op in ops:
        kind = op[0]
        if kind == "append":
            rows = list(op[1])
            append_delta_snapshot(
                spark.createDataFrame(rows, "k long, v long"), spark, dest
            )
            model.extend(rows)
        elif kind == "append_bad_schema":
            with pytest.raises(ValueError, match="schema"):
                append_delta_snapshot(
                    spark.createDataFrame([(1,)], "k long"), spark, dest
                )
        elif kind == "validate":
            summary = validate_delta_log(dest)
            assert summary["n_active_files"] >= 1 and summary["n_rows"] == len(model)
        check()


# ---------------------------------------------------------------------------
# quantile_bucket_scores(exact=True): the cutoffs must equal the value at
# rank ceil(p*n) (row_number definition, ties with multiplicity) for ANY
# data distribution, bucket count, and sketch accuracy — the refinement
# must absorb whatever rank error the sketch commits.
# ---------------------------------------------------------------------------

_metric_vals = st.lists(
    st.integers(min_value=-50, max_value=50).map(float),
    min_size=1,
    max_size=80,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(vals=_metric_vals, k=st.integers(min_value=2, max_value=6),
       accuracy=st.sampled_from([20, 100, 10000]))
@pytest.mark.slow
def test_quantile_bucket_exact_matches_rank_model(spark, vals, k, accuracy):
    import math

    from telecom_dataengineering_pipeline_spark.operators.windows import (
        quantile_bucket_scores,
    )

    df = spark.createDataFrame([(v,) for v in vals], "m double").coalesce(2)
    out = quantile_bucket_scores(df, ["m"], k=k, accuracy=accuracy, exact=True)

    srt = sorted(vals)
    n = len(srt)
    cuts = [srt[math.ceil(i / k * n) - 1] for i in range(1, k)]
    want = sorted((v, 1 + sum(v > c for c in cuts)) for v in vals)
    got = sorted((r["m"], r["m_bucket"]) for r in out.collect())
    assert got == want
