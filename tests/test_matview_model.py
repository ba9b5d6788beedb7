"""Randomized incremental-view-maintenance model: arbitrary interleavings
of base-table DML (appends, COW deletes, MOR deletes, upserts via
delete+append), layout churn (OPTIMIZE, checkpoint restarts) and catch-up
points must leave the rollup EQUAL to a from-scratch recompute of the base
— the IVM twin of the txnlog dict-model. Skipped catch-ups model crashes
(the next catch-up recovers every missed version); double catch-ups model
replays (txn-id no-ops)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.operators.matview import IncrementalRollup
from telecom_dataengineering_pipeline_spark.sources.txnlog import TxnLogTable

_GROUPS = ["g0", "g1", "g2", "g3"]

_ivm_op = st.one_of(
    st.tuples(
        st.just("append"),
        st.lists(
            st.tuples(st.integers(0, 29), st.integers(0, 3), st.integers(1, 99)),
            min_size=1,
            max_size=4,
        ),
    ),
    st.tuples(st.just("delete_cow"), st.integers(0, 29)),
    st.tuples(st.just("delete_mor"), st.lists(st.integers(0, 29), min_size=1, max_size=3)),
    st.tuples(
        st.just("upsert"),
        st.integers(0, 29),
        st.integers(0, 3),
        st.integers(100, 199),
    ),
    st.tuples(st.just("optimize")),
    st.tuples(st.just("checkpoint")),
    st.tuples(st.just("catch_up")),
    st.tuples(st.just("catch_up_twice")),
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
@given(ops=st.lists(_ivm_op, min_size=3, max_size=8))
def test_ivm_matches_recompute_under_random_interleavings(
    spark, tmp_path_factory, ops
):
    root = tmp_path_factory.mktemp("ivmmodel")
    base = TxnLogTable(str(root / "base"), stat_cols=("id",), checkpoint_interval=0)
    view = TxnLogTable(str(root / "view"), stat_cols=("g",), checkpoint_interval=0)
    rollup = IncrementalRollup(view, group_cols=["g"], sum_cols=["x"])

    model: dict[int, tuple[str, int]] = {i: (_GROUPS[i % 4], 10 + i) for i in range(6)}
    base.create_or_replace(
        spark.createDataFrame(
            sorted((i, g, x) for i, (g, x) in model.items()),
            "id long, g string, x long",
        ).coalesce(2)
    )

    def expected():
        out: dict[str, tuple[int, int]] = {}
        for g, x in model.values():
            n, s = out.get(g, (0, 0))
            out[g] = (n + 1, s + x)
        return {g: v for g, v in out.items() if v[0] > 0}

    def check_view():
        got = {
            r["g"]: (r["n_rows"], int(r["sum_x"]))
            for r in rollup.read(spark).collect()
        }
        assert got == expected()

    for op in ops:
        kind = op[0]
        if kind == "append":
            fresh = {i: (g, x) for i, g, x in op[1] if i not in model}
            if not fresh:
                continue
            base.append(
                spark.createDataFrame(
                    sorted((i, _GROUPS[gi], x) for i, (gi, x) in fresh.items()),
                    "id long, g string, x long",
                )
            )
            model.update({i: (_GROUPS[gi], x) for i, (gi, x) in fresh.items()})
        elif kind == "delete_cow":
            v0 = base.version()
            base.delete_where(spark, [("id", "=", op[1])])
            model.pop(op[1], None)
            if base.version() == v0:
                continue  # no-op delete: nothing to fold
        elif kind == "delete_mor":
            v0 = base.version()
            base.merge_delete_mor(
                spark,
                spark.createDataFrame([(k,) for k in sorted(set(op[1]))], "id long"),
                keys=("id",),
            )
            for k in op[1]:
                model.pop(k, None)
            if base.version() == v0:
                continue
        elif kind == "upsert":
            i, gi, x = op[1], _GROUPS[op[2]], op[3]
            v0 = base.version()
            base.delete_where(spark, [("id", "=", i)])
            base.append(spark.createDataFrame([(i, gi, x)], "id long, g string, x long"))
            model[i] = (gi, x)
        elif kind == "optimize":
            base.optimize(spark, target_files=1)
        elif kind == "checkpoint":
            base.checkpoint()
            base = TxnLogTable(str(root / "base"), stat_cols=("id",), checkpoint_interval=0)
        elif kind == "catch_up":
            rollup.catch_up(base, spark)
            check_view()
        elif kind == "catch_up_twice":
            rollup.catch_up(base, spark)
            before = view.version()
            rollup.catch_up(base, spark)  # replay: txn-id no-ops, no commits
            assert view.version() == before
            check_view()

    # final recovery: whatever DML was never caught up folds in now
    rollup.catch_up(base, spark)
    check_view()
    # and the incremental result equals a literal full recompute
    full = {
        r["g"]: (r["n"], int(r["s"]))
        for r in base.read(spark)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("x").cast("decimal(38,6)")).cast("long").alias("s"),
        )
        .collect()
    }
    got = {
        r["g"]: (r["n_rows"], int(r["sum_x"])) for r in rollup.read(spark).collect()
    }
    assert got == full == expected()
