"""Local replica of the driver's correctness harness.

Runs a registered query on Spark and its oracle SQL on DuckDB (same parquet
tables registered as views, as the driver does), then compares row count,
column names/types, and order-insensitive values. Used by tests and by
``python -m telecom_dataengineering_pipeline_spark.oracle_check [--sf DIR] [names...]``.
"""

from __future__ import annotations

import math
import os
import sys
from dataclasses import dataclass

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from .queries.registry import REGISTRY
from .sources.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir.rstrip('/')}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def _values_equal(a: object, b: object) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        # repr-strict: the driver may hash stringified values, where
        # "0.0" != "-0.0" and ulp differences show — require bit-identity.
        return repr(a) == repr(b)
    if pd.isna(a) and pd.isna(b):  # type: ignore[arg-type]
        return True
    return str(a) == str(b)


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str
    spark_rows: int = -1
    oracle_rows: int = -1


def check_query(spark: SparkSession, name: str, sf_dir: str) -> ParityResult:
    spec = REGISTRY[name]
    return check_frame(spec.fn(spark, sf_dir), spec.oracle, sf_dir, name)


def check_frame(
    sdf, oracle: str | None, sf_dir: str, name: str = "<unregistered>"
) -> ParityResult:
    """The driver-replica comparison for an arbitrary (DataFrame, oracle
    SQL) pair — lets tests value-gate REGISTRATION CANDIDATES with the
    identical row-count / column / repr-strict value logic before they
    enter the registry (check_query is this applied to a REGISTRY entry)."""
    spark_pd = sdf.toPandas()
    if oracle is None:
        return ParityResult(name, True, f"rows-only ({len(spark_pd)} rows)", len(spark_pd), -1)
    con = duckdb_connection(sf_dir)
    try:
        duck_pd = con.execute(oracle).fetchdf()
    finally:
        con.close()

    if len(spark_pd) != len(duck_pd):
        return ParityResult(
            name, False, f"row count: spark={len(spark_pd)} duckdb={len(duck_pd)}",
            len(spark_pd), len(duck_pd),
        )
    if sorted(spark_pd.columns) != sorted(duck_pd.columns):
        return ParityResult(
            name, False,
            f"columns: spark={sorted(spark_pd.columns)} duckdb={sorted(duck_pd.columns)}",
            len(spark_pd), len(duck_pd),
        )
    s = _normalize(spark_pd)
    d = _normalize(duck_pd)
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if not _values_equal(a, b):
                return ParityResult(
                    name, False,
                    f"value mismatch col={col} row={i}: spark={a!r} duckdb={b!r}",
                    len(spark_pd), len(duck_pd),
                )
    return ParityResult(name, True, f"match ({len(spark_pd)} rows)", len(spark_pd), len(duck_pd))


def _current_round() -> int:
    """Next round number = max committed CORRECTNESS_r*.json + 1."""
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    rounds = [
        int(m.group(1))
        for p in root.glob("CORRECTNESS_r*.json")
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p.name))
    ]
    return (max(rounds) + 1) if rounds else 0


def sweep(sf_dir: str, out_path: str | None, names: list[str]) -> int:
    """Resumable full-registry sweep (VERDICT r9 item 9): runs every name
    through the driver-replica check and records a driver-shaped JSON
    artifact, flushed after EVERY query so an interrupted sweep resumes
    where it stopped (names already recorded OK are skipped; recorded
    failures re-run). One command re-verifies the whole registry:

        python -m telecom_dataengineering_pipeline_spark.oracle_check \\
            --sweep [--sf DIR] [--out FILE] [names...]
    """
    import json
    import time
    from pathlib import Path

    from .session import get_spark

    sf_tag = Path(sf_dir.rstrip("/")).name
    path = Path(out_path) if out_path else Path(f"SWEEP_r{_current_round():02d}_{sf_tag}.json")
    results: dict[str, dict] = {}
    if path.exists():
        results = json.loads(path.read_text())
        # Only entries verified at THIS sf_dir count as done — resuming an
        # artifact recorded at another scale would otherwise silently mix
        # scales into what presents as one sweep.
        def _done(n: str) -> bool:
            e = results.get(n, {})
            return bool(e.get("ok")) and e.get("sf_dir") == sf_dir

        wrong_sf = sorted({
            e["sf_dir"]
            for n in names
            if (e := results.get(n, {})).get("ok") and e.get("sf_dir") != sf_dir
        })
        if wrong_sf:
            print(
                f"resuming {path}: ignoring OK entries recorded at other "
                f"scale(s) {wrong_sf}; re-running them at {sf_dir}"
            )
        done_ok = [n for n in names if _done(n)]
        if done_ok:
            print(f"resuming {path}: {len(done_ok)} names already OK, skipping")
        names = [n for n in names if not _done(n)]
    spark = get_spark("oracle-sweep")
    failures = 0
    for i, n in enumerate(names):
        t0 = time.monotonic()
        try:
            r = check_query(spark, n, sf_dir)
        except Exception as e:
            r = ParityResult(n, False, f"exception: {type(e).__name__}: {e}")
        elapsed = round(time.monotonic() - t0, 2)
        results[n] = {
            "ok": r.ok,
            "detail": r.detail,
            "spark_rows": r.spark_rows,
            "oracle_rows": r.oracle_rows,
            "sf_dir": sf_dir,
            "elapsed_s": elapsed,
        }
        # atomic flush: a kill mid-write must not truncate the artifact
        # (the next resume json.loads it)
        tmp = path.with_name(path.name + ".tmp")
        tmp.write_text(json.dumps(results, indent=1))
        os.replace(tmp, path)
        status = "OK  " if r.ok else "FAIL"
        print(f"[{i + 1}/{len(names)}] {status} {n}: {r.detail} ({elapsed}s)", flush=True)
        failures += 0 if r.ok else 1
    n_ok = sum(1 for v in results.values() if v["ok"])
    print(f"\n{n_ok}/{len(results)} recorded OK -> {path}")
    return 1 if failures else 0


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    do_sweep = "--sweep" in args
    if do_sweep:
        args.remove("--sweep")
    names = args or list(REGISTRY)
    if do_sweep:
        return sweep(sf_dir, out_path, names)

    from .session import get_spark

    spark = get_spark("oracle-check")
    failures = 0
    for n in names:
        try:
            r = check_query(spark, n, sf_dir)
        except Exception as e:  # surface per-query instead of dying
            r = ParityResult(n, False, f"exception: {type(e).__name__}: {e}")
        status = "OK  " if r.ok else "FAIL"
        print(f"{status} {n}: {r.detail}")
        failures += 0 if r.ok else 1
    print(f"\n{len(names) - failures}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
