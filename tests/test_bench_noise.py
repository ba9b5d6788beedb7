"""Ambient-noise sentinel (VERDICT r11 item 2): every bench JSON carries
a ``noise_probe`` block so a judge/driver can mechanically discount a
session measured on a contended host instead of re-running it. These pin
the probe's shape and the flag logic; the end-to-end JSON contract is
covered by driving ``bench.py`` at a small SF in the round workflow."""

from __future__ import annotations

from telecom_dataengineering_pipeline_spark.benchlib import (
    PROBE_NOISY_FACTOR,
    noise_flags,
    noise_probe,
)


def test_noise_probe_shape():
    p = noise_probe()
    assert set(p) == {"loadavg_1m", "foreign_java_procs", "probe_sec", "probe_inflation"}
    assert p["probe_sec"] > 0
    assert p["probe_inflation"] > 0
    # the probe is self-consistent: inflation is sec / pinned reference
    from telecom_dataengineering_pipeline_spark.benchlib import PROBE_REFERENCE_SEC

    assert abs(p["probe_inflation"] - p["probe_sec"] / PROBE_REFERENCE_SEC) < 0.01
    # foreign java excludes our own session's child JVM: a pytest-spark run
    # has exactly the fixture JVM alive, owned by this process
    assert p["foreign_java_procs"] >= 0


def test_noise_flags_logic():
    quiet = {"loadavg_1m": 0.3, "foreign_java_procs": 0, "probe_inflation": 1.02}
    assert noise_flags(quiet, quiet) == []

    hot = {
        "loadavg_1m": 14.0,
        "foreign_java_procs": 2,
        "probe_inflation": PROBE_NOISY_FACTOR + 0.5,
    }
    flags = noise_flags(hot, quiet)
    assert any("contention" in f for f in flags)
    assert any("java" in f for f in flags)
    assert any("loadavg" in f for f in flags)
    # loadavg flags only at session START: the bench itself saturates the
    # host, so the end reading always reflects our own work
    end_only = noise_flags(quiet, hot)
    assert any("contention" in f for f in end_only)
    assert not any("loadavg" in f for f in end_only)
    # flags annotate — they are strings for a human/judge, never a verdict
    assert all(isinstance(f, str) for f in flags)
