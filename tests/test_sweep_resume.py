"""Resume semantics of oracle_check.sweep (ADVICE r10): an OK entry only
skips when it was recorded at the CURRENT sf_dir, and the per-query flush
is atomic (temp + os.replace) so a kill mid-write can't truncate the
artifact the resume depends on."""

from __future__ import annotations

import json

from telecom_dataengineering_pipeline_spark.oracle_check import sweep

_NAME = "top_orders_by_price"
_SF = "/root/testdata/sf0.001"


def test_sweep_resume_skips_only_same_sf_entries(tmp_path, capsys):
    out = tmp_path / "sweep.json"

    # Seed an artifact whose OK entry was recorded at ANOTHER scale: the
    # resume must NOT skip it (a skip would present a mixed-scale sweep
    # as one artifact).
    out.write_text(json.dumps({_NAME: {"ok": True, "sf_dir": "/root/testdata/sf0.01"}}))
    assert sweep(_SF, str(out), [_NAME]) == 0
    rec = json.loads(out.read_text())[_NAME]
    assert rec["ok"] and rec["sf_dir"] == _SF  # re-ran and re-recorded here
    assert "other scale" in capsys.readouterr().out

    # Same-scale OK entry resumes as a skip: the sentinel detail survives
    # untouched, proving the query did not re-run.
    rec["detail"] = "sentinel-not-rerun"
    out.write_text(json.dumps({_NAME: rec}))
    assert sweep(_SF, str(out), [_NAME]) == 0
    assert json.loads(out.read_text())[_NAME]["detail"] == "sentinel-not-rerun"

    # Flush left no temp file behind (atomic-replace discipline).
    assert not (tmp_path / "sweep.json.tmp").exists()


def test_pin_staging_mtimes_raises_on_missing_or_empty_shard(tmp_path):
    """A mis-staged query must fail loudly: os.walk on a missing shard
    yields nothing, and an unstamped shard streams in undefined order."""
    import os

    import pytest

    from telecom_dataengineering_pipeline_spark.streaming.staging import (
        pin_staging_mtimes,
    )

    staging = str(tmp_path)
    os.makedirs(os.path.join(staging, "b0"))
    (tmp_path / "b0" / "part-0.parquet").write_bytes(b"x")
    with pytest.raises(FileNotFoundError, match="b1"):
        pin_staging_mtimes(staging, 2)  # b1 never staged
    os.makedirs(os.path.join(staging, "b1"))
    with pytest.raises(FileNotFoundError, match="b1"):
        pin_staging_mtimes(staging, 2)  # b1 present but empty
    (tmp_path / "b1" / "part-0.parquet").write_bytes(b"y")
    pin_staging_mtimes(staging, 2)
    m0 = (tmp_path / "b0" / "part-0.parquet").stat().st_mtime
    m1 = (tmp_path / "b1" / "part-0.parquet").stat().st_mtime
    assert m0 < m1  # strictly increasing trigger order
