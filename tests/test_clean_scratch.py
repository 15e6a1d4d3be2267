"""tools/clean_scratch.py triage: fixtures survive, per-run scratch
and crash-leaked atomic-build staging copies go, unknown rtdac_ names
are kept conservatively — gated on a sandboxed temp root instead of
trusting the round checklist to catch a misclassification."""

from __future__ import annotations

import importlib.util
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def _load_clean_scratch():
    spec = importlib.util.spec_from_file_location(
        "clean_scratch", str(REPO / "tools" / "clean_scratch.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fixture_build_recovers_from_stale_squatter(
    spark, tmp_path, monkeypatch
):
    """A rename failure during the atomic fixture promote does NOT
    always mean another session won with a complete fixture: a
    stale/partial out_dir (crashed old run, old layout) squats on the
    path too.  The builder must evict the squatter and promote its own
    complete staging copy rather than deleting it."""
    import os
    import tempfile

    from tests.conftest import SF_SMOKE

    from real_time_data_analytics_cassandra_spark import queries as q

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    first = q.build_copurchase_pairs_fixture(spark, SF_SMOKE)
    assert os.path.isdir(os.path.join(first, "pairs"))
    # simulate the squatter: same keyed path, no pairs/ inside
    import shutil

    shutil.rmtree(first)
    os.makedirs(first)
    with open(os.path.join(first, "junk"), "w") as fh:
        fh.write("stale")
    again = q.build_copurchase_pairs_fixture(spark, SF_SMOKE)
    assert again == first
    assert os.path.isdir(os.path.join(again, "pairs"))
    assert not os.path.exists(os.path.join(again, "junk"))
    assert spark.read.parquet(os.path.join(again, "pairs")).count() > 0


def test_triage_keeps_fixtures_drops_scratch_and_stage(tmp_path, monkeypatch):
    cs = _load_clean_scratch()
    kept = [
        "rtdac_copurchase_sf001_1_2",   # fixture prefix
        "rtdac_bm25_idx_sf001_1_2",     # fixture prefix
        "rtdac_stream",                  # FIXTURE_EXACT name
        "rtdac_totally_unknown_thing",   # unknown: conservative keep
    ]
    removed = [
        "rtdac_ckpt_streaming_ks_abc",   # per-run scratch prefix
        "rtdac_copurchase_sf001_1_2.stage-deadbeef",  # leaked stage
        "rtdac_bm25_idx_x.stage-01",     # stage wins over fixture prefix
    ]
    for name in kept + removed:
        (tmp_path / name).mkdir()
        (tmp_path / name / "payload").write_text("x")
    monkeypatch.setattr(cs.tempfile, "gettempdir", lambda: str(tmp_path))
    cs.main()
    survivors = {p.name for p in tmp_path.iterdir()}
    assert survivors == set(kept), survivors
