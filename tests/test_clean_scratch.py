"""tools/clean_scratch.py triage: fixtures survive, per-run scratch
and crash-leaked atomic-build staging copies go, unknown rtdac_ names
are kept conservatively — gated on a sandboxed temp root instead of
trusting the round checklist to catch a misclassification."""

from __future__ import annotations

import importlib.util
import sys


def _load_clean_scratch():
    spec = importlib.util.spec_from_file_location(
        "clean_scratch", "/root/repo/tools/clean_scratch.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


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
