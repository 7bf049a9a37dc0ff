"""bench.py wedge-survival orchestrator: parse, cache, stale fallback.

Round-3 lesson: the driver's bench run recorded value=0 because a single
90s probe overlapped a TPU wedge (BENCH_r03.json).  The orchestrator must
(a) pick the result line out of noisy stdout, (b) cache good results,
(c) emit the last-known-good with stale:true instead of a zero.
"""
import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def test_parse_result_line_picks_last_json_result():
    out = (
        "WARNING: platform 'axon' is experimental\n"
        '{"not": "a result"}\n'
        '{"metric": "frames_scored_per_sec", "value": 1.0, "unit": "x"}\n'
        '{"metric": "frames_scored_per_sec", "value": 2.5, "unit": "x"}\n'
    )
    res = bench._parse_result_line(out)
    assert res is not None and res["value"] == 2.5


def test_parse_result_line_none_on_garbage():
    assert bench._parse_result_line("no json here\n{broken\n") is None


def test_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "CACHE_PATH", tmp_path / "cache.json")
    result = {"metric": "frames_scored_per_sec", "value": 123.0,
              "unit": "frames/s", "vs_baseline": 7.0}
    bench._save_cache(result)
    cached, measured_at, source = bench._load_cache()
    assert cached == result
    assert measured_at and source == str(tmp_path / "cache.json")
    payload = json.loads((tmp_path / "cache.json").read_text())
    assert "measured_at" in payload and "commit" in payload


def test_load_cache_falls_back_to_driver_bench_records(tmp_path,
                                                       monkeypatch):
    # no cache file -> newest BENCH_r*.json with a nonzero value wins
    monkeypatch.setattr(bench, "CACHE_PATH", tmp_path / "nope.json")
    cached, measured_at, source = bench._load_cache()
    if not list(REPO.glob("BENCH_r*.json")):
        pytest.skip("no driver bench records in this checkout")
    assert cached is not None and cached["value"] > 0
    assert "BENCH_r" in source


def test_zero_value_results_never_cached_or_served(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "CACHE_PATH", tmp_path / "cache.json")
    (tmp_path / "cache.json").write_text(json.dumps(
        {"result": {"metric": "m", "value": 0}, "measured_at": "t"}))
    monkeypatch.setattr(Path, "glob", lambda self, pat: iter(()))
    cached, _, _ = bench._load_cache()
    assert cached is None


def test_orchestrator_emits_stale_result_under_persistent_wedge(
        tmp_path, monkeypatch, capsys):
    """Persistent probe failure + a cached result => stale JSON, rc 0."""
    monkeypatch.setattr(bench, "CACHE_PATH", tmp_path / "cache.json")
    bench._save_cache({"metric": "frames_scored_per_sec", "value": 42.0,
                       "unit": "frames/s", "vs_baseline": 3.0})
    monkeypatch.setattr(bench, "_device_responsive", lambda *a, **k: False)
    monkeypatch.setenv("EDSNET_BENCH_BUDGET_S", "1")
    bench.main()  # must not sys.exit when a cache exists
    out = capsys.readouterr().out
    res = bench._parse_result_line(out)
    assert res["value"] == 42.0
    assert res["stale"] is True
    assert "stale_from" in res and "error" in res


def test_orchestrator_uses_fresh_measurement_and_refreshes_cache(
        tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(bench, "CACHE_PATH", tmp_path / "cache.json")
    monkeypatch.setattr(bench, "_device_responsive", lambda *a, **k: True)

    fresh = {"metric": "frames_scored_per_sec", "value": 99.0,
             "unit": "frames/s", "vs_baseline": 5.0}

    class FakeCompleted:
        returncode = 0
        stdout = "warning noise\n" + json.dumps(fresh) + "\n"
        stderr = ""

    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: FakeCompleted())
    monkeypatch.setenv("EDSNET_BENCH_BUDGET_S", "30")
    bench.main()
    res = bench._parse_result_line(capsys.readouterr().out)
    assert res == fresh
    cached, _, _ = bench._load_cache()
    assert cached == fresh


def test_orchestrator_surfaces_measure_crash_on_responsive_device(
        tmp_path, monkeypatch, capsys):
    """A crashing measurement on a LIVE device is a code regression; it
    must be reported as a failure, never masked by the stale cache."""
    import bench
    monkeypatch.setattr(bench, "CACHE_PATH", tmp_path / "cache.json")
    bench._save_cache({"metric": "frames_scored_per_sec", "value": 9.0,
                       "unit": "frames/s", "vs_baseline": 1.0})
    monkeypatch.setattr(bench, "_device_responsive", lambda *a, **k: True)

    class Crashed:
        returncode = 1
        stdout = ""
        stderr = "Traceback ...\nValueError: boom"

    import subprocess
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: Crashed())
    import pytest as _pytest
    with _pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 1
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["value"] == 0
    assert "crashed on a responsive device" in out["error"]
    assert "stale" not in out


def test_bench_record_fallback_sorts_rounds_numerically(tmp_path,
                                                        monkeypatch):
    """r10 must beat r9 (reverse-lexicographic put 'r9' after 'r10')."""
    monkeypatch.setattr(bench, "CACHE_PATH", tmp_path / "nope.json")
    for n, val in ((9, 9.0), (10, 10.0)):
        (tmp_path / f"BENCH_r{n}.json").write_text(
            json.dumps({"n": n, "parsed": {"value": val}}))
    fakes = [tmp_path / "BENCH_r9.json", tmp_path / "BENCH_r10.json"]
    monkeypatch.setattr(Path, "glob", lambda self, pat: iter(fakes))
    cached, measured_at, _ = bench._load_cache()
    assert cached["value"] == 10.0
    assert "10" in measured_at
