"""The bench calibration contamination gate (bench.py::
_gate_and_write_detail): a run whose host sentinel exceeds the
committed round-close calib by >25% must tag itself contaminated on
the stdout line AND leave the round-close BENCH_DETAIL.json untouched
— the r12 driver run silently overwrote a cleaner-host record, which
is exactly what the gate exists to prevent. No Spark needed."""

import importlib.util
import json
import sys
from pathlib import Path

_BENCH = Path(__file__).resolve().parent.parent / "bench.py"


def _load_bench():
    spec = importlib.util.spec_from_file_location("_bench_mod", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_bench_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


def _detail(calib, **extra):
    d = {
        "metric": "headline_queries_total_wall",
        "value": 100.0,
        "unit": "sec",
        "queries": {"q": 1.0},
        "sf": 0.1,
        "calib_sec": calib,
        "calib_chunks": [calib],
    }
    d.update(extra)
    return d


def test_clean_run_overwrites(tmp_path):
    bench = _load_bench()
    path = tmp_path / "BENCH_DETAIL.json"
    path.write_text(json.dumps(_detail(0.20)))
    new = _detail(0.21)
    assert bench._gate_and_write_detail(new, str(path)) is True
    assert "contaminated" not in new
    assert json.loads(path.read_text())["calib_sec"] == 0.21


def test_contaminated_run_tags_and_refuses(tmp_path):
    bench = _load_bench()
    path = tmp_path / "BENCH_DETAIL.json"
    path.write_text(json.dumps(_detail(0.20)))
    hot = _detail(0.30)  # 1.5x the committed floor
    assert bench._gate_and_write_detail(hot, str(path)) is False
    # the tag rides the in-memory dict (and thus the stdout JSON line)
    assert hot["contaminated"] is True
    assert hot["calib_committed"] == 0.20
    # the round-close record is untouched
    kept = json.loads(path.read_text())
    assert kept["calib_sec"] == 0.20
    assert "contaminated" not in kept
    # full evidence still lands in the clearly-named sidecar
    side = json.loads((tmp_path / "BENCH_DETAIL.json.rejected")
                      .read_text())
    assert side["calib_sec"] == 0.30 and side["contaminated"] is True


def test_force_overrides_refusal(tmp_path):
    bench = _load_bench()
    path = tmp_path / "BENCH_DETAIL.json"
    path.write_text(json.dumps(_detail(0.20)))
    hot = _detail(0.40)
    assert bench._gate_and_write_detail(hot, str(path), force=True)
    assert hot["contaminated"] is True  # still tagged, still written
    assert json.loads(path.read_text())["calib_sec"] == 0.40


def test_contaminated_prior_is_not_a_floor(tmp_path):
    bench = _load_bench()
    path = tmp_path / "BENCH_DETAIL.json"
    path.write_text(json.dumps(_detail(0.10, contaminated=True)))
    new = _detail(0.50)
    # prior is tagged → no reference floor → write proceeds untagged
    assert bench._gate_and_write_detail(new, str(path)) is True
    assert "contaminated" not in new


def test_no_prior_file_writes(tmp_path):
    bench = _load_bench()
    path = tmp_path / "BENCH_DETAIL.json"
    new = _detail(0.50)
    assert bench._gate_and_write_detail(new, str(path)) is True
    assert json.loads(path.read_text())["calib_sec"] == 0.50


def test_boundary_exactly_125_percent_is_clean(tmp_path):
    bench = _load_bench()
    path = tmp_path / "BENCH_DETAIL.json"
    path.write_text(json.dumps(_detail(0.20)))
    edge = _detail(0.25)  # exactly 1.25x: allowed (> not >=)
    assert bench._gate_and_write_detail(edge, str(path)) is True
    assert "contaminated" not in edge
