"""bench.py self-healing layout fallback.

The driver runs bench.py unattended on real TPU at round end; when a
gate layout hits the TPU silent-miscompile (workload guard trips), bench
must fall back to the dense layout and still report an honest number
instead of 0.0 (benchmarks/NOTES.md round-2 postmortem). As of round 3
the DEFAULT layout is dense (the flat descriptor gate is mis-fused by
the current TPU compiler at production shapes), so the default plan is
single-entry; the fallback machinery stays for any future non-dense
default. These tests exercise the decision logic with run_layout
monkeypatched - no device compute.
"""

import importlib.util
import json
import os

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture()
def bench_mod(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "whole_frame_baseline", lambda h, w: 209.4)
    # stub the synthetic render out of the decision-logic tests
    from edge_based_visual_odometry_tpu.io import synthetic as S
    monkeypatch.setattr(S, "make_sequence",
                        lambda n_frames, h, w: object())
    monkeypatch.delenv("_VO_BENCH_LAYOUT", raising=False)
    return mod


def _run_main(mod, capsys):
    rc = mod.main()
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])   # contract: ONE JSON line on stdout
    return rc, payload


def test_plan_layouts():
    spec = importlib.util.spec_from_file_location(
        "bench_plan", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.plan_layouts(None, "dense") == ["dense"]
    assert mod.plan_layouts(None, "flat") == ["flat", "dense"]
    assert mod.plan_layouts(None, "flat5") == ["flat5", "dense"]
    assert mod.plan_layouts("flat4", "dense") == ["flat4"]


def test_default_dense_ok(bench_mod, monkeypatch, capsys):
    calls = []

    def fake_run_layout(seq, layout, n):
        calls.append(layout)
        return 2.0, "mates=9999 quads=9999 inlier_ratio=0.9"

    monkeypatch.setattr(bench_mod, "run_layout", fake_run_layout)
    rc, payload = _run_main(bench_mod, capsys)
    assert rc == 0
    assert calls == ["dense"]
    assert payload["value"] == 2.0
    assert "note" not in payload
    assert payload["vs_baseline"] == pytest.approx(2.0 * 209.4, rel=0.01)
    assert "baseline_hw" in payload


def test_nondense_default_falls_back_to_dense(bench_mod, monkeypatch,
                                              capsys):
    calls = []

    def fake_run_layout(seq, layout, n):
        calls.append(layout)
        if layout != "dense":
            return None, "workload collapsed: mates=0 quads=0"
        return 1.5, "mates=9999 quads=9999 inlier_ratio=0.9"

    monkeypatch.setattr(bench_mod, "plan_layouts",
                        lambda pinned, default: ["flat", "dense"])
    monkeypatch.setattr(bench_mod, "run_layout", fake_run_layout)
    rc, payload = _run_main(bench_mod, capsys)
    assert rc == 0
    assert calls == ["flat", "dense"]
    assert payload["value"] == 1.5
    assert "dense" in payload["note"]


def test_all_collapse_reports_error(bench_mod, monkeypatch, capsys):
    monkeypatch.setattr(bench_mod, "plan_layouts",
                        lambda pinned, default: ["flat", "dense"])
    monkeypatch.setattr(bench_mod, "run_layout",
                        lambda seq, layout, n:
                        (None, f"workload collapsed ({layout})"))
    rc, payload = _run_main(bench_mod, capsys)
    assert rc == 1
    assert payload["value"] == 0.0
    assert "flat" in payload["error"] and "dense" in payload["error"]


def test_pinned_layout_skips_fallback(bench_mod, monkeypatch, capsys):
    calls = []

    def fake_run_layout(seq, layout, n):
        calls.append(layout)
        return None, "workload collapsed"

    monkeypatch.setenv("_VO_BENCH_LAYOUT", "flat4")
    monkeypatch.setattr(bench_mod, "run_layout", fake_run_layout)
    rc, payload = _run_main(bench_mod, capsys)
    assert rc == 1
    assert calls == ["flat4"]
