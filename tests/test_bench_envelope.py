"""Bench failure-envelope unit tests (VERDICT r4 item 1).

The r4 driver bench timed out with NOTHING captured (BENCH_r04.json rc=124,
parsed=null).  r5 restructured bench.py around an emit-early contract:

* `_emit` prints a self-contained JSON line (and mirrors to BENCH_OUT);
* `_emit_fallback` prints a labeled partial line on SIGTERM/atexit when no
  line has been emitted yet;
* the headline staged line is emitted immediately after the staged probe.

These tests drive the emission state machine directly (no jax, no device)
so the contract is enforced on every CPU test run.
"""

import importlib.util
import io
import json
import os
import sys

import pytest


def _load_bench(monkeypatch, tmp_path, out_name=None):
    """Fresh bench module instance (module-level state is per-test)."""
    if out_name:
        monkeypatch.setenv("BENCH_OUT", str(tmp_path / out_name))
    else:
        monkeypatch.delenv("BENCH_OUT", raising=False)
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _lines(capsys):
    return [json.loads(l) for l in
            capsys.readouterr().out.strip().splitlines() if l.strip()]


def test_emit_prints_schema_and_mirrors_to_file(monkeypatch, tmp_path, capsys):
    b = _load_bench(monkeypatch, tmp_path, "out.jsonl")
    b._STATE["extra"]["probe"] = 1
    b._emit(12.34, "staged_median")
    (line,) = _lines(capsys)
    assert line["metric"].startswith("kodak_768x512_encdec")
    assert line["value"] == 12.34
    assert line["unit"] == "img/s"
    assert line["vs_baseline"] == pytest.approx(12.34 / 20.0)
    assert line["extra"]["regime"] == "staged_median"
    assert line["extra"]["probe"] == 1
    mirrored = [json.loads(l) for l in
                (tmp_path / "out.jsonl").read_text().splitlines()]
    assert mirrored == [line]
    assert b._STATE["emitted"] == 1


def test_superseding_emission_appends(monkeypatch, tmp_path, capsys):
    b = _load_bench(monkeypatch, tmp_path, "out.jsonl")
    b._emit(10.0, "staged_median")
    b._STATE["extra"]["enc_img_s"] = 20.0
    b._emit(10.0, "staged_median")
    lines = _lines(capsys)
    assert len(lines) == 2
    # the last (authoritative) line carries the later fields
    assert "enc_img_s" in lines[1]["extra"]
    assert len((tmp_path / "out.jsonl").read_text().splitlines()) == 2


def test_fallback_emits_partial_with_measured_value(monkeypatch, tmp_path,
                                                    capsys):
    b = _load_bench(monkeypatch, tmp_path)
    # a value was measured but never emitted (e.g. SIGTERM mid-phase)
    b._STATE["value"] = 7.7
    b._STATE["regime"] = "staged_median"
    b._emit_fallback("signal_15")
    (line,) = _lines(capsys)
    assert line["value"] == 7.7
    assert line["extra"]["regime"] == "partial_staged_median"
    assert line["extra"]["partial_reason"] == "signal_15"


def test_fallback_emits_labeled_zero_when_nothing_measured(monkeypatch,
                                                           tmp_path, capsys):
    b = _load_bench(monkeypatch, tmp_path)
    b._emit_fallback("exit_before_emit")
    (line,) = _lines(capsys)
    assert line["value"] == 0.0
    assert line["extra"]["regime"] == "no_measurement"


def test_fallback_is_noop_after_real_emission(monkeypatch, tmp_path, capsys):
    b = _load_bench(monkeypatch, tmp_path)
    b._emit(5.0, "staged_median")
    b._emit_fallback("signal_15")
    lines = _lines(capsys)
    assert len(lines) == 1  # no second line: the real emission stands
