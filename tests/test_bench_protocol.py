"""The driver-bench output protocol (round 5).

BENCH_r04 was an rc=124 timeout with an empty tail — zero numbers captured.
The fix is structural and must stay pinned: each section emits its own JSON
line immediately (a killed run's tail still carries completed metrics), a
wall-clock budget skips sections that can't fit instead of overrunning, and
a section failure never aborts the record.  These tests drive
``bench._run_sections`` directly (no device, no timing).
"""

import json
import time

import bench


def _patched(monkeypatch, budget):
    monkeypatch.setattr(bench, "BUDGET_S", budget)
    monkeypatch.setattr(bench, "_T0", time.time())


def test_sections_emit_incremental_json_lines(monkeypatch, capsys):
    _patched(monkeypatch, budget=60.0)
    results, truncated, failed = bench._run_sections([
        ("one", 1, lambda: {"a": 1}),
        ("two", 1, lambda: {"b": 2.5}),
    ])
    assert results == {"one": {"a": 1}, "two": {"b": 2.5}}
    assert truncated == [] and failed == {}
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert [l["bench_section"] for l in lines] == ["one", "two"]
    assert lines[0]["a"] == 1 and "elapsed_s" in lines[0]


def test_over_budget_section_skipped_not_run(monkeypatch, capsys):
    _patched(monkeypatch, budget=5.0)
    ran = []
    results, truncated, failed = bench._run_sections([
        ("cheap", 1, lambda: ran.append("cheap") or {"x": 1}),
        ("huge", 10_000, lambda: ran.append("huge") or {"y": 2}),
        ("cheap2", 1, lambda: ran.append("cheap2") or {"z": 3}),
    ])
    # the over-estimate section is skipped; later cheap sections still run
    assert ran == ["cheap", "cheap2"]
    assert truncated == ["huge"]
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    skip = next(l for l in lines if l["bench_section"] == "huge")
    assert skip["skipped"] == "budget" and skip["est_s"] == 10_000


def test_section_failure_is_isolated(monkeypatch, capsys):
    _patched(monkeypatch, budget=60.0)

    def boom():
        raise RuntimeError("tunnel fell over")

    results, truncated, failed = bench._run_sections([
        ("bad", 1, boom),
        ("good", 1, lambda: {"v": 7}),
    ])
    assert results == {"good": {"v": 7}}
    assert "bad" in failed and "tunnel fell over" in failed["bad"]
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert "error" in next(l for l in lines if l["bench_section"] == "bad")


def test_serve_record_key_mapping():
    """The serving section namespaces its record so the aggregate merge
    can't collide on generic keys (value/wall_s/rounds)."""
    rec = {"value": 225533.5, "wall_s": 16.27, "rounds": 14,
           "slot_occupancy": 1.0, "aggregate_rtf": 10.23,
           "first_audio_first_wave_ms_p50": 2502.2,
           "first_audio_ms_p50": 6569.6, "first_audio_ms_p95": 10637.2,
           "inter_chunk_gap_ms_p50": 1005.6,
           "inter_chunk_gap_ms_p95": 2609.4,
           "derived_device_samples_per_sec": 2845368.3,
           "tunnel_tax_factor": 12.62,
           "overload": {"shed_rate": 0.734}}
    out = bench._serve_record_to_keys(rec)
    assert out["serve_samples_per_sec_measured"] == 225533.5
    assert out["serve_shed_rate"] == 0.734
    assert out["serve_tunnel_tax_factor"] == 12.62
    assert all(k.startswith("serve_") for k in out)


def test_every_line_is_self_contained_json(monkeypatch, capsys):
    """The whole point: a run killed at ANY moment leaves a tail of
    parseable lines."""
    _patched(monkeypatch, budget=60.0)
    bench._run_sections([
        ("a", 1, lambda: {"m": 1}),
        ("b", 99_999, lambda: {"m": 2}),
        ("c", 1, lambda: (_ for _ in ()).throw(ValueError("x"))),
    ])
    for line in capsys.readouterr().out.splitlines():
        json.loads(line)  # raises -> test fails
