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


def test_compact_final_line_fits_the_proven_tail_cap():
    """The driver parses the LAST stdout line from a bounded tail whose cap
    is unknown; r3's 723-char aggregate is the largest line proven to
    parse.  With EVERY section landed (the worst case for line length) the
    compact final line must stay in that proven range while carrying the
    headline + the r4-VERDICT witness keys; the full record rides the
    penultimate ``bench_full`` line."""
    flat = {
        "chip_bf16_tflops": 199.7,
        "vocoder_samples_per_sec_per_chip": 2901234.5,
        "vocoder_vs_baseline": 1.055, "vocoder_rtf": 131.6,
        "vocoder_samples_per_sec_int8": 4443210.9,
        "vocoder_int8_vs_baseline": 1.616,
        "tacotron_frames_per_sec": 585123.4,
        "tacotron_frames_per_sec_b64": 1489123.4,
        "train_waveglow_samples_per_sec": 581234.5,
        "train_waveglow_bf16_samples_per_sec": 581234.5,
        "train_waveglow_mfu": 0.571,
        "train_waveglow_f32_samples_per_sec": 497900.0,
        "train_waveglow_f32_mfu": 0.556,
        "train_waveglow_bf16_b2_samples_per_sec": 726000.0,
        "train_waveglow_bf16_vs_f32": 1.458,
        "train_tacotron_frames_per_sec_f32_b8": 193123.4,
        "train_tacotron_mfu_f32_b8": 0.034,
        "train_tacotron_frames_per_sec_bf16_b32": 368123.4,
        "train_tacotron_mfu_bf16_b32": 0.061,
        "preprocess_mel_frames_per_sec": 5512.3,
        "preprocess_e2e_runs": [5400.1, 5512.3, 5601.2],
        "preprocess_e2e_spread_pct": 3.1,
        "preprocess_trim_impl_auto": "host",
        "preprocess_link_h2d_MBps": 90.2,
        "preprocess_link_d2h_MBps": 33.8,
        "preprocess_derived_transfer_bound_fps": 7123.4,
        "preprocess_device_frames_per_sec": 7816513.1,
        "preprocess_cpu_baseline_frames_per_sec": 29551.3,
        "serve_samples_per_sec_measured": 237123.4,
        "serve_shed_rate": 0.734, "serve_wall_s": 16.3,
        "serve_rounds": 14, "serve_slot_occupancy": 1.0,
        "serve_aggregate_rtf": 10.8,
        "serve_first_audio_first_wave_ms_p50": 2502.2,
        "serve_first_audio_ms_p50": 6569.6,
        "serve_first_audio_ms_p95": 10637.2,
        "serve_inter_chunk_gap_ms_p50": 1005.6,
        "serve_inter_chunk_gap_ms_p95": 2609.4,
        "serve_derived_device_samples_per_sec": 2845368.3,
        "serve_tunnel_tax_factor": 12.0,
    }
    derived = {
        "e2e_rtf": 128.4, "e2e_rtf_int8": 196.9,
        "e2e_rtf_int8_chain": "int8 vocoder + bf16 decode (policy)",
        "first_audio_ms_streaming": 28.2,
        "first_audio_ms_full_scan": 114.9,
        "first_audio_ms_16_sessions": 374.5,
        "first_audio_ms_16_sessions_decode_term": 5.2,
        "first_audio_ms_16_sessions_vocode_term": 369.3,
    }
    full, compact = bench._final_lines(
        flat, derived, [], {}, "TPU v5 lite0")
    line = json.dumps(compact)
    assert len(line) <= 800, (len(line), line)
    for k in ("metric", "value", "vs_baseline",
              "train_waveglow_bf16_samples_per_sec",
              "train_tacotron_frames_per_sec_bf16_b32",
              "preprocess_mel_frames_per_sec",
              "serve_samples_per_sec_measured", "e2e_rtf_int8"):
        assert k in compact, k
    # the full line is a superset and self-identifies
    assert full["bench_full"] is True
    assert set(compact) - {"failed"} <= set(full)
    for k, v in flat.items():
        assert full[k] == v
    # a bad day (errors + truncations) must not blow the compact line up:
    # failed reprs stay out of it, only section names ride along
    full_bad, compact_bad = bench._final_lines(
        {"vocoder_samples_per_sec_per_chip": 2.9e6,
         "vocoder_vs_baseline": 1.05},
        {}, ["train_waveglow_f32_ab", "preprocess_e2e", "serve_e2e"],
        {"tacotron_b64": "RuntimeError('tunnel fell over mid-section: "
                         + "x" * 150 + "')"},
        "TPU v5 lite0")
    assert compact_bad["failed"] == ["tacotron_b64"]
    assert "tunnel fell over" in full_bad["failed"]["tacotron_b64"]
    assert len(json.dumps(compact_bad)) <= 800


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
