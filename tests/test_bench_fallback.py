"""bench.py outage behavior: the driver's end-of-round bench must emit the
last recorded on-chip measurement (marked stale) when the TPU tunnel is
down, and zeros only when no recorded measurement exists."""
import importlib.util
import json
import os
import sys


def _load_bench():
    os.environ["SYN3R_STACK_REEXEC"] = "1"  # suppress the re-exec path
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(os.path.dirname(__file__), "..",
                                  "bench.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_stale_fallback_emits_last_good(tmp_path, capsys, monkeypatch):
    m = _load_bench()
    rec = {"measured_at": "2026-08-18T05:34:43Z",
           "result": {"metric": "guided_denoise_steps_per_sec",
                      "value": 0.159, "unit": "steps/s (both directions)",
                      "vs_baseline": None,
                      "extra": {"gs_train_step_ms": 14.7}}}
    p = tmp_path / "last_good.json"
    p.write_text(json.dumps(rec))
    monkeypatch.setattr(m, "_LAST_GOOD", str(p))
    m._emit_stale_or_error("tunnel down test")
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 0.159
    assert out["extra"]["stale"] is True
    assert out["extra"]["measured_at"] == "2026-08-18T05:34:43Z"
    assert "tunnel down test" in out["extra"]["stale_reason"]
    assert out["extra"]["gs_train_step_ms"] == 14.7


def test_stale_fallback_zero_without_record(tmp_path, capsys, monkeypatch):
    m = _load_bench()
    monkeypatch.setattr(m, "_LAST_GOOD", str(tmp_path / "missing.json"))
    m._emit_stale_or_error("no tunnel")
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 0.0
    assert "no tunnel" in out["extra"]["error"]


def test_record_then_fallback_roundtrip(tmp_path, capsys, monkeypatch):
    m = _load_bench()
    monkeypatch.setattr(m, "_LAST_GOOD", str(tmp_path / "lg.json"))
    result = {"metric": "guided_denoise_steps_per_sec", "value": 0.2,
              "unit": "steps/s (both directions)", "vs_baseline": None,
              "extra": {"completion_s_per_pair": 500.0}}
    m._record_last_good(result)
    m._emit_stale_or_error("flap")
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 0.2
    assert out["extra"]["completion_s_per_pair"] == 500.0
    assert out["extra"]["stale"] is True


def test_probe_refuses_cpu_backend(monkeypatch):
    m = _load_bench()

    class FakeProc:
        returncode = 0
        stdout = "cpu 8"
        stderr = ""

    monkeypatch.setattr(m.subprocess, "run",
                        lambda *a, **k: FakeProc())
    monkeypatch.delenv("SYN3R_BENCH_ALLOW_CPU", raising=False)
    ok, detail = m._probe_backend(timeout_s=5)
    assert not ok and "CPU" in detail
    monkeypatch.setenv("SYN3R_BENCH_ALLOW_CPU", "1")
    ok, _ = m._probe_backend(timeout_s=5)
    assert ok


def test_record_incremental_emission(tmp_path, capsys, monkeypatch):
    """Round-5 emission contract: a fresh last-good emits IMMEDIATELY as a
    provisional partial line (carried fields listed), live values replace
    carried ones, and the final line drops the markers and refreshes the
    last-good record."""
    m = _load_bench()
    monkeypatch.setattr(m, "_LAST_GOOD", str(tmp_path / "lg.json"))
    m._record_last_good({
        "metric": "guided_denoise_steps_per_sec", "value": 0.15,
        "unit": "steps/s (both directions)", "vs_baseline": None,
        "extra": {"gs_train_step_ms": 15.0, "unet_cfg_fwd_ms": 2100.0}})

    rec = m._Record()
    assert rec.seed_from_last_good()
    rec.emit()
    line1 = json.loads(capsys.readouterr().out.strip())
    assert line1["extra"]["partial"] is True
    assert "provisional_from_last_good" in line1["extra"]
    assert "value" in line1["extra"]["carried_fields"]
    assert line1["value"] == 0.15

    rec.set_value(0.2)
    rec.set(unet_cfg_fwd_ms=2000.0)
    rec.emit()
    line2 = json.loads(capsys.readouterr().out.strip())
    assert line2["value"] == 0.2
    assert line2["extra"]["unet_cfg_fwd_ms"] == 2000.0
    cf = line2["extra"]["carried_fields"]
    assert "value" not in cf and "unet_cfg_fwd_ms" not in cf
    assert "gs_train_step_ms" in cf          # still carried

    rec.set(gs_train_step_ms=13.0)
    rec.emit(final=True)
    final = json.loads(capsys.readouterr().out.strip())
    for marker in ("partial", "carried_fields", "provisional_from_last_good"):
        assert marker not in final["extra"]
    stored = json.loads((tmp_path / "lg.json").read_text())
    assert stored["result"]["value"] == 0.2
    assert stored["result"]["extra"]["gs_train_step_ms"] == 13.0


def test_record_no_last_good_starts_empty(tmp_path, monkeypatch):
    m = _load_bench()
    monkeypatch.setattr(m, "_LAST_GOOD", str(tmp_path / "none.json"))
    rec = m._Record()
    assert not rec.seed_from_last_good()
    assert rec.result["extra"] == {}


def test_final_emit_never_promotes_carried_fields(tmp_path, capsys,
                                                  monkeypatch):
    """A final record must contain only live-measured values: still-carried
    fields are dropped, and a never-measured primary finalizes as 0.0 with
    an error instead of a stale value under fresh provenance."""
    m = _load_bench()
    monkeypatch.setattr(m, "_LAST_GOOD", str(tmp_path / "lg.json"))
    m._record_last_good({
        "metric": "guided_denoise_steps_per_sec", "value": 0.15,
        "unit": "steps/s (both directions)", "vs_baseline": None,
        "extra": {"old_metric_gone": 42.0, "gs_train_step_ms": 15.0}})

    rec = m._Record()
    rec.seed_from_last_good()
    rec.set_value(0.2)
    rec.set(gs_train_step_ms=13.0)
    rec.emit(final=True)
    final = json.loads(capsys.readouterr().out.strip())
    assert "old_metric_gone" not in final["extra"]
    assert final["extra"]["gs_train_step_ms"] == 13.0
    stored = json.loads((tmp_path / "lg.json").read_text())
    assert "old_metric_gone" not in stored["result"]["extra"]

    rec2 = m._Record()
    rec2.seed_from_last_good()
    rec2.emit(final=True)
    f2 = json.loads(capsys.readouterr().out.strip())
    assert f2["value"] == 0.0 and "error" in f2["extra"]
