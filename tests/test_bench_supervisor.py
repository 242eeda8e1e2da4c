"""The bench.py supervisor contract (driver scoreboard resilience).

VERDICT r2 Missing #1: the driver records exactly what bench.py prints; a
child that dies or overruns must still yield one machine-readable scoreboard
line. These tests exercise the supervisor in-process with a stubbed
subprocess layer — no chip, no real bench child.
"""
import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench  # noqa: E402

HEADLINE = json.dumps(
    {
        "metric": "kodak24_compress_decompress",
        "value": 61.5,
        "unit": "images/sec/chip",
        "vs_baseline": 1.23,
        "note": "headline only; optional stages still running",
    }
)
FINAL = json.dumps(
    {
        "metric": "kodak24_compress_decompress",
        "value": 61.5,
        "unit": "images/sec/chip",
        "vs_baseline": 1.23,
        "rd_curve": [],
        "note": "trained",
    }
)


def test_find_result_line_prefers_last_scoreboard_line():
    out = "diag\n" + HEADLINE + "\nnoise {not json}\n" + FINAL + "\n"
    obj = bench.find_result_line(out)
    assert obj is not None and obj["note"] == "trained"
    assert bench.find_result_line("no json here") is None
    assert bench.find_result_line('{"metric": "m"}') is None  # missing keys
    assert bench.find_result_line(None) is None


def _run_supervise(monkeypatch, capsys, fake_run):
    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setenv("BENCH_ATTEMPTS", "2")
    monkeypatch.setenv("BENCH_ATTEMPT_TIMEOUT", "5")
    monkeypatch.setattr(bench.time, "sleep", lambda _s: None)
    rc = bench.supervise()
    return rc, capsys.readouterr().out.strip().splitlines()


def test_supervise_salvages_headline_on_timeout(monkeypatch, capsys):
    def fake_run(*a, **k):
        raise subprocess.TimeoutExpired(
            cmd="bench", timeout=5, output="compiling...\n" + HEADLINE + "\n"
        )

    rc, lines = _run_supervise(monkeypatch, capsys, fake_run)
    assert rc == 0
    obj = json.loads(lines[-1])
    assert obj["partial"] is True
    assert obj["value"] == 61.5
    assert "salvaged" in obj["note"]


def test_supervise_passes_through_final_line(monkeypatch, capsys):
    def fake_run(*a, **k):
        return subprocess.CompletedProcess(
            args=a, returncode=0, stdout=HEADLINE + "\n" + FINAL + "\n"
        )

    rc, lines = _run_supervise(monkeypatch, capsys, fake_run)
    assert rc == 0
    obj = json.loads(lines[-1])
    assert "rd_curve" in obj and "partial" not in obj


def test_supervise_emits_error_json_after_exhausted_attempts(
    monkeypatch, capsys
):
    calls = []

    def fake_run(*a, **k):
        calls.append(1)
        return subprocess.CompletedProcess(
            args=a, returncode=1, stdout="Traceback ...\nRuntimeError: axon\n"
        )

    rc, lines = _run_supervise(monkeypatch, capsys, fake_run)
    assert rc == 1
    assert len(calls) == 2  # BENCH_ATTEMPTS honored
    obj = json.loads(lines[-1])
    assert obj["value"] == 0.0 and "error" in obj


def test_supervise_salvage_handles_bytes_stdout(monkeypatch, capsys):
    def fake_run(*a, **k):
        raise subprocess.TimeoutExpired(
            cmd="bench", timeout=5, output=(HEADLINE + "\n").encode()
        )

    rc, lines = _run_supervise(monkeypatch, capsys, fake_run)
    assert rc == 0
    assert json.loads(lines[-1])["partial"] is True


def test_supervise_salvages_headline_on_child_crash(monkeypatch, capsys):
    """A child that prints the headline then dies (rc != 0) during the
    optional stages must not score 0.0: the supervisor retries for a full
    run, then falls back to the measured headline."""
    calls = []

    def fake_run(*a, **k):
        calls.append(1)
        return subprocess.CompletedProcess(
            args=a, returncode=137,
            stdout=HEADLINE + "\nfull-dims stage: device halt\n",
        )

    rc, lines = _run_supervise(monkeypatch, capsys, fake_run)
    assert rc == 0
    assert len(calls) == 2  # retried for a complete run first
    obj = json.loads(lines[-1])
    assert obj["partial"] is True and obj["value"] == 61.5
    assert "salvaged" in obj["note"]
