"""The bench.py supervisor contract (driver scoreboard resilience).

VERDICT r2 Missing #1 / r3 Missing #1: the driver records exactly what
bench.py prints and kills the whole process tree at ~30 min. The supervisor
therefore TEEs the child's stdout line-by-line AS LINES ARRIVE (a kill at
any moment leaves every measured line in the artifact) and sizes attempt
timeouts to fit a total budget. These tests exercise the supervisor
in-process with a stubbed Popen — no chip, no real bench child.
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
        "note": "trained checkpoint",
    }
)
FINAL = json.dumps(
    {
        "metric": "kodak24_compress_decompress",
        "value": 61.5,
        "unit": "images/sec/chip",
        "vs_baseline": 1.23,
        "rd_curve": [],
        "note": "trained checkpoint",
    }
)


class FakeProc:
    """Mimics the Popen surface the supervisor uses: .stdout iteration,
    .wait(timeout), .kill()."""

    def __init__(self, lines, rc=0, timeout=False):
        self.stdout = iter([ln + "\n" for ln in lines])
        self._rc = rc
        self._timeout = timeout
        self.killed = False

    def wait(self, timeout=None):
        if self._timeout and not self.killed:
            raise subprocess.TimeoutExpired(cmd="bench", timeout=timeout)
        return self._rc

    def kill(self):
        self.killed = True


def _run_supervise(monkeypatch, capsys, procs, budget="1700"):
    """procs: list of FakeProc returned per attempt; returns (rc, lines,
    captured child envs)."""
    envs = []
    it = iter(procs)

    def fake_popen(cmd, env=None, **k):
        envs.append(env)
        return next(it)

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    monkeypatch.setenv("BENCH_ATTEMPTS", "2")
    monkeypatch.setenv("BENCH_TOTAL_BUDGET", budget)
    monkeypatch.delenv("BENCH_SOFT_DEADLINE", raising=False)
    monkeypatch.setattr(bench.time, "sleep", lambda _s: None)
    rc = bench.supervise()
    return rc, capsys.readouterr().out.strip().splitlines(), envs


def test_find_result_line_prefers_last_scoreboard_line():
    out = "diag\n" + HEADLINE + "\nnoise {not json}\n" + FINAL + "\n"
    obj = bench.find_result_line(out)
    assert obj is not None and "rd_curve" in obj
    assert bench.find_result_line("no json here") is None
    assert bench.find_result_line('{"metric": "m"}') is None  # missing keys
    assert bench.find_result_line(None) is None


def test_supervise_tees_and_passes_through_complete_run(monkeypatch, capsys):
    rc, lines, _ = _run_supervise(
        monkeypatch, capsys, [FakeProc(["diag", HEADLINE, FINAL], rc=0)]
    )
    assert rc == 0
    # every child line teed through, in order, as it arrived
    assert lines == ["diag", HEADLINE, FINAL]
    obj = json.loads(lines[-1])
    assert "rd_curve" in obj and "partial" not in obj


def test_supervise_salvages_cumulative_line_on_timeout(monkeypatch, capsys):
    """A child killed mid-extras: its already-teed cumulative line is the
    record; the supervisor re-prints it annotated partial."""
    rc, lines, _ = _run_supervise(
        monkeypatch, capsys,
        [FakeProc(["compiling...", HEADLINE], timeout=True)],
    )
    assert rc == 0
    assert HEADLINE in lines  # teed live BEFORE the timeout handling
    obj = json.loads(lines[-1])
    assert obj["partial"] is True and obj["value"] == 61.5
    assert "cumulative" in obj["note"]


def test_supervise_keeps_record_on_child_crash(monkeypatch, capsys):
    """A child that prints the headline then dies (rc != 0) during the
    optional stages must not score 0.0 and must not burn the remaining
    budget re-measuring what it already has."""
    procs = [FakeProc([HEADLINE, "full-dims stage: device halt"], rc=137)]
    rc, lines, envs = _run_supervise(monkeypatch, capsys, procs)
    assert rc == 0
    assert len(envs) == 1  # no pointless retry once a record exists
    obj = json.loads(lines[-1])
    assert obj["partial"] is True and obj["value"] == 61.5


def test_supervise_emits_error_json_after_exhausted_attempts(
    monkeypatch, capsys
):
    rc, lines, envs = _run_supervise(
        monkeypatch, capsys,
        [
            FakeProc(["Traceback ...", "RuntimeError: axon"], rc=1),
            FakeProc(["Traceback ...", "RuntimeError: axon"], rc=1),
        ],
    )
    assert rc == 1
    assert len(envs) == 2  # BENCH_ATTEMPTS honored
    obj = json.loads(lines[-1])
    assert obj["value"] == 0.0 and "error" in obj


def test_stage_cache_roundtrip_and_rotation(monkeypatch, tmp_path):
    """Stage-result persistence (VERDICT r4 Next #3): results survive to the
    next run's scoreboard, and the run order visits never-measured stages
    first (cheapest-first), then the stalest cache entry."""
    monkeypatch.setattr(bench, "CACHE_PATH", tmp_path / "bench_cache.json")
    assert bench.load_stage_cache() == {}  # missing file -> empty
    cache = {
        "train": {"fields": {"train_mfu": 0.28}, "sha": "abc", "t": 100.0},
        "refine": {"fields": {"refine_img_per_s": 11.6}, "sha": "abc", "t": 50.0},
    }
    bench.save_stage_cache(cache)
    assert bench.load_stage_cache() == cache

    stages = (
        ("train", 180, "E", None),
        ("rd_curve", 240, "E", None),
        ("caption", 300, "E", None),
        ("refine", 420, "E", None),
    )
    names = [s[0] for s in bench.rotation_order(stages, cache)]
    # uncached (rd_curve cheaper than caption) first, then stalest cached
    assert names == ["rd_curve", "caption", "refine", "train"]

    # corrupt file degrades to empty, never raises
    bench.CACHE_PATH.write_text("{not json")
    assert bench.load_stage_cache() == {}


def test_supervise_sizes_child_deadline_inside_attempt_window(
    monkeypatch, capsys
):
    """The r3 failure: child soft deadline (2100) > attempt timeout is
    unreachable. The supervisor must hand the child a deadline that fits
    inside the attempt window with margin for the final prints."""
    _, _, envs = _run_supervise(
        monkeypatch, capsys, [FakeProc([HEADLINE, FINAL], rc=0)]
    )
    child_soft = float(envs[0]["BENCH_SOFT_DEADLINE"])
    timeout = float(envs[0].get("BENCH_ATTEMPT_TIMEOUT", "1200"))
    assert child_soft <= timeout - 120
    assert envs[0]["BENCH_CHILD"] == "1"
