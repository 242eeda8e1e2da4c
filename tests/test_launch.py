"""Launcher CLI tests: gang spawn env wiring + elastic restart semantics."""
import pytest
import subprocess
import sys
import textwrap
from pathlib import Path

from textmae_tpu.cli.launch import run_gang


def test_gang_env_wiring(tmp_path):
    """Each worker gets rendezvous env vars; same coordinator, distinct ids."""
    script = tmp_path / "w.py"
    script.write_text(
        textwrap.dedent(
            """
            import os, sys
            out = sys.argv[1]
            with open(f"{out}/env_{os.environ['JAX_PROCESS_ID']}.txt", "w") as f:
                f.write(os.environ["JAX_COORDINATOR_ADDRESS"] + "\\n")
                f.write(os.environ["JAX_NUM_PROCESSES"] + "\\n")
                f.write(os.environ["RANK"] + " " + os.environ["WORLD_SIZE"] + "\\n")
            """
        )
    )
    rc = run_gang(
        [sys.executable, str(script), str(tmp_path)],
        nproc_per_node=3,
        monitor_interval=0.05,
    )
    assert rc == 0
    lines = [
        (tmp_path / f"env_{i}.txt").read_text().splitlines() for i in range(3)
    ]
    assert len({ln[0] for ln in lines}) == 1  # shared coordinator
    assert all(ln[1] == "3" for ln in lines)
    assert sorted(ln[2] for ln in lines) == ["0 3", "1 3", "2 3"]


@pytest.mark.slow  # ~42s: multi-process restart drill; env wiring stays default
def test_gang_restart_on_failure(tmp_path):
    """A worker crash tears down the gang and relaunches it (submitit requeue
    analog); the retry succeeds because the sentinel now exists."""
    script = tmp_path / "flaky.py"
    script.write_text(
        textwrap.dedent(
            """
            import os, sys
            sentinel = sys.argv[1]
            if os.environ["JAX_PROCESS_ID"] == "1" and not os.path.exists(sentinel):
                open(sentinel, "w").write("crashed once")
                sys.exit(3)
            """
        )
    )
    sentinel = tmp_path / "crashed"
    rc = run_gang(
        [sys.executable, str(script), str(sentinel)],
        nproc_per_node=2,
        max_restarts=1,
        monitor_interval=0.05,
    )
    assert rc == 0
    assert sentinel.exists()

    sentinel.unlink()
    rc = run_gang(
        [sys.executable, str(script), str(sentinel)],
        nproc_per_node=2,
        max_restarts=0,
        monitor_interval=0.05,
    )
    assert rc == 3  # no retries left: the worker's exit code propagates


def test_cli_requires_command():
    rc = subprocess.run(
        [sys.executable, "-m", "textmae_tpu.cli.launch", "--nproc-per-node", "1"],
        capture_output=True,
        cwd=str(Path(__file__).parent.parent),
    )
    assert rc.returncode != 0
