"""Real multi-process jax.distributed smoke test (SURVEY.md §4, §5).

The unit suite's virtual 8-device mesh exercises SPMD semantics inside one
process; this test crosses an actual process boundary: two OS processes, each
with 2 virtual CPU devices, form one global ("data", 4) mesh via
jax.distributed + gloo collectives (the CI analog of a 2-host TPU slice over
DCN; reference's equivalent is torch.distributed NCCL init,
/root/reference/models/MAE/util/misc.py:216-248) and run real MCM train steps.

Checks:
  * both processes converge on bit-identical global metrics and params,
  * the 2-process run matches a single-process run over the same 4-device
    global topology and batch (process count is an implementation detail).
"""
import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).parent / "mp_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(nproc: int, tmp_path: Path, timeout: float = 600.0):
    port = _free_port()
    procs, outs = [], []
    for p in range(nproc):
        out = tmp_path / f"mp_out_{nproc}_{p}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(WORKER), str(p), str(nproc), str(port), str(out)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                cwd=str(WORKER.parent.parent),
            )
        )
    results = []
    for proc, out in zip(procs, outs):
        stdout, _ = proc.communicate(timeout=timeout)
        assert proc.returncode == 0, f"worker failed:\n{stdout.decode()[-3000:]}"
        results.append(json.loads(out.read_text()))
    return results


@pytest.mark.slow
def test_two_process_train_step_matches_single_process(tmp_path):
    two = _run_workers(2, tmp_path)
    assert all(r["num_processes"] == 2 and r["global_devices"] == 4 for r in two)
    # both processes see identical global metrics and identical final params
    assert two[0]["losses"] == two[1]["losses"]
    assert two[0]["param_sum"] == two[1]["param_sum"]
    assert all(np.isfinite(v) for v in two[0]["losses"])

    one = _run_workers(1, tmp_path)[0]
    assert one["num_processes"] == 1 and one["global_devices"] == 4
    # same global computation; gloo reduction order may differ from the
    # single-process reduction order, so allow float-roundoff noise
    np.testing.assert_allclose(one["losses"], two[0]["losses"], rtol=1e-5)
    np.testing.assert_allclose(one["param_sum"], two[0]["param_sum"], rtol=1e-5)


@pytest.mark.slow
def test_gang_restart_checkpoint_resume(tmp_path):
    """Full elastic-recovery drill (VERDICT r1 Next #5): 2 processes x 4
    virtual devices train MCM over one global ("data", 8) mesh under
    cli.launch; process 0 hard-exits after step 2 (simulated preemption),
    the launcher relaunches the gang (--max-restarts 1), and the restarted
    gang resumes from the checkpoint and finishes. Reference semantics:
    submitit requeue + --resume (submitit_pretrain.py:61-71)."""
    gang_worker = Path(__file__).parent / "mp_gang_worker.py"
    proc = subprocess.run(
        [
            sys.executable, "-m", "textmae_tpu.cli.launch",
            "--nproc-per-node", "2", "--max-restarts", "1",
            "--monitor-interval", "0.2",
            "--", sys.executable, str(gang_worker), str(tmp_path),
        ],
        cwd=str(WORKER.parent.parent),
        capture_output=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr.decode()[-3000:]
    assert b"restarting gang" in proc.stderr

    results = [
        json.loads((tmp_path / f"gang_result_{p}.json").read_text())
        for p in range(2)
    ]
    for res in results:
        assert res["num_processes"] == 2 and res["global_devices"] == 8
        # the surviving run RESUMED: it started from the step-2 checkpoint
        assert res["start_step"] == 2
        assert len(res["losses"]) == 2 and all(np.isfinite(v) for v in res["losses"])
    # both processes computed identical global metrics and params
    assert results[0]["losses"] == results[1]["losses"]
    assert results[0]["param_sum"] == results[1]["param_sum"]
    assert (tmp_path / "preempted.marker").exists()


@pytest.mark.slow
def test_gang_restart_tp_resume(tmp_path):
    """TP-sharded elastic drill (VERDICT r2 Next #8): the same 2-process gang
    runs the TENSOR-PARALLEL MCM step over a ("data", 2) x ("model", 4) mesh
    — "data" across processes, "model" over each process's local devices —
    checkpoints from process-local shards, survives the simulated preemption,
    and the restarted gang re-pins params AND Adam moments to the TP layout
    (cli.train --resume semantics). The result JSON proves the post-restart
    qkv kernel and its mu moment both carry the "model" spec."""
    gang_worker = Path(__file__).parent / "mp_gang_worker.py"
    proc = subprocess.run(
        [
            sys.executable, "-m", "textmae_tpu.cli.launch",
            "--nproc-per-node", "2", "--max-restarts", "1",
            "--monitor-interval", "0.2",
            "--", sys.executable, str(gang_worker), str(tmp_path), "tp",
        ],
        cwd=str(WORKER.parent.parent),
        capture_output=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr.decode()[-3000:]
    assert b"restarting gang" in proc.stderr

    results = [
        json.loads((tmp_path / f"gang_result_{p}.json").read_text())
        for p in range(2)
    ]
    for res in results:
        assert res["num_processes"] == 2 and res["global_devices"] == 8
        assert res["start_step"] == 2  # resumed from the step-2 checkpoint
        assert len(res["losses"]) == 2 and all(np.isfinite(v) for v in res["losses"])
        # the TP layout survived the restart on params AND moments
        assert "model" in res["qkv_param_spec"], res["qkv_param_spec"]
        assert "model" in res["qkv_mu_spec"], res["qkv_mu_spec"]
    assert results[0]["losses"] == results[1]["losses"]
    assert results[0]["param_sum"] == results[1]["param_sum"]
