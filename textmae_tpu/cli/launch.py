"""Multi-process launcher: the torchrun / submitit analog for JAX workloads.

The reference reaches multi-process scale two ways: torch.distributed env-var
rendezvous (/root/reference/models/MAE/util/misc.py:216-248) and submitit
SLURM jobs whose `checkpoint()` hook requeues on preemption with `--resume`
(/root/reference/models/MAE/submitit_pretrain.py:61-71). This launcher is the
scheduler-agnostic TPU-native equivalent:

  * spawns `--nproc-per-node` worker processes, each with the
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars that
    `jax.distributed.initialize()` (and textmae_tpu.parallel.init_distributed)
    picks up automatically,
  * multi-node: run one launcher per node with `--nnodes`/`--node-rank` and a
    shared `--coordinator host:port`,
  * elastic recovery: if any worker dies, the whole gang is torn down and
    relaunched (up to `--max-restarts`); pair with the training CLIs'
    `--auto-resume` so the restart continues from the newest checkpoint —
    exactly submitit's requeue semantics, without SLURM.

Example (2 processes sharing one host's chips):

    python -m textmae_tpu.cli.launch --nproc-per-node 2 -- \
        python -m textmae_tpu.cli.train -d data/ --auto-resume ...
"""
from __future__ import annotations

import argparse
import os
import signal
import socket
import subprocess
import sys
import time
from typing import List, Optional


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Launch a gang of jax.distributed worker processes.",
        usage="%(prog)s [options] -- <command> [args...]",
    )
    p.add_argument("--nproc-per-node", type=int, default=1)
    p.add_argument("--nnodes", type=int, default=1)
    p.add_argument("--node-rank", type=int, default=0)
    p.add_argument(
        "--coordinator",
        type=str,
        default=None,
        help="host:port of process 0 (default: localhost with a free port; "
        "required for --nnodes > 1)",
    )
    p.add_argument(
        "--max-restarts",
        type=int,
        default=0,
        help="relaunch the gang this many times if a worker fails "
        "(submitit requeue analog; combine with --auto-resume)",
    )
    p.add_argument(
        "--monitor-interval", type=float, default=1.0, help="poll period (s)"
    )
    return p


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(cmd: List[str], coordinator: str, num_processes: int, proc_id: int):
    env = dict(os.environ)
    env["JAX_COORDINATOR_ADDRESS"] = coordinator
    env["JAX_NUM_PROCESSES"] = str(num_processes)
    env["JAX_PROCESS_ID"] = str(proc_id)
    # torchrun-compatible aliases, for scripts that read these instead
    env["RANK"] = str(proc_id)
    env["WORLD_SIZE"] = str(num_processes)
    return subprocess.Popen(cmd, env=env)


def _terminate(procs: List[subprocess.Popen], grace: float = 10.0) -> None:
    for p in procs:
        if p.poll() is None:
            p.send_signal(signal.SIGTERM)
    deadline = time.time() + grace
    for p in procs:
        if p.poll() is None:
            try:
                p.wait(timeout=max(0.1, deadline - time.time()))
            except subprocess.TimeoutExpired:
                p.kill()
                p.wait()


def run_gang(
    cmd: List[str],
    nproc_per_node: int,
    nnodes: int = 1,
    node_rank: int = 0,
    coordinator: Optional[str] = None,
    max_restarts: int = 0,
    monitor_interval: float = 1.0,
) -> int:
    """Run the worker gang; returns the final exit code (0 on success)."""
    if coordinator is None:
        if nnodes > 1:
            raise SystemExit("--coordinator host:port is required for --nnodes > 1")
        coordinator = f"localhost:{_free_port()}"
    world = nproc_per_node * nnodes

    for attempt in range(max_restarts + 1):
        procs = [
            _spawn(cmd, coordinator, world, node_rank * nproc_per_node + i)
            for i in range(nproc_per_node)
        ]
        failed: Optional[int] = None
        try:
            while True:
                codes = [p.poll() for p in procs]
                bad = [c for c in codes if c not in (None, 0)]
                if bad:
                    failed = bad[0]
                    break
                if all(c == 0 for c in codes):
                    return 0
                time.sleep(monitor_interval)
        except KeyboardInterrupt:
            _terminate(procs)
            return 130
        _terminate(procs)
        if attempt < max_restarts:
            print(
                f"[launch] worker exited with {failed}; restarting gang "
                f"(attempt {attempt + 2}/{max_restarts + 1})",
                file=sys.stderr,
                flush=True,
            )
            if nnodes == 1:
                coordinator = f"localhost:{_free_port()}"  # old port may linger
    print(f"[launch] giving up after {max_restarts + 1} attempts", file=sys.stderr)
    failed = int(failed or 1)
    # a signal-killed worker yields a negative Popen returncode (e.g. -9);
    # report the shell convention 128+signum instead of letting the OS wrap
    # it mod 256 into an unrelated-looking status
    return 128 - failed if failed < 0 else failed


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" in argv:
        split = argv.index("--")
        own, cmd = argv[:split], argv[split + 1 :]
    else:
        own, cmd = argv, []
    args = build_parser().parse_args(own)
    if not cmd:
        build_parser().error("no worker command given (separate it with --)")
    return run_gang(
        cmd,
        nproc_per_node=args.nproc_per_node,
        nnodes=args.nnodes,
        node_rank=args.node_rank,
        coordinator=args.coordinator,
        max_restarts=args.max_restarts,
        monitor_interval=args.monitor_interval,
    )


if __name__ == "__main__":
    sys.exit(main())
