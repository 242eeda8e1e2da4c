"""Metric logging: windowed meters, ETA progress lines, scalar event log.

Behavioral parity with the reference's MetricLogger / SmoothedValue
(/root/reference/models/Compression/common/logger.py:11-155) minus the
distributed sync machinery — under SPMD jit the metric scalars are already
global (see textmae_tpu.parallel), so `synchronize_between_processes` has no
work to do and is kept as a no-op for API compatibility.

Scalar events go to TensorBoard when available (torch SummaryWriter,
matching training.py:135-139) and always to a JSONL file readable anywhere.
"""
from __future__ import annotations

import datetime
import json
import time
from collections import defaultdict, deque
from pathlib import Path
from typing import Dict, Iterable, Optional


class SmoothedValue:
    """Track a series with a window median/avg and global avg (logger.py:11-62)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        value = float(value)
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self) -> str:
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def add_meter(self, name: str, meter: SmoothedValue):
        self.meters[name] = meter

    def synchronize_between_processes(self):
        """No-op: SPMD metrics are already global (see module docstring)."""

    def __str__(self) -> str:
        return self.delimiter.join(f"{k}: {v}" for k, v in self.meters.items())

    @staticmethod
    def _device_mem() -> str:
        """Peak device memory if the backend reports it (the reference prints
        max CUDA memory, logger.py:138-143)."""
        try:
            import jax

            stats = jax.local_devices()[0].memory_stats() or {}
            peak = stats.get("peak_bytes_in_use")
            if peak:
                return f"  max mem: {peak / 2**20:.0f}MB"
        except Exception:
            pass
        return ""

    def log_every(self, iterable: Iterable, print_freq: int, header: str = ""):
        """Progress-printing iterator with iter/data timing and ETA
        (logger.py:110-154)."""
        i = 0
        start = time.time()
        iter_time, data_time = SmoothedValue(fmt="{avg:.4f}"), SmoothedValue(fmt="{avg:.4f}")
        end = time.time()
        try:
            total = len(iterable)  # type: ignore[arg-type]
        except TypeError:
            total = None
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 or (total is not None and i == total - 1):
                eta = ""
                if total is not None:
                    eta_s = iter_time.global_avg * (total - i)
                    eta = f"eta: {datetime.timedelta(seconds=int(eta_s))}  "
                count = f"[{i}{'/' + str(total) if total is not None else ''}]"
                print(
                    f"{header} {count}  {eta}{self}  "
                    f"time: {iter_time}  data: {data_time}{self._device_mem()}",
                    flush=True,
                )
            i += 1
            end = time.time()
        elapsed = time.time() - start
        print(f"{header} Total time: {datetime.timedelta(seconds=int(elapsed))}", flush=True)


class ScalarWriter:
    """TensorBoard (if installed) + JSONL scalar event writer."""

    def __init__(self, log_dir: Optional[str]):
        self.tb = None
        self.jsonl = None
        if log_dir is None:
            return
        log_dir = Path(log_dir)
        log_dir.mkdir(parents=True, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(log_dir=str(log_dir))
        except Exception:
            self.tb = None
        self.jsonl = open(log_dir / "scalars.jsonl", "a")

    def add_scalar(self, tag: str, value: float, step: int):
        if self.tb is not None:
            self.tb.add_scalar(tag, value, step)
        if self.jsonl is not None:
            self.jsonl.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")

    def flush(self):
        if self.tb is not None:
            self.tb.flush()
        if self.jsonl is not None:
            self.jsonl.flush()

    def close(self):
        if self.tb is not None:
            self.tb.close()
        if self.jsonl is not None:
            self.jsonl.close()
