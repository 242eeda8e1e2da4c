"""Metric logger / scalar writer / profiling utility tests."""
import json

import numpy as np
import pytest

from textmae_tpu.train.logger import MetricLogger, ScalarWriter, SmoothedValue
from textmae_tpu.utils import StepTimer, enable_compile_cache, profile_trace


def test_smoothed_value_stats():
    v = SmoothedValue(window_size=3)
    for x in (1.0, 2.0, 3.0, 4.0):
        v.update(x)
    assert v.value == 4.0
    assert v.max == 4.0
    assert v.avg == pytest.approx(3.0)  # window (2,3,4)
    assert v.global_avg == pytest.approx(2.5)
    assert "(" in str(v)


def test_metric_logger_update_and_str():
    logger = MetricLogger()
    logger.update(loss=1.5, bpp=0.2)
    logger.update(loss=0.5, bpp=0.1)
    assert logger.loss.global_avg == pytest.approx(1.0)
    s = str(logger)
    assert "loss" in s and "bpp" in s
    logger.synchronize_between_processes()  # no-op, must not raise


def test_log_every_iterates(capsys):
    logger = MetricLogger()
    out = list(logger.log_every(range(5), print_freq=2, header="T"))
    assert out == [0, 1, 2, 3, 4]
    captured = capsys.readouterr().out
    assert "T [0/5]" in captured
    assert "Total time" in captured


def test_scalar_writer_jsonl(tmp_path):
    w = ScalarWriter(str(tmp_path))
    w.add_scalar("train/loss", 1.25, 3)
    w.flush()
    w.close()
    lines = (tmp_path / "scalars.jsonl").read_text().strip().splitlines()
    rec = json.loads(lines[-1])
    assert rec == {"tag": "train/loss", "value": 1.25, "step": 3}


def test_scalar_writer_none_is_noop():
    w = ScalarWriter(None)
    w.add_scalar("x", 1.0, 0)
    w.flush()
    w.close()


def test_step_timer():
    t = StepTimer()
    t.data_done()
    t.step_done()
    rates = t.rates()
    assert set(rates) == {"data_time", "step_time"}
    assert rates["step_time"] >= 0


def test_profile_trace_noop():
    with profile_trace(None):
        pass


def test_enable_compile_cache(tmp_path):
    """Must accept an explicit dir — and the test must restore the suite's
    cache dir: leaving it pointed at this tmp_path silently cold-compiles
    every later test module (measured: +6x on train/tp/parity tests)."""
    import jax

    prev = jax.config.jax_compilation_cache_dir
    try:
        enable_compile_cache(str(tmp_path))  # must not raise
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
