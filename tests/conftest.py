"""Test configuration: force an 8-device virtual CPU platform before JAX init.

Multi-chip hardware is not available in CI; all sharding tests run on a virtual
8-device CPU mesh (the TPU-native analog of a fake distributed backend — see
SURVEY.md §4).
"""
import os

# Hard override (the environment may pre-set an accelerator platform, e.g.
# the axon TPU tunnel, whose sitecustomize register() also calls
# jax.config.update("jax_platforms", ...), trumping env vars): the unit suite
# always runs on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
# the CPU AOT cache loader logs a scary-but-benign machine-feature warning on
# every cache hit (same-host cache; the mismatch is XLA's prefer-no-scatter
# pseudo-features, not real ISA features) — keep stderr readable
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: this box has ONE CPU, so the suite's wall time is
# dominated by serial XLA compiles; warm runs skip them (VERDICT r1 Next #8)
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("TEXTMAE_TEST_CACHE", "/tmp/jax_test_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


_EXPECTED_CACHE_DIR = jax.config.jax_compilation_cache_dir

# ---------------------------------------------------------------------------
# Suite wall-time ledger (VERDICT r3 Next #6): the warm full-suite time
# drifted 450 s -> 1341 s across rounds with nothing guarding it. Record
# per-test durations, print the top offenders, and WARN loudly when the
# total exceeds the budget so the drift is visible in every summary. (A
# hard exit-status fail would flake: this box has one CPU and a concurrent
# training chain inflates wall time up to ~2x — see NOTES.md round 4.)
# Budget applies to full-suite runs only (selections prorate by test count).
# ---------------------------------------------------------------------------
_SUITE_BUDGET_S = float(os.environ.get("TEXTMAE_SUITE_BUDGET_S", "900"))
_durations = {}


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_protocol(item, nextitem):
    import time as _time

    t0 = _time.time()
    yield
    _durations[item.nodeid] = _time.time() - t0


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    if not _durations:
        return
    ledger_path = os.environ.get("TEXTMAE_SUITE_LEDGER_PATH")
    if ledger_path:
        import json as _json

        with open(ledger_path, "w") as f:
            _json.dump(_durations, f, indent=0, sort_keys=True)
    total = sum(_durations.values())
    top = sorted(_durations.items(), key=lambda kv: -kv[1])[:10]
    tw = terminalreporter
    tw.section("suite wall-time ledger")
    tw.write_line(
        f"total test time {total:.0f}s over {len(_durations)} tests "
        f"(budget {_SUITE_BUDGET_S:.0f}s for the full suite)"
    )
    for nodeid, dur in top:
        tw.write_line(f"  {dur:6.1f}s  {nodeid}")
    # budget enforcement only on full-suite-sized runs (a -k selection of a
    # few tests should not trip a whole-suite budget)
    if len(_durations) >= 200 and total > _SUITE_BUDGET_S:
        tw.write_line(
            f"WARNING: suite wall time {total:.0f}s exceeds the "
            f"{_SUITE_BUDGET_S:.0f}s budget — shrink dims or mark `slow` "
            "(VERDICT r3 #6: 450->1341s drift must not resume)",
        )


@pytest.fixture(autouse=True, scope="module")
def _compile_cache_hygiene():
    """Guard the process-wide compile cache dir (VERDICT r2 Next #7).

    The efb5740 failure class: a test redirected jax_compilation_cache_dir to
    a pytest tmp_path and never restored it, silently cold-compiling every
    later module on every run (suite wall time doubled). Any test that
    changes the dir must restore it before its module ends.
    """
    yield
    assert jax.config.jax_compilation_cache_dir == _EXPECTED_CACHE_DIR, (
        "a test left jax_compilation_cache_dir changed "
        f"({jax.config.jax_compilation_cache_dir!r}); restore it or every "
        "later module cold-compiles (efb5740 regression)"
    )
