"""utils.profiling tests."""

import json
import os

import pytest

from fluidsim_tpu.utils.profiling import StepTimer, trace_profile


def test_step_timer_summary():
    t = StepTimer()
    import time

    for _ in range(5):
        with t:
            time.sleep(0.01)
    s = t.summary(steps_per_sample=2)
    assert s["count"] == 5
    assert 4.0 < s["p50_ms"] < 50.0  # ~5 ms per step (10 ms / 2 steps)
    assert s["steps_per_sec"] > 0
    t.reset()
    assert t.summary() == {"count": 0}


def test_trace_profile_writes(tmp_path):
    logdir = str(tmp_path / "trace")
    import jax.numpy as jnp

    with trace_profile(logdir):
        _ = jnp.ones((8, 8)).sum().block_until_ready()
    # jax.profiler writes a plugins/profile tree
    found = []
    for root, dirs, files in os.walk(logdir):
        found.extend(files)
    assert found, "no trace files written"


def test_cli_bench_profile_flag(tmp_path, capsys):
    from fluidsim_tpu.cli import main

    prof = str(tmp_path / "prof")
    main(["bench", "--preset", "smoke32", "--steps", "2", "--substeps",
          "2", "--profile", prof])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(out)
    assert res["profile"] == prof
    assert os.path.isdir(prof)
