"""Tests for the infra utilities: profiling hooks, loggers, metrics, params
snapshots (the aux-subsystem layer of SURVEY.md §5)."""

import json
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np


def test_phase_timer_and_annotate():
    from flowstate_tpu.utils.profiling import PhaseTimer, annotate

    timer = PhaseTimer()
    x = jnp.arange(8.0)
    with timer.phase("square", sync_on=x):
        y = x * x
    with timer.phase("square"):
        _ = x + 1
    with annotate("region"):
        _ = jax.device_get(y)
    s = timer.summary()
    assert s["square"]["count"] == 2
    assert s["square"]["total_s"] >= s["square"]["mean_s"] > 0


def test_trace_writes_profile(tmp_path):
    from flowstate_tpu.utils.profiling import trace

    log_dir = str(tmp_path / "prof")
    with trace(log_dir):
        _ = jax.device_get(jnp.arange(64.0).sum())
    found = []
    for root, _, files in os.walk(log_dir):
        found += files
    assert found, "profiler trace wrote no files"


def test_setup_logger_and_metrics(tmp_path):
    from flowstate_tpu.utils.logging import (
        MetricsWriter, save_params_json, setup_logger,
    )

    log_file = str(tmp_path / "run.log")
    logger = setup_logger("t_infra", log_file)
    logger.info("hello")
    logger.debug("debug-line")
    for h in logger.handlers:
        h.flush()
    content = open(log_file).read()
    assert "hello" in content and "debug-line" in content  # file at DEBUG

    m = MetricsWriter(str(tmp_path / "metrics.jsonl"))
    m.log("cycle", cycle=1, loss=float(np.float32(0.5)),
          arr=jnp.arange(2))
    m.close()
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert rows[0]["event"] == "cycle" and rows[0]["cycle"] == 1
    assert rows[0]["arr"] == [0, 1]

    p = save_params_json({"a": 1, "b": jnp.float32(2.5)}, str(tmp_path))
    snap = json.load(open(p))
    assert snap["a"] == 1 and abs(snap["b"] - 2.5) < 1e-6

    # per-run loggers don't duplicate handlers on re-setup
    logger2 = setup_logger("t_infra", log_file)
    assert logger2 is logging.getLogger("t_infra")
    assert len(logger2.handlers) <= 3


def test_roofs_dot_flop_classifier():
    """utils/roofs.py: HLO dot-flop counting and the two-roof split."""
    import jax
    import jax.numpy as jnp

    from flowstate_tpu.utils.roofs import dot_flops, split_cost, vpu_roof

    @jax.jit
    def f(a, b, c):
        return jax.nn.relu(a @ b) @ c

    a = jnp.ones((64, 32))
    b = jnp.ones((32, 48))
    c = jnp.ones((48, 16))
    comp = f.lower(a, b, c).compile()
    expected = 2 * 64 * 32 * 48 + 2 * 64 * 48 * 16
    assert dot_flops(comp) == expected

    costs = split_cost(comp)
    assert costs is not None
    assert costs["dot_flops"] == expected
    assert costs["vpu_flops"] == costs["flops"] - expected
    assert costs["flops"] >= expected

    # batched einsum counts batch dims correctly
    @jax.jit
    def g(x, y):
        return jnp.einsum("bij,bjk->bik", x, y)

    comp2 = g.lower(jnp.ones((4, 8, 16)), jnp.ones((4, 16, 8))).compile()
    assert dot_flops(comp2) == 2 * 4 * 8 * 8 * 16

    # calibrated VPU roof loads from the committed evidence file
    assert 1e12 < vpu_roof() < 1e13


def test_cost_analysis_counts_scan_body_once():
    """The while-body-once caveat that bench.py's loop-corrected
    accounting exists for: cost_analysis reports the SAME flops for a
    scan of length 2 and 20 (so a K-layer scanned flow understates ~K-
    fold), and combine_loop_cost restores the missing trips."""
    import jax
    import jax.numpy as jnp

    from flowstate_tpu.utils.roofs import combine_loop_cost, split_cost

    def make(K):
        @jax.jit
        def f(x, w):
            def body(c, _):
                return jnp.tanh(c @ w), None
            out, _ = jax.lax.scan(body, x, None, length=K)
            return out
        return f

    x = jnp.ones((64, 64))
    w = jnp.ones((64, 64))
    c2 = split_cost(make(2).lower(x, w).compile())
    c20 = split_cost(make(20).lower(x, w).compile())
    assert c2["flops"] == c20["flops"]          # the caveat, pinned
    assert c2["dot_flops"] == c20["dot_flops"]

    body = split_cost(
        jax.jit(lambda a, b: jnp.tanh(a @ b)).lower(x, w).compile())
    fixed = combine_loop_cost(c20, body, 19)
    # the corrected dot count is 20 matmuls (each 2*64^3)
    assert abs(fixed["dot_flops"] - 20 * 2 * 64**3) / (20 * 2 * 64**3) < 0.01
