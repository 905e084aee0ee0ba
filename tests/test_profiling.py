"""Profiling helpers: trace capture, annotations, marginal timing."""

import os

import jax
import jax.numpy as jnp

from micromix_tpu.utils import annotate, hlo_dump_env, marginal_timer, trace


def test_annotate_inside_jit():
    @jax.jit
    def f(x):
        with annotate("square"):
            return x * x

    y = f(jnp.ones((4, 4)))
    assert float(y.sum()) == 16.0


def test_trace_writes_files(tmp_path):
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    found = [os.path.join(r, f) for r, _, fs in os.walk(logdir) for f in fs]
    assert found, "no trace files written"


def test_marginal_timer_positive():
    x = jnp.ones((32, 32))
    f = jax.jit(lambda x: x @ x)

    def call():
        jax.block_until_ready(f(x))

    sec = marginal_timer(call, iters=8, reps=1)
    assert sec > 0


def test_hlo_dump_env():
    env = hlo_dump_env("/tmp/dump")
    assert "--xla_dump_to=/tmp/dump" in env["XLA_FLAGS"]
