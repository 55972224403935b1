"""AOT-preload experiment (VERDICT r3 #4 / r4 #3): does ahead-of-time
compilation move the per-program first-call relay setup?

Background: with a warm persistent compile cache, a program's FIRST
execution through the dev relay costs 30-110+ s (weather-dependent) while
backend_compile is ~0 — the mass is remote-side executable
registration/loading, not compilation.  If `jit(...).lower().compile()`
(AOT) triggers that registration, warmup could front-load it concurrently;
if the cost only materializes at first *execution*, AOT cannot help and
the warmup residual is pure relay setup with nothing in-library left.

Method, one process, three phases on three IDENTICAL-shape but distinct
programs (distinct constants force distinct executables):
  p1: compile();            time compile, then time first execution
  p2: no AOT;               time first execution (trace+compile+run)
  p3: compile() ... sleep;  time first execution later (tests deferral)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_aot_preload.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("AM_TPU_COMPILE_CACHE", "1")

import jax
import jax.numpy as jnp


def big_program(c):
    # ~HTSAT-block-sized matmul chain so the executable is nontrivial
    @jax.jit
    def f(x, w1, w2):
        h = jnp.tanh(x @ w1 + c)
        return (h @ w2).sum()

    return f


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(json.dumps({label: round(dt, 2)}), flush=True)
    return out


def main():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (4096, 1024), jnp.float32)
    w1 = jax.random.normal(k, (1024, 4096), jnp.float32)
    w2 = jax.random.normal(k, (4096, 1024), jnp.float32)
    jax.block_until_ready((x, w1, w2))
    timed("baseline_tiny_op_s", lambda: float(jnp.sum(x[0, :4])))

    f1, f2, f3 = big_program(1.0), big_program(2.0), big_program(3.0)

    lowered = timed("p1_lower_s", lambda: f1.lower(x, w1, w2))
    compiled = timed("p1_aot_compile_s", lambda: lowered.compile())
    timed("p1_first_exec_after_aot_s", lambda: float(compiled(x, w1, w2)))
    timed("p1_second_exec_s", lambda: float(compiled(x, w1, w2)))

    timed("p2_first_exec_no_aot_s", lambda: float(f2(x, w1, w2)))
    timed("p2_second_exec_s", lambda: float(f2(x, w1, w2)))

    c3 = timed("p3_aot_compile_s", lambda: f3.lower(x, w1, w2).compile())
    time.sleep(5)
    timed("p3_first_exec_5s_later_s", lambda: float(c3(x, w1, w2)))


if __name__ == "__main__":
    main()
