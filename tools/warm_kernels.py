#!/usr/bin/env python3
"""Prewarm the persistent compile cache for a problem's production
Pallas kernels.

A FRESH (kernel, shape) pair costs a 300-400 s remote Mosaic compile on
a tunneled chip (PERF.md "Compile-cost note") — the pipeline quantizes
batch shapes precisely so that cost is paid once.  After any change to
parallel/pallas_engine.py every problem family's executables are cold
again; run this once per problem so interactive runs never sit through
a compile:

    python tools/warm_kernels.py force_free laplace grad_shafranov kerr

Builds and dispatches (with a device->host fence) one superbatch through
each production kernel: the segmented mixed-op kernel, both structured
full-run variants (big="a"/"b"), and the per-tile kernel, at the
production superbatch size (SearchConfig auto: 262144 on TPU).
"""

import os
import sys
import time

import numpy as np

# runnable from anywhere: the package lives next to tools/
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def warm(problem_name: str, batch_size: int) -> None:
    import jax.numpy as jnp

    from pde_engine_tpu.models import load_problem
    from pde_engine_tpu.ops.jets import n_coeffs
    from pde_engine_tpu.parallel.incremental import OP_INDEX
    from pde_engine_tpu.parallel.pallas_engine import (
        TILE, make_pallas_segmented_kernel, make_pallas_structured_kernel,
        make_pallas_tiled_kernel)

    problem = load_problem(problem_name)
    order = problem.residual_order
    key = problem.get_residual_key()
    P = len(problem.screen_points)
    F = len(problem.fingerprint_points)
    rtol = float(problem.screen_rtol)
    T = n_coeffs(order)
    N = batch_size
    NT = N // TILE

    rng = np.random.default_rng(0)
    # The OUTER jit is shape-specialized on the cache array too, and the
    # production cache grows in 1M-row capacity quanta precisely to bound
    # the number of executables (pipeline.py: initial_capacity 1<<20 on
    # accelerators) — so the dummy cache must be EXACTLY the first
    # production quantum or the warm executables would never be hit.
    # It also must span the structured kernel's contiguous N-row slice.
    C = max(1 << 20, N + TILE)
    cache_s = jnp.asarray(rng.normal(size=(C, P * T)).astype(np.float32))
    cache_f = jnp.asarray(rng.normal(size=(C, F * 3)).astype(np.float32))
    sp = jnp.asarray(problem.screen_points, jnp.float32)
    fp = jnp.asarray(problem.fingerprint_points, jnp.float32)
    ab = jnp.asarray(rng.integers(0, C, size=(N, 2)).astype(np.int32))
    n_ops = len(OP_INDEX)
    ops = jnp.asarray(rng.integers(0, n_ops, size=(NT,)).astype(np.int32))
    starts = jnp.asarray(
        rng.integers(0, C - TILE, size=(NT,)).astype(np.int32))
    consts = jnp.asarray(rng.integers(0, C, size=(NT,)).astype(np.int32))
    opkind = jnp.asarray(
        rng.integers(0, 2 * n_ops, size=(NT,)).astype(np.int32))
    first_op = jnp.asarray(0, jnp.int32)

    def fence(name, fn, *args):
        t0 = time.time()
        packed, _, _ = fn(*args)
        _ = np.asarray(packed[:1, 0])
        print(f"  {problem_name}: {name} warm in {time.time() - t0:.1f}s",
              flush=True)

    fence("segmented",
          make_pallas_segmented_kernel(order, key, rtol, P, F),
          cache_s, cache_f, ab, ops, sp, fp)
    for big in ("a", "b"):
        fence(f"structured[{big}]",
              make_pallas_structured_kernel(order, key, rtol, P, F, big, N),
              cache_s, cache_f, jnp.asarray(1, jnp.int32),
              jnp.asarray(3, jnp.int32), first_op, sp, fp)
    fence("tiled",
          make_pallas_tiled_kernel(order, key, rtol, P, F, N),
          cache_s, cache_f, starts, consts, opkind, sp, fp)


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not names:
        names = ["force_free", "laplace", "grad_shafranov", "kerr"]
    bs = 262144
    for a in sys.argv[1:]:
        if a.startswith("--batch-size="):
            bs = int(a.split("=", 1)[1])
    for nm in names:
        print(f"warming {nm} at batch {bs} ...", flush=True)
        warm(nm, bs)


if __name__ == "__main__":
    main()
