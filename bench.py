#!/usr/bin/env python3
"""Benchmark: candidate residual-validations/sec on one chip.

Measures the fused screen+fingerprint kernel (order-4 force-free foliation
determinant at 8 collocation points + order-1 fingerprints at 6 probe points
per candidate) on a realistic depth-4 candidate mix produced by the real
enumerator.

Baseline: the reference validates ~10-50 expressions/s/process with SymPy
(BASELINE.md "Implied validation throughput"); vs_baseline uses 50/s.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/50}
"""

import json
import sys
import time

import numpy as np


def build_candidate_batch(n_target: int, max_nodes: int):
    """A realistic tape mix: enumerate force_free to depth 3 (uniqued by
    structure only — no device work) and tile to n_target."""
    from pde_engine_tpu.enumerator import Enumerator
    from pde_engine_tpu.models import load_problem

    problem = load_problem("force_free")
    enum = Enumerator(problem, include_special_ops=True, prune=True)
    for c in enum.primitive_candidates():
        enum.add_unique(c)
    tapes = []
    for depth in (2, 3):
        batch = []
        for cand in enum.candidates_at_depth(depth):
            batch.append(cand)
            if len(cand.tape) <= max_nodes:
                tapes.append(cand.tape)
        # feed structural uniques forward (dedup-free superset is fine
        # for a throughput benchmark)
        for cand in batch[:400]:
            enum.add_unique(cand)
    reps = (n_target + len(tapes) - 1) // len(tapes)
    tapes = (tapes * reps)[:n_target]
    arr = np.stack([t.padded(max_nodes) for t in tapes])
    lengths = np.array([len(t) for t in tapes], dtype=np.int32)
    return problem, arr, lengths


def main():
    import jax
    import jax.numpy as jnp

    from pde_engine_tpu.parallel.search import make_search_kernel
    from pde_engine_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    MAX_NODES = 32
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    ITERS = 5

    problem, tapes, lengths = build_candidate_batch(N, MAX_NODES)
    consts = jnp.asarray(problem.consts.as_array(np.float32))
    spoints = jnp.asarray(problem.screen_points, jnp.float32)
    fpoints = jnp.asarray(problem.fingerprint_points, jnp.float32)
    tapes_d = jnp.asarray(tapes)
    lengths_d = jnp.asarray(lengths)

    kernel = make_search_kernel(
        order=problem.residual_order, max_nodes=MAX_NODES,
        residual_key=problem.get_residual_key(),
        screen_rtol=float(problem.screen_rtol),
        n_screen=len(problem.screen_points),
        n_fp=len(problem.fingerprint_points))

    # warm-up / compile
    out = kernel(tapes_d, lengths_d, consts, spoints, fpoints)
    _ = np.asarray(out.rel_max)

    # Force a device->host materialization every iteration.  On the axon
    # TPU platform block_until_ready returns before execution completes,
    # which overreports throughput by orders of magnitude; copying a
    # result column out is the only reliable fence.
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = kernel(tapes_d, lengths_d, consts, spoints, fpoints)
        _ = np.asarray(out.rel_max)
    dt = time.perf_counter() - t0

    per_sec = N * ITERS / dt
    baseline = 50.0  # reference validations/s/process (BASELINE.md)
    print(json.dumps({
        "metric": "candidate_residual_validations_per_sec_per_chip",
        "value": round(per_sec, 1),
        "unit": "validations/s",
        "vs_baseline": round(per_sec / baseline, 1),
    }))


if __name__ == "__main__":
    main()
