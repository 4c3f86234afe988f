#!/usr/bin/env python3
"""Benchmark: candidate residual-validations/sec on one chip.

Measures the incremental search engine's device path — the fused
gather + surface-op + order-4 foliation residual (8 collocation points)
+ order-1 fingerprint (6 probe points) kernel — on the *real* depth-4
candidate stream of the force-free problem: the jet cache is seeded by
actually enumerating and deduplicating depths 1-3 on device, then every
depth-4 op batch is timed.

Baseline: the reference validates ~10-50 expressions/s/process with SymPy
(BASELINE.md "Implied validation throughput"); vs_baseline uses 50/s.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/50}

NOTE (axon TPU platform): block_until_ready returns before execution
completes; every timing below fences with a device->host copy.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pde_engine_tpu.enumerator import Enumerator
    from pde_engine_tpu.models import load_problem
    from pde_engine_tpu.ops.jets import n_coeffs
    from pde_engine_tpu.parallel.incremental import JetCache, make_op_kernel
    from pde_engine_tpu.parallel.pallas_engine import make_pallas_op_kernel
    from pde_engine_tpu.parallel.search import unpack_screen_result_compact
    from pde_engine_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    seed_depth = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    batch_size = 262144
    use_pallas = jax.default_backend() != "cpu"

    problem = load_problem("force_free")
    enum = Enumerator(problem, include_special_ops=True, prune=True)
    spoints = jnp.asarray(problem.screen_points, jnp.float32)
    fpoints = jnp.asarray(problem.fingerprint_points, jnp.float32)
    # same capacity/quantum as the production pipeline so bench shares its
    # compiled executables (every distinct cache capacity is a distinct
    # operand shape = a fresh multi-minute remote compile on the tunnel)
    cache = JetCache(n_screen=len(problem.screen_points),
                     t_screen=n_coeffs(problem.residual_order),
                     n_fp=len(problem.fingerprint_points),
                     initial_capacity=1 << 20,
                     grow_quantum=1 << 20)

    def op_kernel(name):
        mk = make_pallas_op_kernel if use_pallas else make_op_kernel
        return mk(
            name, order=problem.residual_order,
            residual_key=problem.get_residual_key(),
            screen_rtol=float(problem.screen_rtol),
            n_screen=len(problem.screen_points),
            n_fp=len(problem.fingerprint_points), compact=True)

    # ---- seed: depth 1 via the NumPy oracle ----
    from pde_engine_tpu.ops.interpreter import eval_jets_np_many
    prims = enum.primitive_candidates()
    tapes = np.stack([c.tape.padded(16) for c in prims])
    lengths = np.array([len(c.tape) for c in prims], np.int64)
    consts64 = problem.consts.as_array(np.float64)
    jets = eval_jets_np_many(tapes, lengths, consts64,
                             problem.screen_points, problem.residual_order)
    fj = eval_jets_np_many(tapes, lengths, consts64,
                           problem.fingerprint_points, 1)
    for c in prims:
        enum.add_unique(c)
    cache.append(jnp.asarray(jets.reshape(len(prims), -1).astype(np.float32)),
                 jnp.asarray(fj.reshape(len(prims), -1).astype(np.float32)))

    # ---- seed: depths 2..seed_depth via the incremental path + dedup ----
    seen = set()
    for depth in range(2, seed_depth + 1):
        for op_name, batch in enum.op_batches_at_depth(depth, batch_size):
            npad = ((len(batch) + 511) // 512) * 512  # Pallas tile multiple
            n = len(batch)
            ab = np.zeros((npad, 2), np.int32)
            ab[:n, 0] = np.fromiter((c.a.uid for c in batch), np.int32, n)
            ab[:n, 1] = np.fromiter(
                (c.b.uid if c.b is not None else 0 for c in batch),
                np.int32, n)
            packed, out_s, out_f = op_kernel(op_name)(
                cache.screen, cache.fp, jnp.asarray(ab), spoints, fpoints)
            cu = unpack_screen_result_compact(
                np.asarray(packed), len(problem.fingerprint_points))
            fpa, fpb = cu.sr.fp_a, cu.sr.fp_b
            keep = []
            for j, c in enumerate(batch):
                key = (int(fpa[j]), int(fpb[j]))
                if key in seen:
                    continue
                seen.add(key)
                enum.add_unique(c)
                keep.append(j)
            idx = jnp.asarray(np.asarray(keep, np.int32))
            cache.append(out_s[idx], out_f[idx])

    n_uniques = enum.count_uniques()

    # ---- timed: the full depth-(seed_depth+1) candidate stream ----
    # collect homogeneous batches first (host enumeration excluded from the
    # device timing; it runs concurrently with the device in production)
    batches = []
    for op_name, batch in enum.op_batches_at_depth(seed_depth + 1,
                                                   batch_size):
        n = len(batch)
        # quantize to two shapes per op (see pipeline._eval_op_idx)
        npad = 8192 if n <= 8192 else batch_size
        ab = np.zeros((npad, 2), np.int32)
        ab[:n, 0] = np.fromiter((c.a.uid for c in batch), np.int32, n)
        ab[:n, 1] = np.fromiter(
            (c.b.uid if c.b is not None else 0 for c in batch), np.int32, n)
        batches.append((op_name, n, jnp.asarray(ab)))

    # warm-up: compile every (op, shape) variant AND the fence concat
    # outside the timing (identical dispatch sequence to the timed loop)
    warm = []
    for op_name, n, ab in batches:
        packed, _, _ = op_kernel(op_name)(cache.screen, cache.fp, ab,
                                          spoints, fpoints)
        warm.append(packed)
    _ = np.asarray(jnp.concatenate([p[:1, 0] for p in warm]))
    del warm

    # Timed: dispatch the whole depth's batches back-to-back (the
    # production pipeline likewise keeps the device queue full and drains
    # results one batch behind), fence ONCE with a device->host copy of
    # every batch's verdicts.  Per-batch fencing would measure the axon
    # tunnel's ~27 ms round-trip latency 23x, not the chip.
    total = 0
    t0 = time.perf_counter()
    inflight = []
    for op_name, n, ab in batches:
        packed, out_s, out_f = op_kernel(op_name)(
            cache.screen, cache.fp, ab, spoints, fpoints)
        inflight.append(packed)
        total += n
    # single fence: one device-side concat depends on every batch, one
    # device->host copy (per-batch np.asarray would pay the tunnel RTT 23x)
    fence = jnp.concatenate([p[:1, 0] for p in inflight])
    _ = np.asarray(fence)
    dt = time.perf_counter() - t0

    per_sec = total / dt
    baseline = 50.0  # reference validations/s/process (BASELINE.md)
    print(json.dumps({
        "metric": "candidate_residual_validations_per_sec_per_chip",
        "value": round(per_sec, 1),
        "unit": "validations/s",
        "vs_baseline": round(per_sec / baseline, 1),
        "detail": {
            "candidates_timed": total,
            "seconds": round(dt, 3),
            "cache_uniques": n_uniques,
            "depth_timed": seed_depth + 1,
        },
    }))


if __name__ == "__main__":
    main()
