#!/usr/bin/env python3
"""Stage-by-stage timing of the production segmented screen kernel.

The device path of one superbatch is
    gather cache rows -> transpose to lane-major -> Pallas op+residual
    -> inverse transpose -> verdict reductions + compact packing
and bench.py times only the whole chain.  This tool times each stage as
its own jitted program on the real chip (random cache contents — timing
is value-independent), so the optimization target is measured, not
guessed.  Every window fences with a device->host copy (axon's
block_until_ready returns early) and reports the best of ``--reps``
repetitions of ``--iters`` back-to-back dispatches.

Usage:  python tools/profile_kernel.py [--cache-rows 1048576]
            [--batch 262144] [--iters 8] [--reps 3]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache-rows", type=int, default=1 << 20)
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pde_engine_tpu.models import load_problem
    from pde_engine_tpu.ops.jets import n_coeffs
    from pde_engine_tpu.ops.lanes import from_lane_major, to_lane_major
    from pde_engine_tpu.parallel.pallas_engine import (
        TILE, make_pallas_segmented_kernel)
    from pde_engine_tpu.parallel.search import (pack_screen_result_compact,
                                                verdicts_from_parts)

    problem = load_problem("force_free")
    order = problem.residual_order
    T = n_coeffs(order)
    P = len(problem.screen_points)
    F = len(problem.fingerprint_points)
    rtol = float(problem.screen_rtol)
    C, N = args.cache_rows, args.batch
    n_tiles = N // TILE

    rng = np.random.default_rng(0)
    cache_s = jnp.asarray(rng.normal(size=(C, P * T)).astype(np.float32))
    cache_f = jnp.asarray(rng.normal(size=(C, F * 3)).astype(np.float32))
    ab = jnp.asarray(rng.integers(0, C, size=(N, 2)).astype(np.int32))
    ops = jnp.asarray(rng.integers(0, 16, size=(n_tiles,)).astype(np.int32))
    sp = jnp.asarray(problem.screen_points, jnp.float32)
    fp = jnp.asarray(problem.fingerprint_points, jnp.float32)

    def timed(name, fn, fence, *fargs):
        out = fn(*fargs)           # compile
        _ = np.asarray(fence(out))
        best = None
        for _rep in range(args.reps):
            t0 = time.perf_counter()
            outs = [fn(*fargs) for _ in range(args.iters)]
            _ = np.asarray(
                jnp.stack([fence(o).ravel()[0] for o in outs]))
            dt = (time.perf_counter() - t0) / args.iters
            best = dt if best is None else min(best, dt)
        ns = best * 1e9 / N
        print(json.dumps({"stage": name, "ms_per_batch": round(best * 1e3, 3),
                          "ns_per_candidate": round(ns, 2),
                          "mcand_per_s": round(N / best / 1e6, 2)}))
        return out

    # ---- stage 1: the four cache gathers ----
    @jax.jit
    def g_gather(cs, cf, ab_):
        return (cs[ab_[:, 0]], cf[ab_[:, 0]], cs[ab_[:, 1]], cf[ab_[:, 1]])

    gath = timed("gather(4x)", g_gather, lambda o: o[0][:1, :1],
                 cache_s, cache_f, ab)

    # ---- stage 1b: one gather of screen rows only ----
    @jax.jit
    def g_gather1(cs, ab_):
        return cs[ab_[:, 0]]

    timed("gather(1x screen)", g_gather1, lambda o: o[:1, :1], cache_s, ab)

    # ---- stage 2: gather + lane-major transpose (the Pallas preamble) ----
    @jax.jit
    def g_pre(cs, cf, ab_):
        return (to_lane_major(cs[ab_[:, 0]], P, T),
                to_lane_major(cf[ab_[:, 0]], F, 3),
                to_lane_major(cs[ab_[:, 1]], P, T),
                to_lane_major(cf[ab_[:, 1]], F, 3))

    pre = timed("gather+transpose", g_pre, lambda o: o[0][:1, :1],
                cache_s, cache_f, ab)

    # ---- stage 3: full chain (the production path); the Pallas body's
    # share is full - (gather+transpose) - (verdict+pack) ----
    seg = make_pallas_segmented_kernel(order, problem.get_residual_key(),
                                       rtol, P, F)
    full = timed("full segmented kernel", seg, lambda o: o[0][:1, :1],
                 cache_s, cache_f, ab, ops, sp, fp)

    # ---- stage 4: verdict block + packing from lane-major outputs ----
    rows_s, rows_f = T * P, 3 * F
    out_s_lm = jnp.asarray(rng.normal(size=(rows_s, N)).astype(np.float32))
    out_f_lm = jnp.asarray(rng.normal(size=(rows_f, N)).astype(np.float32))
    res_lm = jnp.asarray(rng.normal(size=(P, N)).astype(np.float32))
    scale_lm = jnp.asarray(
        np.abs(rng.normal(size=(P, N))).astype(np.float32))

    @jax.jit
    def g_verdict(out_s, out_f, res, scale):
        jets = from_lane_major(out_s, P, T).reshape(N, P, T)
        fj = from_lane_major(out_f, F, 3).reshape(N, F, 3)
        sr = verdicts_from_parts(res.T, scale.T, jets, fj, rtol)
        return (pack_screen_result_compact(sr), jets.reshape(N, -1),
                fj.reshape(N, -1))

    timed("verdict+pack (from lane-major)", g_verdict,
          lambda o: o[0][:1, :1], out_s_lm, out_f_lm, res_lm, scale_lm)

    del gath, full


if __name__ == "__main__":
    main()
