"""Pallas lane-major fused op+residual kernels — the TPU fast path.

The incremental engine's per-candidate work is one surface-op application
plus the PDE residual, both pure jet algebra: hundreds of statically
unrolled FMAs over Taylor coefficients.  XLA lays candidates on the last
axis of [N, P, T] arrays (coefficients on lanes), which wastes most of
each 8×128 vreg; the measured-4.2× layout keeps CANDIDATES on the 128-wide
lane axis and (coefficient, point) on sublanes (PERF.md "lane-major layout").

This module runs the engine's existing jet/residual code inside a Pallas
TPU kernel in that layout via the LJ shim (ops/lanes.py):

    XLA:    gather operand rows from the HBM jet cache, transpose to
            lane-major [T*P, N]
    Pallas: per 512-candidate tile — surface op at screen order (4) and
            fingerprint order (1) + PDE residual/scale + verdict flags,
            fingerprint quantize+hash and the 12 B/candidate compact
            packing (_verdict_pack_tile), all in VMEM
    XLA:    candidate-major transpose of the output jets (cache append)

The XLA universal kernel (parallel/incremental.py) remains the default on
CPU and the correctness oracle; tests compare the two in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.jetops import UNARY_NAMES, apply_surface_op
from ..ops.jets import n_coeffs
from ..ops.lanes import (from_lane_major, lanes, lj_from_ref, lj_store,
                         to_lane_major)
from .search import (_RESIDUALS, pack_screen_result,
                     pack_screen_result_compact, snap_fp_jets,
                     verdicts_from_parts)

TILE = 512


def _verdict_pack_tile(res, scale, s_cols, f_cols, n_screen: int,
                       n_fp: int, tile: int, screen_rtol: float):
    """IN-KERNEL verdicts + compact packing for one lane-major tile —
    the fused tail of search.verdicts_from_parts +
    pack_screen_result_compact.

    Keeping the verdict in the kernel removes the biggest XLA post-pass
    of every screen dispatch: the old tail re-read the full
    candidate-major jet arrays ([N, P*T] + [N, F*3], ~155 MB per 262k
    superbatch) plus two [P, N] res/scale outputs just to reduce them to
    12 B/candidate.  Here the reduction happens on the [P, tile] vregs
    already live in VMEM and only the 12 B/candidate packing leaves the
    kernel.

    Bit-identity with the XLA pair is by construction: the same jnp
    elementwise ops (including jnp.frexp's bit-level mantissa/exponent
    split inside search._quantize) in the same fingerprint fold order,
    and the point/coefficient reductions (any/all/max) are exact.
    Asserted against the XLA oracle in tests/test_structured.py (CPU
    interpret mode) and on chip (PERF.md).

    Returns a ``[3, tile]`` uint32 block: rows (fp_a, fp_b,
    rel_max-bf16 | flags) — the lane-major transpose of one
    pack_screen_result_compact row block.
    """
    from .search import JET_TINY, SCALE_FLOOR, _quantize

    P, F = n_screen, n_fp
    f32 = jnp.float32
    u32 = jnp.uint32
    res = jnp.broadcast_to(res, (P, tile)).astype(f32)
    scale = jnp.broadcast_to(scale, (P, tile)).astype(f32)
    rel = jnp.abs(res) / (scale + jnp.asarray(1e-30, f32))
    finite = jnp.isfinite(res) & jnp.isfinite(scale)

    # informative_points: underflow-blind vs structural-zero discipline
    coeff_ok = None
    allzero = None
    for c in s_cols:
        a = jnp.abs(jnp.broadcast_to(c, (P, tile)).astype(f32))
        ok = (a == 0.0) | (a > JET_TINY)
        zz = a == 0.0
        coeff_ok = ok if coeff_ok is None else (coeff_ok & ok)
        allzero = zz if allzero is None else (allzero & zz)
    healthy = coeff_ok & ~allzero
    structural = (scale == 0.0) & (res == 0.0) & healthy
    ok_pt = finite & ((scale > SCALE_FLOOR) | structural)
    any_inform = jnp.any(ok_pt, axis=0, keepdims=True)        # [1, tile]
    rel_max = jnp.max(jnp.where(ok_pt, rel, 0.0), axis=0, keepdims=True)
    rel_max = jnp.where(any_inform, rel_max, jnp.inf).astype(f32)
    nonfinite_any = jnp.any(~finite, axis=0, keepdims=True)
    screen_ok = (~nonfinite_any) & any_inform & (rel_max < screen_rtol)

    # fingerprint quantize + FNV fold, flat order k = probe*3 + coeff
    fcols = [jnp.broadcast_to(c, (F, tile)).astype(f32) for c in f_cols]
    q = [_quantize(c) for c in fcols]                       # [F, tile] i32
    fin = [jnp.isfinite(c) for c in fcols]

    def fold(mult: int, seed: int):
        h = jnp.full((1, tile), seed, dtype=u32)
        for p in range(F):
            for c in range(3):
                h = (h * u32(mult)) ^ q[c][p:p + 1, :].astype(u32)
        return h

    fp_a = fold(0x01000193, 0x811C9DC5)
    fp_b = fold(0x85EBCA6B, 0xC2B2AE35)
    fp_fin = jnp.all(fin[0] & fin[1] & fin[2], axis=0, keepdims=True)
    val_ok = jnp.all(fin[0], axis=0, keepdims=True)
    grad_max = jnp.max(jnp.maximum(jnp.abs(fcols[1]), jnp.abs(fcols[2])),
                       axis=0, keepdims=True)
    is_const = (grad_max == 0.0) & val_ok

    flags = (screen_ok.astype(u32)
             | (nonfinite_any.astype(u32) << 1)
             | (is_const.astype(u32) << 2)
             | (fp_fin.astype(u32) << 3))
    rel_bits = jax.lax.bitcast_convert_type(rel_max, u32)
    col2 = ((rel_bits + u32(0xFFFF)) & u32(0xFFFF0000)) | flags
    return jnp.concatenate([fp_a, fp_b, col2], axis=0)       # [3, tile]


def lj_from_pmajor(y, n_points: int, n_coeff: int):
    """Build an LJ from a ``[n_points*n_coeff, tile]`` block whose rows
    are in (point, coeff) order — the raw in-register transpose of a
    candidate-major cache-row block.  LJ wants coefficient blocks; the
    static slices lower to Mosaic sublane moves.  Measured with the
    per-tile block-gather: this in-kernel assembly runs 5.3 ms / 262k
    candidates vs 7.9 ms for the same slice/transpose in XLA (PERF.md),
    which is why ALL kernel inputs arrive candidate-major raw."""
    from ..ops.lanes import LJ
    return LJ([jnp.concatenate(
        [y[p * n_coeff + k:p * n_coeff + k + 1, :]
         for p in range(n_points)], axis=0)
        for k in range(n_coeff)])


def _store_candidate_major(ref, jet, n_points: int, n_coeff: int,
                           tile: int):
    """Write an LJ to a ``[tile, P*T]`` ref in CANDIDATE-MAJOR layout
    (column p*T + k == the jet-cache row format) — the in-kernel
    equivalent of ops.lanes.from_lane_major.

    The old tail wrote lane-major ``[T*P, n]`` outputs and XLA
    transposed them back to cache rows (from_lane_major: a full
    HBM read+write of the jet arrays, ~310 MB per 262k superbatch
    across screen+fingerprint orders).  Reordering the rows while
    they are still VMEM vregs and transposing in-register removes
    that pass; the cache append and the passer gather then consume
    the kernel output directly.  Pure layout change — values are
    bit-identical, asserted in tests/test_structured.py."""
    rows = [jnp.broadcast_to(jet.cols[k], (n_points, tile))[p:p + 1, :]
            .astype(ref.dtype)
            for p in range(n_points) for k in range(n_coeff)]
    ref[:] = jnp.concatenate(rows, axis=0).T


def _op_tile_runner(op_name: str, order: int, residual_key: str,
                    n_screen: int, n_fp: int, tile: int,
                    interpret: bool):
    """Pallas tile runner for ONE surface op with the UNIVERSAL signature
    (points3, a_s, a_f, b_s, b_f) -> (out_s_lm, out_f_lm, res, scale) —
    unary ops ignore the b operands so every op fits one lax.switch
    branch shape."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    residual_fn = _RESIDUALS[residual_key]
    T = n_coeffs(order)
    P = n_screen
    F = n_fp
    unary = op_name in UNARY_NAMES
    rows_s = T * P
    rows_f = 3 * F

    def kernel(points_ref, *refs):
        if unary:
            a_s_ref, a_f_ref, out_s_ref, out_f_ref, res_ref, scale_ref = refs
            b_s = b_f = None
        else:
            (a_s_ref, a_f_ref, b_s_ref, b_f_ref,
             out_s_ref, out_f_ref, res_ref, scale_ref) = refs
            b_s = lj_from_ref(b_s_ref, P, T)
            b_f = lj_from_ref(b_f_ref, F, 3)
        a_s = lj_from_ref(a_s_ref, P, T)
        a_f = lj_from_ref(a_f_ref, F, 3)

        out_s = apply_surface_op(op_name, a_s, b_s, order, lanes)
        out_f = apply_surface_op(op_name, a_f, b_f, 1, lanes)

        pts = points_ref[:]                     # [P, 1, 2]
        res, scale = residual_fn(out_s, pts, lanes)

        lj_store(out_s_ref, out_s, P, tile)
        lj_store(out_f_ref, out_f, F, tile)
        res_ref[:] = jnp.broadcast_to(res, (P, tile)).astype(res_ref.dtype)
        scale_ref[:] = jnp.broadcast_to(scale,
                                        (P, tile)).astype(scale_ref.dtype)

    def spec(r):
        return pl.BlockSpec((r, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    pts_spec = pl.BlockSpec((P, 1, 2), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    def run_tiles(points3, a_s, a_f, b_s, b_f):
        n = a_s.shape[-1]
        assert n % tile == 0, (n, tile)  # callers pad batches to the tile
        grid = (n // tile,)
        in_specs = [pts_spec, spec(rows_s), spec(rows_f)]
        args = [points3, a_s, a_f]
        if not unary:
            in_specs += [spec(rows_s), spec(rows_f)]
            args += [b_s, b_f]
        out_shape = [
            jax.ShapeDtypeStruct((rows_s, n), jnp.float32),
            jax.ShapeDtypeStruct((rows_f, n), jnp.float32),
            jax.ShapeDtypeStruct((P, n), jnp.float32),
            jax.ShapeDtypeStruct((P, n), jnp.float32),
        ]
        out_specs = [spec(rows_s), spec(rows_f), spec(P), spec(P)]
        return pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, interpret=interpret)(*args)

    return run_tiles


@functools.lru_cache(maxsize=None)
def make_pallas_universal_kernel(order: int, residual_key: str,
                                 screen_rtol: float, n_screen: int,
                                 n_fp: int, tile: int = TILE,
                                 interpret: bool = False,
                                 compact: bool = False):
    """ONE jitted executable for ALL surface ops: gather both operands,
    ``lax.switch`` on a traced op id into the op's Pallas tile kernel,
    then the shared verdict/fingerprint packing.

    One executable instead of 18 matters on a tunneled TPU for the same
    reason as the XLA universal kernel (incremental.py): each executable's
    FIRST use pays a multi-second serialized-executable load even when
    the persistent compile cache hits — per-op Pallas jits were ~70 s of
    a warm depth-4 run's device wall."""
    from .incremental import OP_ORDER  # shared switch-branch order

    T = n_coeffs(order)
    P = n_screen
    F = n_fp
    runners = [
        _op_tile_runner(name, order, residual_key, P, F, tile, interpret)
        for name in OP_ORDER]

    def call(cache_screen, cache_fp, ab_idx, op_id, spoints, fpoints):
        n = ab_idx.shape[0]
        a_idx = ab_idx[:, 0]
        b_idx = ab_idx[:, 1]
        a_s = to_lane_major(cache_screen[a_idx], P, T)
        a_f = to_lane_major(cache_fp[a_idx], F, 3)
        b_s = to_lane_major(cache_screen[b_idx], P, T)
        b_f = to_lane_major(cache_fp[b_idx], F, 3)
        points3 = spoints.reshape(P, 1, 2).astype(jnp.float32)

        def branch(run):
            return lambda ops: run(*ops)

        out_s_lm, out_f_lm, res, scale = jax.lax.switch(
            op_id, [branch(r) for r in runners],
            (points3, a_s, a_f, b_s, b_f))
        jets = from_lane_major(out_s_lm, P, T).reshape(n, P, T)
        # grid-snap the fingerprint jets before verdicts/keys and before
        # they become cache rows (search.snap_fp_jets)
        fj = snap_fp_jets(from_lane_major(out_f_lm, F, 3).reshape(n, F, 3))
        sr = verdicts_from_parts(res.T, scale.T, jets, fj, screen_rtol)
        packed = (pack_screen_result_compact(sr) if compact
                  else pack_screen_result(sr))
        return (packed, jets.reshape(n, -1), fj.reshape(n, -1))

    return jax.jit(call)


@functools.lru_cache(maxsize=None)
def make_pallas_segmented_kernel(order: int, residual_key: str,
                                 screen_rtol: float, n_screen: int,
                                 n_fp: int, tile: int = TILE,
                                 interpret: bool = False,
                                 compact: bool = True):
    """ONE dispatch for a whole MIXED-op superbatch: candidates arrive as
    tile-aligned op segments and a per-tile op-id array rides in as a
    scalar-prefetch argument; each tile ``lax.switch``es into its op's
    jet-algebra branch inside the kernel.

    This is the per-depth dispatch-collapse: the per-op universal kernel
    costs one host->device dispatch per (op, shape) batch — ~34 per
    force_free depth, and the tunnel charges ~5 ms each, 4x the actual
    compute at depth-4 scale.  The segmented kernel runs the same depth
    in ceil(total/262144) dispatches.

    Verdicts + compact packing are FUSED into the kernel
    (:func:`_verdict_pack_tile`); only ``compact=True`` is supported
    here (the per-op universal kernel keeps the XLA tail and both
    packings, and serves as the correctness oracle)."""
    assert compact, "segmented kernel fuses the compact packing in-kernel"
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .incremental import OP_ORDER

    residual_fn = _RESIDUALS[residual_key]
    T = n_coeffs(order)
    P = n_screen
    F = n_fp
    rows_s = T * P
    rows_f = 3 * F

    def kernel(tile_op_ref, points_ref, a_s_ref, a_f_ref, b_s_ref,
               b_f_ref, out_s_ref, out_f_ref, packed_ref):
        op = tile_op_ref[pl.program_id(0)]
        # operands arrive candidate-major raw (the gathered cache rows);
        # the lane-major relayout happens in-register (lj_from_pmajor)
        a_s = lj_from_pmajor(a_s_ref[:].T, P, T)
        a_f = lj_from_pmajor(a_f_ref[:].T, F, 3)
        b_s = lj_from_pmajor(b_s_ref[:].T, P, T)
        b_f = lj_from_pmajor(b_f_ref[:].T, F, 3)

        def branch(name):
            unary = name in UNARY_NAMES

            def fn(_):
                s = apply_surface_op(name, a_s, None if unary else b_s,
                                     order, lanes)
                f = apply_surface_op(name, a_f, None if unary else b_f,
                                     1, lanes)
                # LJ is not a pytree — return uniformly-broadcast column
                # tuples so every branch has one output signature
                return (tuple(jnp.broadcast_to(c, (P, tile))
                              .astype(jnp.float32) for c in s.cols),
                        tuple(jnp.broadcast_to(c, (F, tile))
                              .astype(jnp.float32) for c in f.cols))
            return fn

        s_cols, f_cols = jax.lax.switch(
            op, [branch(n) for n in OP_ORDER], 0)
        # grid-snap fingerprint jets in-kernel (search.snap_fp_jets):
        # keys and cache rows must both see the snapped values
        f_cols = tuple(snap_fp_jets(c) for c in f_cols)
        out_s = lanes.stack(list(s_cols), axis=-1)
        out_f = lanes.stack(list(f_cols), axis=-1)
        pts = points_ref[:]
        res, scale = residual_fn(out_s, pts, lanes)
        _store_candidate_major(out_s_ref, out_s, P, T, tile)
        _store_candidate_major(out_f_ref, out_f, F, 3, tile)
        packed_ref[:] = _verdict_pack_tile(res, scale, s_cols, f_cols,
                                           P, F, tile, screen_rtol)

    # under scalar prefetch every index_map receives the prefetch ref as
    # a trailing argument
    def spec(r):
        return pl.BlockSpec((r, tile), lambda i, _ops: (0, i),
                            memory_space=pltpu.VMEM)

    def rspec(w):
        return pl.BlockSpec((tile, w), lambda i, _ops: (i, 0),
                            memory_space=pltpu.VMEM)

    pts_spec = pl.BlockSpec((P, 1, 2), lambda i, _ops: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    def call(cache_screen, cache_fp, ab_idx, tile_ops, spoints, fpoints):
        n = ab_idx.shape[0]
        assert n % tile == 0, (n, tile)
        a_idx = ab_idx[:, 0]
        b_idx = ab_idx[:, 1]
        a_s = cache_screen[a_idx]            # candidate-major raw rows
        a_f = cache_fp[a_idx]
        b_s = cache_screen[b_idx]
        b_f = cache_fp[b_idx]
        points3 = spoints.reshape(P, 1, 2).astype(jnp.float32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // tile,),
            in_specs=[pts_spec, rspec(rows_s), rspec(rows_f),
                      rspec(rows_s), rspec(rows_f)],
            out_specs=[rspec(rows_s), rspec(rows_f), spec(3)],
        )
        out_shape = [
            jax.ShapeDtypeStruct((n, rows_s), jnp.float32),
            jax.ShapeDtypeStruct((n, rows_f), jnp.float32),
            jax.ShapeDtypeStruct((3, n), jnp.uint32),
        ]
        jets, fj, packed_lm = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret)(tile_ops, points3, a_s, a_f, b_s, b_f)
        return (packed_lm.T, jets, fj)

    return jax.jit(call)


@functools.lru_cache(maxsize=None)
def make_pallas_structured_kernel(order: int, residual_key: str,
                                  screen_rtol: float, n_screen: int,
                                  n_fp: int, big: str, n_batch: int,
                                  tile: int = TILE,
                                  interpret: bool = False,
                                  compact: bool = True):
    """ONE dispatch for a superbatch with STRUCTURED operands: every
    candidate shares one surface op, one operand is a single constant uid
    and the other is a contiguous uid range ``[big0, big0 + n_batch)``.

    This is the gather bypass.  The profiled cost split of the mixed
    segmented kernel (tools/profile_kernel.py) is ~79% XLA row-gather —
    cache[idx] moves only ~32 GB/s against the chip's ~800 GB/s — while
    the dominant enumeration blocks (d1 small × d2 = depth-d1 huge,
    enumerator.vector_batches_at_depth) emit exactly repeat/tile index
    patterns: the constant operand needs ONE row and the varying operand
    is a contiguous cache slice read at full bandwidth with
    ``lax.dynamic_slice``.  The Pallas body is identical to the mixed
    segmented kernel; the constant operand rides in as ``[rows, 1]``
    columns that broadcast across the candidate lanes.

    ``big`` selects which operand is the contiguous range:
      big="b": binary candidates (const_uid, big0+i)   — a constant
      big="a": binary candidates (big0+i, const_uid)   — b constant,
               and ALL unary candidates over a contiguous range
               (const_uid ignored by unary branches).

    Verdicts + compact packing are fused in-kernel
    (:func:`_verdict_pack_tile`); compact only.
    """
    assert compact, "structured kernel fuses the compact packing in-kernel"
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .incremental import OP_ORDER

    assert big in ("a", "b")
    residual_fn = _RESIDUALS[residual_key]
    T = n_coeffs(order)
    P = n_screen
    F = n_fp
    rows_s = T * P
    rows_f = 3 * F
    n = n_batch
    assert n % tile == 0, (n, tile)

    def kernel(op_ref, points_ref, s_s_ref, s_f_ref, b_s_ref, b_f_ref,
               out_s_ref, out_f_ref, packed_ref):
        from ..ops.lanes import LJ

        op = op_ref[0]
        # all operands arrive candidate-major raw; in-register relayout
        small_s = lj_from_pmajor(s_s_ref[:].T, P, T)  # [P, 1] columns
        small_f = lj_from_pmajor(s_f_ref[:].T, F, 3)
        big_s = lj_from_pmajor(b_s_ref[:].T, P, T)    # [P, tile] columns
        big_f = lj_from_pmajor(b_f_ref[:].T, F, 3)
        if interpret:
            # XLA:CPU's codegen is shape-sensitive: computing on [P, 1]
            # columns and broadcasting the result differs from the mixed
            # kernel's replicated [P, tile] computation by 1 ulp on a few
            # lanes, which can flip a fingerprint-quantization boundary.
            # Pre-broadcasting makes the interpret path trace the mixed
            # kernel's exact shapes so CPU tests assert bit equality.
            # Mosaic (real TPU) is bit-identical without this — measured
            # via the same comparison on-chip.
            small_s = LJ([jnp.broadcast_to(c, (P, tile))
                          for c in small_s.cols])
            small_f = LJ([jnp.broadcast_to(c, (F, tile))
                          for c in small_f.cols])

        def branch(name):
            unary = name in UNARY_NAMES

            def fn(_):
                if unary:
                    s = apply_surface_op(name, big_s, None, order, lanes)
                    f = apply_surface_op(name, big_f, None, 1, lanes)
                elif big == "b":
                    s = apply_surface_op(name, small_s, big_s, order,
                                         lanes)
                    f = apply_surface_op(name, small_f, big_f, 1, lanes)
                else:
                    s = apply_surface_op(name, big_s, small_s, order,
                                         lanes)
                    f = apply_surface_op(name, big_f, small_f, 1, lanes)
                return (tuple(jnp.broadcast_to(c, (P, tile))
                              .astype(jnp.float32) for c in s.cols),
                        tuple(jnp.broadcast_to(c, (F, tile))
                              .astype(jnp.float32) for c in f.cols))
            return fn

        s_cols, f_cols = jax.lax.switch(
            op, [branch(nm) for nm in OP_ORDER], 0)
        f_cols = tuple(snap_fp_jets(c) for c in f_cols)  # grid snap
        out_s = lanes.stack(list(s_cols), axis=-1)
        out_f = lanes.stack(list(f_cols), axis=-1)
        pts = points_ref[:]
        res, scale = residual_fn(out_s, pts, lanes)
        _store_candidate_major(out_s_ref, out_s, P, T, tile)
        _store_candidate_major(out_f_ref, out_f, F, 3, tile)
        packed_ref[:] = _verdict_pack_tile(res, scale, s_cols, f_cols,
                                           P, F, tile, screen_rtol)

    def spec(r):
        return pl.BlockSpec((r, tile), lambda i, _op: (0, i),
                            memory_space=pltpu.VMEM)

    def rspec(w):
        return pl.BlockSpec((tile, w), lambda i, _op: (i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(w):
        return pl.BlockSpec((1, w), lambda i, _op: (0, 0),
                            memory_space=pltpu.VMEM)

    pts_spec = pl.BlockSpec((P, 1, 2), lambda i, _op: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // tile,),
        in_specs=[pts_spec, const_spec(rows_s), const_spec(rows_f),
                  rspec(rows_s), rspec(rows_f)],
        out_specs=[rspec(rows_s), rspec(rows_f), spec(3)],
    )
    out_shape = [
        jax.ShapeDtypeStruct((n, rows_s), jnp.float32),
        jax.ShapeDtypeStruct((n, rows_f), jnp.float32),
        jax.ShapeDtypeStruct((3, n), jnp.uint32),
    ]

    def call(cache_screen, cache_fp, const_uid, big0, op_id, spoints,
             fpoints):
        small_s = jax.lax.dynamic_slice(
            cache_screen, (const_uid, 0), (1, P * T))
        small_f = jax.lax.dynamic_slice(
            cache_fp, (const_uid, 0), (1, F * 3))
        big_s = jax.lax.dynamic_slice(
            cache_screen, (big0, 0), (n, P * T))
        big_f = jax.lax.dynamic_slice(
            cache_fp, (big0, 0), (n, F * 3))
        points3 = spoints.reshape(P, 1, 2).astype(jnp.float32)
        op_arr = jnp.reshape(op_id, (1,)).astype(jnp.int32)
        jets, fj, packed_lm = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret)(op_arr, points3, small_s, small_f,
                                 big_s, big_f)
        return (packed_lm.T, jets, fj)

    return jax.jit(call)


@functools.lru_cache(maxsize=None)
def make_pallas_tiled_kernel(order: int, residual_key: str,
                             screen_rtol: float, n_screen: int,
                             n_fp: int, n_batch: int, tile: int = TILE,
                             interpret: bool = False,
                             compact: bool = True):
    """The PER-TILE gather bypass: every 512-candidate tile has its own
    (surface op, constant-operand uid, contiguous-operand start row) —
    the generalization of make_pallas_structured_kernel from one
    superbatch-long run to ANY mix of runs at tile granularity.

    This covers what the full-run kernel cannot: the deferred sub-SUPER
    run tails, short-run enumeration blocks (small × mid-depth), and
    runs with interior pad rows — i.e. nearly all of the remaining
    mixed-path traffic, whose XLA row-gather costs ~79% of that kernel's
    device time (tools/profile_kernel.py).

    Per-tile operand fetch measured on the v5e (262,144 candidates):
    ``vmap(dynamic_slice)`` block-gather + in-kernel transpose +
    static-slice row permute = 5.3 ms, bit-identical to gather +
    ``to_lane_major`` — vs 7.9 ms for the same assembly in XLA (the
    block-gather defeats XLA's slice/transpose fusion) and ~13 ms for
    the row-gather path it replaces.

    ``opkind[i] = op_index*2 + kind`` per tile, where kind=0 means the
    contiguous range is operand ``a`` (and all unary ops), kind=1 means
    it is operand ``b`` (constant ``a``).  Pad rows inside a tile (a run
    shorter than the tile) read whatever cache rows follow the run —
    live rows of other uids — and are discarded by the caller's segment
    windows, exactly like the mixed path's (0, 0) pad rows.

    Verdicts + compact packing are fused in-kernel
    (:func:`_verdict_pack_tile`); compact only."""
    assert compact, "tiled kernel fuses the compact packing in-kernel"
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .incremental import OP_ORDER

    residual_fn = _RESIDUALS[residual_key]
    T = n_coeffs(order)
    P = n_screen
    F = n_fp
    rows_s = T * P
    rows_f = 3 * F
    n = n_batch
    assert n % tile == 0, (n, tile)
    n_tiles = n // tile

    def kernel(opkind_ref, points_ref, b_s_ref, b_f_ref, c_s_ref,
               c_f_ref, out_s_ref, out_f_ref, packed_ref):
        from ..ops.lanes import LJ

        ok = opkind_ref[pl.program_id(0)]
        big_s = lj_from_pmajor(b_s_ref[0].T, P, T)    # [P, tile] cols
        big_f = lj_from_pmajor(b_f_ref[0].T, F, 3)
        small_s = lj_from_pmajor(c_s_ref[0].T, P, T)  # [P, 1] cols
        small_f = lj_from_pmajor(c_f_ref[0].T, F, 3)
        if interpret:
            # same 1-ulp shape sensitivity as the structured kernel: CPU
            # tests assert bit equality with the mixed kernel, so trace
            # its exact [P, tile] shapes
            small_s = LJ([jnp.broadcast_to(c, (P, tile))
                          for c in small_s.cols])
            small_f = LJ([jnp.broadcast_to(c, (F, tile))
                          for c in small_f.cols])

        def branch(name, kind):
            unary = name in UNARY_NAMES

            def fn(_):
                if unary:
                    s = apply_surface_op(name, big_s, None, order, lanes)
                    f = apply_surface_op(name, big_f, None, 1, lanes)
                elif kind == 1:   # big is b, const is a
                    s = apply_surface_op(name, small_s, big_s, order,
                                         lanes)
                    f = apply_surface_op(name, small_f, big_f, 1, lanes)
                else:             # big is a, const is b
                    s = apply_surface_op(name, big_s, small_s, order,
                                         lanes)
                    f = apply_surface_op(name, big_f, small_f, 1, lanes)
                return (tuple(jnp.broadcast_to(c, (P, tile))
                              .astype(jnp.float32) for c in s.cols),
                        tuple(jnp.broadcast_to(c, (F, tile))
                              .astype(jnp.float32) for c in f.cols))
            return fn

        branches = []
        for nm in OP_ORDER:
            branches.append(branch(nm, 0))
            branches.append(branch(nm, 1))
        s_cols, f_cols = jax.lax.switch(ok, branches, 0)
        f_cols = tuple(snap_fp_jets(c) for c in f_cols)  # grid snap
        out_s = lanes.stack(list(s_cols), axis=-1)
        out_f = lanes.stack(list(f_cols), axis=-1)
        pts = points_ref[:]
        res, scale = residual_fn(out_s, pts, lanes)
        _store_candidate_major(out_s_ref, out_s, P, T, tile)
        _store_candidate_major(out_f_ref, out_f, F, 3, tile)
        packed_ref[:] = _verdict_pack_tile(res, scale, s_cols, f_cols,
                                           P, F, tile, screen_rtol)

    def spec(r):
        return pl.BlockSpec((r, tile), lambda i, _ok: (0, i),
                            memory_space=pltpu.VMEM)

    def rspec(w):
        return pl.BlockSpec((tile, w), lambda i, _ok: (i, 0),
                            memory_space=pltpu.VMEM)

    def block_spec(rows, w):
        return pl.BlockSpec((1, rows, w), lambda i, _ok: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    pts_spec = pl.BlockSpec((P, 1, 2), lambda i, _ok: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pts_spec, block_spec(tile, P * T), block_spec(tile, F * 3),
                  block_spec(1, P * T), block_spec(1, F * 3)],
        out_specs=[rspec(rows_s), rspec(rows_f), spec(3)],
    )
    out_shape = [
        jax.ShapeDtypeStruct((n, rows_s), jnp.float32),
        jax.ShapeDtypeStruct((n, rows_f), jnp.float32),
        jax.ShapeDtypeStruct((3, n), jnp.uint32),
    ]

    def call(cache_screen, cache_fp, starts, const_uid, opkind, spoints,
             fpoints):
        blocks_s = jax.vmap(lambda st: jax.lax.dynamic_slice(
            cache_screen, (st, 0), (tile, P * T)))(starts)
        blocks_f = jax.vmap(lambda st: jax.lax.dynamic_slice(
            cache_fp, (st, 0), (tile, F * 3)))(starts)
        const_s = cache_screen[const_uid][:, None, :]   # [nt, 1, Ws]
        const_f = cache_fp[const_uid][:, None, :]
        points3 = spoints.reshape(P, 1, 2).astype(jnp.float32)
        jets, fj, packed_lm = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret)(opkind.astype(jnp.int32), points3,
                                 blocks_s, blocks_f, const_s, const_f)
        return (packed_lm.T, jets, fj)

    return jax.jit(call)


@functools.lru_cache(maxsize=None)
def make_pallas_op_kernel(op_name: str, order: int, residual_key: str,
                          screen_rtol: float, n_screen: int, n_fp: int,
                          tile: int = TILE, interpret: bool = False,
                          compact: bool = False):
    """Per-op view of the universal Pallas kernel (same jitted executable
    for every op — the op id is a traced scalar); call signature matches
    incremental.make_op_kernel."""
    from .incremental import OP_INDEX

    uni = make_pallas_universal_kernel(order, residual_key, screen_rtol,
                                       n_screen, n_fp, tile, interpret,
                                       compact)
    op_id = jnp.asarray(OP_INDEX[op_name], jnp.int32)

    def call(cache_screen, cache_fp, ab_idx, spoints, fpoints):
        return uni(cache_screen, cache_fp, ab_idx, op_id, spoints, fpoints)

    return call
