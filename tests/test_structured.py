"""Structured-dispatch gather bypass (make_pallas_structured_kernel).

The mixed segmented kernel's device time is ~79% XLA row-gather
(tools/profile_kernel.py); superbatches whose candidates share one op
with one constant operand and one contiguous-uid operand — the dominant
repeat/tile blocks from enumerator.vector_batches_at_depth — dispatch
through a slice+broadcast kernel instead.  These tests pin (a) bit
equality with the mixed kernel, (b) the run-shape classifier, and (c)
end-to-end pipeline equality with carving on vs off."""

import numpy as np
import pytest

from pde_engine_tpu.models import load_problem
from pde_engine_tpu.pipeline import DiscoveryEngine, structured_run_kind
from pde_engine_tpu.utils.config import SearchConfig


def _kernels(problem, n):
    import jax.numpy as jnp

    from pde_engine_tpu.ops.jets import n_coeffs
    from pde_engine_tpu.parallel.pallas_engine import (
        make_pallas_segmented_kernel, make_pallas_structured_kernel)

    order = problem.residual_order
    T = n_coeffs(order)
    P = len(problem.screen_points)
    F = len(problem.fingerprint_points)
    rtol = float(problem.screen_rtol)
    key = problem.get_residual_key()
    seg = make_pallas_segmented_kernel(order, key, rtol, P, F,
                                       interpret=True)
    st = {big: make_pallas_structured_kernel(order, key, rtol, P, F, big,
                                             n, interpret=True)
          for big in ("a", "b")}
    rng = np.random.default_rng(0)
    C = 4 * n
    cache_s = jnp.asarray(rng.normal(size=(C, P * T)).astype(np.float32))
    cache_f = jnp.asarray(rng.normal(size=(C, F * 3)).astype(np.float32))
    sp = jnp.asarray(problem.screen_points, jnp.float32)
    fp = jnp.asarray(problem.fingerprint_points, jnp.float32)
    return seg, st, cache_s, cache_f, sp, fp, C


@pytest.mark.parametrize("op_name,kind", [
    ("mul", "b"), ("geom_sum", "b"),   # constant a, contiguous b
    ("sub", "a"), ("div", "a"),        # contiguous a, constant b
    ("exp", "a"), ("square", "a"),     # unary over a contiguous range
])
def test_structured_kernel_matches_segmented(op_name, kind):
    import jax.numpy as jnp

    from pde_engine_tpu.ops.jetops import UNARY_NAMES
    from pde_engine_tpu.parallel.incremental import OP_INDEX

    problem = load_problem("force_free")
    N = 512
    seg, st, cache_s, cache_f, sp, fp, C = _kernels(problem, N)
    const_uid, big0 = 7, 1000
    opid = OP_INDEX[op_name]
    ab = np.zeros((N, 2), np.int32)
    contig = np.arange(big0, big0 + N, dtype=np.int32)
    if op_name in UNARY_NAMES:
        ab[:, 0] = contig
    elif kind == "b":
        ab[:, 0] = const_uid
        ab[:, 1] = contig
    else:
        ab[:, 0] = contig
        ab[:, 1] = const_uid
    ops = np.full(N // 512, opid, np.int32)

    p_ref, js_ref, jf_ref = seg(cache_s, cache_f, jnp.asarray(ab),
                                jnp.asarray(ops), sp, fp)
    p_st, js_st, jf_st = st[kind](
        cache_s, cache_f, jnp.asarray(const_uid, jnp.int32),
        jnp.asarray(big0, jnp.int32), jnp.asarray(opid, jnp.int32), sp, fp)
    assert (np.asarray(p_ref) == np.asarray(p_st)).all()
    assert (np.asarray(js_ref) == np.asarray(js_st)).all()
    assert (np.asarray(jf_ref) == np.asarray(jf_st)).all()


def test_tiled_kernel_matches_segmented():
    """The per-tile gather bypass (make_pallas_tiled_kernel): a
    superbatch mixing per-tile ops, kinds and contiguous starts must be
    bit-identical to the mixed segmented kernel on the equivalent
    row-gather index array."""
    import jax.numpy as jnp

    from pde_engine_tpu.ops.jetops import UNARY_NAMES
    from pde_engine_tpu.parallel.incremental import OP_INDEX
    from pde_engine_tpu.parallel.pallas_engine import (
        make_pallas_tiled_kernel)

    problem = load_problem("force_free")
    N, TILE = 2048, 512
    n_tiles = N // TILE
    seg, _, cache_s, cache_f, sp, fp, C = _kernels(problem, N)
    tiled = make_pallas_tiled_kernel(
        problem.residual_order, problem.get_residual_key(),
        float(problem.screen_rtol), len(problem.screen_points),
        len(problem.fingerprint_points), N, interpret=True)

    # tile 0: mul with const a; tile 1: div with const b; tile 2: unary
    # exp; tile 3: geom_sum with const a — four kinds in one dispatch
    tiles = [("mul", 1, 7, 100), ("div", 0, 9, 700),
             ("exp", 0, 0, 1500), ("geom_sum", 1, 3, 30)]
    ab = np.zeros((N, 2), np.int32)
    ops = np.zeros(n_tiles, np.int32)
    starts = np.zeros(n_tiles, np.int32)
    const = np.zeros(n_tiles, np.int32)
    opkind = np.zeros(n_tiles, np.int32)
    for i, (name, kind, cu, st) in enumerate(tiles):
        lo = i * TILE
        contig = np.arange(st, st + TILE, dtype=np.int32)
        if name in UNARY_NAMES:
            ab[lo:lo + TILE, 0] = contig
        elif kind == 1:
            ab[lo:lo + TILE, 0] = cu
            ab[lo:lo + TILE, 1] = contig
        else:
            ab[lo:lo + TILE, 0] = contig
            ab[lo:lo + TILE, 1] = cu
        ops[i] = OP_INDEX[name]
        starts[i] = st
        const[i] = cu
        opkind[i] = OP_INDEX[name] * 2 + kind

    p_ref, js_ref, jf_ref = seg(cache_s, cache_f, jnp.asarray(ab),
                                jnp.asarray(ops), sp, fp)
    p_t, js_t, jf_t = tiled(cache_s, cache_f, jnp.asarray(starts),
                            jnp.asarray(const), jnp.asarray(opkind),
                            sp, fp)
    assert (np.asarray(p_ref) == np.asarray(p_t)).all()
    assert (np.asarray(js_ref) == np.asarray(js_t)).all()
    assert (np.asarray(jf_ref) == np.asarray(jf_t)).all()


def test_structured_run_kind():
    const = np.full(64, 5, np.int32)
    contig = np.arange(100, 164, dtype=np.int32)
    scattered = contig.copy()
    scattered[10] += 1  # duplicate uid elsewhere -> not contiguous

    assert structured_run_kind(const, contig, 0, 64) == "b"
    assert structured_run_kind(contig, const, 0, 64) == "a"
    assert structured_run_kind(contig, None, 0, 64) == "a"
    assert structured_run_kind(const, scattered, 0, 64) is None
    assert structured_run_kind(scattered, const, 0, 64) is None
    assert structured_run_kind(contig, contig, 0, 64) is None
    # window honors pos
    a2 = np.concatenate([contig, const])
    b2 = np.concatenate([const, contig])
    assert structured_run_kind(a2, b2, 64, 64) == "b"
    assert structured_run_kind(a2, b2, 0, 64) == "a"


def test_structured_pipeline_matches_mixed():
    """End-to-end: a run with the full-run carve enabled (per-tile bypass
    off) must produce the identical registry and verdict stream as the
    gather path — with only whole-superbatch runs carved, superbatch
    boundaries and uid assignment are preserved exactly — and must
    actually carve (batch_size == one tile, so depth-4 parent runs
    exceed SUPER)."""
    p1 = load_problem("laplace")
    ref = DiscoveryEngine(p1, SearchConfig(
        max_depth=4, use_segmented=True, use_structured=False,
        use_tiled=False, batch_size=512))
    ref.run(4)
    assert ref.structured_dispatches == 0

    p2 = load_problem("laplace")
    eng = DiscoveryEngine(p2, SearchConfig(
        max_depth=4, use_segmented=True, use_structured=True,
        use_tiled=False, batch_size=512))
    eng.run(4)
    assert eng.structured_dispatches > 0

    assert [s.unique for s in ref.stats] == [s.unique for s in eng.stats]
    assert [s.valid for s in ref.stats] == [s.valid for s in eng.stats]
    # identical rows in identical order (uid assignment preserved)
    r1 = [(r.expression, r.signature, r.is_valid) for r in ref.rows]
    r2 = [(r.expression, r.signature, r.is_valid) for r in eng.rows]
    assert r1 == r2


def test_tiled_pipeline_matches_mixed():
    """End-to-end with the per-tile bypass: short run items dispatch
    through the tiled kernel, interleaving the three superbatch buffers.
    Dispatch order (and so uid assignment / first-occurrence
    representatives) deterministically differs from the gather path, but
    the candidate SET is identical and fingerprint dedup is
    order-invariant — per-depth candidate/unique/valid counts and the
    knowns must match exactly."""
    p1 = load_problem("laplace")
    ref = DiscoveryEngine(p1, SearchConfig(
        max_depth=4, use_segmented=True, use_structured=False,
        use_tiled=False, batch_size=512))
    ref.run(4)

    p2 = load_problem("laplace")
    eng = DiscoveryEngine(p2, SearchConfig(
        max_depth=4, use_segmented=True, use_structured=True,
        use_tiled=True, batch_size=512, tiled_min_rows=64))
    eng.run(4)
    assert eng.tiled_dispatches > 0

    assert [s.candidates for s in ref.stats] == \
        [s.candidates for s in eng.stats]
    assert [s.unique for s in ref.stats] == [s.unique for s in eng.stats]
    assert [s.valid for s in ref.stats] == [s.valid for s in eng.stats]
    k1 = {r.paper_solution_name for r in ref.rows if r.is_paper_solution}
    k2 = {r.paper_solution_name for r in eng.rows if r.is_paper_solution}
    assert k1 == k2 and len(k2) > 0


def test_fused_verdicts_match_universal_oracle():
    """The segmented kernel fuses verdicts + compact packing IN-KERNEL
    (pallas_engine._verdict_pack_tile) and moved its IO to candidate-
    major cache-row layout with in-register relayout.  The per-op
    universal kernel keeps the original XLA tail (verdicts_from_parts +
    pack_screen_result_compact + from_lane_major) and serves as the
    oracle.

    The cache rows are REAL engine rows (a depth-3 force_free run) so the
    structural-zero / exact-zero verdict paths are represented the way
    production sees them.  Fingerprint keys, verdict flags, screen jets
    and fingerprint jets must all be BYTE-identical per tile.  The one
    field compared approximately is col2's bf16 rel_max: the foliation
    det nearly cancels, and XLA:CPU contracts FMAs differently in the
    segmented kernel's lax.switch program vs the universal kernel's
    switch-free runner, shifting a cancelled residual by a few percent
    (CPU-only; the same class of codegen sensitivity the structured
    kernel's interpret-mode note documents).  On Mosaic (real TPU) ALL
    outputs are byte-identical — asserted on-chip for
    seg/structured/tiled (PERF.md, round-3 fused-verdict note)."""
    import jax.numpy as jnp

    from pde_engine_tpu.parallel.pallas_engine import (
        make_pallas_segmented_kernel, make_pallas_universal_kernel)

    problem = load_problem("force_free")
    from pde_engine_tpu.ops.jets import n_coeffs
    order = problem.residual_order
    T = n_coeffs(order)
    P = len(problem.screen_points)
    F = len(problem.fingerprint_points)
    rtol = float(problem.screen_rtol)
    key = problem.get_residual_key()
    N, TILE = 2048, 512
    rng = np.random.default_rng(7)
    eng = DiscoveryEngine(load_problem("force_free"),
                          SearchConfig(max_depth=3))
    eng.run(3)
    C = eng.cache.n
    assert C >= TILE
    cache_s = eng.cache.screen[:C]
    cache_f = eng.cache.fp[:C]
    sp, fp = eng._spoints, eng._fpoints
    ab = jnp.asarray(rng.integers(0, C, size=(N, 2)).astype(np.int32))
    ops = jnp.asarray(rng.integers(0, 11, size=(N // TILE,))
                      .astype(np.int32))

    seg = make_pallas_segmented_kernel(order, key, rtol, P, F,
                                       interpret=True)
    uni = make_pallas_universal_kernel(order, key, rtol, P, F,
                                       interpret=True, compact=True)
    def same_to_1ulp(a, b):
        if not (np.array_equal(np.isnan(a), np.isnan(b))
                and np.array_equal(np.isfinite(a), np.isfinite(b))):
            return False
        eq = a.view(np.uint32) == b.view(np.uint32)
        ra, rb = a[~eq], b[~eq]
        if not np.all(np.isfinite(ra) & np.isfinite(rb)):
            return False      # non-finite entries must agree bit-for-bit
        with np.errstate(all="ignore"):
            val_eq = ra == rb                       # ±0
        ia = ra.view(np.uint32).astype(np.int64)
        ib = rb.view(np.uint32).astype(np.int64)
        one_ulp = ((np.signbit(ra) == np.signbit(rb))
                   & (np.abs(ia - ib) <= 1))
        return bool(np.all(val_eq | one_ulp))

    pk, js, fs = (np.asarray(x)
                  for x in seg(cache_s, cache_f, ab, ops, sp, fp))
    for t in range(N // TILE):
        sl = slice(t * TILE, (t + 1) * TILE)
        opid = jnp.asarray(int(ops[t]), jnp.int32)
        pk2, js2, fs2 = (np.asarray(x) for x in
                         uni(cache_s, cache_f, ab[sl], opid, sp, fp))
        assert np.array_equal(pk[sl][:, :2], pk2[:, :2]), ("fp keys", t)
        # col2's high half (bf16 rel_max) is NOT compared on CPU: for a
        # nearly-cancelled det the computed residual is rounding noise,
        # so two FMA-contraction schedules produce arbitrarily different
        # (tiny) values.  It is a diagnostic field (f64_skip_below
        # defaults to 0.0 so production never reads it), and it IS
        # byte-identical on Mosaic where both kernels share one
        # contraction scheme.
        assert np.array_equal(pk[sl][:, 2] & np.uint32(0xFFFF),
                              pk2[:, 2] & np.uint32(0xFFFF)), ("flags", t)
        assert same_to_1ulp(js[sl], js2), ("jets", t)
        assert same_to_1ulp(fs[sl], fs2), ("fj", t)
