"""Incremental-engine internals: jet-space op application must agree with
tape interpretation, and the vectorized enumerator must produce the same
candidate multiset as the object-based one."""

import numpy as np
import pytest

from pde_engine_tpu.enumerator import Enumerator
from pde_engine_tpu.models import load_problem
from pde_engine_tpu.ops import optable as ot
from pde_engine_tpu.ops.interpreter import eval_jets_np, eval_jets_np_many
from pde_engine_tpu.ops.jetops import apply_surface_op
from pde_engine_tpu.ops.tape import ConstTable, apply_binary, apply_unary, leaf_var


POINTS = np.array([[0.8, 0.857], [0.45, 0.31], [1.25, 0.55]])


@pytest.mark.parametrize("op_name", list(ot.UNARY_OPS) + list(ot.ALL_BINARY_OPS))
@pytest.mark.parametrize("order", [1, 2, 4])
def test_jetops_match_tape_interpreter(op_name, order):
    """apply_surface_op(jets(a), jets(b)) == jets(op(a, b)) for operands
    with nontrivial derivatives."""
    import sympy as sp
    consts = ConstTable()
    rho, z = sp.symbols("rho z", positive=True)
    from pde_engine_tpu.ops.tape import from_sympy
    ta = from_sympy(rho**2 + z, consts, (rho, z))
    tb = from_sympy(rho * z + sp.Rational(1, 3), consts, (rho, z))

    ja = eval_jets_np(ta.rows, len(ta), consts.as_array(), POINTS, order)
    jb = eval_jets_np(tb.rows, len(tb), consts.as_array(), POINTS, order)

    op = ot.ALL_SURFACE_OPS[op_name]
    if op.arity == 1:
        tc = apply_unary(op, ta, consts)
        got = apply_surface_op(op_name, ja, None, order, np)
    else:
        tc = apply_binary(op, ta, tb, consts)
        got = apply_surface_op(op_name, ja, jb, order, np)
    want = eval_jets_np(tc.rows, len(tc), consts.as_array(), POINTS, order)
    mask = np.isfinite(want)
    assert (np.isfinite(got) == mask).all(), op_name
    scale = np.maximum(np.abs(want[mask]), 1.0)
    np.testing.assert_allclose(got[mask] / scale, want[mask] / scale,
                               rtol=0, atol=1e-12, err_msg=op_name)


def test_batched_np_interpreter_matches_single():
    p = load_problem("force_free")
    exprs = list(p.known_solutions) + ["rho*z", "rho / (1 - z)",
                                       "exp_neg((z + z))"]
    tapes = [p.parse(s) for s in exprs]
    L = max(len(t) for t in tapes)
    batch = np.stack([t.padded(L) for t in tapes])
    lengths = np.array([len(t) for t in tapes])
    consts = p.consts.as_array()
    got = eval_jets_np_many(batch, lengths, consts, POINTS, 4)
    for i, t in enumerate(tapes):
        want = eval_jets_np(t.rows, len(t), consts, POINTS, 4)
        np.testing.assert_allclose(got[i], want, rtol=1e-12, atol=0,
                                   err_msg=exprs[i])


def test_vector_enumerator_matches_object_enumerator():
    """Same candidate multiset {(op, a, b)} from both generation paths."""
    p = load_problem("force_free")
    enum = Enumerator(p, include_special_ops=True, prune=True)
    for c in enum.primitive_candidates():
        enum.add_unique(c)
    # fabricate a depth-2 unique layer by structural identity (no device):
    seen = set()
    for cand in enum.candidates_at_depth(2):
        key = (cand.op_name, cand.a.uid,
               cand.b.uid if cand.b is not None else -1)
        seen.add(key)
        enum.add_unique(cand)

    obj = set()
    enum2 = Enumerator(p, include_special_ops=True, prune=True)
    for c in enum2.primitive_candidates():
        enum2.add_unique(c)
    for cand in enum2.candidates_at_depth(2):
        enum2.add_unique(cand)
    for cand in enum2.candidates_at_depth(3):
        a, b = cand.a.uid, (cand.b.uid if cand.b is not None else -1)
        obj.add((cand.op_name, a, b))

    enum3 = Enumerator(p, include_special_ops=True, prune=True)
    for c in enum3.primitive_candidates():
        enum3.add_unique(c)
    for cand in enum3.candidates_at_depth(2):
        enum3.add_unique(cand)
    vec = set()
    for op_name, a_u, b_u in enum3.vector_batches_at_depth(3, 1000):
        if b_u is None:
            for a in a_u.tolist():
                vec.add((op_name, a, -1))
        else:
            for a, b in zip(a_u.tolist(), b_u.tolist()):
                vec.add((op_name, a, b))

    assert obj == vec


def test_binary_blocks_emit_smallest_first():
    """Anytime-search block order: within a depth, binary (d1, d2)
    blocks emit in ascending |A|*|B| (d1 ascending on ties), so a
    bounded/aborted deep run has searched every shallow-parent
    combination before the giant (primitive x newest-depth) blocks
    start.  Depth 4 of laplace has blocks (1,3)/(3,1) (4 x N3) and
    (2,2) (N2^2) — with N2 = 66 and N3 ~ 2k, (2,2) is the smaller and
    must come first among full chunks."""
    p = load_problem("laplace")
    e = Enumerator(p, include_special_ops=True, prune=True)
    for c in e.primitive_candidates():
        e.add_unique(c)
    for d in (2, 3):
        for cand in e.candidates_at_depth(d):
            e.add_unique(cand)
    uid_depth = {}
    for d in (1, 2, 3):
        for u in e.uid_array(d).tolist():
            uid_depth[u] = d
    sizes = {(d1, 4 - d1): e.uid_array(d1).size * e.uid_array(4 - d1).size
             for d1 in (1, 2, 3)}
    first_seen = []
    bs = 64
    for op, a_u, b_u in e.vector_batches_at_depth(4, bs):
        if b_u is None or a_u.size < bs:
            continue  # unary, or deferred tail (depth-end by contract)
        blk = (uid_depth[int(a_u[0])], uid_depth[int(b_u[0])])
        if blk not in first_seen:
            first_seen.append(blk)
    assert first_seen, "test premise: depth-4 must emit full chunks"
    emitted_sizes = [sizes[b] for b in first_seen]
    assert emitted_sizes == sorted(emitted_sizes), (first_seen,
                                                    emitted_sizes)
    assert first_seen[0] == (2, 2)  # the genuinely smallest block


def _segment_ids(enum, depth, batches):
    """Map each emitted batch to its emission segment: 'u' for the
    unary block, (depth_a, depth_b) for a binary block.  Tails flush at
    segment boundaries, so segments are contiguous in the stream."""
    ids = []
    for op, a_u, b_u in batches:
        if b_u is None:
            ids.append("u")
        else:
            ids.append((int(enum.u_depth[int(a_u[0])]) or 1,
                        int(enum.u_depth[int(b_u[0])]) or 1))
    return ids


def test_vector_enumerator_defers_tails_per_block():
    """Deferred-tail emission order (the structured-dispatch enabler):
    within each emission segment (the unary block / one binary (d1, d2)
    block), every FULL batch_size-aligned chunk streams before any
    sub-batch tail, so the pipeline's mixed superbatch buffer never
    flushes partially filled when a structured run begins.  Tails flush
    at the END OF THEIR BLOCK, not the depth: a mid-depth block whose
    runs are all sub-batch-size must not have its content pushed past
    the later (larger) blocks, or the smallest-block-first anytime
    order is defeated (the round-5 GS depth-7 lesson: the (3,4) block
    holding the Solovev candidate deferred wholesale to position 2.1B
    of 3.0B).  The candidate SET is pinned against the object path by
    test_vector_enumerator_matches_object_enumerator; this pins the
    order contract."""
    p = load_problem("force_free")
    enum = Enumerator(p, include_special_ops=True, prune=True)
    for c in enum.primitive_candidates():
        enum.add_unique(c)
    for cand in enum.candidates_at_depth(2):
        enum.add_unique(cand)
    bs = 64  # small enough that depth-3 blocks emit both fulls and tails
    batches = list(enum.vector_batches_at_depth(3, bs))
    sizes = [a.size for _, a, _ in batches]
    assert any(s == bs for s in sizes) and any(s < bs for s in sizes)
    segs = _segment_ids(enum, 3, batches)
    # segments are contiguous (tails never leak past their block)
    seen = set()
    prev = None
    for s in segs:
        if s != prev:
            assert s not in seen, f"segment {s} split across the stream"
            seen.add(s)
            prev = s
    # within each segment: fulls before tails
    for seg in seen:
        seg_sizes = [sz for sz, s in zip(sizes, segs) if s == seg]
        first_tail = next((i for i, sz in enumerate(seg_sizes)
                           if sz < bs), len(seg_sizes))
        assert all(sz < bs for sz in seg_sizes[first_tail:]), seg


def test_same_depth_blocks_match_object_enumerator_depth4():
    """Depth 4 exercises the (2, 2) same-depth block, which emits ONE
    RUN AT A TIME (_same_depth_batches) instead of flat repeat/tile
    arrays so it rides the structured-dispatch gather bypass.  Pins the
    candidate SET against the object path with prune both on and off
    (off removes the a != b diagonal exclusion), plus duplicate-freedom
    and the per-segment fulls-before-tails order contract."""
    p = load_problem("laplace")
    for prune in (True, False):
        def mk():
            e = Enumerator(p, include_special_ops=True, prune=prune)
            for c in e.primitive_candidates():
                e.add_unique(c)
            for d in (2, 3):
                for cand in e.candidates_at_depth(d):
                    e.add_unique(cand)
            return e

        obj = set()
        for cand in mk().candidates_at_depth(4):
            obj.add((cand.op_name, cand.a.uid,
                     cand.b.uid if cand.b is not None else -1))
        e4 = mk()
        vec, n_vec, sizes = set(), 0, []
        bs = 64
        batches = list(e4.vector_batches_at_depth(4, bs))
        for op, a_u, b_u in batches:
            n_vec += a_u.size
            sizes.append(a_u.size)
            if b_u is None:
                vec.update((op, int(a), -1) for a in a_u.tolist())
            else:
                vec.update((op, int(a), int(b))
                           for a, b in zip(a_u.tolist(), b_u.tolist()))
        assert obj == vec
        assert len(vec) == n_vec  # no swapped-pair duplicates
        segs = _segment_ids(e4, 4, batches)
        for seg in set(segs):
            seg_sizes = [sz for sz, s in zip(sizes, segs) if s == seg]
            first_tail = next((i for i, sz in enumerate(seg_sizes)
                               if sz < bs), len(seg_sizes))
            assert all(sz < bs for sz in seg_sizes[first_tail:]), seg


def test_vector_enumerator_counts_depth2():
    p = load_problem("force_free")
    enum = Enumerator(p, include_special_ops=True, prune=True)
    for c in enum.primitive_candidates():
        enum.add_unique(c)
    n_obj = sum(1 for _ in enum.candidates_at_depth(2))
    enum2 = Enumerator(p, include_special_ops=True, prune=True)
    for c in enum2.primitive_candidates():
        enum2.add_unique(c)
    n_vec = sum(a.size for _, a, _ in enum2.vector_batches_at_depth(2, 4096))
    assert n_obj == n_vec


def test_uidrange_sharded_kernel_matches_unsharded():
    """The uid-range-sharded kernel (jet cache split across the mesh by
    row range, operands reconstructed with masked-gather + psum) must
    produce bit-identical VERDICTS and FINGERPRINT rows to the
    single-device universal kernel — the key-bearing content that dedup
    and resume depend on.  Order-R screen jets are only compared to a
    tight tolerance: the two compilations may FMA-contract the order-4
    jet products differently (last-ulp, amplified through inv chains —
    see ops/jets.jet_mul), which moves verdict rounding only; fingerprint
    rows stay exact because they are grid-snapped in-kernel with
    exact-product inputs (search.snap_fp_jets).  This is the 10^8-unique
    HBM-scaling path: K chips hold contiguous cache slices, only operand
    rows ride ICI."""
    import jax
    import jax.numpy as jnp

    from pde_engine_tpu.ops.jets import n_coeffs
    from pde_engine_tpu.parallel.incremental import (
        make_op_kernel, make_op_kernel_uidrange)
    from pde_engine_tpu.parallel.mesh import candidate_mesh

    p = load_problem("force_free")
    T = n_coeffs(p.residual_order)
    P_ = len(p.screen_points)
    F = len(p.fingerprint_points)
    rng = np.random.default_rng(7)
    C = 64                       # cache rows (divisible by 8 devices)
    N = 32                       # batch (divisible by 8)
    cache_s = jnp.asarray(rng.normal(size=(C, P_ * T)).astype(np.float32))
    cache_f = jnp.asarray(rng.normal(size=(C, F * 3)).astype(np.float32))
    ab = jnp.asarray(
        rng.integers(0, C, size=(N, 2)).astype(np.int32))
    sp = jnp.asarray(p.screen_points, jnp.float32)
    fp = jnp.asarray(p.fingerprint_points, jnp.float32)

    kw = dict(order=p.residual_order,
              residual_key=p.get_residual_key(),
              screen_rtol=float(p.screen_rtol),
              n_screen=P_, n_fp=F)
    mesh = candidate_mesh(8)
    for op_name in ("mul", "div", "neg", "geom_sum"):
        ref_packed, ref_s, ref_f = make_op_kernel(
            op_name=op_name, compact=True, **kw)(
            cache_s, cache_f, ab, sp, fp)
        packed, out_s, out_f, n_pass = make_op_kernel_uidrange(
            mesh, op_name, **kw)(cache_s, cache_f, ab, sp, fp)
        np.testing.assert_array_equal(np.asarray(ref_packed),
                                      np.asarray(packed))
        rs, os_ = np.asarray(ref_s), np.asarray(out_s)
        fin = np.isfinite(rs) & np.isfinite(os_)
        np.testing.assert_allclose(os_[fin], rs[fin], rtol=1e-3)
        assert ((~np.isfinite(rs)) == (~np.isfinite(os_))).all()
        np.testing.assert_array_equal(np.asarray(ref_f), np.asarray(out_f))
        assert int(n_pass) == int(
            (np.asarray(ref_packed)[:, 2] & 1).sum())
