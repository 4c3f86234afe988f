"""Fingerprint grid-snap: dedup identity must not drift with emission
order (VERDICT round 3 weak #1; SURVEY.md §7 hard part 4).

Round 3 documented a -2.9% unique-count drift on GS depth-6 when the
emission order changed: the FIRST equivalent candidate seen becomes the
registered representative, its raw f32 fingerprint jets become the
JetCache row, and every descendant's fingerprint (hence dedup key) is
computed from that row — so near-cell-boundary keys compounded through
depths.  The fix snaps every fingerprint jet onto its quantization-cell
representative (``search.snap_fp_jets``) before keys are computed and
before rows enter the cache, making the key lattice a function of the
candidate's VALUE CELL, not of which representative got registered.

Tested here:
- the snap is pure-integer bit-identical between the NumPy mirror and
  the XLA implementation (the subnormal flush is what makes this true —
  XLA backends flush subnormals inconsistently);
- the snap is *cell-canonical*: it factors exactly through ``_quantize``
  (one snapped bit pattern per cell, key round-trip, idempotence);
- ``jet_mul`` is bitwise swap-symmetric, so commutative-candidate
  orientation (which follows uid order = emission order) cannot change
  descendant jets;
- end-to-end: a laplace depth-4 run with every dispatch batch REVERSED
  (flipping first-occurrence representatives wholesale) produces the
  exact same per-depth unique counts, fingerprint-key set, and valid
  set as the normal run.

The reference has no analog (its dedup is string normalization —
problems/__init__.py normalize_expression) — this guards a failure mode
specific to the numeric-fingerprint redesign.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_engine_tpu.models import load_problem
from pde_engine_tpu.ops.jets import jet_mul
from pde_engine_tpu.parallel.search import (_quantize, snap_fp_jets,
                                            snap_fp_jets_np)
from pde_engine_tpu.pipeline import DiscoveryEngine
from pde_engine_tpu.utils.config import SearchConfig
from pde_engine_tpu.utils.hashing import STRUCT_TAG


def _sweep():
    """Wide f32 sweep: ~60 decades plus every edge class."""
    rng = np.random.default_rng(0)
    v = np.concatenate([
        (rng.standard_normal(20000)
         * 10.0 ** rng.integers(-30, 30, 20000)).astype(np.float32),
        np.array([0.0, -0.0, 1.0, -1.0, 2.0 ** -149, -(2.0 ** -149),
                  2.0 ** -126, 0.99999994, 1.00000012, 3.4e38, -3.4e38,
                  np.inf, -np.inf, np.nan, 65535.99, 2.0 ** -140 * 1.37],
                 np.float32)]).astype(np.float32)
    return v


def _bits(x):
    return np.ascontiguousarray(x, np.float32).view(np.uint32)


def test_snap_np_jnp_bit_identity():
    v = _sweep()
    s_np = snap_fp_jets_np(v)
    s_j = np.asarray(jax.jit(snap_fp_jets)(jnp.asarray(v)))
    fin = np.isfinite(v)
    assert (_bits(s_np)[fin] == _bits(s_j)[fin]).all()
    # non-finite passes through on both
    assert (np.isinf(s_np[~fin]) == np.isinf(v[~fin])).all()
    assert (np.isnan(s_np[~fin]) == np.isnan(v[~fin])).all()
    assert (np.isinf(s_j[~fin]) == np.isinf(v[~fin])).all()


def test_snap_edge_semantics():
    v = _sweep()
    s = snap_fp_jets_np(v)
    # exact zeros (and -0.0) snap to +0.0 — constant detection is
    # equality-based
    assert _bits(s)[v == 0].tolist() == [0, 0]
    # subnormals flush to +0.0 on every path (the TPU VPU is FTZ)
    sub = np.isfinite(v) & (v != 0) & (np.abs(v) < 2.0 ** -126)
    assert sub.any() and (_bits(s)[sub] == 0).all()
    # normal values never flush
    norm = np.isfinite(v) & (np.abs(v) >= 2.0 ** -126)
    assert (s[norm & (v != 0)] != 0).all()
    # relative error bounded by half a cell (2**-12 at binade bottom)
    ok = norm & (np.abs(v) < 3.3e38)
    rel = np.abs((s[ok] - v[ok]) / v[ok])
    assert rel.max() < 2.5e-4
    # power-of-two seam: just-below-1.0 merges INTO 1.0's cell
    assert _bits(snap_fp_jets_np(np.float32([0.99999994])))[0] == \
        _bits(np.float32([1.0]))[0]


def test_snap_is_cell_canonical():
    """snap factors exactly through _quantize: one snapped bit pattern
    per quantization cell (this is the whole dedup-stability argument —
    equal key => bit-identical cache row, whoever registers first)."""
    v = _sweep()
    norm = np.isfinite(v) & (np.abs(v) >= 2.0 ** -126) & (np.abs(v) < 3.3e38)
    s = snap_fp_jets_np(v)
    q_raw = np.asarray(jax.jit(_quantize)(jnp.asarray(v)))
    q_snap = np.asarray(jax.jit(_quantize)(jnp.asarray(s)))
    # key round-trip: quantize(snap(v)) == quantize(v)
    assert (q_raw[norm] == q_snap[norm]).all()
    # idempotence: snap(snap(v)) == snap(v) bitwise
    assert (_bits(snap_fp_jets_np(s))[norm] == _bits(s)[norm]).all()
    # cell-canonical: every cell maps to exactly one snapped bit pattern
    cells = {}
    sb = _bits(s)
    for q, b in zip(q_raw[norm].tolist(), sb[norm].tolist()):
        assert cells.setdefault(q, b) == b, (q, cells[q], b)


def test_jet_mul_swap_symmetry():
    """jet_mul(a, b) must match jet_mul(b, a) on the fingerprint path:
    commutative candidates are oriented by uid order, which follows
    emission order.  In NumPy (no FMA) the mirror grouping alone is
    exact at every order.  Compiled, XLA:CPU FMA-contracts one product
    per group (even through min/max and optimization_barrier — measured
    round 4), so the production contract is the one tested here: with
    GRID-SNAPPED operands (12-bit significands — which is what every
    fingerprint mul sees, its operands being snapped cache rows) every
    cross product is exact in f32 and the result is bit-identical under
    the swap regardless of contraction."""
    rng = np.random.default_rng(1)
    a = rng.standard_normal((257, 5, 15))
    b = rng.standard_normal((257, 5, 15))
    assert (jet_mul(a, b, 4, np) == jet_mul(b, a, 4, np)).all()

    raw = lambda: (rng.standard_normal((4096, 5, 3))
                   * 10.0 ** rng.integers(-8, 8, (4096, 5, 3))
                   ).astype(np.float32)
    a1 = jnp.asarray(snap_fp_jets_np(raw()))
    b1 = jnp.asarray(snap_fp_jets_np(raw()))
    f = jax.jit(lambda x, y: jet_mul(x, y, 1, jnp, swap_safe=True))
    assert (np.asarray(f(a1, b1)) == np.asarray(f(b1, a1))).all()
    # the wired call site: apply_surface_op("mul") at order 1 is swap_safe
    from pde_engine_tpu.ops.jetops import apply_surface_op
    g = jax.jit(lambda x, y: apply_surface_op("mul", x, y, 1, jnp))
    assert (np.asarray(g(a1, b1)) == np.asarray(g(b1, a1))).all()
    # swap_safe adds NO rounding error vs the plain form
    h = jax.jit(lambda x, y: jet_mul(x, y, 1, jnp))
    assert (np.asarray(f(a1, b1)) == np.asarray(h(a1, b1))).all()


def _run_laplace(reverse_batches: bool):
    p = load_problem("laplace")
    cfg = SearchConfig(max_depth=4, use_pallas=False, use_segmented=False)
    eng = DiscoveryEngine(p, cfg)
    if reverse_batches:
        orig = eng.enumerator.vector_batches_at_depth

        def reversed_gen(depth, batch_size, max_parent_uid=None):
            # reverse candidates within every dispatch batch: safe (all
            # parents live at depths < d on this path) but flips which
            # equivalent candidate wins first-occurrence registration
            for op_name, a_u, b_u in orig(depth, batch_size,
                                          max_parent_uid=max_parent_uid):
                yield (op_name, a_u[::-1].copy(),
                       None if b_u is None else b_u[::-1].copy())

        eng.enumerator.vector_batches_at_depth = reversed_gen
    eng.run(4)
    ks, _ = eng.fp_to_uid.items_arrays()
    # fingerprint keys are semantic (bit 63 clear); struct-tagged keys
    # hash parent UIDs, which legitimately relabel under reordering
    fp_keys = set(ks[(ks & np.uint64(STRUCT_TAG)) == 0].tolist())
    n_struct = int(((ks & np.uint64(STRUCT_TAG)) != 0).sum())
    stats = {st.depth: (st.candidates, st.unique) for st in eng.stats}
    # compare valid rows by dedup key (Row.signature), not spelling: the
    # registered representative's SPELLING legitimately changes when an
    # equivalent candidate wins first-occurrence under the other order
    valid = sorted(r.signature for r in eng.valid_rows)
    knowns = sorted(r.paper_solution_name for r in eng.valid_rows
                    if r.paper_solution_name)
    return stats, fp_keys, n_struct, valid, knowns


def test_emission_order_invariance_e2e():
    """Depth-4 laplace under normal vs reversed emission: unique KEY SETS
    must be identical — not counts-within-1% (VERDICT round 3 weak #1)."""
    stats_a, keys_a, nstruct_a, valid_a, knowns_a = _run_laplace(False)
    stats_b, keys_b, nstruct_b, valid_b, knowns_b = _run_laplace(True)
    assert stats_a == stats_b
    assert keys_a == keys_b
    assert nstruct_a == nstruct_b
    assert valid_a == valid_b
    assert knowns_a == knowns_b
