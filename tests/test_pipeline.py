"""End-to-end discovery pipeline tests (CPU, small depths).

The minimum slice (SURVEY.md §7 stage 4): depth-2 force_free must behave
like the reference — rho**2 valid and tagged as the Vertical field paper
solution, garbage rejected for non-finiteness (not accepted as zero),
constants excluded.
"""

import numpy as np
import pytest

from pde_engine_tpu.models import load_problem
from pde_engine_tpu.pipeline import DiscoveryEngine
from pde_engine_tpu.utils.config import SearchConfig


@pytest.fixture(scope="module")
def ff_depth2():
    p = load_problem("force_free")
    eng = DiscoveryEngine(p, SearchConfig(max_depth=2))
    eng.run(2)
    return eng


def test_depth2_finds_vertical_field(ff_depth2):
    names = {r.paper_solution_name for r in ff_depth2.valid_rows
             if r.paper_solution_name}
    assert "Vertical field" in names


def test_depth2_counts_sane(ff_depth2):
    # Reference depth-2: ~128 candidates with the 5-op fast path; ours adds
    # the special binary ops (the full all_binary_ops surface) -> more.
    s = {st.depth: st for st in ff_depth2.stats}
    assert s[1].candidates == 5          # the 5 primitives
    assert 100 <= s[2].candidates <= 250
    assert s[2].unique <= s[2].candidates
    assert 0 < s[2].valid < s[2].unique


def test_dedup_catches_equivalent_forms(ff_depth2):
    """sqrt(rho**2 + z**2) vs pow-composed equivalents etc. — unique count
    strictly below candidate count proves value-level dedup works (the
    reference's normalizer failed to do this for op-wrapped strings)."""
    s = {st.depth: st for st in ff_depth2.stats}
    assert s[2].unique < s[2].candidates


def test_constants_and_garbage_rejected(ff_depth2):
    for r in ff_depth2.rows:
        if "constant" in r.validation_reason.lower():
            assert not r.is_valid
        if "non-finite" in r.validation_reason.lower():
            assert not r.is_valid
    # the '1' primitive must not be valid
    ones = [r for r in ff_depth2.rows if r.expression == "1"]
    assert all(not r.is_valid for r in ones)


def test_rows_have_reference_schema_fields(ff_depth2):
    r = ff_depth2.rows[0]
    for field in ("expression", "normalized", "signature", "depth",
                  "validation_status", "is_valid", "validation_reason",
                  "validator_method"):
        assert hasattr(r, field)


def test_no_false_positive_from_degenerate_denominators(ff_depth2):
    """The reference's mega-run accepted 4,443 `1/(1-1)` rows as valid
    (SURVEY.md §4).  None of our valid rows may be built on a non-finite
    evaluation."""
    from pde_engine_tpu.ops.interpreter import eval_jets_np
    p = ff_depth2.problem
    for r in ff_depth2.valid_rows:
        t = p.parse(r.expression)
        jets = eval_jets_np(t.rows, len(t), p.consts.as_array(),
                            p.screen_points, p.residual_order)
        assert np.isfinite(jets[..., 0]).all(), r.expression


def test_expression_strings_roundtrip(ff_depth2):
    """Every stored expression string must re-parse to the same function
    (value-equivalence at probe points).  The reference's sub spelling
    "(a - b)" was NOT round-trippable — e.g. "(X - X**2 + Y**2)" re-parses
    as a different expression — which poisons resume/audit reparse."""
    from pde_engine_tpu.ops.interpreter import eval_jets_np
    p = ff_depth2.problem
    pts = p.fingerprint_points
    uniques = ff_depth2.enumerator.all_uniques()
    for u in uniques:
        t2 = p.parse(u.expr_str)
        a = eval_jets_np(u.tape.rows, len(u.tape), p.consts.as_array(),
                         pts, 1)
        b = eval_jets_np(t2.rows, len(t2), p.consts.as_array(), pts, 1)
        mask = np.isfinite(a) & np.isfinite(b)
        assert (np.isfinite(a) == np.isfinite(b)).all(), u.expr_str
        np.testing.assert_allclose(a[mask], b[mask], rtol=1e-9, atol=1e-12,
                                   err_msg=u.expr_str)


def test_laplace_depth2_e2e():
    p = load_problem("laplace")
    eng = DiscoveryEngine(p, SearchConfig(max_depth=2))
    eng.run(2)
    names = {r.paper_solution_name for r in eng.valid_rows
             if r.paper_solution_name}
    # X*Y and X are depth <= 2 (X*Y = mul of two primitives)
    assert "Saddle (Im z^2)" in names
    assert "Uniform X" in names


def test_symbolic_confirm_mode():
    """Sequential-mode semantics: exact zeros proven inline."""
    p = load_problem("laplace")
    eng = DiscoveryEngine(p, SearchConfig(max_depth=1,
                                          confirm_symbolic=True))
    eng.run(1)
    for r in eng.valid_rows:
        assert "exact zero" in r.validation_reason, r


def test_mesh_sharded_run_matches_unsharded():
    """Candidate-axis sharding over the 8 virtual CPU devices must not
    change any verdict (SPMD correctness)."""
    from pde_engine_tpu.parallel.mesh import candidate_mesh
    p1 = load_problem("grad_shafranov")
    e1 = DiscoveryEngine(p1, SearchConfig(max_depth=2))
    e1.run(2)
    p2 = load_problem("grad_shafranov")
    e2 = DiscoveryEngine(p2, SearchConfig(max_depth=2),
                         mesh=candidate_mesh(8))
    e2.run(2)
    v1 = sorted(r.expression for r in e1.valid_rows)
    v2 = sorted(r.expression for r in e2.valid_rows)
    assert v1 == v2
    assert [s.unique for s in e1.stats] == [s.unique for s in e2.stats]
    # the flagship incremental path must have gone through the explicitly
    # shard_mapped op kernel (psum'd survivor count is its marker)
    assert getattr(e2, "mesh_survivors", None) is not None
    assert int(e2.mesh_survivors) >= 0


def test_shard_cache_run_exceeds_per_chip_window():
    """--shard-cache e2e (VERDICT round 3 missing #1): an 8-device run
    whose uniques EXCEED the per-chip max_cache_rows must compose every
    unique deeper — NO parent-window truncation — and match an
    untruncated single-device run exactly.  laplace depth 3 has ~1.5k
    uniques; per-chip budget 256 would truncate a replicated-cache run,
    but 8 uid-range shards give an effective window of 2048."""
    from pde_engine_tpu.parallel.mesh import CANDIDATE_AXIS, candidate_mesh
    from jax.sharding import PartitionSpec

    p1 = load_problem("laplace")
    ref = DiscoveryEngine(p1, SearchConfig(max_depth=3))
    ref.run(3)
    assert ref.cache.n == ref.enumerator.count_uniques()  # untruncated

    p2 = load_problem("laplace")
    cfg = SearchConfig(max_depth=3, max_cache_rows=256, shard_cache=True)
    eng = DiscoveryEngine(p2, cfg, mesh=candidate_mesh(8))
    eng.run(3)

    # per-chip budget exceeded, mesh budget not: full parent window
    n_uniq = eng.enumerator.count_uniques()
    assert n_uniq > 256, "test premise: uniques must exceed one chip"
    assert eng.cache_row_limit == 256 * 8
    assert eng.cache.n == n_uniq, "parent window must NOT truncate"

    # identical search content (keys are emission/kernel-layout invariant
    # since the fingerprint grid snap — tests/test_fp_snap.py)
    assert [s.unique for s in ref.stats] == [s.unique for s in eng.stats]
    assert [s.candidates for s in ref.stats] == \
        [s.candidates for s in eng.stats]
    assert sorted(r.signature for r in ref.valid_rows) == \
        sorted(r.signature for r in eng.valid_rows)

    # the cache arrays really are row-sharded across the mesh (the HBM
    # scaling claim), and survived appends/growth with that layout
    spec = eng.cache.screen.sharding.spec
    assert spec == PartitionSpec(CANDIDATE_AXIS) or (
        len(spec) >= 1 and spec[0] == CANDIDATE_AXIS), spec
    assert eng.cache.capacity % 8 == 0
    assert getattr(eng, "mesh_survivors", None) is not None


def test_auto_cache_rows_scale_with_jet_row_bytes():
    """max_cache_rows=None spends a fixed HBM budget row-size-aware: the
    order-4 force_free family (~552 B/row) keeps the 20M-row window and
    order-2 families get ~2x of it; an explicit value is respected."""
    ff = DiscoveryEngine(load_problem("force_free"), SearchConfig(max_depth=2))
    gs = DiscoveryEngine(load_problem("grad_shafranov"),
                         SearchConfig(max_depth=2))
    assert ff.cache_row_limit == 20_000_000
    assert gs.cache_row_limit > 2 * ff.cache_row_limit
    explicit = DiscoveryEngine(
        load_problem("laplace"),
        SearchConfig(max_depth=2, max_cache_rows=123))
    assert explicit.cache_row_limit == 123


def test_cache_grow_clamped_to_row_limit():
    """JetCache._grow must never allocate past the engine's HBM budget:
    when a window fills, doubling from the current capacity would
    overshoot the stated ~11 GiB budget by up to 2x (ADVICE r4) — the
    capacity must clamp to row_limit rounded up to the grow quantum,
    while still satisfying pow-2-padded appends that slightly exceed
    the logical limit."""
    from pde_engine_tpu.parallel.incremental import JetCache
    c = JetCache(n_screen=2, t_screen=3, n_fp=2, initial_capacity=8,
                 grow_quantum=8)
    c.row_limit = 20
    import jax.numpy as jnp
    for _ in range(5):
        c.append(jnp.ones((8, c.sdim)), jnp.ones((8, c.fdim)),
                 real_rows=min(8, max(0, c.row_limit - c.n)))
        if c.n >= c.row_limit:
            break
    assert c.capacity <= 24  # ceil(20/8)*8, NOT 8->16->32 doubling
    # an oversized physical append (padding) must still fit
    c2 = JetCache(n_screen=2, t_screen=3, n_fp=2, initial_capacity=8,
                  grow_quantum=8)
    c2.row_limit = 4
    c2.append(jnp.ones((16, c2.sdim)), jnp.ones((16, c2.fdim)),
              real_rows=4)
    assert c2.capacity >= 16


def test_max_cache_rows_bounds_parent_window():
    """With a tiny HBM budget the engine must keep running: uniques
    beyond the cap are screened/stored but never composed deeper, so the
    bounded run's uniques are a subset of the full run's."""
    p1 = load_problem("laplace")
    full = DiscoveryEngine(p1, SearchConfig(max_depth=3))
    full.run(3)
    p2 = load_problem("laplace")
    cfg = SearchConfig(max_depth=3, max_cache_rows=40)
    trunc = DiscoveryEngine(p2, cfg)
    trunc.run(3)
    assert trunc.cache.n <= 40
    # display strings may differ (a window-dropped early spelling lets a
    # later spelling become its fingerprint class's first occurrence), so
    # compare value-level identities: finite fingerprint signatures of
    # the bounded run are a subset of the full run's
    def finite_sigs(eng):
        return {r.signature for r in eng.rows
                if '"fp_finite": true' in (r.validator_evidence or "")}
    assert finite_sigs(trunc) <= finite_sigs(full)
    # depth-2 candidates (both parents are primitives, always in-window)
    # are identical
    d2_full = {r.expression for r in full.rows if r.depth == 2}
    d2_trunc = {r.expression for r in trunc.rows if r.depth == 2}
    assert d2_trunc == d2_full and len(d2_trunc) > 0


def test_segmented_superbatch_matches_per_op():
    """The segmented superbatch path (one mixed-op dispatch per
    batch_size candidates, interpret-mode Pallas on CPU) must produce the
    same uniques and verdicts as the per-op XLA path."""
    p1 = load_problem("laplace")
    ref = DiscoveryEngine(p1, SearchConfig(max_depth=3))
    ref.run(3)
    p2 = load_problem("laplace")
    seg = DiscoveryEngine(p2, SearchConfig(max_depth=3,
                                           use_segmented=True,
                                           batch_size=4096))
    seg.run(3)
    assert [s.unique for s in ref.stats] == [s.unique for s in seg.stats]
    assert [s.valid for s in ref.stats] == [s.valid for s in seg.stats]
    v1 = sorted(r.expression for r in ref.valid_rows)
    v2 = sorted(r.expression for r in seg.valid_rows)
    assert v1 == v2
