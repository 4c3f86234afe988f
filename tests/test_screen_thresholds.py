"""False-reject audit of the screen's health heuristics (VERDICT r1 weak #3).

``informative_points`` (parallel/search.py) gates every verdict with three
thresholds (SCALE_FLOOR, JET_TINY, the exactly-0-or-sane rule).  These tests
measure — not assume — their behavior on a large family of expressions that
are VALID BY CONSTRUCTION: the foliation constraint is invariant under any
monotone reparameterization u -> f(u) (the same property the reference's
validator has, force_free/validator.py:323-347 — f'(u) factors out of the
determinant columns), so every f(known solution) must screen as valid.

Also pins the inverse: perturbed non-solutions stay rejected, and the
degenerate-constant guard (f64 gradient exactly 0) rejects constants the f32
screen's is_const can miss.
"""

import numpy as np
import pytest
import sympy as sp

from pde_engine_tpu.models import load_problem
from pde_engine_tpu.ops.interpreter import eval_jets_np_many
from pde_engine_tpu.parallel.search import (informative_points,
                                            verdicts_from_jets_np)


@pytest.fixture(scope="module")
def problem():
    return load_problem("force_free")


def _screen(problem, exprs):
    """Run the float64 oracle screen over sympy expressions; returns the
    ScreenResult."""
    tapes = [problem.compile_sympy(e) for e in exprs]
    L = max(len(t) for t in tapes)
    arr = np.stack([t.padded(L) for t in tapes])
    lengths = np.array([len(t) for t in tapes], np.int64)
    consts = problem.consts.as_array(np.float64)
    jets = eval_jets_np_many(arr, lengths, consts, problem.screen_points,
                             problem.residual_order)
    fj = eval_jets_np_many(arr, lengths, consts,
                           problem.fingerprint_points, 1)
    return verdicts_from_jets_np(jets, fj, problem.screen_points,
                                 problem.residual_fn,
                                 float(problem.screen_rtol))


def _reparam_family(problem):
    """f(u) for each known solution u, for a zoo of monotone f — all valid
    by the reparameterization invariance of the constraint."""
    rho, z = problem.sympy_vars()
    knowns = [sp.sympify(s, locals={"rho": rho, "z": z})
              for s in problem.known_solutions]
    out = []
    for u in knowns:
        out += [
            u + 3,
            7 * u,
            u / 5 - sp.Rational(2, 3),
            u**3,
            sp.exp(u / 4),          # /4 keeps exp from overflowing
            sp.exp(-u / 4),
            u + u**2 / 10,
            sp.sqrt(u + 10),        # +10 keeps the argument positive
            1 / (u + 10),
            sp.log(u + 10),
        ]
    return out


def test_reparam_family_false_reject_rate_is_zero(problem):
    family = _reparam_family(problem)
    sr = _screen(problem, family)
    rejected = [str(e) for e, ok in zip(family, sr.screen_ok.tolist())
                if not ok]
    # Every member is a true solution: the screen's false-reject rate on
    # this 70-expression family must be exactly 0.
    assert not rejected, (
        f"screen false-rejected {len(rejected)}/{len(family)} valid "
        f"reparameterizations: {rejected[:5]}")


def test_tiny_coefficient_scale_does_not_reject(problem):
    """Expressions with legitimately tiny jet coefficients at some points
    (deep exponential decay) must not be misclassified by JET_TINY as long
    as the constraint genuinely holds: u = exp(-k*z)*rho**2 is the Bent
    solution family for any k."""
    rho, z = problem.sympy_vars()
    family = [rho**2 * sp.exp(-k * z) for k in (1, 2, 5, 10)]
    sr = _screen(problem, family)
    assert sr.screen_ok.all(), (
        f"rejected decay rates: "
        f"{[k for k, ok in zip((1, 2, 5, 10), sr.screen_ok) if not ok]}")


def test_non_solutions_still_rejected(problem):
    """Genuinely nonzero-residual expressions (near-miss perturbations of
    true solutions) must fail the screen."""
    rho, z = problem.sympy_vars()
    bad = [rho * z,
           rho**2 * z + rho,            # perturbed X-point
           rho**2 + sp.Rational(1, 100) * z**3,
           sp.sqrt(rho**2 + z**2) + rho]
    sr = _screen(problem, bad)
    accepted = [str(e) for e, ok in zip(bad, sr.screen_ok.tolist()) if ok]
    assert not accepted, f"screen accepted non-solutions: {accepted}"


def test_structural_zeros_accepted_like_reference(problem):
    """u depending on one coordinate only (rho, z, rho**3, exp(z)) makes
    every Lie-derivative column vanish identically, so det == 0 EXACTLY.
    The reference validator proves these zero symbolically and returns
    Valid (verified against /root/reference problems/force_free/validator.py
    — its test_validator docstring calling them non-solutions does not
    match its own behavior), so the screen must accept them too."""
    rho, z = problem.sympy_vars()
    sr = _screen(problem, [rho, z, rho**3, sp.exp(z), rho**2 + z])
    assert sr.screen_ok.all()
    assert (sr.rel_max < 1e-12).all()   # exact structural zeros


def test_steep_decay_rejected_by_f64_funnel(problem):
    """exp(-40*(1-rho)*e^(z^2)) has a TRUE relative residual of ~1.7e-3 at
    (4/5, 6/7) (verified at 60 digits) — under the loose 3e-3 screen gate
    at some points, so it may pass stage 0, but the float64 recheck at
    confirm_rtol must reject it before it can be stored Valid."""
    from pde_engine_tpu.enumerator import Candidate
    from pde_engine_tpu.pipeline import DiscoveryEngine
    from pde_engine_tpu.utils.config import SearchConfig
    rho, z = problem.sympy_vars()
    u = sp.exp(-(1 - rho) * sp.exp(z**2) * 40)
    eng = DiscoveryEngine(problem, SearchConfig(use_pallas=False,
                                                use_native=False))
    cand = Candidate(depth=4, expr_str=str(u), top_op="exp", has_var=True,
                     tape=problem.compile_sympy(u), consts=problem.consts)
    ok, rel = eng._recheck_f64(cand)
    assert not ok
    # the true nonzero residual is visible in f64 (well above confirm_rtol;
    # the engine's scale is a magnitude *bound*, so rel understates the
    # pointwise truth — 4.6e-7 here vs 1.7e-3 at (4/5, 6/7) exactly)
    assert rel > 1e-8


def test_informative_points_units():
    """Direct unit semantics of the three-threshold rule (f32 floors; the
    f64 oracle's floors sit ~155 decades lower)."""
    f32 = np.float32
    jets = np.zeros((1, 3, 6), f32)
    jets[0, :, 0] = 1.0          # healthy value coefficient
    res = np.zeros((1, 3), f32)
    scale = np.zeros((1, 3), f32)
    # structural zero: res == 0, scale == 0, healthy jets -> informative
    assert informative_points(res, scale, jets, np).all()
    # underflow garbage: tiny-but-nonzero coefficients -> not informative
    jets2 = jets.copy()
    jets2[0, :, 1] = 1e-30
    assert not informative_points(res, scale, jets2, np).any()
    # healthy scale above the floor -> informative regardless
    scale3 = np.full((1, 3), 1e-3, f32)
    assert informative_points(res, scale3, jets2, np).all()
    # float64 oracle: 1e-30 coefficients are perfectly healthy there
    assert informative_points(res.astype(np.float64),
                              scale.astype(np.float64),
                              jets2.astype(np.float64), np).all()
    # ... but true f64-underflow garbage is still blind
    jets3 = jets.astype(np.float64).copy()
    jets3[0, :, 1] = 1e-170
    assert not informative_points(res.astype(np.float64),
                                  scale.astype(np.float64),
                                  jets3, np).any()


def test_constant_disguised_as_expression_rejected_at_f64(problem):
    """(z*(rho/z))/rho ≡ 1: the f32 screen's is_const can miss it (rounding
    keeps f32 jets inexact), but the engine's f64 gray recheck must reject
    it via the exact-zero-gradient guard rather than store it Valid."""
    from pde_engine_tpu.pipeline import DiscoveryEngine
    from pde_engine_tpu.utils.config import SearchConfig
    eng = DiscoveryEngine(problem, SearchConfig(use_pallas=False,
                                                use_native=False))
    tape = problem.compile_sympy(sp.Integer(1))
    from pde_engine_tpu.enumerator import Candidate
    cand = Candidate(depth=3, expr_str="((z * (rho/z)) / (rho))",
                     top_op="div", has_var=True, tape=tape,
                     consts=problem.consts)
    ok, rel = eng._recheck_f64(cand)
    assert not ok

    # composed-tape variant: z * ((rho/z)/rho) evaluated op-by-op keeps
    # ~1e-16 cancellation noise in its f64 gradient — the RELATIVE
    # zero-gradient guard must still classify it constant (this exact
    # candidate was stored Valid by a resumed run before the guard)
    from pde_engine_tpu.ops import optable as ot
    from pde_engine_tpu.ops.tape import apply_binary
    t_ratio = apply_binary(ot.ALL_SURFACE_OPS["div"],
                           problem.parse("rho/z"), problem.parse("rho"),
                           problem.consts)
    t_full = apply_binary(ot.ALL_SURFACE_OPS["mul"],
                          problem.parse("z"), t_ratio, problem.consts)
    cand2 = Candidate(depth=3, expr_str="(z * ((rho/z) / (rho)))",
                      top_op="mul", has_var=True, tape=t_full,
                      consts=problem.consts)
    ok2, _ = eng._recheck_f64(cand2)
    assert not ok2
