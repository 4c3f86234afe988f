"""Residual-operator goldens.

Mirrors the reference's executable self-test (force_free/validator.py:490-535):
the 7 known Compère solutions must satisfy the foliation constraint and 5
non-solutions must fail; Kerr/Laplace/Grad-Shafranov residuals are checked
against SymPy ground truth.
"""

import numpy as np
import pytest
import sympy as sp

from pde_engine_tpu.models import load_problem
from pde_engine_tpu.models.force_free import ForceFreeProblem
from pde_engine_tpu.ops.interpreter import eval_jets_np

# The reference's self-test prints (but does not assert) a "should fail"
# list containing rho, z, rho**3, exp(z) — those are in fact *exact*
# solutions of the determinant equation (reparameterizations of valid
# foliations; verified symbolically), and the reference validator itself
# accepts them.  We assert on expressions that genuinely violate the
# constraint instead.
KNOWN_FAIL = ["rho*z", "rho + z**2", "rho**2*z**2", "sqrt(rho) + z"]

# Valid reparameterizations that must also pass (same level sets as knowns).
KNOWN_REPARAM_VALID = ["rho", "z", "rho**3", "exp(z)", "rho**2 + z"]


def np_residual(problem, expr_str):
    t = problem.parse(expr_str)
    jets = eval_jets_np(t.rows, len(t), problem.consts.as_array(),
                        problem.screen_points, problem.residual_order)
    res, scale = problem.residual_fn(jets, problem.screen_points, np)
    return res, scale


@pytest.mark.parametrize("expr_str", list(load_problem("force_free").known_solutions))
def test_force_free_knowns_zero(expr_str):
    p = load_problem("force_free")
    res, scale = np_residual(p, expr_str)
    rel = np.abs(res) / (scale + 1e-300)
    assert np.isfinite(res).all(), expr_str
    assert rel.max() < 1e-9, (expr_str, rel.max())


@pytest.mark.parametrize("expr_str", KNOWN_FAIL)
def test_force_free_fails_nonzero(expr_str):
    p = load_problem("force_free")
    res, scale = np_residual(p, expr_str)
    rel = np.abs(res) / (scale + 1e-300)
    assert np.nanmax(rel) > 1e-6, (expr_str, rel)


@pytest.mark.parametrize("expr_str", KNOWN_REPARAM_VALID)
def test_force_free_reparam_valid(expr_str):
    p = load_problem("force_free")
    res, scale = np_residual(p, expr_str)
    rel = np.abs(res) / (scale + 1e-300)
    assert np.nanmax(rel) < 1e-9, (expr_str, rel)


# Under rigid rotation Omega = 1, only 5 of the 7 knowns still satisfy the
# constraint (verified symbolically with the reference's rotating A, B —
# validator.py:326-332); Dipolar and Bent genuinely fail.  The reference's
# claim that all 7 remain valid (validator.py:499-504) is printed output,
# not an assertion, and is mathematically wrong.
ROTATING_VALID = [
    "rho**2", "rho**2*z", "1 - z/sqrt(rho**2 + z**2)",
    "sqrt(rho**2 + z**2) - z",
    "sqrt(z**2 + (rho - 1)**2) - sqrt(z**2 + (rho + 1)**2)",
]
ROTATING_INVALID = ["rho**2/(rho**2 + z**2)**(3/2)", "rho**2*exp(-2*z)"]


@pytest.mark.parametrize("expr_str", ROTATING_VALID)
def test_force_free_knowns_zero_rotating(expr_str):
    p = ForceFreeProblem(omega=1.0)
    res, scale = np_residual(p, expr_str)
    rel = np.abs(res) / (scale + 1e-300)
    assert rel.max() < 1e-9, (expr_str, rel.max())


@pytest.mark.parametrize("expr_str", ROTATING_INVALID)
def test_force_free_rotating_invalid(expr_str):
    p = ForceFreeProblem(omega=1.0)
    res, scale = np_residual(p, expr_str)
    rel = np.abs(res) / (scale + 1e-300)
    assert np.nanmax(rel) > 1e-6, (expr_str, rel.max())


def test_foliation_residual_matches_sympy():
    """Jet-computed det equals the symbolic det evaluated numerically for a
    non-solution (nontrivial value)."""
    p = load_problem("force_free")
    rho, z = p.sympy_vars()
    for expr in [rho**3, rho * z, sp.exp(z) + rho**2, rho / z + z**2]:
        t = p.compile_sympy(expr)
        jets = eval_jets_np(t.rows, len(t), p.consts.as_array(),
                            p.screen_points, 4)
        res, _ = p.residual_fn(jets, p.screen_points, np)
        det = p.sympy_residual(expr)
        for i, (rv, zv) in enumerate(p.screen_points):
            want = float(det.subs({rho: sp.Float(rv, 30),
                                   z: sp.Float(zv, 30)}))
            np.testing.assert_allclose(res[i], want, rtol=1e-6,
                                       err_msg=str(expr))


def test_kerr_residual_matches_sympy():
    p = load_problem("kerr")
    r, x = p.sympy_vars()
    for expr in [r, x**2, r * x, 1 - x, (1 - x) * r]:
        t = p.compile_sympy(expr)
        jets = eval_jets_np(t.rows, len(t), p.consts.as_array(),
                            p.screen_points, 2)
        res, _ = p.residual_fn(jets, p.screen_points, np)
        lhs = p.sympy_residual(expr, symbolic_params=False)
        for i, (rv, xv) in enumerate(p.screen_points):
            want = float(lhs.subs({r: sp.Rational(rv).limit_denominator(10**9),
                                   x: sp.Rational(xv).limit_denominator(10**9)}))
            np.testing.assert_allclose(res[i], want, rtol=1e-6, atol=1e-12,
                                       err_msg=str(expr))


def test_kerr_monopole_anchor_semantics():
    """1 - x is NOT an exact solution at a = 1/10 (G_x != 0) — it is the
    a -> 0 anchor.  The validator funnel must reflect that, matching the
    reference's fast point check + monopole-extension machinery."""
    p = load_problem("kerr")
    res, scale = np_residual(p, "1 - x")
    rel = np.abs(res) / (scale + 1e-300)
    assert rel.max() > 1e-6  # not exactly zero at finite spin
    x = p.sympy_vars()[1]
    assert p.is_monopole_extension(1 - x)
    assert not p.is_monopole_extension(1 + x)


def test_underflow_is_not_a_solution():
    """exp(-(1-x)*e^(r^2+a^2x^2)) underflows residual AND scale to exact 0
    at every collocation point — it must NOT screen as valid (the float-
    underflow analog of the reference's NaN false positives)."""
    from pde_engine_tpu.parallel.search import SCALE_FLOOR
    p = load_problem("kerr")
    res, scale = np_residual(p, "exp_neg(exp_mul(1 - x, a**2*x**2 + r**2))")
    # every point is blind (scale below the underflow floor)
    assert (scale <= SCALE_FLOOR).any()
    # and the screen rule must therefore reject it
    ok = (np.isfinite(res).all() and np.isfinite(scale).all()
          and (scale > SCALE_FLOOR).all())
    assert not ok


@pytest.mark.parametrize("slug,exprs", [
    ("laplace", list(load_problem("laplace").known_solutions)),
    ("grad_shafranov", list(load_problem("grad_shafranov").known_solutions)),
])
def test_new_problem_knowns_zero(slug, exprs):
    p = load_problem(slug)
    for expr_str in exprs:
        res, scale = np_residual(p, expr_str)
        rel = np.abs(res) / (scale + 1e-300)
        assert rel.max() < 1e-9, (expr_str, rel.max())


def test_kerr_heavy_funnel_verdicts():
    """The round-3 rewrite of the Kerr heavy checks (finiteness probe,
    data-driven flux limits, single a->0 anchor limit) must keep the
    reference funnel's verdicts (kerr validator.py:93-161 semantics)."""
    import sympy as sp

    p = load_problem("kerr")
    r, x = p.sympy_vars()
    prm = p.sympy_params()
    M, a = prm["M"], prm["a"]

    # finiteness probe: healthy forms pass, probe-point blow-ups fail
    assert p._finite_classical(1 - x)
    assert p._finite_classical(r * x + a**2)
    assert not p._finite_classical(1 / (r - sp.Rational(7, 3)))
    assert not p._finite_classical(sp.zoo * r)

    # regularity: monopole-like forms are regular on axis + horizon; a
    # 1/(1 - x**2) form has divergent axis flux limits
    assert p._check_regularity(1 - x)
    assert not p._check_regularity(r / (1 - x**2))

    # anchor: a-dependent expressions reduce to the monopole as a -> 0
    assert p.is_monopole_extension(1 - x + a**2 * r * x)
    assert not p.is_monopole_extension(1 - x + r)
    # normalization-tolerant mode accepts a constant (M-dependent) offset
    p.allow_normalization = True
    try:
        assert p.is_monopole_extension(1 - x + 2 * M)
    finally:
        p.allow_normalization = False

    # full funnel: constants excluded; anchored solutions pass
    ok, why = p.heavy_checks(sp.Rational(1, 3))
    assert not ok and "constant" in why.lower()
    ok, _ = p.heavy_checks(1 - x)
    assert ok
