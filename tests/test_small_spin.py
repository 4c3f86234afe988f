"""Small-spin O(a²) derivation (reference analog: problems/__init__.py:305-352,
re-derived from the surrogate operator instead of hard-coded)."""

import numpy as np
import pytest
import sympy as sp

from pde_engine_tpu.models.kerr_small_spin import (SmallSpinExpansion,
                                                   derive_small_spin_odes)


@pytest.fixture(scope="module")
def exp13():
    return SmallSpinExpansion(1, modes=(1, 3))


@pytest.fixture(scope="module")
def odes13(exp13):
    return exp13.project()


def test_monopole_is_exact_at_zero_spin(exp13):
    """O(a⁰) term of lhs(Ψ₀ + a²ψ₂) vanishes — 1 - x solves the a→0
    equation exactly, so the expansion is around a true solution."""
    assert sp.simplify(exp13.spin_coefficient(0)) == 0


def test_expansion_is_even_in_spin(exp13):
    assert sp.simplify(exp13.spin_coefficient(1)) == 0


def test_small_spin_odes_structure(exp13, odes13):
    r = exp13.r
    for l in (1, 3):
        eq = odes13[l]
        assert isinstance(eq, sp.Eq)
        # each projected equation is a 2nd-order ODE involving its own mode
        assert eq.lhs.has(sp.Derivative(exp13.f[l], (r, 2)))
        assert eq.rhs == 0
    # the plain-L2 projection of (1-x²)d²/dx² mixes P1/P3, so the system
    # couples — same mathematical structure as the reference's


def test_small_spin_forcing_present(exp13, odes13):
    """The O(a²) forcing survives projection (the correction is forced —
    the system is inhomogeneous).  After clearing denominators the
    forcing ∝ M(x³−x) = (2M/5)(P₃ − P₁): BOTH mode equations carry a
    source — matching the structure of the reference's hard-coded rhs
    4Mr²(r−2M)(x³−x)."""
    zero_f = {exp13.f[1]: 0, exp13.f[3]: 0}
    for l in (1, 3):
        inhom = sp.simplify(odes13[l].lhs.subs(zero_f).doit())
        assert inhom != 0, l


def test_projection_matches_numeric_quadrature(exp13, odes13):
    """Independent check: substitute concrete mode profiles, compare the
    symbolic projected ODE against direct numeric quadrature of the
    unprojected (cleared — polynomial in x, so Gauss-Legendre is exact)
    O(a²) equation at a sample radius."""
    eq2 = exp13.correction_equation()
    r, x = exp13.r, exp13.x
    subs_f = {exp13.f[1]: r**2, exp13.f[3]: r}

    r0 = sp.Rational(3)
    for l in (1, 3):
        sym_val = float(
            odes13[l].lhs.subs(subs_f).doit().subs(r, r0).evalf())
        integrand = sp.lambdify(
            x, eq2.subs(subs_f).doit().subs(r, r0), "numpy")
        Pl = sp.lambdify(x, sp.legendre(l, x), "numpy")
        xs, ws = np.polynomial.legendre.leggauss(60)
        quad = float(np.sum(ws * integrand(xs) * Pl(xs)) * (2 * l + 1) / 2)
        assert abs(sym_val - quad) < 1e-8 * max(1.0, abs(quad)), (
            l, sym_val, quad)


def test_reference_shaped_wrapper():
    """derive_small_spin_odes keeps the reference's return contract
    (problems/__init__.py:340-352): 'f1'/'f3' Eq dict + context symbols."""
    odes, ctx = derive_small_spin_odes(1)
    assert set(odes) == {"f1", "f3"}
    for k in ("r", "x", "M", "P1", "P3", "f1", "f3", "U"):
        assert k in ctx
    assert all(isinstance(e, sp.Eq) for e in odes.values())


def test_general_mode_set():
    """The derivation generalizes beyond the reference's fixed (P1, P3)."""
    exp = SmallSpinExpansion(1, modes=(5,))
    odes = exp.project()
    assert set(odes) == {5}
    assert isinstance(odes[5], sp.Eq)


def test_even_modes_rejected():
    with pytest.raises(ValueError):
        SmallSpinExpansion(1, modes=(2,))
