"""Small-spin ODE derivation (reference problems/__init__.py:305-352)."""

import sympy as sp

from pde_engine_tpu.models.kerr_small_spin import derive_small_spin_odes


def test_small_spin_odes_structure():
    odes, ctx = derive_small_spin_odes(1)
    r, f1, f3 = ctx["r"], ctx["f1"], ctx["f3"]
    for key, fn in (("f1", f1), ("f3", f3)):
        eq = odes[key]
        assert isinstance(eq, sp.Eq)
        # each projected equation is a 2nd-order ODE involving its own mode
        assert eq.lhs.has(sp.Derivative(fn, (r, 2)))
        assert eq.rhs == 0
    # note: the plain-L2 projection of (1-x^2) d^2/dx^2 mixes P1/P3, so the
    # equations couple — same construction as the reference
    # (problems/__init__.py:327-338)


def test_small_spin_forcing_present():
    """The (x^3 - x) forcing survives projection (the system is
    inhomogeneous — a pure O(a^2) correction is being forced)."""
    odes, ctx = derive_small_spin_odes(1)
    f1, f3 = ctx["f1"], ctx["f3"]
    inhom = sp.simplify(
        odes["f3"].lhs.subs({f1: 0, f3: 0}).doit())
    assert inhom != 0
