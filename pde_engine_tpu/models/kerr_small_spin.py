"""Small-spin (O(a²)) analysis utilities for the Kerr magnetosphere problem.

Parity target: reference problems/__init__.py:305-352
(``derive_small_spin_odes``) — derives the O(a²) correction system projected
onto the first two odd Legendre modes.  This is host-side symbolic analysis
(it runs once per study, not per candidate), so SymPy is the right tool.

The expansion: write Ψ = (1 - x) + a² ψ₂ + O(a⁴) and project the linear
surrogate operator onto P₁ = x and P₃ = (5x³ - 3x)/2 with
ψ₂ = f₁(r) P₁ + f₃(r) P₃.
"""

from __future__ import annotations

from typing import Dict, Tuple


def derive_small_spin_odes(M_value=1) -> Tuple[Dict, Dict]:
    """Derive the O(a²) correction ODEs for f1 and f3.

    Returns (odes, context): odes maps 'f1'/'f3' to SymPy ``Eq``s; context
    holds the symbols/functions used (mirrors the reference's return
    contract, problems/__init__.py:340-352).
    """
    import sympy as sp

    r = sp.Symbol("r", real=True, positive=True)
    x = sp.Symbol("x", real=True)
    M = sp.Integer(M_value) if isinstance(M_value, int) \
        else sp.nsimplify(M_value)

    # Legendre polynomials P1, P3
    P1 = x
    P3 = sp.Rational(1, 2) * (5 * x**3 - 3 * x)

    f1 = sp.Function("f1")(r)
    f3 = sp.Function("f3")(r)

    U = f1 * P1 + f3 * P3

    # The left-hand operator of the small-spin correction system and the
    # O(a^2) forcing produced by expanding the full surrogate PDE around
    # the a -> 0 monopole.
    L_U = ((1 - x**2) * sp.diff(U, x, 2)
           - r * (r - 2 * M) * sp.diff(U, r, 2)
           - 2 * M * sp.diff(U, r))
    rhs = 4 * M * r**2 * (r - 2 * M) * (x**3 - x)

    # L2 projection onto P1 and P3 over x in [-1, 1]
    eq1 = sp.integrate((L_U - rhs) * P1, (x, -1, 1))
    eq3 = sp.integrate((L_U - rhs) * P3, (x, -1, 1))

    odes = {
        "f1": sp.Eq(sp.simplify(sp.together(eq1)), 0),
        "f3": sp.Eq(sp.simplify(sp.together(eq3)), 0),
    }
    context = {
        "r": r, "x": x, "M": M,
        "P1": P1, "P3": P3,
        "f1": f1, "f3": f3,
        "U": U,
    }
    return odes, context
