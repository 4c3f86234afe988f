"""Small-spin (O(a²)) perturbation analysis of the Kerr surrogate PDE.

Where the reference ships a hard-coded two-mode correction system
(problems/__init__.py:305-352), this module *derives* it from scratch:

1. take the actual linear-surrogate operator
       lhs(Ψ) = ∂r[(G/(1-x²)) ∂r Ψ] + ∂x[(G/Δ) ∂x Ψ]
   (the same operator the on-device residual implements,
   models/residuals.py::kerr_residual);
2. expand Ψ = Ψ₀ + a² ψ₂ + O(a⁴) around the exact a→0 monopole
   Ψ₀ = 1 - x and series-expand lhs(Ψ) in the spin a — the O(a⁰) and
   O(a¹) terms vanish identically (checked in tests), leaving the O(a²)
   correction equation;
3. write ψ₂ = Σ_l f_l(r) P_l(x) over ANY set of odd Legendre modes and
   L²-project the correction equation onto each mode (normalized by
   ∫P_l² = 2/(2l+1)).

Clearing the denominators before projecting is *required*, not a style
choice: the raw O(a²) expansion carries a 1/(1−x²) pole whose numerator
(Σ f_l'' P_l) does not vanish at x = ±1, so ∫(raw)·P_l dx diverges —
multiplying through by (1−x²)·r⁴·(r−2M) yields a polynomial-in-x
equation with well-defined projections.  (Derived this way, the radial
part r(r−2M)f'' + 2M f' and the (1−x²)∂²ₓ angular part of the
reference's hard-coded operator drop out automatically, confirming its
form.)  The reference's fixed (P₁, P₃) system is the ``modes=(1, 3)``
instance.  This is host-side symbolic analysis (runs once per study, not
per candidate), so SymPy is the right tool.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple


def surrogate_lhs(psi, r, x, M, a):
    """The Kerr linear-surrogate operator in divergence form (identical
    semantics to the device residual, models/residuals.py:142-176)."""
    import sympy as sp
    S = r**2 + a**2 * x**2
    G = 1 - 2 * M * r / S
    Delta = r**2 - 2 * M * r + a**2
    return (sp.diff(G / (1 - x**2) * sp.diff(psi, r), r)
            + sp.diff(G / Delta * sp.diff(psi, x), x))


class SmallSpinExpansion:
    """O(a²) mode-projected correction system around the monopole."""

    def __init__(self, M_value=1, modes: Sequence[int] = (1, 3)):
        import sympy as sp
        if any(l % 2 == 0 for l in modes):
            raise ValueError("the O(a²) correction is odd in x; "
                             f"modes must be odd, got {modes}")
        self.modes = tuple(modes)
        self.r = sp.Symbol("r", real=True, positive=True)
        self.x = sp.Symbol("x", real=True)
        self.a = sp.Symbol("a", real=True)
        self.M = (sp.Integer(M_value) if isinstance(M_value, int)
                  else sp.nsimplify(M_value))
        self.monopole = 1 - self.x
        self.f = {l: sp.Function(f"f{l}")(self.r) for l in self.modes}
        self.psi2 = sum(self.f[l] * sp.legendre(l, self.x)
                        for l in self.modes)

    def spin_coefficient(self, k: int):
        """Coefficient of a^k in lhs(Ψ₀ + a² ψ₂), expanded to O(a²)."""
        import sympy as sp
        series = getattr(self, "_series", None)
        if series is None:
            psi = self.monopole + self.a**2 * self.psi2
            lhs = surrogate_lhs(psi, self.r, self.x, self.M, self.a)
            # series() on the whole operator re-derives slowly; a rational
            # function of a² only needs a 2nd-order Taylor poke
            series = sp.expand(
                sp.series(lhs, self.a, 0, 3).removeO())
            self._series = series
        return series.coeff(self.a, k)

    def correction_equation(self, cleared: bool = True):
        """The O(a²) equation: L[ψ₂] + forcing = 0 (unprojected).

        ``cleared=True`` multiplies through by (1−x²)·r⁴·(r−2M) — the
        minimal factor that removes the x = ±1 pole (without which the
        Legendre projections diverge, see module docstring) and the
        radial denominators.
        """
        import sympy as sp
        eq2 = self.spin_coefficient(2)
        if not cleared:
            return eq2
        w = (1 - self.x**2) * self.r**4 * (self.r - 2 * self.M)
        return sp.expand(sp.cancel(sp.together(eq2 * w)))

    def project(self) -> Dict[int, "object"]:
        """L²-project the correction equation onto each requested mode.

        Returns {l: sympy.Eq} — the coupled radial ODE system for the
        f_l(r).  Normalization: ⟨·, P_l⟩ · (2l+1)/2 so a pure P_l source
        projects to itself.
        """
        import sympy as sp
        eq2 = self.correction_equation()
        odes = {}
        for l in self.modes:
            proj = sp.integrate(eq2 * sp.legendre(l, self.x),
                                (self.x, -1, 1)) * sp.Rational(2 * l + 1, 2)
            odes[l] = sp.Eq(sp.simplify(sp.together(proj)), 0)
        return odes

    def context(self) -> Dict:
        return {"r": self.r, "x": self.x, "a": self.a, "M": self.M,
                "modes": self.modes, "f": self.f, "psi2": self.psi2,
                "monopole": self.monopole}


def derive_small_spin_odes(M_value=1) -> Tuple[Dict, Dict]:
    """Reference-shaped convenience wrapper (problems/__init__.py:305-352
    return contract): the two-mode instance with 'f1'/'f3' keys."""
    exp = SmallSpinExpansion(M_value, modes=(1, 3))
    odes = exp.project()
    ctx = exp.context()
    import sympy as sp
    context = {"r": ctx["r"], "x": ctx["x"], "M": ctx["M"],
               "P1": sp.legendre(1, ctx["x"]),
               "P3": sp.legendre(3, ctx["x"]),
               "f1": ctx["f"][1], "f3": ctx["f"][3],
               "U": ctx["psi2"]}
    return {"f1": odes[1], "f3": odes[3]}, context
