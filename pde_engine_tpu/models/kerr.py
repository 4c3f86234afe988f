"""Kerr magnetosphere linear-surrogate problem.

Parity target: reference problems/__init__.py:259-302 (spec) and
problems/kerr_magnetosphere/validator.py (staged validation funnel).
"""

from __future__ import annotations

from fractions import Fraction
from functools import partial
from typing import Tuple

import numpy as np

from ..ops.tape import ConstTable
from .base import Problem, register
from .residuals import kerr_residual

M_VALUE = Fraction(1)
A_VALUE = Fraction(1, 10)

# Screen points: the reference's 3 rational points
# (kerr validator.py:167-171) plus extras; all with r > r_+ ≈ 1.995 and
# |x| < 1 so Δ > 0 and 1 - x² > 0.
SCREEN_POINTS = np.array([
    [2.5, 0.6],
    [7.0 / 3.0, 1.0 / 3.0],
    [5.0, -0.4],
    [3.1, 0.23],
    [2.8, -0.67],
    [4.2, 0.81],
], dtype=np.float64)

FINGERPRINT_POINTS = np.array([
    [2.7, 0.37],
    [3.6, -0.51],
    [4.4, 0.13],
    [2.35, 0.77],
    [3.05, -0.29],
    [4.9, 0.59],
], dtype=np.float64)


class KerrProblem(Problem):

    def __init__(self,
                 M_value: Fraction = M_VALUE,
                 a_value: Fraction = A_VALUE,
                 require_monopole_extension: bool = True,
                 monopole_target: str = "1-x",
                 allow_normalization: bool = False,
                 exclude_constants: bool = True):
        import sympy as sp

        self.require_monopole_extension = require_monopole_extension
        self.monopole_target = monopole_target
        self.allow_normalization = allow_normalization
        self.exclude_constants = exclude_constants

        consts = ConstTable()
        r = sp.Symbol("r", real=True, positive=True)
        x = sp.Symbol("x", real=True)
        M = sp.Symbol("M", real=True, positive=True)
        a = sp.Symbol("a", real=True)
        Delta = r**2 - 2 * M * r + a**2
        G = 1 - (2 * M * r) / (r**2 + a**2 * x**2)

        super().__init__(
            name="Kerr Magnetosphere (linear surrogate)",
            slug="kerr_magnetosphere",
            var_names=("r", "x"),
            consts=consts,
            primitives=[],
            primitive_strs=[],
            unary_ops=["neg", "inv", "sqrt", "square", "pow_3_2",
                       "pow_neg_3_2", "exp", "exp_neg"],
            binary_ops=["add", "sub", "mul", "div", "geom_sum"],
            special_ops=["sqrt_shift_neg", "sqrt_shift_pos",
                         "exp_mul", "log_mul"],
            residual_order=2,
            residual_fn=partial(kerr_residual,
                                M=float(M_value), a=float(a_value)),
            known_solutions={"1 - x": "Monopole (a -> 0 limit)"},
            screen_points=SCREEN_POINTS,
            fingerprint_points=FINGERPRINT_POINTS,
            output_root="problems/kerr_magnetosphere/outputs",
            param_values={"M": Fraction(M_value), "a": Fraction(a_value)},
            anchor_only_knowns={
                "Monopole (a -> 0 limit)":
                    "exact at the a→0 anchor, not at a=1/10 — validated "
                    "at the anchor parameterization"},
        )
        # primitives (reference problems/__init__.py:271-281):
        # r, x, 1, 1/3, (1-x), a^2, r^2 + a^2 x^2, Delta, G
        prim_exprs = [r, x, sp.Integer(1), sp.Rational(1, 3), 1 - x,
                      a**2, r**2 + a**2 * x**2, Delta, G]
        self.primitives = [self.compile_sympy(e) for e in prim_exprs]
        self.primitive_strs = [str(e) for e in prim_exprs]

    def validate_known(self, expr_str: str) -> Tuple[bool, float, str]:
        """The monopole 1 - x solves the surrogate only in the a→0 limit
        (it is NOT a solution at a=1/10; the reference's known-solution
        contract silently glossed over this, problems/__init__.py:285-287).
        Validate it at its anchor and say so."""
        import numpy as np
        from ..ops.interpreter import eval_jets_np
        name = self.known_solutions.get(expr_str, "")
        if name not in self.anchor_only_knowns:
            return super().validate_known(expr_str)
        t = self.parse(expr_str)
        jets = eval_jets_np(t.rows, len(t),
                            self.consts.as_array(np.float64),
                            self.screen_points, self.residual_order)
        res, scale = kerr_residual(jets, self.screen_points, np,
                                   M=float(self.param_values["M"]), a=0.0)
        with np.errstate(invalid="ignore"):
            rel = np.abs(res) / (scale + 1e-300)
        ok = bool(np.isfinite(res).all() and rel.max() < self.confirm_rtol)
        return ok, float(np.nanmax(rel)), "at anchor a→0"

    # -- SymPy residual (exact confirm / --verify-pde) -------------------
    def sympy_residual(self, u, symbolic_params: bool = True):
        """lhs = ∂r[(G/(1-x²)) u_r] + ∂x[(G/Δ) u_x] with symbolic M, a
        (matching the reference's strict_sympy_check, validator.py:288-294)."""
        import sympy as sp
        r, x = self.sympy_vars()
        p = self.sympy_params()
        M, a = p["M"], p["a"]
        if not symbolic_params:
            M = sp.Rational(self.param_values["M"])
            a = sp.Rational(self.param_values["a"])
        Delta = r**2 - 2 * M * r + a**2
        G = 1 - (2 * M * r) / (r**2 + a**2 * x**2)
        u = u.subs({s: (r if str(s) == "r" else x)
                    for s in u.free_symbols if str(s) in ("r", "x")})
        ur = sp.diff(u, r)
        ux = sp.diff(u, x)
        return sp.diff(G / (1 - x**2) * ur, r) + sp.diff(G / Delta * ux, x)

    def heavy_checks(self, u) -> Tuple[bool, str]:
        """Reference kerr validator heavy funnel (validator.py:325-342):
        non-constant, finite at safe points, axis/horizon regularity,
        small-spin monopole anchor."""
        import sympy as sp
        r, x = self.sympy_vars()
        p = self.sympy_params()
        M, a = p["M"], p["a"]
        u = u.subs({s: (r if str(s) == "r" else x)
                    for s in u.free_symbols if str(s) in ("r", "x")})

        if self.exclude_constants:
            try:
                if not (u.has(r) or u.has(x)):
                    return False, "Trivial constant solution excluded"
            except Exception:
                pass

        if not self._finite_classical(u):
            return False, "non-finite"

        if not self._check_regularity(u):
            return False, "Symbolic zero but fails regularity checks"

        if self.require_monopole_extension and \
                not self.is_monopole_extension(u):
            return False, "fails a->0 monopole anchor"

        return True, "ok"

    # Finiteness probe assignments (M, a, r, x) — the reference's two
    # exact rational test points (kerr validator.py:100-110), kept as
    # parity constants; the evaluation strategy below is this repo's own.
    _FINITE_PROBES = np.array([
        [1.0, 3 / 5, 7 / 3, 1 / 3],
        [1.0, 4 / 5, 3.0, -2 / 5],
    ], dtype=np.float64)

    def _finite_classical(self, expr) -> bool:
        """Finite at the probe assignments.

        Engine idiom: one vectorized float64 evaluation over all probe
        rows through a lambdified callable (complex-valued so sqrt/log of
        negatives stay finite numbers rather than erroring — the exact-
        arithmetic analog treats I-valued results as finite too).  A
        division blow-up lands as inf/nan and rejects; no per-point
        simplify ladder."""
        import sympy as sp
        if expr.has(sp.zoo, sp.oo, -sp.oo, sp.nan):
            return False
        r, x = self.sympy_vars()
        p = self.sympy_params()
        try:
            f = sp.lambdify((r, x, p["M"], p["a"]), expr, modules="numpy")
            pts = self._FINITE_PROBES
            with np.errstate(all="ignore"):
                vals = np.asarray(
                    f(pts[:, 2] + 0j, pts[:, 3] + 0j,
                      pts[:, 0] + 0j, pts[:, 1] + 0j))
            return bool(np.isfinite(vals.real).all()
                        and np.isfinite(vals.imag).all())
        except Exception:
            return False

    def _flux_limit_checks(self, u):
        """The three regularity limits as (flux density, variable,
        approach) triples.

        The operator's flux coefficients G/(1-x²) and G/Δ are singular BY
        CONSTRUCTION on the axis (x → ±1) and horizon (r → r_+): the raw
        fluxes diverge for every u with u_r ≠ 0 / u_x ≠ 0, which made the
        reference's raw-flux checks vacuous (its `in (oo, -oo, zoo)` test
        also missed `oo*sign(...)` divergences — kerr validator.py:93-125,
        a latent hole SURVEY §4 says not to reproduce).  The meaningful
        regularity statement weights each flux by its degenerate factor:
        G·u_r must stay finite on the axis and G·u_x on the horizon (at
        the problem's exact rational M, a)."""
        import sympy as sp
        r, x = self.sympy_vars()
        p = self.sympy_params()
        M, a = p["M"], p["a"]
        G = 1 - (2 * M * r) / (r**2 + a**2 * x**2)
        axis_density = G * sp.diff(u, r)
        Ms = sp.Rational(self.param_values["M"])
        as_ = sp.Rational(self.param_values["a"])
        r_plus = Ms + sp.sqrt(Ms**2 - as_**2)
        horizon_density = (G.subs({M: Ms, a: as_})) * sp.diff(u, x)
        return ((axis_density, x, sp.Integer(1)),
                (axis_density, x, sp.Integer(-1)),
                (horizon_density, r, r_plus))

    def _check_regularity(self, u) -> bool:
        """Every weighted flux density limit must exist and be finite
        (see _flux_limit_checks); divergences of any spelling — including
        `oo*sign(...)` products — reject."""
        import sympy as sp
        for flux, var, to in self._flux_limit_checks(u):
            try:
                if sp.limit(flux, var, to).has(sp.oo, -sp.oo, sp.zoo,
                                               sp.nan):
                    return False
            except Exception:
                return False
        return True

    def is_monopole_extension(self, Psi) -> bool:
        """The small-spin limit of Ψ must be the monopole: compute the
        a → 0 form ONCE, then compare it against the configured target(s)
        — 1 - x, x, or either; with allow_normalization, an (M-dependent)
        constant offset is accepted.  Verdict parity with the reference's
        per-target limit ladder (kerr validator.py:127-161)."""
        import sympy as sp
        _, x = self.sympy_vars()
        p = self.sympy_params()
        M, a = p["M"], p["a"]
        try:
            L0 = sp.limit(Psi, a, 0)
        except Exception:
            try:
                L0 = Psi.subs(a, 0)
            except Exception:
                return False
        targets = {"1-x": [1 - x], "x": [x],
                   "either": [1 - x, x]}.get(self.monopole_target, [])
        for tgt in targets:
            try:
                d = sp.simplify(L0 - tgt)
                if d == 0:
                    return True
                if (self.allow_normalization
                        and not d.has(sp.oo, sp.zoo, sp.nan)
                        and (d.free_symbols <= {M} or d.is_number)):
                    return True
            except Exception:
                continue
        return False

    def _math_definition(self) -> str:
        return ("d/dr[(G/(1-x^2)) du/dr] + d/dx[(G/Delta) du/dx] = 0, "
                "Delta = r^2 - 2Mr + a^2, G = 1 - 2Mr/(r^2 + a^2 x^2)")


@register(["kerr", "kerr_magnetosphere", "kerr-magnetosphere"])
def _make_kerr() -> KerrProblem:
    return KerrProblem()
