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

    def _finite_classical(self, expr) -> bool:
        import sympy as sp
        r, x = self.sympy_vars()
        p = self.sympy_params()
        M, a = p["M"], p["a"]
        try:
            e = sp.simplify(expr)
        except Exception:
            e = expr
        try:
            if e.has(sp.zoo, sp.oo, -sp.oo, sp.nan):
                return False
        except Exception:
            return False
        tests = [
            {M: sp.Integer(1), a: sp.Rational(3, 5),
             r: sp.Rational(7, 3), x: sp.Rational(1, 3)},
            {M: sp.Integer(1), a: sp.Rational(4, 5),
             r: sp.Integer(3), x: -sp.Rational(2, 5)},
        ]
        for s in tests:
            try:
                val = sp.simplify(e.subs(s))
                if val.has(sp.zoo, sp.oo, -sp.oo, sp.nan):
                    return False
            except Exception:
                return False
        return True

    def _check_regularity(self, u) -> bool:
        import sympy as sp
        r, x = self.sympy_vars()
        p = self.sympy_params()
        M, a = p["M"], p["a"]
        Delta = r**2 - 2 * M * r + a**2
        G = 1 - (2 * M * r) / (r**2 + a**2 * x**2)
        try:
            flux_r = G / (1 - x**2) * sp.diff(u, r)
            lim1 = sp.limit(flux_r, x, 1)
            lim2 = sp.limit(flux_r, x, -1)
            if any(v in (sp.oo, -sp.oo, sp.zoo) for v in (lim1, lim2)):
                return False
        except Exception:
            return False
        try:
            Ms = sp.Rational(self.param_values["M"])
            as_ = sp.Rational(self.param_values["a"])
            r_plus = Ms + sp.sqrt(Ms**2 - as_**2)
            lim_h = sp.limit((G / Delta).subs({M: Ms, a: as_})
                             * sp.diff(u, x), r, r_plus)
            if lim_h in (sp.oo, -sp.oo, sp.zoo):
                return False
        except Exception:
            return False
        return True

    def is_monopole_extension(self, Psi) -> bool:
        """Ψ → 1 - x (or x, per target) as a → 0
        (reference validator.py:127-161)."""
        import sympy as sp
        r, x = self.sympy_vars()
        p = self.sympy_params()
        M, a = p["M"], p["a"]
        targets = []
        if self.monopole_target in ("1-x", "either"):
            targets.append(1 - x)
        if self.monopole_target in ("x", "either"):
            targets.append(x)
        for tgt in targets:
            try:
                diff = sp.simplify(Psi - tgt)
            except Exception:
                diff = Psi - tgt
            try:
                L = sp.simplify(sp.limit(diff, a, 0))
            except Exception:
                try:
                    L = sp.simplify(diff.subs(a, 0))
                except Exception:
                    continue
            try:
                if L == 0:
                    return True
                if self.allow_normalization and \
                        not L.has(sp.oo, sp.zoo, sp.nan):
                    if L.free_symbols.issubset({M}) or L.is_number:
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
