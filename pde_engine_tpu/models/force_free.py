"""Force-free foliation discovery problem (Compère et al., arXiv:1606.06727).

Parity target: reference problems/__init__.py:66-108 (spec) and
problems/force_free/validator.py (constraint + regularity + known set).
"""

from __future__ import annotations

from fractions import Fraction
from functools import partial
from typing import Tuple

import numpy as np

from ..ops.tape import ConstTable
from .base import Problem, register
from .residuals import foliation_residual

# Screen points: the reference's exact-point check uses (4/5, 6/7)
# (validator.py:296-297); we add further points in a safe domain
# (rho > 0, z > 0, rho != z, moderate magnitudes so 4th-order jets of
# exp/pow chains stay in f32 range).
SCREEN_POINTS = np.array([
    [0.80, 6.0 / 7.0],
    [0.45, 0.31],
    [1.25, 0.55],
    [0.60, 0.95],
    [1.10, 0.17],
    [0.35, 1.15],
    [0.95, 1.33],
    [1.35, 0.71],
], dtype=np.float64)

FINGERPRINT_POINTS = np.array([
    [0.67, 0.43],
    [1.05, 0.89],
    [0.52, 1.21],
    [0.91, 0.23],
    [1.31, 0.57],
    [0.73, 1.07],
], dtype=np.float64)

KNOWN_SOLUTIONS = {
    # reference problems/__init__.py:85-93
    "rho**2": "Vertical field",
    "rho**2*z": "X-point",
    "1 - z/sqrt(rho**2 + z**2)": "Radial",
    "rho**2/(rho**2 + z**2)**(3/2)": "Dipolar",
    "sqrt(rho**2 + z**2) - z": "Parabolic",
    "sqrt(z**2 + (rho - 1)**2) - sqrt(z**2 + (rho + 1)**2)": "Hyperbolic",
    "rho**2*exp(-2*z)": "Bent",
}


class ForceFreeProblem(Problem):

    def __init__(self, omega: float = 0.0):
        import sympy as sp

        self.omega = float(omega)
        consts = ConstTable()
        rho = sp.Symbol("rho", real=True, positive=True)
        z = sp.Symbol("z", real=True)

        super().__init__(
            name="Force-Free Foliations",
            slug="force_free",
            var_names=("rho", "z"),
            consts=consts,
            primitives=[],
            primitive_strs=[],
            unary_ops=["neg", "inv", "sqrt", "square", "pow_3_2",
                       "pow_neg_3_2", "exp", "exp_neg"],
            binary_ops=["add", "sub", "mul", "div", "geom_sum"],
            special_ops=["sqrt_shift_neg", "sqrt_shift_pos",
                         "exp_mul", "log_mul"],
            residual_order=4,
            residual_fn=partial(foliation_residual, omega=float(omega)),
            known_solutions=dict(KNOWN_SOLUTIONS),
            screen_points=SCREEN_POINTS,
            fingerprint_points=FINGERPRINT_POINTS,
            output_root="problems/force_free/outputs",
        )
        # primitives: rho, z, rho^2+z^2, rho/z, 1
        # (reference problems/__init__.py:73-79)
        prim_exprs = [rho, z, rho**2 + z**2, rho / z, sp.Integer(1)]
        self.primitives = [self.compile_sympy(e) for e in prim_exprs]
        self.primitive_strs = [str(e) for e in prim_exprs]
        # mega-run family breakdown (utils/families): any z-independent
        # u(rho) foliates trivially — the Lie-bracket terms vanish
        # identically (u_z ≡ 0 ⇒ det ≡ 0), so the dominant share of a
        # deep valid set is this ONE physical statement
        self.family_notes = {
            "no_z": "degenerate: det ≡ 0 identically for any u(rho)",
            "no_rho": "degenerate: u(z)-only foliation",
        }

    # -- SymPy residual (exact confirm / --verify-pde) -------------------
    def sympy_residual(self, u):
        import sympy as sp
        rho, z = self.sympy_vars()
        u = u.subs({s: (rho if str(s) == "rho" else z)
                    for s in u.free_symbols if str(s) in ("rho", "z")})
        u_r = sp.diff(u, rho)
        u_z = sp.diff(u, z)
        u_rr = sp.diff(u_r, rho)
        u_zz = sp.diff(u_z, z)
        if self.omega:
            w2 = sp.nsimplify(self.omega) ** 2
            A = (1 - rho**2 * w2) * (u_rr + u_zz) \
                - (1 + rho**2 * w2) / rho * u_r
            B = (1 - rho**2 * w2) * (u_r**2 + u_z**2)
        else:
            A = u_rr + u_zz - u_r / rho
            B = u_r**2 + u_z**2

        def lie_T(f):
            return u_z * sp.diff(f, rho) - u_r * sp.diff(f, z)

        LT_A, LT_B = lie_T(A), lie_T(B)
        L2T_A, L2T_B = lie_T(LT_A), lie_T(LT_B)
        return LT_A * L2T_B - LT_B * L2T_A

    def heavy_checks(self, u) -> Tuple[bool, str]:
        """Axis regularity (u finite at rho = 0) and non-constant gradient —
        reference validator.py:288-312."""
        import sympy as sp
        rho, z = self.sympy_vars()
        u = u.subs({s: (rho if str(s) == "rho" else z)
                    for s in u.free_symbols if str(s) in ("rho", "z")})
        try:
            axis_value = u.subs(rho, 0)
            if axis_value.has(sp.oo, sp.zoo, sp.nan):
                return False, "Singular on axis"
        except Exception:
            return False, "Singular on axis"
        try:
            if sp.diff(u, rho) == 0 and sp.diff(u, z) == 0:
                return False, "Zero gradient (constant expression)"
        except Exception:
            pass
        return True, "ok"

    def _math_definition(self) -> str:
        return ("det[[L_T A, L_T B], [L_T^2 A, L_T^2 B]] = 0, "
                "A = u_rr + u_zz - u_r/rho, B = u_r^2 + u_z^2, "
                "T = u_z d_rho - u_r d_z"
                + (f", Omega = {self.omega}" if self.omega else ""))


@register(["force_free", "forcefree", "foliation", "foliations"])
def _make_force_free() -> ForceFreeProblem:
    return ForceFreeProblem()
