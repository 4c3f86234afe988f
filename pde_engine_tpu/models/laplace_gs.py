"""New problem families beyond the reference: Laplace and Grad–Shafranov.

The BASELINE ladder (BASELINE.md targets) calls for extending the engine to
new problems; these two exercise the plugin layer with different residual
operators while reusing the same op library and search machinery.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..ops.tape import ConstTable
from .base import Problem, register
from .residuals import grad_shafranov_residual, laplace_residual

_L_SCREEN = np.array([
    [0.80, 0.857], [0.45, 0.31], [1.25, 0.55], [0.60, 0.95],
    [1.10, 0.17], [0.35, 1.15], [0.95, 1.33], [1.35, 0.71],
], dtype=np.float64)
_L_FP = np.array([
    [0.67, 0.43], [1.05, 0.89], [0.52, 1.21],
    [0.91, 0.23], [1.31, 0.57], [0.73, 1.07],
], dtype=np.float64)


class LaplaceProblem(Problem):
    """2-D Laplace equation u_xx + u_yy = 0 on coordinates (X, Y)."""

    def __init__(self):
        import sympy as sp
        consts = ConstTable()
        super().__init__(
            name="Laplace (2D harmonic functions)",
            slug="laplace",
            var_names=("X", "Y"),
            consts=consts,
            primitives=[],
            primitive_strs=[],
            unary_ops=["neg", "inv", "sqrt", "square", "exp", "exp_neg"],
            binary_ops=["add", "sub", "mul", "div"],
            special_ops=["log_mul"],
            residual_order=2,
            residual_fn=laplace_residual,
            known_solutions={
                "X**2 - Y**2": "Quadrupole (Re z^2)",
                "X*Y": "Saddle (Im z^2)",
                "X": "Uniform X",
                "log(X**2 + Y**2)": "Point charge (2D log potential)",
            },
            screen_points=_L_SCREEN,
            fingerprint_points=_L_FP,
            output_root="problems/laplace/outputs",
        )
        X, Y = self.sympy_vars()
        prim_exprs = [X, Y, X**2 + Y**2, sp.Integer(1)]
        self.primitives = [self.compile_sympy(e) for e in prim_exprs]
        self.primitive_strs = [str(e) for e in prim_exprs]

    def sympy_residual(self, u):
        import sympy as sp
        X, Y = self.sympy_vars()
        u = u.subs({s: (X if str(s) == "X" else Y)
                    for s in u.free_symbols if str(s) in ("X", "Y")})
        return sp.diff(u, X, 2) + sp.diff(u, Y, 2)

    def heavy_checks(self, u) -> Tuple[bool, str]:
        import sympy as sp
        X, Y = self.sympy_vars()
        try:
            if sp.diff(u, X) == 0 and sp.diff(u, Y) == 0:
                return False, "Zero gradient (constant expression)"
        except Exception:
            pass
        return True, "ok"

    def _math_definition(self) -> str:
        return "u_XX + u_YY = 0"


class GradShafranovProblem(Problem):
    """Homogeneous Grad–Shafranov: Δ* u = u_rr - u_r/rho + u_zz = 0."""

    def __init__(self):
        import sympy as sp
        consts = ConstTable()
        super().__init__(
            name="Grad-Shafranov (homogeneous)",
            slug="grad_shafranov",
            var_names=("rho", "z"),
            consts=consts,
            primitives=[],
            primitive_strs=[],
            unary_ops=["neg", "inv", "sqrt", "square", "pow_3_2",
                       "pow_neg_3_2", "exp", "exp_neg"],
            binary_ops=["add", "sub", "mul", "div", "geom_sum"],
            special_ops=[],
            residual_order=2,
            residual_fn=grad_shafranov_residual,
            known_solutions={
                "rho**2": "Vertical flux",
                "rho**2*z": "X-point flux",
                # depth 7 in the size-weighted vocabulary: binary depth
                # adds (enumerator.vector_batches_at_depth), and the
                # cheapest split is rho**4 (depth 3) - 4*rho**2*z**2
                # (depth 4) — reachable by a depth-7 run, or verify
                # directly via problem.validator.validate(...)
                "rho**2*(rho**2 - 4*z**2)": "Quadratic Solovev-type",
            },
            screen_points=_L_SCREEN,
            fingerprint_points=_L_FP,
            output_root="problems/grad_shafranov/outputs",
        )
        rho, z = self.sympy_vars()
        prim_exprs = [rho, z, rho**2 + z**2, sp.Integer(1)]
        self.primitives = [self.compile_sympy(e) for e in prim_exprs]
        self.primitive_strs = [str(e) for e in prim_exprs]

    def sympy_residual(self, u):
        import sympy as sp
        rho, z = self.sympy_vars()
        u = u.subs({s: (rho if str(s) == "rho" else z)
                    for s in u.free_symbols if str(s) in ("rho", "z")})
        return (sp.diff(u, rho, 2) - sp.diff(u, rho) / rho
                + sp.diff(u, z, 2))

    # ------------------------------------------------------------------
    # Axis regularity (VERDICT round 3 weak #7): a physical flux surface
    # is even in rho near the axis — u finite and u_rho/rho bounded as
    # rho -> 0 (u ~ u_axis + c(z) rho^2 + ...).  1/rho- and log(rho)-type
    # fluxes satisfy the homogeneous residual but are axis-singular; the
    # reference enforces the analogous per-problem regularity in its
    # force-free validator (force_free/validator.py:288-293).
    # ------------------------------------------------------------------

    # numeric probes for the array-level family tagger (utils/families):
    # two rho-decades on the axis approach at fixed z
    family_probe_points = np.array([[1e-3, 0.4], [1e-4, 0.4]],
                                   dtype=np.float64)
    family_extra_name = "axis_singular"
    family_notes = {
        "axis_singular": ("satisfies Δ*u = 0 but u or u_rho/rho is "
                          "unbounded on the axis — unphysical flux"),
    }

    @staticmethod
    def family_extra_tag(vals, fj, aj):
        """Rows whose u_rho/rho GROWS between rho=1e-3 and rho=1e-4 (i.e.
        leading power < 2: 1/rho^k, log rho, odd-in-rho fluxes), or whose
        axis-probe jets are non-finite.  u ~ rho^2 gives a constant
        ratio; u ~ rho^4 a shrinking one; exact zeros never flag."""
        with np.errstate(all="ignore"):
            nonfin = ~np.isfinite(aj).all(axis=(1, 2))
            r0 = np.abs(aj[:, 0, 1]) / 1e-3
            r1 = np.abs(aj[:, 1, 1]) / 1e-4
            growing = (r1 > 5.0 * (r0 + 1e-300)) & (r1 > 1e-6)
        return nonfin | growing

    def heavy_checks(self, u) -> Tuple[bool, str]:
        import sympy as sp
        rho, z = self.sympy_vars()
        try:
            if sp.diff(u, rho) == 0 and sp.diff(u, z) == 0:
                return False, "Zero gradient (constant expression)"
        except Exception:
            pass
        # symbolic axis regularity: u and u_rho/rho must stay finite as
        # rho -> 0 on a generic z slice (z=2/5 keeps sqrt/log branches
        # real on the safe domain); numeric family tagging applies the
        # same criterion at array speed for mega-run post-hoc audits
        try:
            uz = u.subs(z, sp.Rational(2, 5))
            lim_u = sp.limit(uz, rho, 0, "+")
            lim_g = sp.limit(sp.diff(uz, rho) / rho, rho, 0, "+")
            if any(v.has(sp.oo, sp.zoo, sp.nan) or v.is_finite is False
                   for v in (lim_u, lim_g) if v is not None):
                return False, ("Axis-singular flux (u or u_rho/rho "
                               "unbounded as rho -> 0)")
        except Exception:
            pass  # SymPy limit failure: leave to the numeric tagger
        return True, "ok"

    def _math_definition(self) -> str:
        return "u_rr - u_r/rho + u_zz = 0"


@register(["laplace"])
def _make_laplace() -> LaplaceProblem:
    return LaplaceProblem()


@register(["grad_shafranov", "grad-shafranov", "gs"])
def _make_gs() -> GradShafranovProblem:
    return GradShafranovProblem()
