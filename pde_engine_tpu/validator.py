"""Single-expression validator — the reference's validator interface.

The reference's ProblemSpec carries a validator object with
``validate(u, check_regularity=True, fast_point_only=False, ...)
-> (bool, reason)`` plus ``describe()`` / ``last_evidence()``
(problems/__init__.py:52, force_free/validator.py:260-437,
kerr_magnetosphere/validator.py:210-381).  The discovery engine itself
validates in device batches (pipeline.py); this adapter provides the same
one-expression-at-a-time API on top of the float64 oracle + SymPy stages,
for users who call the validator directly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from .models.base import Problem
from .ops.interpreter import eval_jets_np
from .parallel.search import informative_points


class ExpressionValidator:

    def __init__(self, problem: Problem):
        self.problem = problem
        self._last_evidence: Dict[str, Any] = {}
        self._cache: Dict[str, Tuple[bool, str]] = {}

    # ------------------------------------------------------------------
    def validate(self, u, check_regularity: bool = True,
                 fast_point_only: bool = False, *,
                 lean_first: bool = True,   # accepted for parity; unused
                 defer_heavy_checks: Optional[bool] = None,
                 enforce_anchor: Optional[bool] = None) -> Tuple[bool, str]:
        """Validate one expression (SymPy expr or string).

        Mirrors the reference funnel: point screen → exact symbolic zero →
        (optional) heavy regularity/finiteness/anchor checks.
        ``fast_point_only=True`` accepts on the numeric screen alone (the
        reference's discovery fast path, validator.py:374-393).
        """
        import sympy as sp
        p = self.problem
        if isinstance(u, str):
            key = u
            u = sp.sympify(u, locals={p.var_names[0]: p.sympy_vars()[0],
                                      p.var_names[1]: p.sympy_vars()[1],
                                      **p.sympy_params()})
        else:
            key = str(u)
        if key in self._cache:
            return self._cache[key]
        result = self._validate_impl(u, key, check_regularity,
                                     fast_point_only, defer_heavy_checks,
                                     enforce_anchor)
        self._cache[key] = result
        return result

    def _validate_impl(self, u, key, check_regularity, fast_point_only,
                       defer_heavy_checks, enforce_anchor):
        import sympy as sp
        p = self.problem

        # degenerate atoms first (1/(1-1) sympifies to zoo)
        try:
            if u.has(sp.zoo, sp.oo, -sp.oo, sp.nan):
                return False, "Non-finite on safe domain (rejected)"
        except Exception:
            pass
        # constant exclusion (kerr validator.py:230-240 / force_free
        # zero-gradient :309-312)
        v0, v1 = p.sympy_vars()
        try:
            if not (u.has(v0) or u.has(v1)):
                return False, "Trivial constant solution excluded"
        except Exception:
            pass

        # numeric screen at the collocation points (float64 oracle)
        try:
            tape = p.compile_sympy(u)
        except ValueError as e:
            return False, f"Validation error: {e}"
        jets = eval_jets_np(tape.rows, len(tape),
                            p.consts.as_array(np.float64),
                            p.screen_points, p.residual_order)
        res, scale = p.residual_fn(jets, p.screen_points, np)
        with np.errstate(invalid="ignore"):
            rel = np.abs(res) / (scale + 1e-300)
        finite = np.isfinite(res).all() and np.isfinite(scale).all()
        if not finite:
            return False, "Non-finite on safe domain (rejected)"
        if (np.abs(jets[..., 1:3]) == 0.0).all():
            return False, "Zero gradient (constant expression)"
        if not informative_points(res, scale, jets, np).all():
            return False, "Indeterminate (residual scale underflows)"
        relmax = float(rel.max())
        self._last_evidence = {
            "relative_residual_max": relmax,
            "points": p.screen_points.tolist(),
            "params": {k: str(v) for k, v in p.param_values.items()},
        }
        if relmax >= p.confirm_rtol:
            return False, (f"PDE residual != 0 "
                           f"(point checks ≈ {relmax:.2e})")

        if fast_point_only:
            return True, "Valid (point check ≈ 0)"

        # exact symbolic zero (reference strict check)
        exact = p.exact_zero_residual(u)
        self._last_evidence["symbolic_zero"] = bool(exact)
        if not exact:
            return False, ("Invalid (symbolic residual != 0; numeric zero "
                           f"was relres ≈ {relmax:.2e})")

        defer = (defer_heavy_checks if defer_heavy_checks is not None
                 else not check_regularity)
        if defer:
            return True, "Valid (exact zero; heavy checks deferred)"

        if enforce_anchor is not None and hasattr(
                p, "require_monopole_extension"):
            old = p.require_monopole_extension
            p.require_monopole_extension = bool(enforce_anchor)
            try:
                ok, reason = p.heavy_checks(u)
            finally:
                p.require_monopole_extension = old
        else:
            ok, reason = p.heavy_checks(u)
        if not ok:
            return False, reason
        return True, "Valid solution (symbolically zero)"

    # ------------------------------------------------------------------
    def validate_known_solutions(self, fast_point_only: bool = False
                                 ) -> Dict[str, bool]:
        """Force-free parity helper (validator.py:439-461).

        ``fast_point_only=True`` skips the symbolic full-plane proof — for
        sqrt-heavy solutions (Hyperbolic) the symbolic determinant is huge
        and SymPy can take minutes, a wart the reference shares (it guarded
        with string-length limits, validator.py:408)."""
        results = {}
        for expr_str, name in self.problem.known_solutions.items():
            ok, reason = self.validate(expr_str, check_regularity=False,
                                       fast_point_only=fast_point_only)
            results[name] = ok
        return results

    def describe(self) -> Dict[str, str]:
        return self.problem.describe()

    def last_evidence(self) -> Dict[str, Any]:
        return self._last_evidence

    def get_cache_stats(self) -> Dict[str, int]:
        valid = sum(1 for v, _ in self._cache.values() if v)
        return {"total": len(self._cache), "valid": valid,
                "invalid": len(self._cache) - valid}

    def clear_cache(self) -> None:
        self._cache.clear()
