"""Problem plugin layer (TPU-native analog of the reference's ProblemSpec).

The reference's ``ProblemSpec`` dataclass (problems/__init__.py:34-63)
carries symbols, primitives, op sets, a validator and known solutions.
Here a :class:`Problem` additionally owns everything the device pipeline
needs: primitive *tapes*, the shared constant table, jet order, collocation
grids, and the jet-space residual — plus the host-side SymPy machinery for
exact confirmation and heavy (regularity/finiteness/anchor) checks.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from fractions import Fraction
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..ops import optable as ot
from ..ops.tape import ConstTable, Tape, from_sympy, to_sympy


@dataclass
class Problem:
    name: str
    slug: str
    var_names: Tuple[str, str]

    consts: ConstTable
    primitives: List[Tape]
    primitive_strs: List[str]

    unary_ops: List[str]
    binary_ops: List[str]
    special_ops: List[str]

    residual_order: int
    # residual(jets, points, xp) -> (res, scale)
    residual_fn: Callable

    known_solutions: Dict[str, str]          # expr string -> human name
    screen_points: np.ndarray                # f64 [P, 2]
    fingerprint_points: np.ndarray           # f64 [F, 2]
    output_root: str

    # named parameters (numeric value used on device; symbolic in confirm)
    param_values: Dict[str, Fraction] = field(default_factory=dict)

    # screening thresholds (relative residual)
    screen_rtol: float = 3e-3
    confirm_rtol: float = 1e-9

    # key into parallel.search._RESIDUALS (set by constructors; defaults to
    # the slug). Non-default parameterizations register a fresh key.
    residual_key: str = ""

    # known solutions that hold only at an anchor parameterization (e.g.
    # Kerr's monopole is exact at a→0, NOT at a=1/10): name -> note.
    # Reports exclude these from the found/expected discoverability count
    # and print the note instead of a misleading ✗.
    anchor_only_knowns: Dict[str, str] = field(default_factory=dict)

    def get_residual_key(self) -> str:
        if not self.residual_key:
            self.residual_key = self.slug + self._residual_param_tag()
        from ..parallel.search import _RESIDUALS, register_residual
        if self.residual_key not in _RESIDUALS:
            register_residual(self.residual_key, self.residual_fn)
        return self.residual_key

    def _residual_param_tag(self) -> str:
        """Disambiguates kernels for non-default parameterizations."""
        parts = []
        if getattr(self, "omega", 0.0):
            parts.append(f"omega={self.omega}")
        for n, v in sorted(self.param_values.items()):
            parts.append(f"{n}={v}")
        return ("@" + ",".join(parts)) if parts else ""

    # ------------------------------------------------------------------
    # SymPy side
    # ------------------------------------------------------------------

    def sympy_vars(self):
        import sympy as sp
        v0 = sp.Symbol(self.var_names[0], real=True, positive=True)
        v1 = sp.Symbol(self.var_names[1], real=True)
        return (v0, v1)

    def sympy_params(self) -> Dict[str, object]:
        import sympy as sp
        out = {}
        for n in self.param_values:
            if n == "M":
                out[n] = sp.Symbol(n, real=True, positive=True)
            else:
                out[n] = sp.Symbol(n, real=True)
        return out

    def tape_to_sympy(self, tape: Tape, symbolic_params: bool = True):
        return to_sympy(tape, self.consts, self.sympy_vars(),
                        self.sympy_params() if symbolic_params else None)

    def compile_sympy(self, expr) -> Tape:
        syms = self.sympy_vars()
        params = {self.sympy_params()[n]: (n, v)
                  for n, v in self.param_values.items()}
        return from_sympy(expr, self.consts, syms, params=params)

    def parse(self, expr_str: str) -> Tape:
        """Parse an expression string (reference spelling, incl. op-wrapped
        forms like ``exp_neg(z)``) into a tape."""
        import sympy as sp
        v0, v1 = self.sympy_vars()
        locals_map = {self.var_names[0]: v0, self.var_names[1]: v1}
        locals_map.update(self.sympy_params())
        # surface-op spellings used by the reference's candidate strings
        locals_map.update({
            "neg": lambda x: -x,
            "inv": lambda x: 1 / x,
            "square": lambda x: x**2,
            "pow_3_2": lambda x: x**sp.Rational(3, 2),
            "pow_neg_3_2": lambda x: x**sp.Rational(-3, 2),
            "exp_neg": lambda x: sp.exp(-x),
            "geom_sum": lambda x, y: x / (1 - y),
            "sqrt_shift_neg": lambda x, y: sp.sqrt((x - 1)**2 + y**2),
            "sqrt_shift_pos": lambda x, y: sp.sqrt((x + 1)**2 + y**2),
            "exp_mul": lambda x, y: x * sp.exp(y),
            "log_mul": lambda x, y: x * sp.log(y),
        })
        expr = sp.sympify(expr_str, locals=locals_map)
        return self.compile_sympy(expr)

    def sympy_residual(self, u):
        """Symbolic residual of a SymPy candidate (exact-confirm stage and
        the --verify-pde audit). Must match ``residual_fn`` semantics."""
        raise NotImplementedError

    def exact_zero_residual(self, u) -> bool:
        """Reference-faithful exact confirmation: residual simplifies to 0
        (force_free validator.py:404-427; kerr validator.py:288-294)."""
        import sympy as sp
        lhs = self.sympy_residual(u)
        try:
            q = sp.together(sp.cancel(lhs))
            if q == 0:
                return True
            return sp.simplify(q) == 0
        except Exception:
            try:
                return sp.expand(lhs) == 0
            except Exception:
                return False

    # ------------------------------------------------------------------
    # Heavy checks (host-side, survivors only) — parity with the
    # reference's deferred heavy pass (general:2024-2136).
    # ------------------------------------------------------------------

    def heavy_checks(self, u) -> Tuple[bool, str]:
        return True, "ok"

    def validate_known(self, expr_str: str) -> Tuple[bool, float, str]:
        """Numeric residual check of a known solution at this problem's
        parameterization (the reference validated knowns first,
        general:481-499).  Returns (ok, max relative residual, note).
        Anchor-only knowns (see ``anchor_only_knowns``) are overridden by
        the problem to validate at their anchor."""
        import numpy as np
        from ..ops.interpreter import eval_jets_np
        t = self.parse(expr_str)
        jets = eval_jets_np(t.rows, len(t), self.consts.as_array(np.float64),
                            self.screen_points, self.residual_order)
        res, scale = self.residual_fn(jets, self.screen_points, np)
        with np.errstate(invalid="ignore"):
            rel = np.abs(res) / (scale + 1e-300)
        ok = bool(np.isfinite(res).all() and rel.max() < self.confirm_rtol)
        return ok, float(np.nanmax(rel)), ""

    def get_output_dir(self) -> str:
        os.makedirs(self.output_root, exist_ok=True)
        return self.output_root

    @property
    def validator(self):
        """Single-expression validator with the reference's interface
        (problems/__init__.py:52) — see pde_engine_tpu/validator.py."""
        v = getattr(self, "_validator", None)
        if v is None:
            from ..validator import ExpressionValidator
            v = ExpressionValidator(self)
            self._validator = v
        return v

    # convenience ------------------------------------------------------
    def known_solution_tapes(self) -> Dict[str, Tape]:
        return {s: self.parse(s) for s in self.known_solutions}

    def describe(self) -> Dict[str, str]:
        return {
            "method_name": f"{type(self).__module__}.{type(self).__name__}",
            "math_definition": self._math_definition(),
        }

    def _math_definition(self) -> str:
        return "<residual>"


_REGISTRY: Dict[str, Callable[[], Problem]] = {}


def register(keys: Sequence[str]):
    def deco(factory):
        for k in keys:
            _REGISTRY[k] = factory
        return factory
    return deco


def load_problem(name: str) -> Problem:
    """Parity with reference problems/__init__.py:355-361."""
    key = (name or "").strip().lower()
    if key not in _REGISTRY:
        avail = sorted(set(_REGISTRY))
        raise ValueError(f"Unknown problem '{name}'. Available: {avail}")
    return _REGISTRY[key]()
