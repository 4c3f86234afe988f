"""Direct jet-space application of surface operations.

The incremental search engine (parallel/incremental.py) never re-interprets
a candidate's tape: a depth-d candidate is ``op(a, b)`` where ``a`` and ``b``
are previously-evaluated unique expressions whose jets are cached on device.
Evaluating the candidate is ONE application of the surface op in jet space —
the dynamic-programming structure of the enumeration (reference
lean_bridge_fixed.py:139-196 builds depth d from the depth-<d unique sets)
mapped onto the TPU.

Semantics match the ISA lowering in optable.py exactly (e.g. ``div`` is
compose(b, x^-1) then a jet-multiply), so values agree with the tape
interpreter up to float rounding.
"""

from __future__ import annotations

from fractions import Fraction
from typing import Optional

from . import optable as ot
from .jets import (
    exp_fs,
    jet_compose,
    jet_mul,
    log_fs,
    n_coeffs,
    pow_fs,
)

UNARY_NAMES = ("neg", "inv", "sqrt", "square", "pow_3_2", "pow_neg_3_2",
               "exp", "exp_neg", "log")
BINARY_NAMES = ("add", "sub", "mul", "div", "geom_sum",
                "sqrt_shift_neg", "sqrt_shift_pos", "exp_mul", "log_mul")

_POW_BY_NAME = {
    "inv": Fraction(-1),
    "sqrt": Fraction(1, 2),
    "square": Fraction(2),
    "pow_3_2": Fraction(3, 2),
    "pow_neg_3_2": Fraction(-3, 2),
}


def _pow(a, p: Fraction, order: int, xp):
    return jet_compose(a, pow_fs(a[..., 0], p, order, xp), order, xp)


def _exp(a, order: int, xp):
    return jet_compose(a, exp_fs(a[..., 0], order, xp), order, xp)


def _log(a, order: int, xp):
    return jet_compose(a, log_fs(a[..., 0], order, xp), order, xp)


def _add_const(a, c: float, xp):
    """a + c (adds to the constant coefficient only).  Column-stack dialect
    (lane-major-shim compatible, see ops/lanes.py)."""
    n = a.shape[-1] if hasattr(a, "shape") else len(a.cols)
    return xp.stack([a[..., 0] + c] + [a[..., k] for k in range(1, n)],
                    axis=-1)


def _one_minus(a, xp):
    return _add_const(-a, 1.0, xp)


def apply_surface_op(name: str, a, b, order: int, xp):
    """Apply a surface operation to jet arrays (last axis = coefficients).

    ``b`` is ignored for unary ops.  Shapes broadcast over leading axes.
    """
    if name == "neg":
        return -a
    if name in _POW_BY_NAME:
        return _pow(a, _POW_BY_NAME[name], order, xp)
    if name == "exp":
        return _exp(a, order, xp)
    if name == "exp_neg":
        return _exp(-a, order, xp)
    if name == "log":
        return _log(a, order, xp)
    if name == "add":
        return a + b
    if name == "sub":
        return a - b
    if name == "mul":
        # order 1 == the fingerprint path: the dedup key lattice needs
        # bitwise swap symmetry under commutative reorientation, which
        # FMA contraction would break (see jets.jet_mul swap_safe)
        return jet_mul(a, b, order, xp, swap_safe=(order == 1))
    if name == "div":
        return jet_mul(a, _pow(b, Fraction(-1), order, xp), order, xp)
    if name == "geom_sum":
        # a / (1 - b)   (expression_operations.py:27-29)
        return jet_mul(a, _pow(_one_minus(b, xp), Fraction(-1), order, xp),
                       order, xp)
    if name == "sqrt_shift_neg":
        t = _add_const(a, -1.0, xp)
        s = jet_mul(t, t, order, xp) + jet_mul(b, b, order, xp)
        return _pow(s, Fraction(1, 2), order, xp)
    if name == "sqrt_shift_pos":
        t = _add_const(a, 1.0, xp)
        s = jet_mul(t, t, order, xp) + jet_mul(b, b, order, xp)
        return _pow(s, Fraction(1, 2), order, xp)
    if name == "exp_mul":
        return jet_mul(a, _exp(b, order, xp), order, xp)
    if name == "log_mul":
        return jet_mul(a, _log(b, order, xp), order, xp)
    raise ValueError(f"unknown surface op {name}")
