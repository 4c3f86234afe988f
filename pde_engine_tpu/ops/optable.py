"""Instruction-set and surface-operation tables for the tape IR.

The reference engine builds SymPy expression trees from a fixed operation
library (reference: expression_operations.py:80-106 — 8 unary ops, 5 binary
ops, 4 "special" binary ops).  Here every expression is instead a fixed-width
SSA *tape*: an ``int32[L, 3]`` array of ``(opcode, a, b)`` rows where ``a`` and
``b`` index earlier rows (SSA registers).  The ISA is deliberately minimal —
a RISC core the TPU jet interpreter can evaluate branchlessly — and all of the
reference's richer surface operations are *lowered* onto it at enumeration
time (e.g. ``geom_sum(a, b) = a / (1 - b)`` becomes CONST(1), SUB, POW(-1),
MUL).

Keeping the ISA small means the vmapped interpreter computes only a handful
of candidate results per node and selects by opcode — no data-dependent
control flow, so XLA can tile everything onto the VPU.
"""

from __future__ import annotations

from dataclasses import dataclass
from fractions import Fraction
from typing import Callable, Dict, List, Optional, Sequence, Tuple

# ---------------------------------------------------------------------------
# Core ISA opcodes
# ---------------------------------------------------------------------------

NOP = 0      # padding; writes zeros, never referenced
VAR0 = 1     # push first coordinate  (rho / r / x ...)
VAR1 = 2     # push second coordinate (z / x / y ...)
CONST = 3    # push constant; b = index into the per-problem constant table
ADD = 4      # a + b
SUB = 5      # a - b
MUL = 6      # a * b
NEG = 7      # -a
POW = 8      # a ** POW_EXPONENTS[b]
EXP = 9      # exp(a)
LOG = 10     # log(a)

N_OPCODES = 11

OPCODE_NAMES = {
    NOP: "nop", VAR0: "var0", VAR1: "var1", CONST: "const",
    ADD: "add", SUB: "sub", MUL: "mul", NEG: "neg",
    POW: "pow", EXP: "exp", LOG: "log",
}

# Static exponent table for POW.  Indexed by the node's ``b`` field.
# Covers the reference's inv / sqrt / square / pow_3_2 / pow_neg_3_2
# (expression_operations.py:35-53).
POW_EXPONENTS: Tuple[Fraction, ...] = (
    Fraction(-1),        # 0: inv
    Fraction(1, 2),      # 1: sqrt
    Fraction(2),         # 2: square
    Fraction(3, 2),      # 3: pow_3_2
    Fraction(-3, 2),     # 4: pow_neg_3_2
)
POW_INV, POW_SQRT, POW_SQUARE, POW_3_2, POW_NEG_3_2 = range(5)

# ---------------------------------------------------------------------------
# Surface operations (the reference's generation vocabulary)
# ---------------------------------------------------------------------------
# Each surface op knows how to emit ISA rows given the register index (or
# indices) of its operand(s) and a function that interns constants into the
# problem's constant table.  ``emit`` appends rows to ``rows`` and returns
# the register index of the result.

ConstInterner = Callable[[Fraction], int]
Rows = List[Tuple[int, int, int]]


def _emit(rows: Rows, op: int, a: int = 0, b: int = 0) -> int:
    rows.append((op, a, b))
    return len(rows) - 1


@dataclass(frozen=True)
class SurfaceOp:
    name: str
    arity: int
    emit: Callable[..., int]   # (rows, const_interner, *operand_regs) -> reg


# -- unary ------------------------------------------------------------------

def _u_neg(rows, ic, a):
    return _emit(rows, NEG, a)

def _u_inv(rows, ic, a):
    return _emit(rows, POW, a, POW_INV)

def _u_sqrt(rows, ic, a):
    return _emit(rows, POW, a, POW_SQRT)

def _u_square(rows, ic, a):
    return _emit(rows, POW, a, POW_SQUARE)

def _u_pow_3_2(rows, ic, a):
    return _emit(rows, POW, a, POW_3_2)

def _u_pow_neg_3_2(rows, ic, a):
    return _emit(rows, POW, a, POW_NEG_3_2)

def _u_exp(rows, ic, a):
    return _emit(rows, EXP, a)

def _u_exp_neg(rows, ic, a):
    n = _emit(rows, NEG, a)
    return _emit(rows, EXP, n)

def _u_log(rows, ic, a):
    return _emit(rows, LOG, a)


# -- binary -----------------------------------------------------------------

def _b_add(rows, ic, a, b):
    return _emit(rows, ADD, a, b)

def _b_sub(rows, ic, a, b):
    return _emit(rows, SUB, a, b)

def _b_mul(rows, ic, a, b):
    return _emit(rows, MUL, a, b)

def _b_div(rows, ic, a, b):
    inv = _emit(rows, POW, b, POW_INV)
    return _emit(rows, MUL, a, inv)

def _b_geom_sum(rows, ic, a, b):
    # a / (1 - b)   (reference: expression_operations.py:27-29)
    one = _emit(rows, CONST, 0, ic(Fraction(1)))
    den = _emit(rows, SUB, one, b)
    inv = _emit(rows, POW, den, POW_INV)
    return _emit(rows, MUL, a, inv)

def _b_sqrt_shift_neg(rows, ic, a, b):
    # sqrt((a - 1)^2 + b^2)   (reference: expression_operations.py:63-65)
    one = _emit(rows, CONST, 0, ic(Fraction(1)))
    am1 = _emit(rows, SUB, a, one)
    s1 = _emit(rows, POW, am1, POW_SQUARE)
    s2 = _emit(rows, POW, b, POW_SQUARE)
    tot = _emit(rows, ADD, s1, s2)
    return _emit(rows, POW, tot, POW_SQRT)

def _b_sqrt_shift_pos(rows, ic, a, b):
    one = _emit(rows, CONST, 0, ic(Fraction(1)))
    ap1 = _emit(rows, ADD, a, one)
    s1 = _emit(rows, POW, ap1, POW_SQUARE)
    s2 = _emit(rows, POW, b, POW_SQUARE)
    tot = _emit(rows, ADD, s1, s2)
    return _emit(rows, POW, tot, POW_SQRT)

def _b_exp_mul(rows, ic, a, b):
    e = _emit(rows, EXP, b)
    return _emit(rows, MUL, a, e)

def _b_log_mul(rows, ic, a, b):
    l = _emit(rows, LOG, b)
    return _emit(rows, MUL, a, l)


UNARY_OPS: Dict[str, SurfaceOp] = {
    "neg": SurfaceOp("neg", 1, _u_neg),
    "inv": SurfaceOp("inv", 1, _u_inv),
    "sqrt": SurfaceOp("sqrt", 1, _u_sqrt),
    "square": SurfaceOp("square", 1, _u_square),
    "pow_3_2": SurfaceOp("pow_3_2", 1, _u_pow_3_2),
    "pow_neg_3_2": SurfaceOp("pow_neg_3_2", 1, _u_pow_neg_3_2),
    "exp": SurfaceOp("exp", 1, _u_exp),
    "exp_neg": SurfaceOp("exp_neg", 1, _u_exp_neg),
}

BINARY_OPS: Dict[str, SurfaceOp] = {
    "add": SurfaceOp("add", 2, _b_add),
    "sub": SurfaceOp("sub", 2, _b_sub),
    "mul": SurfaceOp("mul", 2, _b_mul),
    "div": SurfaceOp("div", 2, _b_div),
    "geom_sum": SurfaceOp("geom_sum", 2, _b_geom_sum),
}

SPECIAL_OPS: Dict[str, SurfaceOp] = {
    "sqrt_shift_neg": SurfaceOp("sqrt_shift_neg", 2, _b_sqrt_shift_neg),
    "sqrt_shift_pos": SurfaceOp("sqrt_shift_pos", 2, _b_sqrt_shift_pos),
    "exp_mul": SurfaceOp("exp_mul", 2, _b_exp_mul),
    "log_mul": SurfaceOp("log_mul", 2, _b_log_mul),
}

ALL_BINARY_OPS: Dict[str, SurfaceOp] = {**BINARY_OPS, **SPECIAL_OPS}
ALL_SURFACE_OPS: Dict[str, SurfaceOp] = {**UNARY_OPS, **ALL_BINARY_OPS}

# Extra string template for pretty-printing surface ops the way the
# reference spells them in its candidate strings (lean_bridge_fixed.py:147-195).
SURFACE_FORMAT: Dict[str, str] = {
    "add": "({a} + {b})",
    "sub": "({a} - {b})",
    "mul": "({a} * {b})",
    "div": "({a} / ({b}))",
    "geom_sum": "({a} / (1 - {b}))",
}
