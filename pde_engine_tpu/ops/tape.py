"""Tape IR: construction, composition, SymPy bridge, pretty printing.

A *tape* is the TPU-native replacement for the reference's SymPy expression
trees (reference builds candidate expressions as Python strings and re-parses
them with sympify — general_method_paper_reproduction.py:1257-1291).  Here an
expression is an SSA program: row k is ``(opcode, a, b)`` with ``a``/``b``
indexing earlier rows; the last row is the result.

Tapes compose structurally: ``binary(op, t1, t2)`` concatenates ``t1`` and a
re-indexed ``t2`` and appends the op's lowered rows — no parsing, no strings,
no SymPy on the hot path.  SymPy enters only at the edges: compiling problem
primitives / known solutions to tapes, and exact confirmation of the tiny
survivor set.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from fractions import Fraction
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from . import optable as ot


class ConstTable:
    """Interns rational constants into a per-problem constant table.

    The table is uploaded to the device as a small float array alongside the
    tape batch; CONST nodes store an index into it.
    """

    def __init__(self, initial: Sequence[Fraction] = ()):  # Fraction-keyed
        self._values: List[Fraction] = []
        self._index: Dict[Fraction, int] = {}
        # Named problem parameters (e.g. Kerr's M, a): numeric on device,
        # but the SymPy bridge can map them back to symbols so the exact
        # confirmation stage stays symbolic in the parameters (parity with
        # reference kerr validator strict_sympy_check, validator.py:288-294).
        self.param_names: Dict[int, str] = {}
        self._param_by_name: Dict[str, int] = {}
        for v in initial:
            self.intern(Fraction(v))

    def intern(self, value: Fraction) -> int:
        value = Fraction(value)
        idx = self._index.get(value)
        if idx is None:
            idx = len(self._values)
            self._values.append(value)
            self._index[value] = idx
        return idx

    def intern_param(self, name: str, value: Fraction) -> int:
        """Intern a named parameter as a dedicated table slot (never shared
        with plain constants of the same value)."""
        if name in self._param_by_name:
            return self._param_by_name[name]
        idx = len(self._values)
        self._values.append(Fraction(value))
        self.param_names[idx] = name
        self._param_by_name[name] = idx
        return idx

    @property
    def values(self) -> List[Fraction]:
        return list(self._values)

    def as_array(self, dtype=np.float64, pad_to: Optional[int] = None) -> np.ndarray:
        arr = np.array([float(v) for v in self._values], dtype=dtype)
        if pad_to is not None and arr.size < pad_to:
            arr = np.pad(arr, (0, pad_to - arr.size))
        return arr

    def __len__(self) -> int:
        return len(self._values)


@dataclass(frozen=True)
class Tape:
    """An immutable SSA program. ``rows`` has shape (L, 3) int32."""

    rows: np.ndarray

    def __post_init__(self):
        object.__setattr__(self, "rows", np.asarray(self.rows, dtype=np.int32))

    def __len__(self) -> int:
        return int(self.rows.shape[0])

    @property
    def result(self) -> int:
        return len(self) - 1

    def key(self) -> bytes:
        """Exact structural identity (not mathematical equivalence)."""
        return self.rows.tobytes()

    def padded(self, max_nodes: int) -> np.ndarray:
        L = len(self)
        if L > max_nodes:
            raise ValueError(f"tape length {L} exceeds max_nodes {max_nodes}")
        out = np.zeros((max_nodes, 3), dtype=np.int32)
        out[:L] = self.rows
        return out

    # -- structural predicates used by the enumerator's prune rules --------
    def top_opcode(self) -> int:
        return int(self.rows[-1, 0])

    def uses_var(self) -> bool:
        ops = self.rows[:, 0]
        return bool(np.any((ops == ot.VAR0) | (ops == ot.VAR1)))

    def is_const_one(self, consts: ConstTable) -> bool:
        if len(self) != 1 or self.top_opcode() != ot.CONST:
            return False
        return consts.values[int(self.rows[0, 2])] == Fraction(1)


# ---------------------------------------------------------------------------
# Construction
# ---------------------------------------------------------------------------

def leaf_var(which: int) -> Tape:
    return Tape(np.array([[ot.VAR0 if which == 0 else ot.VAR1, 0, 0]]))


def leaf_const(value: Fraction, consts: ConstTable) -> Tape:
    return Tape(np.array([[ot.CONST, 0, consts.intern(Fraction(value))]]))


def apply_unary(op: ot.SurfaceOp, operand: Tape, consts: ConstTable) -> Tape:
    rows: ot.Rows = [tuple(r) for r in operand.rows.tolist()]
    op.emit(rows, consts.intern, operand.result)
    return Tape(np.array(rows))


# Which of a node's (a, b) fields hold register references, per opcode.
_A_IS_REG = {ot.ADD, ot.SUB, ot.MUL, ot.NEG, ot.POW, ot.EXP, ot.LOG}
_B_IS_REG = {ot.ADD, ot.SUB, ot.MUL}


def shifted_rows(tape: Tape, shift: int) -> ot.Rows:
    out: ot.Rows = []
    for (opc, a, b) in tape.rows.tolist():
        out.append((opc,
                    a + shift if opc in _A_IS_REG else a,
                    b + shift if opc in _B_IS_REG else b))
    return out


def apply_binary(op: ot.SurfaceOp, left: Tape, right: Tape,
                 consts: ConstTable) -> Tape:
    shift = len(left)
    rows: ot.Rows = [tuple(r) for r in left.rows.tolist()]
    rows.extend(shifted_rows(right, shift))
    op.emit(rows, consts.intern, left.result, right.result + shift)
    return Tape(np.array(rows))


# ---------------------------------------------------------------------------
# SymPy bridge
# ---------------------------------------------------------------------------

def to_sympy(tape: Tape, consts: ConstTable, var_syms,
             param_syms: Optional[Dict[str, object]] = None):
    """Evaluate the tape into a SymPy expression (exact rationals).

    If ``param_syms`` maps parameter names to SymPy symbols, named constant
    slots are rendered symbolically instead of numerically.
    """
    import sympy as sp

    vals: List = []
    cvals = consts.values
    for (opc, a, b) in tape.rows.tolist():
        if opc == ot.NOP:
            vals.append(sp.Integer(0))
        elif opc == ot.VAR0:
            vals.append(var_syms[0])
        elif opc == ot.VAR1:
            vals.append(var_syms[1])
        elif opc == ot.CONST:
            pname = consts.param_names.get(b)
            if param_syms is not None and pname is not None:
                vals.append(param_syms[pname])
            else:
                fr = cvals[b]
                vals.append(sp.Rational(fr.numerator, fr.denominator))
        elif opc == ot.ADD:
            vals.append(vals[a] + vals[b])
        elif opc == ot.SUB:
            vals.append(vals[a] - vals[b])
        elif opc == ot.MUL:
            vals.append(vals[a] * vals[b])
        elif opc == ot.NEG:
            vals.append(-vals[a])
        elif opc == ot.POW:
            e = ot.POW_EXPONENTS[b]
            vals.append(vals[a] ** sp.Rational(e.numerator, e.denominator))
        elif opc == ot.EXP:
            vals.append(sp.exp(vals[a]))
        elif opc == ot.LOG:
            vals.append(sp.log(vals[a]))
        else:
            raise ValueError(f"bad opcode {opc}")
    return vals[tape.result]


def from_sympy(expr, consts: ConstTable, var_syms,
               params: Optional[Dict[object, Tuple[str, Fraction]]] = None
               ) -> Tape:
    """Compile a SymPy expression to a tape (for primitives / known
    solutions).  Supports the closure of the op library: +, *, rational
    powers with denominator <= 2, exp, log, rational constants.

    ``params`` maps SymPy symbols to (name, numeric_value) pairs; they
    compile to named constant-table slots (see ``ConstTable.intern_param``).
    """
    import sympy as sp

    params = params or {}
    rows: ot.Rows = []

    def emit(opc, a=0, b=0):
        rows.append((opc, a, b))
        return len(rows) - 1

    def compile_pow(base_reg: int, e: Fraction) -> int:
        """x**e as a chain of the 5 table exponents and products."""
        table = {ot.POW_EXPONENTS[i]: i for i in range(len(ot.POW_EXPONENTS))}
        if e in table:
            return emit(ot.POW, base_reg, table[e])
        if e == 1:
            return base_reg
        # Decompose: power-of-two denominator via repeated sqrt, then the
        # integer numerator via binary exponentiation.  Covers x**(1/4)
        # and deeper sqrt nests — valid rows like sqrt(sqrt(z)) sympy-
        # normalize to z**(1/4), and the certifier must be able to
        # re-compile every stored row (VERDICT round 2: 3 'open' depth-4
        # certificates were exactly this re-parse failure).
        d = e.denominator
        if d & (d - 1) == 0:
            reg = base_reg
            while d > 1:
                reg = emit(ot.POW, reg, ot.POW_SQRT)
                d //= 2
            return compile_pow_int_times(reg, e.numerator)
        raise ValueError(f"unsupported exponent {e}")

    def compile_pow_int_times(reg: int, n: int) -> int:
        """reg**n for integer n (n != 0)."""
        neg = n < 0
        n = abs(n)
        # binary exponentiation over tape nodes
        result = None
        base = reg
        while n:
            if n & 1:
                result = base if result is None else emit(ot.MUL, result, base)
            n >>= 1
            if n:
                base = emit(ot.POW, base, ot.POW_SQUARE)
        if neg:
            result = emit(ot.POW, result, ot.POW_INV)
        return result

    def rec(e) -> int:
        if e == var_syms[0]:
            return emit(ot.VAR0)
        if e == var_syms[1]:
            return emit(ot.VAR1)
        # Non-finite atoms (zoo from eager 1/(1-1) evaluation, oo, nan):
        # compile to tape fragments that *evaluate* non-finite, so the
        # validator's reject-on-non-finite discipline applies (never treat
        # unevaluable as zero — SURVEY.md §4 defect class).
        if e is sp.zoo or e is sp.oo:
            zero = emit(ot.CONST, 0, consts.intern(Fraction(0)))
            return emit(ot.POW, zero, ot.POW_INV)          # 1/0 -> inf
        if e is -sp.oo:
            zero = emit(ot.CONST, 0, consts.intern(Fraction(0)))
            inv = emit(ot.POW, zero, ot.POW_INV)
            return emit(ot.NEG, inv)
        if e is sp.nan:
            neg1 = emit(ot.CONST, 0, consts.intern(Fraction(-1)))
            return emit(ot.POW, neg1, ot.POW_SQRT)         # sqrt(-1) -> nan
        if e is sp.E:                                       # exp_mul(x, 1)
            one = emit(ot.CONST, 0, consts.intern(Fraction(1)))
            return emit(ot.EXP, one)
        if e.is_Number:
            if not e.is_Rational:
                raise ValueError(f"non-rational constant {e}")
            return emit(ot.CONST, 0,
                        consts.intern(Fraction(int(e.p), int(e.q))))
        if e in params:
            name, value = params[e]
            return emit(ot.CONST, 0, consts.intern_param(name, value))
        if isinstance(e, sp.Symbol):
            raise ValueError(f"unknown symbol {e} (vars are {var_syms})")
        if e.func is sp.Add:
            regs = [rec(a) for a in e.args]
            r = regs[0]
            for nxt in regs[1:]:
                r = emit(ot.ADD, r, nxt)
            return r
        if e.func is sp.Mul:
            regs = [rec(a) for a in e.args]
            r = regs[0]
            for nxt in regs[1:]:
                r = emit(ot.MUL, r, nxt)
            return r
        if e.func is sp.Pow:
            base, expo = e.args
            if not expo.is_Rational:
                raise ValueError(f"non-rational exponent {expo}")
            breg = rec(base)
            return compile_pow(breg, Fraction(int(expo.p), int(expo.q)))
        if e.func is sp.exp:
            return emit(ot.EXP, rec(e.args[0]))
        if e.func is sp.log:
            return emit(ot.LOG, rec(e.args[0]))
        if e.func is sp.Abs:
            # Abs(x) compiles as sqrt(x^2) — the spelling sqrt(square(z))
            # sympy-normalizes to Abs(z) for real-but-not-positive vars,
            # and stored rows must re-compile for the certifier/post-hoc
            # tools (same numeric semantics on the whole real line)
            sq = emit(ot.POW, rec(e.args[0]), ot.POW_SQUARE)
            return emit(ot.POW, sq, ot.POW_SQRT)
        raise ValueError(f"unsupported sympy node {e.func} in {e}")

    rec(expr)
    return Tape(np.array(rows))


def render(tape: Tape, consts: ConstTable, var_names: Tuple[str, str]) -> str:
    """Cheap human-readable infix rendering (no SymPy)."""
    cvals = consts.values
    txt: List[str] = []
    for (opc, a, b) in tape.rows.tolist():
        if opc == ot.NOP:
            txt.append("0")
        elif opc == ot.VAR0:
            txt.append(var_names[0])
        elif opc == ot.VAR1:
            txt.append(var_names[1])
        elif opc == ot.CONST:
            txt.append(str(cvals[b]))
        elif opc == ot.ADD:
            txt.append(f"({txt[a]} + {txt[b]})")
        elif opc == ot.SUB:
            txt.append(f"({txt[a]} - {txt[b]})")
        elif opc == ot.MUL:
            txt.append(f"({txt[a]} * {txt[b]})")
        elif opc == ot.NEG:
            txt.append(f"(-{txt[a]})")
        elif opc == ot.POW:
            txt.append(f"({txt[a]})**({ot.POW_EXPONENTS[b]})")
        elif opc == ot.EXP:
            txt.append(f"exp({txt[a]})")
        elif opc == ot.LOG:
            txt.append(f"log({txt[a]})")
    return txt[tape.result]
