"""Depth-by-depth candidate enumerator (host side).

TPU-native redesign of the reference's ``FastExpressionGenerator.stream_generate``
(lean_normalizer/lean_bridge_fixed.py:113-215): instead of building Python
strings and re-parsing them with sympify, a candidate is just
``(surface_op, left_unique, right_unique)`` — a node in the enumeration DAG.
Tapes are materialized lazily (only survivors that reach the float64/SymPy
stages need one); the device fast path evaluates candidates directly from
cached operand jets (parallel/incremental.py), one homogeneous op batch at a
time.

Dedup is not done here: the engine fingerprints each batch on-device and
feeds surviving uniques back via :meth:`Enumerator.add_unique` — the analog
of the reference's ``expressions_by_depth`` of normalized forms.

Prune rules reproduced from the reference:
- skip unary ops on constant-only operands          (lean_bridge_fixed.py:143-145)
- skip inv(inv(...)) and sqrt/square/pow_* of '1'   (lean_bridge_fixed.py:148-152)
- skip constant-only x constant-only binaries       (lean_bridge_fixed.py:161-164)
- commutative operand ordering for add/mul          (lean_bridge_fixed.py:167-169)
- skip a - a, mul by 1, div by 1, a / a, geom_sum(., 1)  (:173-195)
- sqrt_shift_* operands restricted to coordinate-like expressions
  (general_method_paper_reproduction.py:425-428, lean_bridge_fixed.py:217-219)
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Set, Tuple

import numpy as np

from .models.base import Problem
from .ops import optable as ot
from .ops.tape import Tape, apply_binary, apply_unary


def wrap_operand(s: str) -> str:
    """Parenthesize an operand string unless it is atomic or already fully
    wrapped.  The reference spells sub as "(a - b)" with a bare b
    (lean_bridge_fixed.py:177), so e.g. sub(X, X**2 + Y**2) prints
    "(X - X**2 + Y**2)" — a string that re-parses as X - X**2 + Y**2, a
    DIFFERENT expression.  All our stored strings must round-trip."""
    if not s:
        return s
    if s.isidentifier() or s.replace(".", "").replace("/", "").isdigit():
        return s
    if s[0] == "(" and s[-1] == ")" and _fully_wrapped(s):
        return s
    head, _, rest = s.partition("(")
    if head.isidentifier() and rest.endswith(")") and _fully_wrapped(
            s[len(head):]):
        return s
    return f"({s})"


def _fully_wrapped(s: str) -> bool:
    depth = 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i == len(s) - 1
    return False


class Candidate:
    """A node in the enumeration DAG.  Either a leaf (explicit tape) or
    ``op(a, b)`` over parent uniques; the tape materializes on demand."""

    __slots__ = ("op_name", "a", "b", "depth", "expr_str", "top_op",
                 "has_var", "is_one", "_tape", "_consts", "_wrapped")

    def __init__(self, depth: int, expr_str: str, top_op: str,
                 has_var: bool, is_one: bool = False,
                 op_name: str = "", a: "Candidate" = None,
                 b: "Candidate" = None, tape: Optional[Tape] = None,
                 consts=None):
        self.depth = depth
        self.expr_str = expr_str
        self.top_op = top_op
        self.has_var = has_var
        self.is_one = is_one
        self.op_name = op_name
        self.a = a
        self.b = b
        self._tape = tape
        self._consts = consts
        self._wrapped = None

    @property
    def wrapped(self) -> str:
        """Memoized wrap_operand(expr_str) — parents are reused by many
        children, and the parenthesization scan is O(len(str))."""
        if self._wrapped is None:
            self._wrapped = wrap_operand(self.expr_str)
        return self._wrapped

    @property
    def tape(self) -> Tape:
        if self._tape is None:
            op = ot.ALL_SURFACE_OPS[self.op_name]
            if self.b is None:
                self._tape = apply_unary(op, self.a.tape, self._consts)
            else:
                self._tape = apply_binary(op, self.a.tape, self.b.tape,
                                          self._consts)
        return self._tape


class Unique(Candidate):
    __slots__ = ("uid",)

    def __init__(self, cand: Candidate, uid: int):
        super().__init__(cand.depth, cand.expr_str, cand.top_op,
                         cand.has_var, cand.is_one, cand.op_name,
                         cand.a, cand.b, cand._tape, cand._consts)
        self.uid = uid


class Enumerator:
    """Streams candidate batches per depth; uniques are fed back after
    dedup.  ``op_batches_at_depth`` is the fast path (homogeneous batches
    of (a_uid, b_uid) pairs for the incremental device engine)."""

    def __init__(self, problem: Problem, include_special_ops: bool = True,
                 prune: bool = True):
        self.problem = problem
        self.prune = prune
        self.unary = [(n, ot.UNARY_OPS[n]) for n in problem.unary_ops]
        binary_names = list(problem.binary_ops)
        if include_special_ops:
            binary_names += list(problem.special_ops)
        self.binary = [(n, ot.ALL_SURFACE_OPS[n]) for n in binary_names]
        self.uniques_by_depth: Dict[int, List[Unique]] = {}
        self.by_uid: List[Unique] = []
        self._next_uid = 0
        # coordinate-like uids (operand restriction for sqrt_shift ops,
        # reference lean_bridge_fixed.py:217-219)
        self._coordinate_uids: Set[int] = set()
        # per-uid flag arrays for the vectorized fast path
        self._cap = 1024
        self.f_has_var = np.zeros(self._cap, np.bool_)
        self.f_is_one = np.zeros(self._cap, np.bool_)
        self.f_top_inv = np.zeros(self._cap, np.bool_)
        self.f_is_coord = np.zeros(self._cap, np.bool_)

    # ------------------------------------------------------------------
    def primitive_candidates(self) -> List[Candidate]:
        out = []
        for t, s in zip(self.problem.primitives, self.problem.primitive_strs):
            out.append(Candidate(
                depth=1, expr_str=s, top_op="",
                has_var=t.uses_var(),
                is_one=t.is_const_one(self.problem.consts),
                tape=t, consts=self.problem.consts))
        return out

    def add_unique(self, cand: Candidate) -> Unique:
        u = Unique(cand, self._next_uid)
        self._next_uid += 1
        self.uniques_by_depth.setdefault(cand.depth, []).append(u)
        self.by_uid.append(u)
        if u.uid >= self._cap:
            self._grow_flags()
        self.f_has_var[u.uid] = u.has_var
        self.f_is_one[u.uid] = u.is_one
        self.f_top_inv[u.uid] = (u.top_op == "inv")
        if self._is_coordinate_like(u):
            self._coordinate_uids.add(u.uid)
            self.f_is_coord[u.uid] = True
        return u

    def add_unique_from_op(self, op_name: str, a_uid: int,
                           b_uid: Optional[int], depth: int) -> Unique:
        """Fast-path unique creation from the vectorized ingest: builds the
        DAG node (and its display string) from parent uniques."""
        a = self.by_uid[a_uid]
        b = self.by_uid[b_uid] if b_uid is not None else None
        if b is None:
            s = f"{op_name}({a.expr_str})"
            has_var = a.has_var
        else:
            fmt = ot.SURFACE_FORMAT.get(op_name)
            if fmt:
                s = fmt.format(a=a.wrapped, b=b.wrapped)
            else:
                s = f"{op_name}({a.expr_str}, {b.expr_str})"
            has_var = a.has_var or b.has_var
        cand = Candidate(depth=depth, expr_str=s, top_op=op_name,
                         has_var=has_var, op_name=op_name, a=a, b=b,
                         consts=self.problem.consts)
        return self.add_unique(cand)

    def _grow_flags(self):
        new_cap = self._cap * 2
        while new_cap <= self._next_uid:
            new_cap *= 2
        for name in ("f_has_var", "f_is_one", "f_top_inv", "f_is_coord"):
            arr = getattr(self, name)
            pad = np.zeros(new_cap - self._cap, np.bool_)
            setattr(self, name, np.concatenate([arr, pad]))
        self._cap = new_cap

    def _is_coordinate_like(self, u: Unique) -> bool:
        cs = getattr(self, "_coord_strs", None)
        if cs is None:
            v0, v1 = self.problem.var_names
            cs = frozenset((v0, v1, f"({v0} + {v1})", f"({v0} - {v1})",
                            f"({v1} - {v0})", f"{v0} + {v1}",
                            f"{v0} - {v1}", f"{v1} - {v0}"))
            self._coord_strs = cs
        return u.expr_str in cs

    # ------------------------------------------------------------------
    def candidates_at_depth(self, depth: int) -> Iterator[Candidate]:
        """All pruned candidates at ``depth`` (>= 2), composed from the
        unique sets of lower depths."""
        assert depth >= 2
        consts = self.problem.consts
        prune = self.prune
        seen: Set[Tuple] = set()

        # unary of depth-1 uniques
        for u in self.uniques_by_depth.get(depth - 1, []):
            if prune and not u.has_var:
                continue
            for name, op in self.unary:
                if prune:
                    if name == "inv" and u.top_op == "inv":
                        continue
                    if name in ("sqrt", "square", "pow_3_2",
                                "pow_neg_3_2") and u.is_one:
                        continue
                key = (name, u.uid, -1)
                if key in seen:
                    continue
                seen.add(key)
                yield Candidate(depth=depth,
                                expr_str=f"{name}({u.expr_str})",
                                top_op=name, has_var=u.has_var,
                                op_name=name, a=u, consts=consts)

        # binary combining depth d1 x depth (depth - d1)
        for d1 in range(1, depth):
            d2 = depth - d1
            if d2 < 1 or d2 >= depth:
                continue
            left_set = self.uniques_by_depth.get(d1, [])
            right_set = self.uniques_by_depth.get(d2, [])
            for u1 in left_set:
                for u2 in right_set:
                    if prune and not (u1.has_var or u2.has_var):
                        continue
                    for name, op in self.binary:
                        a, b = u1, u2
                        if name in ("add", "mul") and a.uid > b.uid:
                            a, b = b, a
                        if prune:
                            if name == "sub" and a.uid == b.uid:
                                continue
                            if name == "mul" and (a.is_one or b.is_one):
                                continue
                            if name == "div" and (b.is_one
                                                  or a.uid == b.uid):
                                continue
                            if name == "geom_sum" and b.is_one:
                                continue
                            if name in ("sqrt_shift_neg", "sqrt_shift_pos") \
                                    and not (
                                        a.uid in self._coordinate_uids
                                        and b.uid in self._coordinate_uids):
                                continue
                        key = (name, a.uid, b.uid)
                        if key in seen:
                            continue
                        seen.add(key)
                        fmt = ot.SURFACE_FORMAT.get(name)
                        if fmt:
                            s = fmt.format(a=a.wrapped, b=b.wrapped)
                        else:
                            s = f"{name}({a.expr_str}, {b.expr_str})"
                        yield Candidate(depth=depth, expr_str=s,
                                        top_op=name,
                                        has_var=a.has_var or b.has_var,
                                        op_name=name, a=a, b=b,
                                        consts=consts)

    # ------------------------------------------------------------------
    def op_batches_at_depth(self, depth: int, batch_size: int
                            ) -> Iterator[Tuple[str, List[Candidate]]]:
        """Candidates grouped into homogeneous per-op batches for the
        incremental device engine."""
        buffers: Dict[str, List[Candidate]] = {}
        for cand in self.candidates_at_depth(depth):
            buf = buffers.setdefault(cand.op_name, [])
            buf.append(cand)
            if len(buf) >= batch_size:
                yield cand.op_name, buf
                buffers[cand.op_name] = []
        for name, buf in buffers.items():
            if buf:
                yield name, buf

    # ------------------------------------------------------------------
    def vector_batches_at_depth(self, depth: int, batch_size: int
                                ) -> Iterator[Tuple[str, np.ndarray,
                                                    Optional[np.ndarray]]]:
        """Array-level candidate generation (no Python objects, no strings):
        yields structurally deduplicated ``(op_name, a_uids, b_uids)``
        batches.  Semantics identical to :meth:`candidates_at_depth`
        (same prune rules, same commutative canonicalization); the 10^5-10^8
        per-depth candidate streams never touch Python-per-candidate code.
        """
        assert depth >= 2
        prune = self.prune

        def uid_arr(d):
            return np.fromiter((u.uid for u in
                                self.uniques_by_depth.get(d, [])),
                               np.int32,
                               len(self.uniques_by_depth.get(d, [])))

        def chunks(name, a, b):
            for i in range(0, a.size, batch_size):
                yield (name, a[i:i + batch_size],
                       None if b is None else b[i:i + batch_size])

        # unary over depth-1 uniques
        prev = uid_arr(depth - 1)
        if prev.size:
            base = prev[self.f_has_var[prev]] if prune else prev
            for name, _ in self.unary:
                sel = base
                if prune:
                    if name == "inv":
                        sel = base[~self.f_top_inv[base]]
                    elif name in ("sqrt", "square", "pow_3_2",
                                  "pow_neg_3_2"):
                        sel = base[~self.f_is_one[base]]
                yield from chunks(name, sel, None)

        # binary over (d1, d2) blocks
        for d1 in range(1, depth):
            d2 = depth - d1
            A, B = uid_arr(d1), uid_arr(d2)
            if not A.size or not B.size:
                continue
            a = np.repeat(A, B.size)
            b = np.tile(B, A.size)
            var = (self.f_has_var[a] | self.f_has_var[b]) if prune else \
                np.ones(a.size, np.bool_)
            for name, _ in self.binary:
                commutative = name in ("add", "mul")
                if commutative and d1 > d2:
                    continue  # block fully redundant with (d2, d1)
                aa, bb = a, b
                if commutative:
                    sw = aa > bb
                    aa = np.where(sw, b, a)
                    bb = np.where(sw, a, b)
                m = var.copy()
                if prune:
                    if name == "sub":
                        m &= aa != bb
                    elif name == "mul":
                        m &= ~(self.f_is_one[aa] | self.f_is_one[bb])
                    elif name == "div":
                        m &= (~self.f_is_one[bb]) & (aa != bb)
                    elif name == "geom_sum":
                        m &= ~self.f_is_one[bb]
                    elif name in ("sqrt_shift_neg", "sqrt_shift_pos"):
                        m &= self.f_is_coord[aa] & self.f_is_coord[bb]
                sa, sb = aa[m], bb[m]
                if commutative and d1 == d2 and sa.size:
                    # swapped duplicates exist only within a same-depth
                    # block; keep first occurrences in enumeration order
                    key = sa.astype(np.int64) << 32 | sb.astype(np.int64)
                    _, fi = np.unique(key, return_index=True)
                    fi.sort()
                    sa, sb = sa[fi], sb[fi]
                yield from chunks(name, sa, sb)

    def count_uniques(self) -> int:
        return self._next_uid
