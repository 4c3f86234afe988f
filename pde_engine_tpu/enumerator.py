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


class SparseStrList:
    """List-of-Optional[str] stand-in for the arena path: the native
    arena owns the strings, so the Python side needs only a sparse
    overlay for the rare explicit sets (screen passers, repairs).  The
    two dense ``[None] * n`` lists were 16 B/unique of host RAM — ~6 GB
    of a 3.8e8-unique depth-6 registry (PERF roadmap #2 / VERDICT round 2
    missing #3)."""

    __slots__ = ("_n", "_d")

    def __init__(self):
        self._n = 0
        self._d: Dict[int, str] = {}

    def append(self, s: Optional[str]):
        if s is not None:
            self._d[self._n] = s
        self._n += 1

    def extend(self, it):
        for s in it:
            self.append(s)

    def extend_none(self, n: int):
        self._n += n

    def __getitem__(self, i: int) -> Optional[str]:
        if i < 0 or i >= self._n:
            raise IndexError(i)
        return self._d.get(i)

    def __setitem__(self, i: int, s: Optional[str]):
        if i < 0 or i >= self._n:
            raise IndexError(i)
        if s is None:
            self._d.pop(i, None)
        else:
            self._d[i] = s

    def __len__(self) -> int:
        return self._n

    def to_list(self) -> List[Optional[str]]:
        return [self._d.get(i) for i in range(self._n)]


def _extend_none(lst, n: int):
    """extend with n Nones — O(1) bookkeeping on the sparse overlay."""
    if isinstance(lst, SparseStrList):
        lst.extend_none(n)
    else:
        lst.extend([None] * n)


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
                 prune: bool = True, spill_dir: Optional[str] = None):
        self.problem = problem
        self.prune = prune
        self.unary = [(n, ot.UNARY_OPS[n]) for n in problem.unary_ops]
        binary_names = list(problem.binary_ops)
        if include_special_ops:
            binary_names += list(problem.special_ops)
        self.binary = [(n, ot.ALL_SURFACE_OPS[n]) for n in binary_names]
        self.uniques_by_depth: Dict[int, List[Unique]] = {}
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
        # SoA registry: the structure (op, a, b, depth) of every unique as
        # flat arrays — the 10^7-unique mega-runs never build a Python
        # object per unique; Unique objects materialize lazily on demand
        # (survivors, resume, tape-engine fallback).
        self._op_names: List[str] = list(ot.ALL_SURFACE_OPS)
        self._op_ids: Dict[str, int] = {n: i
                                        for i, n in enumerate(self._op_names)}
        self.u_op = np.full(self._cap, -1, np.int16)    # -1 for leaves
        self.u_a = np.full(self._cap, -1, np.int32)
        self.u_b = np.full(self._cap, -1, np.int32)     # -1 if unary/leaf
        self.u_depth = np.zeros(self._cap, np.int16)
        self.expr_strs: List[Optional[str]] = []        # by uid
        self.wrapped_strs: List[Optional[str]] = []     # by uid
        self._objs: Dict[int, Unique] = {}              # materialized
        self._uid_chunks: Dict[int, List[np.ndarray]] = {}
        self._uid_arr_cache: Dict[int, np.ndarray] = {}
        self._dropped_string_depths: Set[int] = set()
        # Native display-string arena (csrc ExprArena): children composed
        # from parent bytes in C, uid-aligned with the registry.  When
        # present, the vectorized path skips per-unique Python strings
        # entirely (~100 s of a 24M-unique depth-5 run) and the reject
        # sink packs its blob straight from the arena.  None ⇒ Python
        # string lists (tests, use_native=False).
        self.arena = None
        try:
            from .utils.native import ExprArena
            # spill_dir: back string bytes with an unlinked temp file
            # (evictable pages) — the mega-run registry-RAM lever
            self.arena = ExprArena(spill_dir=spill_dir)
        except Exception:
            self.arena = None
        if self.arena is not None:
            # sparse overlays: the arena owns the strings (the two dense
            # None-lists were 16 B/unique at mega-run scale)
            self.expr_strs = SparseStrList()
            self.wrapped_strs = SparseStrList()

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
        """Object-path registration (depth-1 primitives, resume seeding,
        the tape-engine fallback).  Keeps the SoA registry in sync."""
        uid = self._next_uid
        u = Unique(cand, uid)
        self._next_uid += 1
        if uid >= self._cap:
            self._grow_flags()
        self.uniques_by_depth.setdefault(cand.depth, []).append(u)
        self._objs[uid] = u
        self.u_op[uid] = self._op_ids.get(cand.op_name, -1)
        self.u_a[uid] = cand.a.uid if isinstance(cand.a, Unique) else -1
        self.u_b[uid] = cand.b.uid if isinstance(cand.b, Unique) else -1
        self.u_depth[uid] = cand.depth
        self.expr_strs.append(cand.expr_str)
        self.wrapped_strs.append(u.wrapped)
        if self.arena is not None:
            # keep the arena uid-aligned (composition reads parents there)
            self.arena.add_raw([cand.expr_str])
            if u.wrapped != cand.expr_str:
                try:
                    self.arena.set_wrapped(uid, u.wrapped)
                except RuntimeError:
                    # C wrap-override table full (32 slots;
                    # csrc ingest_core.cpp) — a problem with >32 composite
                    # primitives.  Fall back to the Python string path
                    # instead of crashing registration (ADVICE.md round 2).
                    self._drop_arena()
        self._append_uid_chunk(cand.depth,
                               np.array([uid], dtype=np.int32))
        self.f_has_var[uid] = u.has_var
        self.f_is_one[uid] = u.is_one
        self.f_top_inv[uid] = (u.top_op == "inv")
        if self._is_coordinate_like(u):
            self._coordinate_uids.add(uid)
            self.f_is_coord[uid] = True
        return u

    def add_unique_from_op(self, op_name: str, a_uid: int,
                           b_uid: Optional[int], depth: int) -> Unique:
        """Single-candidate unique creation from parent uids (object path;
        the mass path is :meth:`add_uniques_bulk`)."""
        a = self.unique_at(a_uid)
        b = self.unique_at(b_uid) if b_uid is not None else None
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

    # ------------------------------------------------------------------
    # Bulk (array-level) registration — the mega-run hot path.  No Python
    # objects, no per-candidate function calls beyond one string concat.
    # ------------------------------------------------------------------

    def add_uniques_bulk(self, op_name: str, a_u: np.ndarray,
                         b_u: Optional[np.ndarray], depth: int,
                         retain_strings: bool = True,
                         arena_strings: bool = True
                         ) -> Tuple[int, List[str]]:
        """Register ``op(a, b)`` uniques for parent-uid arrays; returns
        (first uid, display strings).  ``retain_strings=False`` skips
        keeping the strings in the registry (final-depth uniques never
        become parents; their strings live only in the emitted DB rows) —
        they can still be rebuilt on demand from the SoA structure.
        ``arena_strings=False`` means NOTHING will read this batch's
        strings (no-audit final depth; non-writer hosts of a
        sharded-registry run): composition is skipped entirely — native
        arena and Python-list paths alike — saving ~50 GB of a
        3.8e8-unique depth-6 registry; strings regenerate from structure
        on demand, and the arena tail is repaired in uid order by
        _ensure_strings if the run is later extended deeper."""
        n = int(a_u.size)
        # a former final depth may have dropped its strings; if this call
        # needs to READ them (Python-list composition, or arena
        # composition from parent bytes), repair first.  A batch with
        # arena_strings=False (no-audit final depth, or a non-writer host
        # of a sharded-registry run) reads nothing — skip the repair so
        # mega-runs never rebuild dropped strings.
        if self._dropped_string_depths and arena_strings:
            self._ensure_strings(depth)
        uid0 = self._next_uid
        self._next_uid += n
        while self._next_uid > self._cap:
            self._grow_flags()
        sl = slice(uid0, uid0 + n)
        opid = self._op_ids[op_name]
        unary = b_u is None
        self.u_op[sl] = opid
        self.u_a[sl] = a_u
        self.u_b[sl] = -1 if unary else b_u
        self.u_depth[sl] = depth
        self._append_uid_chunk(
            depth, np.arange(uid0, uid0 + n, dtype=np.int32))

        # flags (vectorized)
        if unary:
            self.f_has_var[sl] = self.f_has_var[a_u]
        else:
            self.f_has_var[sl] = self.f_has_var[a_u] | self.f_has_var[b_u]
        self.f_is_one[sl] = False
        self.f_top_inv[sl] = (op_name == "inv")
        if op_name in ("add", "sub") and not unary:
            # coordinate-like composites are exactly (prim ± prim) of the
            # two coordinate primitives (the reference's sqrt_shift operand
            # string set, lean_bridge_fixed.py:217-219)
            coord = (self.f_is_coord[a_u] & self.f_is_coord[b_u]
                     & (self.u_depth[a_u] == 1) & (self.u_depth[b_u] == 1)
                     & (a_u != b_u))
            self.f_is_coord[sl] = coord
            if coord.any():
                self._coordinate_uids.update(
                    (uid0 + np.nonzero(coord)[0]).tolist())
        else:
            self.f_is_coord[sl] = False

        # display strings: one concat per unique from parent wrapped forms.
        # Every composed spelling is self-wrapped ("op(...)" / "({a} + {b})"),
        # so wrapped == expr for the children.
        ws = self.wrapped_strs
        es = self.expr_strs
        if self.arena is not None:
            # native path: compose in the C arena (one call, no Python
            # string objects); Python lists carry None and expr_str_of /
            # the reject sink read the arena directly
            if not arena_strings:
                _extend_none(es, n)
                _extend_none(ws, n)
                self._dropped_string_depths.add(depth)
                return uid0, None
            if unary:
                self.arena.add_bulk(op_name + "(", None, ")", a_u, None)
            else:
                fmt = ot.SURFACE_FORMAT.get(op_name)
                if fmt:
                    p1, rest = fmt.split("{a}")
                    mid, p2 = rest.split("{b}")
                    self.arena.add_bulk(p1, mid, p2, a_u, b_u,
                                        use_wrapped=True)
                else:
                    self.arena.add_bulk(op_name + "(", ", ", ")",
                                        a_u, b_u)
            _extend_none(es, n)
            _extend_none(ws, n)
            return uid0, None
        if not arena_strings:
            # Python-list path with nothing reading the strings (non-writer
            # host of a sharded-registry run): skip composition entirely —
            # they regenerate from structure on demand (expr_str_of)
            _extend_none(es, n)
            _extend_none(ws, n)
            self._dropped_string_depths.add(depth)
            return uid0, None
        if unary:
            pre = op_name + "("
            exprs = [pre + es[i] + ")" for i in a_u.tolist()]
        else:
            fmt = ot.SURFACE_FORMAT.get(op_name)
            if fmt:
                p1, rest = fmt.split("{a}")
                mid, p2 = rest.split("{b}")
                exprs = [p1 + ws[i] + mid + ws[j] + p2
                         for i, j in zip(a_u.tolist(), b_u.tolist())]
            else:
                pre = op_name + "("
                exprs = [pre + es[i] + ", " + es[j] + ")"
                         for i, j in zip(a_u.tolist(), b_u.tolist())]
        if retain_strings:
            es.extend(exprs)
            ws.extend(exprs)  # self-wrapped: same references, no copies
        else:
            es.extend([None] * n)
            ws.extend([None] * n)
            self._dropped_string_depths.add(depth)
        return uid0, exprs

    def register_from_struct(self, op_ids: np.ndarray, a_u: np.ndarray,
                             b_u: np.ndarray, depths: np.ndarray,
                             exprs: Optional[List[str]]) -> int:
        """Array-speed resume registration: rebuild the SoA registry for
        COMPOSED uniques (depth >= 2) directly from the DB's structural
        triples, in uid order, without re-parsing a single expression.
        Depth-1 rows must already be registered via :meth:`add_unique`
        (they carry tapes).  ``op_ids`` use the ALL_SURFACE_OPS order —
        the same table the forward path stores (u_op / struct_op).

        Returns the first assigned uid."""
        n = int(op_ids.size)
        uid0 = self._next_uid
        self._next_uid += n
        while self._next_uid > self._cap:
            self._grow_flags()
        sl = slice(uid0, uid0 + n)
        self.u_op[sl] = op_ids.astype(np.int16)
        self.u_a[sl] = a_u
        self.u_b[sl] = b_u
        self.u_depth[sl] = depths.astype(np.int16)
        for d in np.unique(depths).tolist():
            uids = uid0 + np.nonzero(depths == d)[0].astype(np.int32)
            self._append_uid_chunk(int(d), uids)

        # flags, level by level (parents are strictly shallower, so each
        # depth's flags depend only on already-assigned entries)
        inv_id = self._op_ids.get("inv", -2)
        addsub = {self._op_ids.get("add", -2), self._op_ids.get("sub", -2)}
        for d in sorted(np.unique(depths).tolist()):
            m = depths == d
            uids = uid0 + np.nonzero(m)[0]
            a = a_u[m]
            b = b_u[m]
            hv = self.f_has_var[a]
            has_b = b >= 0
            hv = hv | (has_b & self.f_has_var[np.where(has_b, b, 0)])
            self.f_has_var[uids] = hv
            self.f_is_one[uids] = False
            self.f_top_inv[uids] = op_ids[m] == inv_id
            coord = (np.isin(op_ids[m], list(addsub)) & has_b
                     & self.f_is_coord[a]
                     & self.f_is_coord[np.where(has_b, b, 0)]
                     & (self.u_depth[a] == 1)
                     & (self.u_depth[np.where(has_b, b, 0)] == 1)
                     & (a != b))
            self.f_is_coord[uids] = coord
            if coord.any():
                self._coordinate_uids.update(
                    uids[np.nonzero(coord)[0]].tolist())

        if exprs is None:
            # caller composes the strings itself (see
            # register_from_struct_compose); Python lists get placeholders,
            # the arena is left untouched for the caller's appends
            _extend_none(self.expr_strs, n)
            _extend_none(self.wrapped_strs, n)
        elif self.arena is not None:
            CHUNK = 1 << 20
            for lo in range(0, n, CHUNK):
                self.arena.add_raw(exprs[lo:lo + CHUNK])
            _extend_none(self.expr_strs, n)
            _extend_none(self.wrapped_strs, n)
        else:
            self.expr_strs.extend(exprs)
            # composed spellings are self-wrapped (see add_uniques_bulk)
            self.wrapped_strs.extend(exprs)
        return uid0

    def register_from_struct_compose(self, op_ids: np.ndarray,
                                     a_u: np.ndarray, b_u: np.ndarray,
                                     depths: np.ndarray) -> int:
        """Array-speed resume registration WITHOUT stored expression
        strings: rebuild the SoA registry from structural triples (as
        :meth:`register_from_struct`) and REGENERATE every display string
        by re-running the forward composition (parent wrapped forms +
        per-op format), level by level in uid order.

        This is the resume path for the registry sidecar
        (runtime.DiscoveryRun._save_registry_sidecar): mega-runs with
        ``audit_rejects=False`` persist no reject rows, so the strings
        are not in the DB — but composition is deterministic, so
        rebuilding from structure reproduces them byte-for-byte (asserted
        in tests/test_runtime_db.py).  Composition is batched over
        consecutive same-op uid runs (the forward path registers per-op
        segments, so runs are long).

        Returns the first assigned uid."""
        n = int(op_ids.size)
        if n == 0:
            return self._next_uid
        uid0 = self.register_from_struct(op_ids, a_u, b_u, depths,
                                         exprs=None)
        # run-length segments of consecutive equal op ids
        bounds = np.flatnonzero(np.diff(op_ids)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [n]))
        for lo, hi in zip(starts.tolist(), ends.tolist()):
            name = self._op_names[int(op_ids[lo])]
            seg_a = a_u[lo:hi]
            seg_b = b_u[lo:hi]
            unary = bool(seg_b[0] < 0)
            if self.arena is not None:
                self._arena_compose_segment(name, seg_a, seg_b, unary)
                continue
            es = self.expr_strs
            ws = self.wrapped_strs
            if unary:
                pre = name + "("
                exprs = [pre + es[i] + ")" for i in seg_a.tolist()]
            else:
                fmt = ot.SURFACE_FORMAT.get(name)
                if fmt:
                    p1, rest = fmt.split("{a}")
                    mid, p2 = rest.split("{b}")
                    exprs = [p1 + ws[i] + mid + ws[j] + p2
                             for i, j in zip(seg_a.tolist(),
                                             seg_b.tolist())]
                else:
                    pre = name + "("
                    exprs = [pre + es[i] + ", " + es[j] + ")"
                             for i, j in zip(seg_a.tolist(),
                                             seg_b.tolist())]
            for k, s in enumerate(exprs):
                es[uid0 + lo + k] = s
                ws[uid0 + lo + k] = s  # composed spellings self-wrap
        return uid0

    def _arena_compose_segment(self, name: str, seg_a: np.ndarray,
                               seg_b: np.ndarray, unary: bool):
        """Append one same-op segment of composed display strings to the
        native arena (parents' bytes are read in C; appends must arrive
        in uid order)."""
        if unary:
            self.arena.add_bulk(name + "(", None, ")", seg_a, None)
            return
        fmt = ot.SURFACE_FORMAT.get(name)
        if fmt:
            p1, rest = fmt.split("{a}")
            mid, p2 = rest.split("{b}")
            self.arena.add_bulk(p1, mid, p2, seg_a, seg_b,
                                use_wrapped=True)
        else:
            self.arena.add_bulk(name + "(", ", ", ")", seg_a, seg_b)

    def _drop_arena(self):
        """Abandon the native string arena: materialize every arena-backed
        string into plain Python lists, then continue on the Python path."""
        arena = self.arena
        self.arena = None
        if isinstance(self.expr_strs, SparseStrList):
            self.expr_strs = self.expr_strs.to_list()
            self.wrapped_strs = self.wrapped_strs.to_list()
        for uid in range(self._next_uid):
            if self.expr_strs[uid] is None and uid < len(arena):
                s = arena.get(uid)
                self.expr_strs[uid] = s
                self.wrapped_strs[uid] = wrap_operand(s)

    def _ensure_strings(self, below_depth: int):
        # arena tail repair first: depths registered with
        # arena_strings=False left the arena short of the registry; appends
        # must stay uid-aligned, so rebuild the whole contiguous tail in
        # uid order before any new composition reads parent bytes.  The
        # tail holds composed uniques only (depth-1 registration always
        # writes its string), so rebuild via the same batched same-op
        # segment composition the forward path uses — per-uid recursive
        # expr_str_of over a mega-run tail would take hours (round-3
        # review finding).
        if self.arena is not None and len(self.arena) < self._next_uid:
            lo0 = len(self.arena)
            hi0 = self._next_uid
            ops = self.u_op[lo0:hi0]
            a_all = np.ascontiguousarray(self.u_a[lo0:hi0], np.int32)
            b_all = np.ascontiguousarray(self.u_b[lo0:hi0], np.int32)
            bounds = np.flatnonzero(np.diff(ops)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [hi0 - lo0]))
            for lo, hi in zip(starts.tolist(), ends.tolist()):
                name = self._op_names[int(ops[lo])]
                self._arena_compose_segment(
                    name, a_all[lo:hi], b_all[lo:hi],
                    unary=bool(b_all[lo] < 0))
        for d in sorted(self._dropped_string_depths):
            if d >= below_depth:
                continue
            if self.arena is None:
                for uid in self.uid_array(d).tolist():
                    if self.expr_strs[uid] is None:
                        s = self.expr_str_of(uid)
                        self.expr_strs[uid] = s
                        self.wrapped_strs[uid] = wrap_operand(s)
            self._dropped_string_depths.discard(d)

    def _append_uid_chunk(self, depth: int, chunk: np.ndarray):
        self._uid_chunks.setdefault(depth, []).append(chunk)
        self._uid_arr_cache.pop(depth, None)

    def uid_array(self, depth: int) -> np.ndarray:
        arr = self._uid_arr_cache.get(depth)
        if arr is None:
            chunks = self._uid_chunks.get(depth, [])
            arr = (np.concatenate(chunks) if chunks
                   else np.empty(0, np.int32))
            self._uid_arr_cache[depth] = arr
        return arr

    def expr_str_of(self, uid: int) -> str:
        s = self.expr_strs[uid]
        if s is not None:
            return s
        if self.arena is not None and uid < len(self.arena):
            return self.arena.get(uid)
        # dropped string (retain_strings=False): rebuild from structure
        op = self._op_names[int(self.u_op[uid])]
        a = int(self.u_a[uid])
        b = int(self.u_b[uid])
        if b < 0:
            return f"{op}({self.expr_str_of(a)})"
        fmt = ot.SURFACE_FORMAT.get(op)
        aw = wrap_operand(self.expr_str_of(a))
        bw = wrap_operand(self.expr_str_of(b))
        if fmt:
            return fmt.format(a=aw, b=bw)
        return f"{op}({self.expr_str_of(a)}, {self.expr_str_of(b)})"

    # ------------------------------------------------------------------
    # Batch tape materialization (native C when available)
    # ------------------------------------------------------------------

    def _tape_builder(self):
        """Lazy native TapeBuilder; False sentinel = unavailable."""
        tb = getattr(self, "_tb", None)
        d1 = self.uid_array(1)
        if tb is not None and tb is not False and \
                tb._n_leaves == int(d1.size):
            return tb
        if getattr(self, "allow_native_tapes", True) is False:
            return None
        try:
            from .utils.native import TapeBuilder, load_core
            if load_core() is None:
                self._tb = False
                return None
            if not (d1.size and np.array_equal(
                    d1, np.arange(d1.size, dtype=d1.dtype))):
                self._tb = False
                return None
            leaf_tapes = [self.unique_at(int(u)).tape for u in d1]
            from fractions import Fraction
            one_idx = self.problem.consts.intern(Fraction(1))
            self._tb = TapeBuilder(self._op_names, leaf_tapes, one_idx)
        except Exception:
            self._tb = False
            return None
        return self._tb

    def tapes_batch(self, uids) -> Tuple[np.ndarray, np.ndarray]:
        """Materialize padded tapes for ``uids``: ([n, L, 3] int32 with
        NOP padding, lengths int64[n]).  C fast path (tm_build_batch),
        Python composition fallback — byte-identical by construction
        (asserted in tests/test_native.py)."""
        uids = np.asarray(uids, dtype=np.int64)
        tb = self._tape_builder()
        if tb is not None:
            max_len = 64
            while max_len <= 8192:
                res = tb.build_batch(self.u_op, self.u_a, self.u_b,
                                     uids, max_len)
                if res is not None:
                    arr, lens = res
                    L = int(lens.max()) if lens.size else 1
                    return np.ascontiguousarray(arr[:, :L]), lens
                max_len *= 4
        tapes = [self.unique_at(int(u)).tape for u in uids]
        L = max((len(t) for t in tapes), default=1)
        arr = np.stack([t.padded(L) for t in tapes]) if tapes else \
            np.zeros((0, L, 3), np.int32)
        lens = np.array([len(t) for t in tapes], np.int64)
        return arr, lens

    def tape_of(self, uid: int) -> Tape:
        arr, lens = self.tapes_batch(np.array([uid], np.int64))
        return Tape(arr[0, :int(lens[0])])

    def unique_at(self, uid: int) -> Unique:
        """Materialize the Unique object for a uid (lazy; recursion
        materializes the ancestor DAG, shared across children)."""
        u = self._objs.get(uid)
        if u is not None:
            return u
        op = self._op_names[int(self.u_op[uid])]
        a = self.unique_at(int(self.u_a[uid]))
        bi = int(self.u_b[uid])
        b = self.unique_at(bi) if bi >= 0 else None
        cand = Candidate(
            depth=int(self.u_depth[uid]), expr_str=self.expr_str_of(uid),
            top_op=op, has_var=bool(self.f_has_var[uid]),
            is_one=bool(self.f_is_one[uid]), op_name=op, a=a, b=b,
            consts=self.problem.consts)
        u = Unique(cand, uid)
        self._objs[uid] = u
        return u

    def all_uniques(self) -> List[Unique]:
        return [self.unique_at(i) for i in range(self._next_uid)]

    def _grow_flags(self):
        from .utils.native import hugepage_array
        new_cap = self._cap * 2
        while new_cap <= self._next_uid:
            new_cap *= 2
        for name, fill in (("f_has_var", False), ("f_is_one", False),
                           ("f_top_inv", False), ("f_is_coord", False),
                           ("u_op", -1), ("u_a", -1), ("u_b", -1),
                           ("u_depth", 0)):
            arr = getattr(self, name)
            # 2 MiB-page-backed, pre-faulted allocation: a plain
            # np.concatenate doubling faults every fresh 4 KiB page,
            # which on slow-fault virtualized hosts was 43 s of a
            # laplace depth-6 register stage (PDE_INGEST_TIMERS)
            grown = hugepage_array(new_cap, arr.dtype, fill)
            grown[:self._cap] = arr
            setattr(self, name, grown)
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
        for uid in self.uid_array(depth - 1).tolist():
            u = self.unique_at(uid)
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
            left_set = [self.unique_at(i)
                        for i in self.uid_array(d1).tolist()]
            right_set = [self.unique_at(i)
                         for i in self.uid_array(d2).tolist()]
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
    def vector_batches_at_depth(self, depth: int, batch_size: int,
                                max_parent_uid: Optional[int] = None
                                ) -> Iterator[Tuple[str, np.ndarray,
                                                    Optional[np.ndarray]]]:
        """Array-level candidate generation (no Python objects, no strings):
        yields structurally deduplicated ``(op_name, a_uids, b_uids)``
        batches.  Same candidate SET and prune rules as
        :meth:`candidates_at_depth` (same commutative canonicalization);
        the 10^5-10^8 per-depth candidate streams never touch
        Python-per-candidate code.

        Emission order within a depth: every FULL ``batch_size``-aligned
        chunk streams in block order first; every sub-``batch_size`` tail
        is deferred to the end of ITS (d1, d2) block.  Full chunks then
        keep the pipeline's mixed superbatch buffer at exact-SUPER fill
        (no padding flush when a structured-dispatch run begins —
        pipeline.structured_run_kind), and the tails pack densely into
        the block's final superbatches.  Tails flush per BLOCK, not per
        depth: a mid-depth (d, d') block whose runs are all shorter than
        batch_size (e.g. a (3, 4) block with an 82k-unique deep side
        under a 262k batch) would otherwise have its ENTIRE content
        pushed to the depth's end, defeating the smallest-block-first
        anytime order below.  The cost is one possibly-padded mixed
        flush per block boundary (~10 per depth); the gain is that the
        stream position of every candidate tracks its block's position.
        Within-depth order only needs to be deterministic: parents all
        live at depths < d, so the candidate set is order-invariant, and
        resume checkpoints at depth barriers.

        ``max_parent_uid`` bounds the parent window to uids whose jets are
        device-resident (the single-chip HBM budget,
        SearchConfig.max_cache_rows); uniques beyond it are screened and
        stored but never composed deeper on this chip.
        """
        assert depth >= 2
        prune = self.prune
        if max_parent_uid is None:
            uid_arr = self.uid_array
        else:
            cap = max_parent_uid

            def uid_arr(d, _base=self.uid_array, _cap=cap):
                arr = _base(d)
                return arr[arr < _cap] if arr.size and arr[-1] >= _cap \
                    else arr

        deferred: List[Tuple[str, np.ndarray, Optional[np.ndarray]]] = []

        def chunks(name, a, b):
            n_full = (a.size // batch_size) * batch_size
            for i in range(0, n_full, batch_size):
                yield (name, a[i:i + batch_size],
                       None if b is None else b[i:i + batch_size])
            if a.size > n_full:
                deferred.append((name, a[n_full:],
                                 None if b is None else b[n_full:]))

        def flush_tails():
            out = list(deferred)
            deferred.clear()
            return out

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
            yield from flush_tails()

        # binary over (d1, d2) blocks, SMALLEST block first (by |A|*|B|,
        # d1 ascending on ties).  Anytime-search property: a depth-d
        # stream is dominated by its (shallow, d-1) blocks — at mega
        # scale 90%+ of the candidates pair a handful of primitives with
        # the newest depth's millions of uniques — while the structurally
        # diverse (mid, mid) combinations are orders of magnitude
        # smaller.  Emitting small blocks first means a bounded or
        # cleanly-aborted deep run has already searched every
        # shallow-parent combination (where textbook solutions live —
        # e.g. GS Solovev = sub(depth-3 rho**4, depth-4 4*rho**2*z**2))
        # before the giant blocks start.  The candidate SET is order-
        # invariant (tests/test_incremental.py pins it against the
        # object path) and so are the dedup keys (grid-snapped
        # fingerprints, tests/test_fp_snap.py); within-depth order only
        # needs to be deterministic (resume checkpoints at depth
        # barriers).
        blocks = []
        for d1 in range(1, depth):
            d2 = depth - d1
            A, B = uid_arr(d1), uid_arr(d2)
            if not A.size or not B.size:
                continue
            blocks.append((int(A.size) * int(B.size), d1, d2, A, B))
        blocks.sort(key=lambda t: (t[0], t[1]))
        for _, d1, d2, A, B in blocks:
            if d1 != d2:
                yield from self._cross_depth_batches(
                    A, B, d1, d2, batch_size, prune, chunks)
                yield from flush_tails()
                continue
            if d1 >= 2:
                yield from self._same_depth_batches(A, prune, chunks)
                yield from flush_tails()
                continue
            a = np.repeat(A, B.size)
            b = np.tile(B, A.size)
            var = (self.f_has_var[a] | self.f_has_var[b]) if prune else \
                np.ones(a.size, np.bool_)
            for name, _ in self.binary:
                commutative = name in ("add", "mul")
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
                if commutative and sa.size:
                    # swapped duplicates exist only within a same-depth
                    # block; keep first occurrences in enumeration order
                    key = sa.astype(np.int64) << 32 | sb.astype(np.int64)
                    _, fi = np.unique(key, return_index=True)
                    fi.sort()
                    sa, sb = sa[fi], sb[fi]
                yield from chunks(name, sa, sb)
            yield from flush_tails()

        # safety net: flush_tails() after each segment should leave
        # nothing here
        yield from deferred

    def _same_depth_batches(self, A, prune, chunk_fn):
        """Binary candidates of a same-depth ``(d, d)`` block with d >= 2,
        emitted ONE RUN AT A TIME so chunk boundaries coincide with run
        boundaries and the block rides the structured-dispatch gather
        bypass (pipeline.structured_run_kind) instead of the mixed
        row-gather path — same-depth blocks are ~16% of a depth-6
        stream.  The flat repeat/tile emission survives only for the
        tiny d == 1 block, where depth-1 constants make the var mask
        real.

        At d >= 2 the flat path's masks collapse to pure run structure:
        every depth>=2 unique structurally contains a variable
        (constant-only composites are pruned at creation, so
        ``has_var[a] | has_var[b]`` is always true) and none is the
        primitive "1" (``f_is_one`` is set False for all composites), so

        - add/mul: unordered pairs with repetition, canonical min-uid
          first ⇒ run ``(A[i], A[i:])`` — identical pairs in identical
          first-occurrence order to the flat swap+unique path;
        - sub/div: ordered pairs, a != b ⇒ two contiguous pieces around
          the diagonal hole, ``(A[i], A[:i])`` and ``(A[i], A[i+1:])``;
        - geom_sum (and everything when prune is off): all ordered
          pairs ⇒ run ``(A[i], A)``;
        - sqrt_shift_*: coordinate-like × coordinate-like — a tiny
          cross product (only depth-2 rho±z composites qualify beyond
          depth 1), emitted flat.

        Candidate SET identical to the flat path (pinned at depth 4 by
        tests/test_incremental.py); only within-depth emission order
        changes, which the depth-barrier contract allows (parents all
        live at shallower depths)."""
        def const_runs(name, s, brange):
            if brange.size:
                const = np.broadcast_to(np.asarray(s, A.dtype)[None],
                                        brange.shape)
                yield from chunk_fn(name, const, brange)

        for name, _ in self.binary:
            if prune and name in ("sqrt_shift_neg", "sqrt_shift_pos"):
                sel = A[self.f_is_coord[A]]
                if sel.size:
                    yield from chunk_fn(name, np.repeat(sel, sel.size),
                                        np.tile(sel, sel.size))
                continue
            commutative = name in ("add", "mul")
            exclude_diag = prune and name in ("sub", "div")
            for i, s in enumerate(A.tolist()):
                if commutative:
                    yield from const_runs(name, s, A[i:])
                elif exclude_diag:
                    yield from const_runs(name, s, A[:i])
                    yield from const_runs(name, s, A[i + 1:])
                else:
                    yield from const_runs(name, s, A)

    def _cross_depth_batches(self, A, B, d1, d2, batch_size, prune,
                             chunk_fn):
        """Binary candidates of a cross-depth (d1 != d2) block, emitted
        ONE RUN AT A TIME: the shallow side is a per-run constant and the
        deep side streams as the full contiguous uid range.  Chunk
        boundaries then coincide with run boundaries, which is what the
        structured-dispatch gather bypass keys on
        (pipeline.structured_run_kind) — the earlier concatenate-then-
        chunk emission misaligned all but ~1/run.  ``chunk_fn`` is the
        caller's full-chunks-now / tails-at-depth-end emitter.

        Prune semantics match the same-depth path exactly:
        - var: every depth>=2 unique structurally contains a variable
          (constant-only operands are pruned at creation), and the deep
          side is depth>=2, so ``has_var[a] | has_var[b]`` is always
          true here;
        - a != b (sub/div): automatic across different depths;
        - is_one: only the depth-1 primitive "1" exists (so only the
          shallow side can trip it — skip the whole run);
        - sqrt_shift: both operands must be coordinate-LIKE, which
          includes the depth-2 composites rho±z (f_is_coord — the
          reference's operand set {rho, z, rho±z},
          lean_bridge_fixed.py:217-219), so (1,2)/(2,1) blocks emit a
          small coord×coord cross product here; deeper blocks have no
          coord operands on the deep side and emit nothing."""
        small, big = (A, B) if d1 < d2 else (B, A)
        small_is_a = d1 < d2

        def run_chunks(name, s):
            # zero-stride constant view: full-chunk and deferred-tail
            # slices stay O(1) memory however large the run is
            const = np.broadcast_to(np.asarray(s, big.dtype)[None],
                                    big.shape)
            if small_is_a:
                yield from chunk_fn(name, const, big)
            else:
                yield from chunk_fn(name, big, const)

        for name, _ in self.binary:
            commutative = name in ("add", "mul")
            if commutative and d1 > d2:
                continue  # block fully redundant with (d2, d1)
            if prune and name in ("sqrt_shift_neg", "sqrt_shift_pos"):
                sc = small[self.f_is_coord[small]]
                bc = big[self.f_is_coord[big]]
                if sc.size and bc.size:
                    a_c = np.repeat(sc, bc.size)
                    b_c = np.tile(bc, sc.size)
                    if not small_is_a:
                        a_c, b_c = b_c, a_c
                    yield from chunk_fn(name, a_c, b_c)
                continue
            for s in small.tolist():
                if prune:
                    if name == "mul" and self.f_is_one[s]:
                        continue
                    if (name in ("div", "geom_sum") and not small_is_a
                            and self.f_is_one[s]):
                        continue
                yield from run_chunks(name, s)

    def count_uniques(self) -> int:
        return self._next_uid
