"""Discovery pipeline: enumerate → screen/fingerprint on device → dedup →
float64 recheck → symbolic confirm → (optional) heavy checks.

This is the runtime that replaces the reference's orchestrator + process pool
(GeneralFoliationDiscovery.run_parallel_discovery,
general_method_paper_reproduction.py:749-904).  There are no queues and no
worker processes: the depth barrier is the natural synchronization point, and
within a depth candidate batches stream through fused device kernels.

Two device paths:
- **incremental** (default): every unique expression's jets live in a
  device-resident JetCache; a candidate batch is one gather + one surface-op
  application (parallel/incremental.py).  ~50x the tape path's throughput.
- **tape**: the general interpreter (parallel/search.py) — used for depth-1
  primitives, known solutions, resume seeding, and as a fallback
  (config.engine = "tape").

Validation funnel (preserves the reference's staged semantics, §3.3-3.4 of
SURVEY.md, while fixing its treat-unevaluable-as-zero defect):

  stage 0  f32 on-device screen at P collocation points
           non-finite residual ⇒ reject;   rel > screen_rtol ⇒ reject
  stage 1  fingerprint dedup (on-device hashes; host keeps the fp → uid map)
  stage 2  float64 host recheck of screen survivors (NumPy oracle)
  stage 3  SymPy exact-zero confirm (the reference's "exact zero" semantics;
           deferred to --verify-pde by default, like the reference's
           fast_point_only discovery path)
  stage 4  heavy checks (regularity/finiteness/anchor), deferred by default
           exactly like the reference's defer_heavy_checks fast path
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from .enumerator import Candidate, Enumerator
from .models.base import Problem
from .ops.interpreter import eval_jets_np
from .ops.jets import n_coeffs
from .parallel.incremental import JetCache, make_op_kernel, make_select_kernel
from .parallel.search import ScreenResult
from .utils.config import SearchConfig
from .utils.hashing import (FP_MASK, STRUCT_TAG, op_salt, stable_hash64,
                            struct_key_for_expr)


# A candidate counts as constant in the f64 oracle when its gradient
# coefficients are below 1e-12 of its value magnitude at EVERY collocation
# point — exact zeros (true constants) and cancellation noise ~1e-16
# (constants-in-disguise like (z*(rho/z))/rho, whose composed tape keeps a
# tiny nonzero gradient) both fall under it, while genuinely steep-decay
# solutions (gradient comparable to value) sit orders of magnitude above.
_CONST64_RTOL = 1e-12


def _is_contiguous_run(x: np.ndarray) -> bool:
    return (int(x[-1]) - int(x[0]) == x.size - 1
            and bool((np.diff(x) == 1).all()))


def structured_run_kind(a_u: np.ndarray, b_u: Optional[np.ndarray],
                        pos: int, n: int) -> Optional[str]:
    """Classify the ``[pos, pos+n)`` slice of an op segment for the
    structured-dispatch gather bypass (make_pallas_structured_kernel).

    Returns "b" when ``a`` is constant and ``b`` a contiguous uid range,
    "a" when ``b`` is constant (or the op is unary) and ``a`` contiguous,
    else None.  The enumerator's repeat/tile block structure
    (vector_batches_at_depth) makes these the dominant cases at depth ≥ 4;
    endpoint checks short-circuit the full scans."""
    a = a_u[pos:pos + n]
    if b_u is None:
        return "a" if _is_contiguous_run(a) else None
    b = b_u[pos:pos + n]
    if a[0] == a[-1]:
        if _is_contiguous_run(b) and not (a != a[0]).any():
            return "b"
    elif b[0] == b[-1]:
        if _is_contiguous_run(a) and not (b != b[0]).any():
            return "a"
    return None


def _const_in_f64_batch(jets: np.ndarray) -> np.ndarray:
    """Per-candidate constant flag for [N, P, T] float64 jets.

    Fully relative (grad vs value magnitude, no absolute floor): an
    expression whose value AND gradient are both uniformly tiny — extreme
    steep-decay forms like rho**2*exp(-100*z) — must be judged on its
    residual, not classified constant by an absolute 1e-12 cutoff
    (ADVICE.md round 2).  The all-zero case falls out: grad 0 <= 0."""
    grad = np.abs(jets[..., 1:3]).max(axis=(-1, -2))
    mag = np.abs(jets[..., 0]).max(axis=-1)
    return grad <= _CONST64_RTOL * mag


def _const_in_f64(jets: np.ndarray) -> bool:
    return bool(_const_in_f64_batch(jets[None])[0])


@dataclass(slots=True)
class Row:
    """One stored expression — column parity with the reference's
    expressions_<run_id> table (general:655-678)."""
    id: int
    expression: str
    # None on reject rows (normalized == expression by construction here;
    # NULL saves ~25% of the sqlite-bound mega-run reject volume)
    normalized: Optional[str]
    signature: str
    depth: int
    validation_status: str = "completed"
    is_valid: bool = False
    validation_reason: str = ""
    validator_method: str = ""
    is_paper_solution: bool = False
    paper_solution_name: Optional[str] = None
    heavy_is_valid: Optional[bool] = None
    heavy_reason: Optional[str] = None
    # per-row audit trail (reference persisted an evidence JSON per
    # expression, general:1330-1335, kerr validator.py:296-306)
    validator_math: str = ""
    validator_evidence: str = ""
    # structural triple (nullable): op id + parent uids — resume rebuilds
    # the registry from these at array speed instead of re-parsing
    struct_op: Optional[int] = None
    struct_a: Optional[int] = None
    struct_b: Optional[int] = None


@dataclass
class DepthStats:
    depth: int
    candidates: int = 0
    unique: int = 0
    valid: int = 0
    seconds: float = 0.0
    # stage timers (observability; the reference only had wall-clock
    # SLOW-VALIDATION logging, general:1296-1323)
    t_enum: float = 0.0       # host candidate generation
    t_device: float = 0.0     # kernel dispatch + result transfer
    t_ingest: float = 0.0     # dedup + verdicts + rows
    t_gray: float = 0.0       # batched f64 rechecks


# Fine-grained ingest sub-timers (PDE_INGEST_TIMERS=1): wall per section of
# _ingest_vec, printed by the runtime after each depth.  Diagnostic only.
_INGEST_TIMERS: Dict[str, float] = {}
_TIME_INGEST = bool(os.environ.get("PDE_INGEST_TIMERS"))


class _Section:
    __slots__ = ("key", "t0")

    def __init__(self, key: str):
        self.key = key

    def __enter__(self):
        if _TIME_INGEST:
            self.t0 = time.perf_counter()

    def __exit__(self, *exc):
        if _TIME_INGEST:
            _INGEST_TIMERS[self.key] = (
                _INGEST_TIMERS.get(self.key, 0.0)
                + time.perf_counter() - self.t0)


class _Passer:
    """Lazy stand-in for a screen passer's Unique: the tape and display
    string materialize on demand (native C tape builder / structural
    string rebuild) instead of recursively constructing the whole
    ancestor object graph per passer (~100-150 µs each — PERF roadmap
    #3)."""

    __slots__ = ("uid", "_enum", "_tape", "_expr")

    def __init__(self, enum: Enumerator, uid: int):
        self.uid = uid
        self._enum = enum
        self._tape = None
        self._expr = None

    @property
    def tape(self):
        if self._tape is None:
            self._tape = self._enum.tape_of(self.uid)
        return self._tape

    @property
    def expr_str(self) -> str:
        if self._expr is None:
            self._expr = self._enum.expr_str_of(self.uid)
        return self._expr

    @property
    def has_var(self) -> bool:
        return bool(self._enum.f_has_var[self.uid])


class DiscoveryEngine:

    def __init__(self, problem: Problem, config: Optional[SearchConfig] = None,
                 mesh=None):
        from .utils.compile_cache import enable_compile_cache
        from .utils.hostmem import tune_allocator
        enable_compile_cache()
        tune_allocator()
        import jax.numpy as jnp
        self.problem = problem
        self.config = config or SearchConfig()
        self.mesh = mesh
        self.enumerator = Enumerator(
            problem,
            include_special_ops=self.config.include_special_ops,
            prune=self.config.prune,
            spill_dir=self.config.spill_strings)
        if self.config.spill_strings is not None:
            if self.enumerator.arena is None:
                # the native core failed to load entirely — without this
                # notice --spill-strings is silently ignored (ADVICE.md
                # round 3) and a mega-run would hit the Python string
                # path's RAM ceiling unannounced
                print("  [mem] --spill-strings ignored: native string "
                      "arena unavailable (C core not loaded); strings "
                      "stay on the Python path", flush=True)
            elif not self.enumerator.arena.spilled:
                print(f"  [mem] string-arena spill to "
                      f"{self.config.spill_strings} unavailable; strings "
                      "stay in RAM", flush=True)
        if self.config.use_native is False:
            self.enumerator.arena = None  # exercise the Python string path
            self.enumerator.allow_native_tapes = False
        self.screen_rtol = (self.config.screen_rtol
                            if self.config.screen_rtol is not None
                            else problem.screen_rtol)
        self.confirm_rtol = (self.config.confirm_rtol
                             if self.config.confirm_rtol is not None
                             else problem.confirm_rtol)
        # uint64 dedup-key -> uid map.  Native open-addressing map when the
        # C++ core is available (csrc/ingest_core.cpp — ~5x faster inserts
        # and ~10x less RAM than a dict at mega-run scale), else a dict
        # behind the same interface.
        from .utils.native import DedupMap
        import jax as _jx
        if self.config.batch_size is None:
            # auto (SearchConfig.batch_size): large batches amortize the
            # per-dispatch round trip on real accelerators; small ones
            # keep the CPU/test path snappy.  262144 is the production
            # superbatch every recorded mega-run and bench.py use — and
            # the shape whose kernel executables the persistent compile
            # cache already holds (a FRESH shape costs a 300-400 s
            # remote Mosaic compile per kernel on the tunneled chip;
            # that is why shapes are quantized at all)
            self.config.batch_size = (262144 if _jx.default_backend()
                                      != "cpu" else 16384)
        self.fp_to_uid = DedupMap(
            force_python=(self.config.use_native is False),
            # pre-size for mega-runs on real hardware: every rehash of a
            # multi-GB open-addressing table re-probes all keys (was 30+ s
            # of depth-5 dedup); 2^26 slots = 1 GB covers ~44M uniques at
            # the 2/3 load factor
            cap_hint=(1 << 26) if _jx.default_backend() != "cpu"
            else (1 << 16))
        # Host-registry sharding (SearchConfig.shard_registry): in a
        # multi-process run each host's dedup map holds only the keys it
        # owns (key mod world), and verdict persistence (strings, reject
        # rows, gray f64 rechecks) runs only on the writer host — the
        # non-writers' job is keeping the replicated SoA registry and the
        # device cache in lockstep.
        self._reg_rank, self._reg_world = 0, 1
        self.persist_host = True
        if self.config.shard_registry and mesh is not None:
            from .parallel.distributed import is_writer, registry_shard
            self._reg_rank, self._reg_world = registry_shard()
            if self._reg_world > 1:
                self.persist_host = is_writer()
        # reject-row sink writing straight into the run DB via the native
        # sqlite writer; set by DiscoveryRun when a run DB exists
        self.native_sink = None
        # rows are kept in memory only when no sink callback is given
        # (standalone/test use); production streams them to the run DB and
        # keeps counters + valid rows (a 10^7-row mega-run cannot hold
        # every Row object)
        self.rows: List[Row] = []
        self.n_rows = 0
        self.last_expr = ""
        self._keep_rows = True
        # row id = uid + 1 + id_offset; the offset stays 0 except when a
        # resume couldn't re-register every stored row (ids must never
        # collide with stored ones — INSERT OR IGNORE would drop the row)
        self.id_offset = 0
        self.stats: List[DepthStats] = []
        self.valid_rows: List[Row] = []
        self._spoints = jnp.asarray(problem.screen_points, jnp.float32)
        self._fpoints = jnp.asarray(problem.fingerprint_points, jnp.float32)
        # On a real accelerator, start the jet cache big enough that a
        # depth-4 run never reallocates: every distinct capacity is a new
        # operand shape for the op kernel, and each shape costs a
        # multi-second executable load through the tunnel (even with the
        # persistent compile cache).  ~550 B/row ⇒ 1M rows ≈ 0.55 GB HBM.
        import jax as _jax
        on_accel = _jax.default_backend() not in ("cpu",)
        # uid-range cache sharding (SearchConfig.shard_cache): the cache
        # arrays live SPLIT across the mesh (chip d holds rows
        # [d*C/K, (d+1)*C/K)) and _op_kernel routes onto the uid-range
        # kernel, so the parent window scales to mesh_size *
        # max_cache_rows with no truncation
        self._cache_sharded = bool(self.config.shard_cache
                                   and mesh is not None)
        if self.config.shard_cache and mesh is None:
            raise ValueError("shard_cache requires a mesh "
                             "(--devices N / DiscoveryEngine(mesh=...))")
        if self._cache_sharded and _jax.process_count() > 1:
            raise ValueError("shard_cache + multihost is not supported "
                             "yet; use --shard-registry for multi-host "
                             "memory scaling")
        cache_sharding = None
        if self._cache_sharded:
            from .parallel.mesh import shard_batch
            cache_sharding = shard_batch(mesh)
        # the parent-window budget is per chip; a sharded cache holds
        # mesh_size slices of that size
        mcr = self.config.max_cache_rows
        if mcr is None:
            # auto (SearchConfig.max_cache_rows): fixed ~11 GiB HBM
            # budget divided by the family's actual jet-row bytes, so
            # order-2 problems get ~2x the order-4 parent window
            row_bytes = 4 * (
                len(problem.screen_points) * n_coeffs(problem.residual_order)
                + len(problem.fingerprint_points) * 3)
            mcr = max(1 << 20, (20_000_000 * 552) // row_bytes)
        self.cache_row_limit = mcr * (
            int(mesh.devices.size) if self._cache_sharded else 1)
        self.cache = JetCache(
            n_screen=len(problem.screen_points),
            t_screen=n_coeffs(problem.residual_order),
            n_fp=len(problem.fingerprint_points),
            initial_capacity=(1 << 20) if on_accel else (1 << 14),
            grow_quantum=(1 << 20) if on_accel else None,
            sharding=cache_sharding)
        self.cache.row_limit = self.cache_row_limit
        self._known_fp: Dict[str, np.ndarray] = {}
        self._known_sympy = {}
        self.candidates_screened = 0
        self.structured_dispatches = 0  # full-run gather-bypass batches
        self.tiled_dispatches = 0       # per-tile gather-bypass batches
        self.device_seconds = 0.0
        self.errors = 0  # host-side validation errors (reference counted
        #                  per-worker errors, general:1139-1151)
        self._gray: List[Tuple[Candidate, dict, int]] = []
        # one overlap worker for the gray f64 numerics (see _gray_numeric)
        from concurrent.futures import ThreadPoolExecutor
        self._gray_pool = ThreadPoolExecutor(max_workers=1)
        self._gray_done: List = []
        self._math_def = problem.describe().get("math_definition", "")
        self._prepare_known_solutions()

    # ------------------------------------------------------------------
    # Device evaluation
    # ------------------------------------------------------------------

    def _bucket_len(self, L: int) -> int:
        for b in self.config.buckets:
            if L <= b:
                return b
        # beyond the ladder (e.g. resume re-parsing a sympify-normalized
        # mega-run expression): extend to the next power of two instead of
        # crashing the resume (ADVICE.md round 1, runtime.py:226)
        return 1 << (L - 1).bit_length()

    def _use_pallas(self) -> bool:
        if self.config.use_pallas is not None:
            return self.config.use_pallas
        import jax
        return jax.default_backend() != "cpu"

    def _op_kernel(self, op_name: str):
        kw = dict(
            order=self.problem.residual_order,
            residual_key=self.problem.get_residual_key(),
            screen_rtol=float(self.screen_rtol),
            n_screen=len(self.problem.screen_points),
            n_fp=len(self.problem.fingerprint_points))
        if self.mesh is not None:
            import jax
            if jax.process_count() > 1:
                # multi-host: all-gather verdicts + jets so every host
                # ingests identically (parallel/distributed.py)
                from .parallel.distributed import make_op_kernel_multihost
                return make_op_kernel_multihost(self.mesh, op_name, **kw)
            if self._cache_sharded:
                # uid-range-sharded cache: chip d holds cache rows
                # [d*C/K, (d+1)*C/K); operand rows are reconstructed per
                # batch with one fused psum (the >1-chip HBM answer to
                # the parent-window cap, SearchConfig.shard_cache)
                from .parallel.incremental import make_op_kernel_uidrange
                return make_op_kernel_uidrange(self.mesh, op_name, **kw)
            from .parallel.incremental import make_op_kernel_sharded
            return make_op_kernel_sharded(self.mesh, op_name, **kw)
        # single-device path: compact verdict packing (12 B/candidate —
        # the full packing's device->host volume was ~50% of mega-depth
        # device wall through the tunnel)
        if self._use_pallas():
            from .parallel.pallas_engine import make_pallas_op_kernel
            return make_pallas_op_kernel(op_name, compact=True, **kw)
        return make_op_kernel(op_name=op_name, compact=True, **kw)

    def _unpack_start(self, packed, out_f):
        """Phase 1 of verdict unpacking: fetch the (async-copied) packed
        verdicts and DISPATCH the passers' fingerprint-row gather WITHOUT
        blocking on it.  Through the axon tunnel the select kernel must
        be enqueued BEFORE the next superbatch's main kernel: the device
        executes in queue order, so a select fetched after that dispatch
        waits out the whole next kernel — the round-3 profiling finding
        that the mega-run "device" stage was round-trip-bound
        (~350 ms/superbatch against 6-18 ms of kernel time)."""
        from .parallel.incremental import make_select_kernel
        from .parallel.search import unpack_screen_result_compact
        import jax.numpy as jnp
        cu = unpack_screen_result_compact(
            np.asarray(packed), len(self.problem.fingerprint_points))
        rows_dev = None
        if cu.n_passers:
            k = cu.n_passers
            kpad = 1024
            while kpad < k:
                kpad *= 8
            kpad = min(kpad, int(out_f.shape[0]))
            idx = np.zeros(max(kpad, k), np.int32)
            idx[:k] = cu.passer_idx
            rows_dev = make_select_kernel()(out_f, jnp.asarray(idx))
            try:
                rows_dev.copy_to_host_async()
            except AttributeError:
                pass
        return cu, rows_dev

    def _unpack_finish(self, cu, rows_dev) -> ScreenResult:
        """Phase 2: block on the passer-row copy and scatter the raw
        fingerprint values into the ScreenResult."""
        if rows_dev is not None:
            rows = np.asarray(rows_dev)
            cu.sr.fp_vals[cu.passer_idx] = rows[:cu.n_passers]
        return cu.sr

    def _unpack_batch(self, packed, out_f) -> ScreenResult:
        """Unpack a batch's verdicts: compact packing (12 B/candidate)
        on every path — single-device AND mesh (round 2 left the mesh
        kernels on the 108 B full packing, VERDICT weak #7) — with the
        passers' raw fingerprint values gathered from the device-resident
        fingerprint jets afterwards (quantized gather shapes — each
        distinct shape is an executable)."""
        return self._unpack_finish(*self._unpack_start(packed, out_f))

    def _eval_tape_groups(self, cands: List[Candidate]):
        """Evaluate arbitrary tapes via the batched NumPy oracle (this path
        only sees a handful of expressions — primitives, known solutions,
        resume seeding — and the tape-interpreting device kernel costs
        ~10 min of remote compile).  Yields (group, sr, out_s, out_f) with
        the jets as float32 device arrays ready for the cache."""
        import jax.numpy as jnp
        from .ops.interpreter import eval_jets_np_many
        from .parallel.search import verdicts_from_jets_np

        CHUNK = 4096  # bounds the float64 working set (resume can pass
        #               hundreds of thousands of uniques through here)
        groups: Dict[int, List[int]] = {}
        for i, c in enumerate(cands):
            groups.setdefault(self._bucket_len(len(c.tape)), []).append(i)
        consts = self.problem.consts.as_array(np.float64)
        for bucket, idxs in sorted(groups.items()):
            for lo in range(0, len(idxs), CHUNK):
                group = [cands[i] for i in idxs[lo:lo + CHUNK]]
                tapes = np.stack([c.tape.padded(bucket) for c in group])
                lengths = np.array([len(c.tape) for c in group],
                                   dtype=np.int64)
                jets = eval_jets_np_many(tapes, lengths, consts,
                                         self.problem.screen_points,
                                         self.problem.residual_order)
                fj = eval_jets_np_many(tapes, lengths, consts,
                                       self.problem.fingerprint_points, 1)
                sr = verdicts_from_jets_np(
                    jets, fj, self.problem.screen_points,
                    self.problem.residual_fn, float(self.screen_rtol))
                out_s = jnp.asarray(
                    jets.reshape(jets.shape[0], -1).astype(np.float32))
                # cache rows must carry the grid-SNAPPED fingerprint jets
                # (sr.fp_vals — see search.snap_fp_jets), same as the
                # device kernels' rows
                out_f = jnp.asarray(sr.fp_vals.astype(np.float32))
                self.candidates_screened += len(group)
                yield group, sr, out_s, out_f

    def _eval_op_idx(self, op_name: str, a_idx: np.ndarray,
                     b_idx: Optional[np.ndarray]):
        """Incremental fast path: one gather + one surface op."""
        import jax
        import jax.numpy as jnp
        from .parallel.mesh import pad_to_multiple, replicated, shard_batch

        n = a_idx.size
        if b_idx is None:
            b_idx = np.zeros((n,), np.int32)

        # quantize to TWO shapes per op (small / full batch): every
        # distinct shape costs a fresh jit *trace* (~1 s for these kernels)
        # even when the persistent cache already has the executable
        small = 8192
        npad = small if n <= small else self.config.batch_size
        npad = max(npad, n)
        npad = pad_to_multiple(npad, 512)  # Pallas tile divisibility
        if self.mesh is not None:
            nd = self.mesh.devices.size
            npad = pad_to_multiple(max(npad, nd), nd)

        # one combined index upload — the tunnel charges ~90 ms per
        # host->device transfer regardless of size
        ab = np.zeros((npad, 2), np.int32)
        ab[:n, 0] = a_idx
        ab[:n, 1] = b_idx

        t0 = time.perf_counter()
        ab_d = jnp.asarray(ab)
        if self.mesh is not None:
            # explicit shard_map over the candidates axis — the flagship
            # multi-chip path.  Replicated cache: the batch is sharded.
            # uid-range-sharded cache: every device needs the whole index
            # list to serve its cache slice, so ab is replicated.
            ab_d = jax.device_put(
                ab_d, replicated(self.mesh) if self._cache_sharded
                else shard_batch(self.mesh))
            packed, out_s, out_f, n_pass = self._op_kernel(op_name)(
                self.cache.screen, self.cache.fp, ab_d,
                self._spoints, self._fpoints)
            self.mesh_survivors = n_pass
        else:
            packed, out_s, out_f = self._op_kernel(op_name)(
                self.cache.screen, self.cache.fp, ab_d,
                self._spoints, self._fpoints)
        self.device_seconds += time.perf_counter() - t0
        self.candidates_screened += n
        # packed is still an in-flight device array — start its
        # device→host copy now so the transfer overlaps the next batch's
        # compute; the caller unpacks (and blocks) one batch later
        try:
            packed.copy_to_host_async()
        except AttributeError:
            pass
        return packed, out_s, out_f

    @staticmethod
    def _ev_at(sr: ScreenResult, j: int):
        """Per-candidate view of a (numpy) ScreenResult."""
        return {
            "screen_ok": bool(sr.screen_ok[j]),
            "rel_max": float(sr.rel_max[j]),
            "nonfinite": bool(sr.nonfinite[j]),
            "is_const": bool(sr.is_const[j]),
            "fp": (int(sr.fp_a[j]), int(sr.fp_b[j])),
            "fp_finite": bool(sr.fp_finite[j]),
            "fp_vals": sr.fp_vals[j],
        }

    # ------------------------------------------------------------------
    # Known solutions
    # ------------------------------------------------------------------

    def _prepare_known_solutions(self):
        """Fingerprint the known solutions so generated matches can be
        tagged (reference general:1785-1798)."""
        knowns = list(self.problem.known_solutions.items())
        if not knowns:
            return
        cands = []
        for expr_str, name in knowns:
            t = self.problem.parse(expr_str)
            cands.append(Candidate(depth=0, expr_str=expr_str, top_op="",
                                   has_var=True, tape=t,
                                   consts=self.problem.consts))
        for group, sr, _, _ in self._eval_tape_groups(cands):
            for j, cand in enumerate(group):
                if bool(sr.fp_finite[j]):
                    name = self.problem.known_solutions[cand.expr_str]
                    self._known_fp[name] = np.asarray(sr.fp_vals[j],
                                                      dtype=np.float64)
                    self._known_sympy[name] = self.problem.tape_to_sympy(
                        cand.tape)

    def _match_known(self, cand: Candidate, fp_vals) -> Optional[str]:
        """Tolerance match on fingerprint values (robust to quantization
        boundaries), gated by an exact SymPy equality check — the analog of
        the reference's simplify(u - known) == 0 (general:1785-1798)."""
        import sympy as sp
        v = np.asarray(fp_vals, dtype=np.float64)
        for name, kv in self._known_fp.items():
            denom = np.abs(kv) + 1.0
            if np.max(np.abs(v - kv) / denom) < 1e-3:
                try:
                    u = self.problem.tape_to_sympy(cand.tape)
                    if sp.simplify(u - self._known_sympy[name]) == 0:
                        return name
                except Exception:
                    continue
        return None

    # ------------------------------------------------------------------
    # Stages 2-4
    # ------------------------------------------------------------------

    def _recheck_f64(self, cand: Candidate) -> Tuple[bool, float]:
        jets = eval_jets_np(cand.tape.rows, len(cand.tape),
                            self.problem.consts.as_array(np.float64),
                            self.problem.screen_points,
                            self.problem.residual_order)
        # constant guard: a u whose f64 gradient vanishes (exactly, or
        # relative to the jet magnitude — constants-in-disguise like
        # (z*(rho/z))/rho keep cancellation noise ~1e-16 in their f64
        # gradient) trivially zeroes the residual but is excluded by the
        # reference's zero-gradient rule.
        if _const_in_f64(jets):
            return False, float("inf")
        res, scale = self.problem.residual_fn(
            jets, self.problem.screen_points, np)
        with np.errstate(invalid="ignore"):
            rel = np.abs(res) / (scale + 1e-300)
        from .parallel.search import informative_points
        if not (np.isfinite(res).all() and np.isfinite(scale).all()):
            return False, float("inf")
        ok_pt = informative_points(res, scale, jets, np)
        if not ok_pt.any():
            return False, float("inf")
        relmax = float(np.where(ok_pt, rel, 0.0).max())
        return relmax < self.confirm_rtol, relmax

    def _confirm_symbolic(self, cand: Candidate) -> Tuple[Optional[bool], str]:
        """Returns (verdict, method). verdict None => skipped (too large)."""
        if not self.config.confirm_symbolic:
            return None, "numeric"
        if len(cand.expr_str) > self.config.sympy_len_limit:
            return None, "numeric(len-limit)"
        try:
            u = self.problem.tape_to_sympy(cand.tape)
            return self.problem.exact_zero_residual(u), "symbolic"
        except Exception:
            self.errors += 1
            return None, "numeric(symbolic-error)"

    # ------------------------------------------------------------------
    # Ingestion (dedup + verdicts + cache append)
    # ------------------------------------------------------------------

    @staticmethod
    def _fp_keys(sr: ScreenResult, n: int, struct_keys: np.ndarray
                 ) -> np.ndarray:
        """uint64 dedup keys: fingerprint hash when finite, structural
        (op, a, b) hash otherwise (the reference's normalizer likewise fell
        back to the raw candidate string for unparseable forms).

        Bit 63 partitions the key space: finite fp keys are masked into
        [0, 2^63) and structural keys carry the tag bit, so the two kinds
        can never collide/merge."""
        keys = ((sr.fp_a[:n].astype(np.uint64) << np.uint64(32))
                | sr.fp_b[:n].astype(np.uint64)) & np.uint64(FP_MASK)
        nf = ~sr.fp_finite[:n]
        if nf.any():
            keys = keys.copy()
            keys[nf] = struct_keys[nf]
        return keys

    def _ingest(self, cands: List[Candidate], sr: ScreenResult, depth: int,
                st: DepthStats, on_row=None, out_s=None, out_f=None):
        import jax.numpy as jnp
        kept: List[int] = []
        fp_to_uid = self.fp_to_uid
        fpa, fpb, fp_finite = sr.fp_a, sr.fp_b, sr.fp_finite
        st.candidates += len(cands)
        for j, cand in enumerate(cands):
            if fp_finite[j]:
                fp = (((int(fpa[j]) << 32) | int(fpb[j])) & FP_MASK)
            else:
                # structural identity for non-finite expressions (the
                # reference's normalizer also fell back to the raw string);
                # stable digest so resumed runs rebuild the same key
                fp = struct_key_for_expr(cand.expr_str)
            if fp in fp_to_uid:
                continue  # duplicate of an earlier unique
            u = self.enumerator.add_unique(cand)
            fp_to_uid[fp] = u.uid
            kept.append(j)
            st.unique += 1
            self._verdict(u, self._ev_at(sr, j), depth, st, on_row, fp)

        # append the new uniques' jets to the device cache (uid order ==
        # append order, preserving the row == uid invariant)
        if out_s is not None and kept:
            self._append_kept(out_s, out_f, kept)

    def _append_kept(self, out_s, out_f, kept: List[int]):
        """Append the kept rows' jets to the cache — one fused dispatch
        (gather + in-place tail update with donated cache buffers).  The
        selection index is padded to one of TWO shapes (matching the op
        batches' own {8192, batch_size} quantization): each distinct
        (pad, capacity) pair is a separate XLA executable, and on a
        tunneled TPU every executable's first use costs a multi-second
        load — the former power-of-two pad ladder alone was ~17 s of a
        depth-4 run.  The pad rows land beyond cache.n and are
        overwritten by the next append."""
        import jax.numpy as jnp
        k = len(kept)
        nb = int(out_s.shape[0])  # batch rows: 8192 or batch_size
        kpad = nb if (nb <= 8192 or k > 8192) else 8192
        idx = np.zeros(kpad, np.int32)
        idx[:k] = kept
        self.cache.append_gathered(out_s, out_f, jnp.asarray(idx),
                                   real_rows=k)

    def _dedup_sharded(self, keys: np.ndarray, base_uid: int) -> np.ndarray:
        """Sharded-registry dedup (SearchConfig.shard_registry): this host
        probes/stores ONLY the keys it owns (key mod world), the per-host
        new-key masks are OR-combined across processes (ownership
        partitions the batch positions, so the union is disjoint), and
        every host derives the SAME global first-occurrence set — uids
        stay consecutive in batch order exactly like the unsharded
        insert_batch.  The host then rewrites its owned new keys'
        provisional uids with the global assignment.

        RAM effect: the dedup map (~24 B/unique, the largest host
        structure after the string arena) shrinks by the process count;
        the exchanged mask is n bits/batch."""
        from .parallel.distributed import or_reduce_mask
        n = keys.size
        world = np.uint64(self._reg_world)
        rank = np.uint64(self._reg_rank)
        mine = np.nonzero(keys % world == rank)[0]
        local_new = self.fp_to_uid.insert_batch(keys[mine], base_uid=0)
        my_new = mine[local_new]
        mask = np.zeros(n, np.bool_)
        mask[my_new] = True
        gmask = or_reduce_mask(mask)
        new_idx = np.nonzero(gmask)[0].astype(np.int64)
        if my_new.size:
            # global uid of an owned new key = base + its rank in new_idx
            pos = np.searchsorted(new_idx, my_new)
            self.fp_to_uid.set_batch(keys[my_new],
                                     base_uid + pos.astype(np.int64))
        return new_idx

    def _ingest_vec(self, op_name: str, a_u: np.ndarray,
                    b_u: Optional[np.ndarray], sr: ScreenResult,
                    depth: int, st: DepthStats, on_row=None,
                    out_s=None, out_f=None, append_cache: bool = True,
                    on_rows=None, retain_strings: bool = True,
                    row_offset: int = 0, defer_append_to=None):
        """Fully vectorized ingestion: dedup, unique registration, verdict
        classification and reject-row emission all happen at array level —
        per-candidate Python survives only for screen PASSERS (rare).
        This was ~80% of mega-run wall-clock in round 1 (~115 µs/unique of
        object construction, PERF.md); the reference's analogous hot loop
        is emit_to_db (general:1251-1411)."""
        n = a_u.size
        st.candidates += n

        with _Section("keys"):
            # structural hashes (used for non-finite-fingerprint
            # candidates); op_salt is a stable digest — Python hash() is
            # salted per process and would break resume dedup (ADVICE.md
            # round 1)
            bb = b_u if b_u is not None else np.zeros(n, np.int32)
            with np.errstate(over="ignore"):
                struct = (a_u.astype(np.uint64)
                          * np.uint64(0x9E3779B97F4A7C15)
                          ^ bb.astype(np.uint64)
                          * np.uint64(0xC2B2AE3D27D4EB4F)
                          ^ np.uint64(op_salt(op_name)))
            struct |= np.uint64(STRUCT_TAG)
            keys = self._fp_keys(sr, n, struct)

        with _Section("dedup"):
            # global first-occurrence dedup: one native batch insert (new
            # keys get consecutive uids in batch order; the dict fallback
            # reproduces the same semantics via np.unique + filter)
            enum = self.enumerator
            if self._reg_world > 1:
                new_idx = self._dedup_sharded(keys, enum.count_uniques())
            else:
                new_idx = self.fp_to_uid.insert_batch(
                    keys, base_uid=enum.count_uniques())
        if new_idx.size == 0:
            return
        k_new = int(new_idx.size)

        persist = self.persist_host
        with _Section("register"):
            uid0, exprs = enum.add_uniques_bulk(
                op_name, a_u[new_idx],
                None if b_u is None else b_u[new_idx], depth,
                retain_strings=retain_strings and persist,
                # no-audit final depth: nothing reads these strings —
                # skip composing them into the arena entirely (they
                # regenerate from structure on demand; ~50 GB of a
                # depth-6 registry, PERF roadmap #2).  Non-writer hosts
                # of a sharded-registry run never read them either.
                arena_strings=(persist
                               and (self.config.audit_rejects
                                    or retain_strings)))
            if (persist and exprs is None and self.native_sink is None
                    and self.config.audit_rejects):
                # arena-backed strings, but no native sink to read them:
                # materialize Python strings for the Row/tuple paths
                blob = enum.arena.blob(
                    np.arange(uid0, uid0 + k_new, dtype=np.int64))
                exprs = [s.decode() for s in blob.split(b"\x00")[:-1]]
        newkeys = keys[new_idx]
        st.unique += k_new

        if not persist:
            # non-writer host of a sharded-registry run: verdict
            # persistence (reject rows, gray f64 rechecks, valid rows) is
            # the writer's job — uid assignment and the device cache do
            # not depend on it.  Count rows so heartbeat totals stay
            # meaningful, then fall through to the cache append.
            self.n_rows += k_new
            with _Section("cache_append"):
                self._append_cache_section(out_s, out_f, k_new,
                                           new_idx, append_cache,
                                           defer_append_to, row_offset)
            return

        with _Section("verdicts"):
            # vectorized verdict classification
            has_var = enum.f_has_var[uid0:uid0 + k_new]
            is_const = sr.is_const[new_idx] | ~has_var
            nonfin = ((~sr.fp_finite[new_idx] | sr.nonfinite[new_idx])
                      & ~is_const)
            passing = sr.screen_ok[new_idx] & ~is_const & ~nonfin

        with _Section("rejects"):
            self._emit_rejects_bulk(
                uid0, exprs, newkeys, depth, sr, new_idx,
                is_const, nonfin, passing, on_row, on_rows)

        with _Section("passers"):
            # lazy path for the (rare) screen passers: f64 recheck queue
            # holds (uid-shim, evidence, key); tapes/strings materialize
            # in batch at recheck time (C builder)
            pass_locals = np.nonzero(passing)[0]
            if pass_locals.size:
                for local in pass_locals.tolist():
                    uid = uid0 + local
                    u = _Passer(enum, uid)
                    if exprs is not None:
                        u._expr = exprs[local]
                    ev = self._ev_at(sr, int(new_idx[local]))
                    key = int(newkeys[local])
                    if ev["rel_max"] < self.config.f64_skip_below:
                        self._finalize_pass(u, ev, ev["rel_max"], "screen",
                                            depth, st, on_row, key)
                    else:
                        self._gray.append((u, ev, key))

        with _Section("cache_append"):
            self._append_cache_section(out_s, out_f, k_new, new_idx,
                                       append_cache, defer_append_to,
                                       row_offset)

    def _append_cache_section(self, out_s, out_f, k_new: int,
                              new_idx: np.ndarray, append_cache: bool,
                              defer_append_to, row_offset: int):
        if out_s is None or not k_new or not append_cache:
            return
        if defer_append_to is not None:
            # segmented superbatch: one fused append per dispatch
            # instead of one per op segment (uid order preserved —
            # segments ingest in superbatch order)
            defer_append_to.extend((new_idx + row_offset).tolist())
        else:
            # HBM budget: append only the uid-prefix that fits
            # (uids are consecutive in batch order, so the cache
            # invariant rows == uids [0, cache.n) survives a
            # partial append)
            room = self.cache_row_limit - self.cache.n
            if room > 0:
                self._append_kept(out_s, out_f,
                                  new_idx[:room].tolist())

    _R_CONST = "Zero gradient (constant expression)"
    _R_NONFIN = "Non-finite on safe domain (rejected)"
    _EV_FMT = ('{"rel_max": %s, "screen_ok": %s, "nonfinite": %s,'
               ' "is_const": %s, "fp_finite": %s, "n_screen_points": %d,'
               ' "stage": "screen"}')

    @staticmethod
    def _fmt_rel(x: float) -> str:
        """JSON-parseable float: Python's json accepts Infinity/NaN
        spellings but not bare 'inf' (%.e would emit that)."""
        if x != x:
            return "NaN"
        if x == float("inf"):
            return "Infinity"
        if x == float("-inf"):
            return "-Infinity"
        return "%.6e" % x

    def _emit_rejects_bulk(self, uid0, exprs, keys, depth, sr, new_idx,
                           is_const, nonfin, passing, on_row, on_rows):
        """Emit the three mass reject categories (constant / non-finite /
        screen-fail) without constructing Row objects: through the native
        sqlite writer (production with the C++ core), as raw DB tuples
        (production fallback, on_rows sink) or as Rows (standalone)."""
        store_const = self.config.store_constants
        if not self.config.audit_rejects:
            # mega-scale mode: rejects are screened/deduped/counted but
            # not persisted (see SearchConfig.audit_rejects)
            n_skip = int((~passing).sum())
            if not store_const:
                n_skip -= int(is_const.sum())
            self.n_rows += max(n_skip, 0)
            if exprs:
                self.last_expr = exprs[-1]
            elif len(is_const):
                # expr_str_of: arena when present, struct rebuild when
                # the final-depth batch skipped arena strings
                self.last_expr = self.enumerator.expr_str_of(
                    uid0 + len(is_const) - 1)
            return
        if self.native_sink is not None:
            emit = ~passing
            if not store_const:
                emit &= ~is_const
            locs = np.nonzero(emit)[0]
            n_new = len(is_const)
            if exprs:
                self.last_expr = exprs[-1]
            elif n_new:
                # arena path: one string fetch per batch (monitor display)
                self.last_expr = self.enumerator.arena.get(uid0 + n_new - 1)
            if locs.size:
                if exprs is None:
                    # blob packed straight from the C arena (no Python
                    # string objects for the 10^7-row reject stream)
                    blob = self.enumerator.arena.blob(
                        uid0 + locs.astype(np.int64))
                else:
                    blob = ("\x00".join([exprs[i] for i in locs.tolist()])
                            .encode() + b"\x00")
                sel = new_idx[locs]
                reason_code = np.where(
                    is_const[locs], 0,
                    np.where(nonfin[locs], 1, 2)).astype(np.uint8)
                enum = self.enumerator
                self.native_sink.emit(
                    ids=(uid0 + 1 + self.id_offset) + locs.astype(np.int64),
                    exprs_blob=blob, sigs=keys[locs], depth=depth,
                    reason_code=reason_code, rel=sr.rel_max[sel],
                    struct_op=int(enum.u_op[uid0]),
                    struct_a=enum.u_a[uid0 + locs],
                    struct_b=enum.u_b[uid0 + locs],
                    screen_ok=sr.screen_ok[sel], nonfinite=sr.nonfinite[sel],
                    is_const=sr.is_const[sel], fp_finite=sr.fp_finite[sel],
                    n_screen_points=len(self.problem.screen_points),
                    math_def=self._math_def.encode())
                self.n_rows += int(locs.size)
            return
        nsp = len(self.problem.screen_points)
        enum = self.enumerator
        s_op = int(enum.u_op[uid0]) if len(is_const) else -1
        s_a = enum.u_a[uid0:uid0 + len(is_const)].tolist()
        s_b = enum.u_b[uid0:uid0 + len(is_const)].tolist()
        rel_l = sr.rel_max[new_idx].tolist()
        ok_l = sr.screen_ok[new_idx].tolist()
        raw_nf_l = sr.nonfinite[new_idx].tolist()
        raw_c_l = sr.is_const[new_idx].tolist()
        fpf_l = sr.fp_finite[new_idx].tolist()
        const_l = is_const.tolist()
        nonfin_l = nonfin.tolist()
        pass_l = passing.tolist()
        keys_l = keys.tolist()
        ev_fmt = self._EV_FMT
        n_emitted = 0
        as_tuples = on_rows is not None
        sink: List = []
        ap = sink.append
        id0 = uid0 + 1 + self.id_offset
        for local in range(len(exprs)):
            if pass_l[local]:
                continue
            if const_l[local]:
                if not store_const:
                    continue
                reason = self._R_CONST
            elif nonfin_l[local]:
                reason = self._R_NONFIN
            else:
                reason = ("PDE residual != 0 (screen relres ≈ %.2e)"
                          % rel_l[local])
            ev = ev_fmt % (
                self._fmt_rel(rel_l[local]),
                "true" if ok_l[local] else "false",
                "true" if raw_nf_l[local] else "false",
                "true" if raw_c_l[local] else "false",
                "true" if fpf_l[local] else "false",
                nsp)
            e = exprs[local]
            sig = "%016x" % keys_l[local]
            n_emitted += 1
            sa = s_a[local]
            sb = s_b[local]
            if as_tuples:
                # column order must match RunDB.flush's INSERT.
                # normalized/validator_math are NULL on reject rows:
                # normalized always equals expression in this engine and
                # the math definition is a run-level constant — together
                # they were ~40% of the sqlite-write-bound mega-run
                # reject volume (documented deviation, utils/db.py)
                ap((id0 + local, e, None, sig, depth, "completed", 0,
                    reason, "screen", None, ev, 0, None, None, None,
                    None if s_op < 0 else s_op,
                    None if sa < 0 else sa,
                    None if sb < 0 else sb))
            else:
                row = Row(
                    id=id0 + local, expression=e, normalized=None,
                    signature=sig, depth=depth, is_valid=False,
                    validation_reason=reason, validator_method="screen",
                    validator_math=None, validator_evidence=ev,
                    struct_op=None if s_op < 0 else s_op,
                    struct_a=None if sa < 0 else sa,
                    struct_b=None if sb < 0 else sb)
                if self._keep_rows:
                    self.rows.append(row)
                if on_row is not None:
                    on_row(row)
        self.n_rows += n_emitted
        if exprs:
            self.last_expr = exprs[-1]
        if as_tuples and sink:
            on_rows(sink)

    def _verdict(self, cand: Candidate, ev, depth: int, st: DepthStats,
                 on_row=None, key: int = 0):
        if ev["is_const"] or not cand.has_var:
            if self.config.store_constants:
                self._add_row(cand, depth, False,
                              "Zero gradient (constant expression)",
                              "screen", ev, on_row, key=key)
            return

        if not ev["fp_finite"] or ev["nonfinite"]:
            self._add_row(cand, depth, False,
                          "Non-finite on safe domain (rejected)",
                          "screen", ev, on_row, key=key)
            return

        if not ev["screen_ok"]:
            self._add_row(
                cand, depth, False,
                f"PDE residual != 0 (screen relres ≈ {ev['rel_max']:.2e})",
                "screen", ev, on_row, key=key)
            return

        # stage 2: float64 recheck (full tape, independent arithmetic).
        # Every screen passer gets it by default (f64_skip_below = 0.0):
        # it is batched and cheap relative to the device stage, and the
        # f32 screen alone would store near-solutions as Valid.
        if ev["rel_max"] < self.config.f64_skip_below:
            self._finalize_pass(cand, ev, ev["rel_max"], "screen",
                                depth, st, on_row, key)
        else:
            self._gray.append((cand, ev, key))

    def _finalize_pass(self, cand, ev, rel64, f64_tag, depth, st, on_row,
                       key: int = 0):
        """Stages 3-4 for a candidate that survived the numeric funnel."""
        verdict, method = self._confirm_symbolic(cand)
        if verdict is False:
            self._add_row(
                cand, depth, False,
                "Invalid (symbolic residual != 0; numeric zero was "
                f"relres ≈ {rel64:.2e})",
                "screen+f64+symbolic", ev, on_row, key=key)
            return
        if verdict is True:
            reason = "Valid (exact zero; heavy checks deferred)"
        else:
            reason = (f"Valid (numeric zero, relres ≈ {rel64:.2e}; "
                      "symbolic confirm skipped)")

        # NOTE: the DB sink sees the row only AFTER the (optional) inline
        # heavy checks — on_row snapshots the row into an INSERT tuple, so
        # calling it before a heavy demotion would persist 'valid' for a
        # row the engine then rejected.
        row = self._add_row(cand, depth, True, reason,
                            f"{f64_tag}+{method}", ev, None,
                            known=self._match_known(cand, ev["fp_vals"]),
                            key=key, rel64=rel64)
        st.valid += 1

        # stage 4: heavy checks
        if not self.config.defer_heavy_checks:
            try:
                hu = self.problem.tape_to_sympy(cand.tape)
                h_ok, h_reason = self.problem.heavy_checks(hu)
            except Exception as e:
                h_ok, h_reason = False, f"heavy check error: {e}"
                self.errors += 1
            row.heavy_is_valid = h_ok
            row.heavy_reason = h_reason
            if not h_ok:
                row.is_valid = False
                row.validation_reason = h_reason
                st.valid -= 1
                self.valid_rows.remove(row)
        if on_row is not None:
            on_row(row)

    def _gray_numeric(self, part):
        """The numeric (NumPy float64) section of the gray recheck for one
        chunk — pure function of the candidates, safe to run on the
        overlap worker thread (large NumPy ops release the GIL, so this
        hides behind the main thread's tunnel I/O waits on the one-core
        hosts the axon TPU rig provides)."""
        from .ops.interpreter import eval_jets_np_many
        from .parallel.search import informative_points
        consts = self.problem.consts.as_array(np.float64)
        pts = self.problem.screen_points
        # batch tape materialization from the SoA registry (C builder
        # when available) — no per-candidate Python composition
        uids = np.array([c.uid for c, _, _ in part], np.int64)
        tapes, lengths = self.enumerator.tapes_batch(uids)
        jets = eval_jets_np_many(tapes, lengths, consts, pts,
                                 self.problem.residual_order)
        res, scale = self.problem.residual_fn(jets, pts, np)
        with np.errstate(invalid="ignore"):
            rel = np.abs(res) / (scale + 1e-300)
        ok_pt = ((np.isfinite(res) & np.isfinite(scale))
                 & informative_points(res, scale, jets, np))
        finite = ((np.isfinite(res) & np.isfinite(scale)).all(axis=-1)
                  & ok_pt.any(axis=-1))
        rel = np.where(ok_pt, rel, 0.0)
        # constant guard (see _recheck_f64): vanishing f64 gradient at
        # every point ⇒ constant expression, excluded by the
        # zero-gradient rule even though it trivially zeroes the
        # residual (the f32 screen's is_const can miss these)
        const64 = _const_in_f64_batch(jets)
        relmax = np.where(finite, rel.max(axis=-1), np.inf)
        return const64, finite, relmax

    def _gray_maybe_submit(self, chunk: int = 4096, depth: int = None,
                           st: DepthStats = None, on_row=None):
        """Stream gray chunks to the overlap worker during the depth so
        their f64 numerics run while the main thread waits on the device
        (row emission stays on the main thread — sqlite connections and
        Row bookkeeping are not thread-safe).  When the caller provides
        the emission context (depth/st/on_row), finished chunks are also
        DRAINED here: holding every passer's Candidate+evidence until the
        depth barrier was a multi-GB peak on mega-depths."""
        while len(self._gray) >= chunk:
            part = self._gray[:chunk]
            del self._gray[:chunk]
            self._gray_done.append(
                (part, self._gray_pool.submit(self._gray_numeric, part)))
        if st is not None:
            while self._gray_done and self._gray_done[0][1].done():
                part, fut = self._gray_done.pop(0)
                self._emit_gray_part(part, fut.result(), depth, st,
                                     on_row)

    def _emit_gray_part(self, part, res, depth, st, on_row):
        const64, finite, relmax = res
        for j, (cand, ev, key) in enumerate(part):
            if const64[j]:
                self._add_row(cand, depth, False, self._R_CONST,
                              "screen+f64", ev, on_row, key=key)
            elif finite[j] and relmax[j] < self.confirm_rtol:
                self._finalize_pass(cand, ev, float(relmax[j]),
                                    "screen+f64", depth, st, on_row,
                                    key)
            else:
                self._add_row(
                    cand, depth, False,
                    f"Invalid (f64 recheck relres ≈ {relmax[j]:.2e})",
                    "screen+f64", ev, on_row, key=key)

    def _flush_gray(self, depth: int, st: DepthStats, on_row=None,
                    chunk: int = 4096):
        """Drain the gray zone: finish streaming chunks, then emit
        verdict rows for every chunk in submission order."""
        if self._gray:
            # (no length sort: tapes are not materialized up front
            # anymore; within-chunk padding waste is minor)
            for i in range(0, len(self._gray), chunk):
                part = self._gray[i:i + chunk]
                self._gray_done.append(
                    (part, self._gray_pool.submit(self._gray_numeric,
                                                  part)))
            self._gray = []
        done, self._gray_done = self._gray_done, []
        for part, fut in done:
            self._emit_gray_part(part, fut.result(), depth, st, on_row)

    def _add_row(self, cand, depth, is_valid, reason, method, ev,
                 on_row=None, known=None, key: int = 0,
                 rel64: Optional[float] = None) -> Optional[Row]:
        if not is_valid and not self.config.audit_rejects:
            # mega-scale mode: rejects counted, not persisted
            self.n_rows += 1
            self.last_expr = cand.expr_str
            return None
        # The signature IS the dedup key (hex) — resume rebuilds the
        # fp→uid map by parsing it back, so forward-path and resume keys
        # agree across processes by construction.
        if key:
            sig = f"{key:016x}"
        elif ev["fp_finite"]:
            sig = f"{((ev['fp'][0] << 32) | ev['fp'][1]) & FP_MASK:016x}"
        else:
            sig = f"{struct_key_for_expr(cand.expr_str):016x}"
        # Per-row evidence JSON (reference general:1330-1335; kerr
        # validator.py:296-306).  Hand-rolled: json.dumps per row is
        # measurable on 10^7-unique ingests.
        evidence = (
            '{"rel_max": %s, "screen_ok": %s, "nonfinite": %s,'
            ' "is_const": %s, "fp_finite": %s, "n_screen_points": %d,'
            ' "stage": "%s"%s}' % (
                self._fmt_rel(ev["rel_max"]),
                "true" if ev["screen_ok"] else "false",
                "true" if ev["nonfinite"] else "false",
                "true" if ev["is_const"] else "false",
                "true" if ev["fp_finite"] else "false",
                len(self.problem.screen_points), method,
                "" if rel64 is None
                else ', "rel_f64": %s' % self._fmt_rel(rel64)))
        uid = cand.uid
        s_op = int(self.enumerator.u_op[uid])
        s_a = int(self.enumerator.u_a[uid])
        s_b = int(self.enumerator.u_b[uid])
        row = Row(
            # row id == uid + 1 (stable across fresh/resumed runs — resume
            # reloads uniques in id order and must reproduce the same uids)
            id=cand.uid + 1 + self.id_offset,
            expression=cand.expr_str,
            # reject rows store NULL normalized/validator_math (equal to
            # expression / a run-level constant — see _emit_rejects_bulk)
            normalized=cand.expr_str if is_valid else None,
            signature=sig,
            depth=depth,
            is_valid=is_valid,
            validation_reason=reason,
            validator_method=method,
            is_paper_solution=known is not None,
            paper_solution_name=known,
            validator_math=self._math_def if is_valid else None,
            validator_evidence=evidence,
            struct_op=None if s_op < 0 else s_op,
            struct_a=None if s_a < 0 else s_a,
            struct_b=None if s_b < 0 else s_b,
        )
        self.n_rows += 1
        self.last_expr = cand.expr_str
        if self._keep_rows:
            self.rows.append(row)
        if is_valid:
            self.valid_rows.append(row)
        if on_row is not None:
            on_row(row)
        return row

    # ------------------------------------------------------------------
    # Segmented superbatch path (single-device Pallas)
    # ------------------------------------------------------------------

    def _use_segmented(self) -> bool:
        if self.config.use_segmented is not None:
            return self.config.use_segmented
        return self.mesh is None and self._use_pallas()

    def _seg_kernel(self):
        import jax

        from .parallel.pallas_engine import make_pallas_segmented_kernel
        return make_pallas_segmented_kernel(
            order=self.problem.residual_order,
            residual_key=self.problem.get_residual_key(),
            screen_rtol=float(self.screen_rtol),
            n_screen=len(self.problem.screen_points),
            n_fp=len(self.problem.fingerprint_points),
            # interpret mode makes the segmented path testable on CPU
            # (config.use_segmented=True under the test suite's forced
            # CPU platform)
            interpret=(jax.default_backend() == "cpu"),
            compact=True)

    def _use_structured(self) -> bool:
        if self.config.use_structured is not None:
            return self.config.use_structured
        return self._use_segmented()

    def _use_tiled(self) -> bool:
        if self.config.use_tiled is not None:
            return self.config.use_tiled
        return self._use_segmented()

    def _tiled_kernel(self, n_batch: int):
        import jax

        from .parallel.pallas_engine import make_pallas_tiled_kernel
        return make_pallas_tiled_kernel(
            order=self.problem.residual_order,
            residual_key=self.problem.get_residual_key(),
            screen_rtol=float(self.screen_rtol),
            n_screen=len(self.problem.screen_points),
            n_fp=len(self.problem.fingerprint_points),
            n_batch=n_batch,
            interpret=(jax.default_backend() == "cpu"),
            compact=True)

    def _structured_kernel(self, big: str, n_batch: int):
        import jax

        from .parallel.pallas_engine import make_pallas_structured_kernel
        return make_pallas_structured_kernel(
            order=self.problem.residual_order,
            residual_key=self.problem.get_residual_key(),
            screen_rtol=float(self.screen_rtol),
            n_screen=len(self.problem.screen_points),
            n_fp=len(self.problem.fingerprint_points),
            big=big, n_batch=n_batch,
            interpret=(jax.default_backend() == "cpu"),
            compact=True)

    def _run_depth_segmented(self, depth: int, max_depth: int,
                             st: DepthStats, on_row, on_rows, on_batch):
        """One device dispatch per ~batch_size candidates of MIXED ops:
        op batches pack into a tile-aligned superbatch with a per-tile
        op-id array (parallel/pallas_engine.make_pallas_segmented_kernel).
        The per-op path costs one dispatch per (op, shape) — ~34 per
        depth, ~5 ms of tunnel latency each; this path costs
        ceil(total/batch_size) + one fused cache append each."""
        import jax.numpy as jnp

        from .parallel.incremental import OP_INDEX

        TILE = 512
        SUPER = max(TILE, (self.config.batch_size // TILE) * TILE)
        n_tiles = SUPER // TILE
        kernel = self._seg_kernel()

        def append_ok():
            # re-evaluated per drain: a FINAL depth stops appending once
            # the cache passes final_append_limit (the HBM ceiling saver;
            # a stale once-per-depth value let a depth-5 run grow the
            # cache toward 24M rows and OOM in _grow)
            return (depth < max_depth
                    or self.cache.n < self.config.final_append_limit)

        gen = self.enumerator.vector_batches_at_depth(
            depth, SUPER, max_parent_uid=self.cache.n)
        ab = np.zeros((SUPER, 2), np.int32)
        tile_ops = np.zeros(n_tiles, np.int32)
        segs: List = []
        fill_tiles = 0
        pending = None

        def dispatch():
            nonlocal ab, tile_ops, segs, fill_tiles
            td = time.perf_counter()
            packed, out_s, out_f = kernel(
                self.cache.screen, self.cache.fp, jnp.asarray(ab),
                jnp.asarray(tile_ops), self._spoints, self._fpoints)
            st.t_device += time.perf_counter() - td
            try:  # transfer overlaps host work until the drain
                packed.copy_to_host_async()
            except AttributeError:
                pass
            item = (segs, packed, out_s, out_f)
            ab = np.zeros((SUPER, 2), np.int32)
            tile_ops = np.zeros(n_tiles, np.int32)
            segs = []
            fill_tiles = 0
            return item

        def drain_head(item):
            """Fetch verdicts + enqueue the passer-row gather.  MUST run
            before the next superbatch's dispatch (see _unpack_start)."""
            _, packed, _, out_f = item
            ti = time.perf_counter()
            state = self._unpack_start(packed, out_f)
            st.t_device += time.perf_counter() - ti
            self.device_seconds += time.perf_counter() - ti
            return state

        def drain_tail(item, state):
            d_segs, packed, out_s, out_f = item
            self.candidates_screened += sum(
                s[2].size for s in d_segs)
            ti = time.perf_counter()
            sr = self._unpack_finish(*state)
            st.t_device += time.perf_counter() - ti
            self.device_seconds += time.perf_counter() - ti
            ti = time.perf_counter()
            kept: List[int] = []
            for (op_name, start, a_seg, b_seg) in d_segs:
                n = a_seg.size
                view = ScreenResult(
                    *[f[start:start + n] for f in sr])
                self._ingest_vec(
                    op_name, a_seg, b_seg, view, depth, st, on_row,
                    out_s, out_f, append_cache=append_ok(),
                    on_rows=on_rows,
                    retain_strings=(depth < max_depth),
                    row_offset=start, defer_append_to=kept)
            if kept and append_ok():
                room = self.cache_row_limit - self.cache.n
                if room > 0:
                    self._append_kept(out_s, out_f, kept[:room])
            st.t_ingest += time.perf_counter() - ti
            self._gray_maybe_submit(depth=depth, st=st, on_row=on_row)
            if on_batch is not None:
                on_batch(st)

        def advance(make_item):
            """Software-pipeline step: drain_head(pending) BEFORE the new
            dispatch (so the pending batch's select kernel precedes the
            new main kernel in the device queue), dispatch, then finish
            draining while the new kernel executes."""
            nonlocal pending
            state = drain_head(pending) if pending is not None else None
            newitem = make_item()
            if pending is not None:
                drain_tail(pending, state)
            pending = newitem

        structured = self._use_structured()
        tiled = self._use_tiled()

        # per-TILE gather-bypass buffer (make_pallas_tiled_kernel): run
        # items shorter than a superbatch pack here, one (op, const uid,
        # contiguous start) per 512-candidate tile
        t_starts = np.zeros(n_tiles, np.int32)
        t_const = np.zeros(n_tiles, np.int32)
        t_opkind = np.zeros(n_tiles, np.int32)
        t_segs: List = []
        t_fill = 0

        def dispatch_tiled():
            nonlocal t_starts, t_const, t_opkind, t_segs, t_fill
            td = time.perf_counter()
            packed, out_s, out_f = self._tiled_kernel(SUPER)(
                self.cache.screen, self.cache.fp,
                jnp.asarray(t_starts), jnp.asarray(t_const),
                jnp.asarray(t_opkind), self._spoints, self._fpoints)
            st.t_device += time.perf_counter() - td
            try:
                packed.copy_to_host_async()
            except AttributeError:
                pass
            self.tiled_dispatches += 1
            item = (t_segs, packed, out_s, out_f)
            t_starts = np.zeros(n_tiles, np.int32)
            t_const = np.zeros(n_tiles, np.int32)
            t_opkind = np.zeros(n_tiles, np.int32)
            t_segs = []
            t_fill = 0
            return item

        def add_tiled(op_name, kind, a_u, b_u, pos, m):
            """Pack the run slice [pos, pos+m) into the tiled buffer,
            splitting across superbatches when it overflows.  Pad rows in
            a segment's last tile continue the contiguous uid ramp past
            the run's end (live rows of other uids); they land outside
            the segment's window and are discarded at ingest, exactly
            like the mixed path's (0, 0) pad rows."""
            nonlocal t_fill
            opk = OP_INDEX[op_name] * 2 + (1 if kind == "b" else 0)
            if kind == "b":
                const_uid, big0 = int(a_u[pos]), int(b_u[pos])
            else:
                big0 = int(a_u[pos])
                const_uid = 0 if b_u is None else int(b_u[pos])
            off = 0
            while off < m:
                room = (n_tiles - t_fill) * TILE
                if room == 0:
                    advance(dispatch_tiled)
                    continue
                take = min(m - off, room)
                used = -(-take // TILE)
                for j in range(used):
                    t_starts[t_fill + j] = big0 + off + j * TILE
                    t_const[t_fill + j] = const_uid
                    t_opkind[t_fill + j] = opk
                t_segs.append((op_name, t_fill * TILE,
                               a_u[pos + off:pos + off + take],
                               None if b_u is None
                               else b_u[pos + off:pos + off + take]))
                t_fill += used
                off += take

        def dispatch_structured(op_name, kind, a_u, b_u, pos):
            # gather bypass (make_pallas_structured_kernel): the
            # SUPER-slice shares one op with one constant operand and one
            # contiguous-uid operand
            if kind == "b":
                const_uid, big0 = int(a_u[pos]), int(b_u[pos])
            else:
                big0 = int(a_u[pos])
                const_uid = 0 if b_u is None else int(b_u[pos])
            td = time.perf_counter()
            packed, out_s, out_f = self._structured_kernel(kind, SUPER)(
                self.cache.screen, self.cache.fp,
                jnp.asarray(const_uid, jnp.int32),
                jnp.asarray(big0, jnp.int32),
                jnp.asarray(OP_INDEX[op_name], jnp.int32),
                self._spoints, self._fpoints)
            st.t_device += time.perf_counter() - td
            try:
                packed.copy_to_host_async()
            except AttributeError:
                pass
            self.structured_dispatches += 1
            seg = (op_name, 0, a_u[pos:pos + SUPER],
                   None if b_u is None else b_u[pos:pos + SUPER])
            return ([seg], packed, out_s, out_f)

        while True:
            te = time.perf_counter()
            item = next(gen, None)
            st.t_enum += time.perf_counter() - te
            if item is None:
                break
            op_name, a_u, b_u = item
            if a_u.size == 0:
                continue
            opid = OP_INDEX[op_name]
            pos = 0
            while pos < a_u.size:
                rem = a_u.size - pos
                if structured and rem >= SUPER:
                    kind = structured_run_kind(a_u, b_u, pos, SUPER)
                    if kind is not None:
                        # flush the mixed buffer first so drains keep
                        # stream order when the per-tile bypass is off
                        # (with deferred tails this is an exactly-full,
                        # padding-free flush: full chunks precede tails)
                        if fill_tiles:
                            advance(dispatch)
                        advance(lambda: dispatch_structured(
                            op_name, kind, a_u, b_u, pos))
                        pos += SUPER
                        continue
                if tiled and rem >= self.config.tiled_min_rows:
                    kind = structured_run_kind(a_u, b_u, pos, rem)
                    if kind is not None:
                        big0 = int((b_u if kind == "b" else a_u)[pos])
                        pad_end = big0 + (-(-rem // TILE)) * TILE
                        if pad_end <= self.cache.capacity:
                            add_tiled(op_name, kind, a_u, b_u, pos, rem)
                            pos += rem
                            continue
                        # pad tile would slice past the cache allocation
                        # (clamped dynamic_slice would shift real rows):
                        # fall through to the mixed gather — rare, only
                        # within TILE rows of the capacity quantum
                room_rows = (n_tiles - fill_tiles) * TILE
                if room_rows == 0:
                    advance(dispatch)
                    continue
                take = min(int(a_u.size) - pos, room_rows)
                start = fill_tiles * TILE
                ab[start:start + take, 0] = a_u[pos:pos + take]
                if b_u is not None:
                    ab[start:start + take, 1] = b_u[pos:pos + take]
                used = -(-take // TILE)
                tile_ops[fill_tiles:fill_tiles + used] = opid
                # pad rows in the segment's last tile keep ab == (0, 0):
                # the branch runs on uid-0 operands and the results are
                # outside every segment's [start, start+n) window
                segs.append((op_name, start, a_u[pos:pos + take],
                             None if b_u is None else b_u[pos:pos + take]))
                fill_tiles += used
                pos += take
        if t_fill:
            advance(dispatch_tiled)
        if fill_tiles:
            advance(dispatch)
        if pending is not None:
            drain_tail(pending, drain_head(pending))

    # ------------------------------------------------------------------
    # Main loop
    # ------------------------------------------------------------------

    def run(self, max_depth: Optional[int] = None, on_row=None,
            on_depth=None, start_depth: int = 1,
            on_batch=None, on_rows=None) -> List[DepthStats]:
        max_depth = max_depth or self.config.max_depth
        use_incremental = self.config.engine == "incremental"
        # keep Row objects in memory only when nobody is consuming them
        # (standalone/test use); with a bulk sink the DB is the record
        self._keep_rows = on_rows is None
        for depth in range(start_depth, max_depth + 1):
            t0 = time.perf_counter()
            st = DepthStats(depth=depth)
            if depth == 1:
                prims = self.enumerator.primitive_candidates()
                for group, evals, out_s, out_f in self._eval_tape_groups(
                        prims):
                    self._ingest(group, evals, depth, st, on_row,
                                 out_s, out_f)
            elif use_incremental:
                if self.cache.n < self.enumerator.count_uniques():
                    trunc = self.enumerator.count_uniques() - self.cache.n
                    fix = ("raise --max-cache-rows or add chips"
                           if self._cache_sharded else
                           "run with --devices K --shard-cache to split "
                           "the cache across a mesh (parent window scales "
                           "to K * max_cache_rows)")
                    print(f"  [hbm] parent window truncated: {trunc} of "
                          f"{self.enumerator.count_uniques()} uniques "
                          "exceed the cache budget and are not composed "
                          f"deeper ({fix})", flush=True)
                if self._use_segmented():
                    self._run_depth_segmented(depth, max_depth, st,
                                              on_row, on_rows, on_batch)
                    tg = time.perf_counter()
                    self._flush_gray(depth, st, on_row)
                    st.t_gray = time.perf_counter() - tg
                    st.seconds = time.perf_counter() - t0
                    self.stats.append(st)
                    if on_depth is not None:
                        on_depth(st)
                    continue
                # software pipeline: batch k+1 is dispatched to the device
                # before batch k's results are unpacked/ingested on the
                # host, so device execution hides behind host work.  Safe:
                # depth-d candidates only gather cache rows of depths < d,
                # and appends during depth d are never read within it.
                # parent window = device-resident cache rows (uid == row);
                # at depth start all prior appends are complete, so
                # cache.n IS the largest usable parent uid + 1
                gen = self.enumerator.vector_batches_at_depth(
                    depth, self.config.batch_size,
                    max_parent_uid=self.cache.n)
                pending = None

                def drain(pending, state=None):
                    (p_op, p_a, p_b, packed, out_s, out_f) = pending
                    ti = time.perf_counter()
                    sr = (self._unpack_batch(packed, out_f)
                          if state is None else
                          self._unpack_finish(*state))
                    st.t_device += time.perf_counter() - ti
                    self.device_seconds += time.perf_counter() - ti
                    ti = time.perf_counter()
                    # jets (and display strings) at the final depth never
                    # feed another level — skipping the cache append and
                    # string retention removes the HBM/RAM ceiling on
                    # mega-runs.  Small runs keep appending below the
                    # final_append_limit so extension resumes stay
                    # bit-exact (see SearchConfig).
                    self._ingest_vec(
                        p_op, p_a, p_b, sr, depth, st,
                        on_row, out_s, out_f,
                        append_cache=(
                            depth < max_depth
                            or self.cache.n
                            < self.config.final_append_limit),
                        on_rows=on_rows,
                        retain_strings=(depth < max_depth))
                    st.t_ingest += time.perf_counter() - ti
                    self._gray_maybe_submit(depth=depth, st=st,
                                            on_row=on_row)
                    if on_batch is not None:
                        on_batch(st)

                while True:
                    te = time.perf_counter()
                    item = next(gen, None)
                    st.t_enum += time.perf_counter() - te
                    if item is None:
                        break
                    op_name, a_u, b_u = item
                    if a_u.size == 0:
                        continue
                    # select kernel of the pending batch enqueues BEFORE
                    # the next main kernel (see _unpack_start)
                    th = time.perf_counter()
                    state = (self._unpack_start(pending[3], pending[5])
                             if pending is not None else None)
                    st.t_device += time.perf_counter() - th
                    self.device_seconds += time.perf_counter() - th
                    td = time.perf_counter()
                    packed, out_s, out_f = self._eval_op_idx(
                        op_name, a_u, b_u)
                    st.t_device += time.perf_counter() - td
                    if pending is not None:
                        drain(pending, state)
                    pending = (op_name, a_u, b_u, packed, out_s, out_f)
                if pending is not None:
                    drain(pending)
            else:
                buf: List[Candidate] = []

                def flush(buf):
                    for group, evals, out_s, out_f in self._eval_tape_groups(
                            buf):
                        self._ingest(group, evals, depth, st, on_row,
                                     out_s, out_f)

                for cand in self.enumerator.candidates_at_depth(depth):
                    buf.append(cand)
                    if len(buf) >= self.config.batch_size:
                        flush(buf)
                        buf = []
                if buf:
                    flush(buf)
            tg = time.perf_counter()
            self._flush_gray(depth, st, on_row)
            st.t_gray = time.perf_counter() - tg
            st.seconds = time.perf_counter() - t0
            self.stats.append(st)
            if on_depth is not None:
                on_depth(st)
        return self.stats

    def seed_cache_from_uniques(self, snapshot: Optional[dict] = None,
                                limit: Optional[int] = None):
        """Resume path: restore the jet cache for all reloaded uniques.

        With a ``snapshot`` (the run's jet-shard sidecar) the device state
        is restored bit-exactly — REQUIRED for resumed dedup to agree with
        stored fingerprint keys (the f32 device jets are not reproducible
        through the f64 oracle: ~2-4% of quantized fingerprints shift).
        Rows beyond the snapshot (uniques whose jets were never
        device-cached, e.g. a former final depth being extended) are
        re-evaluated through the float64 tape oracle.

        ``limit`` caps the number of cached rows to the original run's
        parent window (saved as ``cache_n`` at each depth barrier) — a
        mega-run whose uniques exceeded max_cache_rows must resume with
        the SAME truncated window or deeper depths would compose from
        parents the original run never used."""
        import jax.numpy as jnp
        total = self.enumerator.count_uniques()
        if limit is not None:
            total = min(total, limit)
        if total == 0:
            return
        n0 = 0
        if snapshot is not None:
            n0 = min(int(snapshot["n"]), total)
            if n0:
                # fp rows written by the current code are already
                # grid-snapped; snapping on load is idempotent and
                # restores the rows-are-on-grid invariant for sidecars
                # written before the snap existed (their stored KEYS
                # remain authoritative either way — see search.snap_fp_jets)
                from .parallel.search import snap_fp_jets_np
                self.cache.load_rows(
                    snapshot["screen"][:n0],
                    snap_fp_jets_np(np.asarray(snapshot["fp"][:n0],
                                               np.float32)))
        if n0 < total:
            if total > self.cache.capacity:
                self.cache._grow(total)
            rest = self._replay_composed_rows(n0, total)
            if rest.size:
                uniques = [self.enumerator.unique_at(int(i))
                           for i in rest]
                for group, evals, out_s, out_f in self._eval_tape_groups(
                        uniques):
                    uids = jnp.asarray(
                        np.asarray([u.uid for u in group],
                                   dtype=np.int32))
                    self.cache.screen = self.cache.screen.at[uids].set(
                        out_s.astype(self.cache.dtype))
                    self.cache.fp = self.cache.fp.at[uids].set(
                        out_f.astype(self.cache.dtype))
        self.cache.n = max(self.cache.n, total)

    def _replay_composed_rows(self, lo: int, total: int) -> np.ndarray:
        """Seed cache rows [lo, total) for COMPOSED uniques by replaying
        their structural (op, a, b) triples through the production
        kernels, depth-ascending — a unique's parents live at strictly
        lower depths, so every operand row is already cached (snapshot
        prefix, or an earlier replay depth) when its children dispatch.
        This reproduces the jets a fresh run would have appended
        bit-identically (every kernel path is asserted bit-equal:
        tests/test_structured.py, test_pipeline.py) at device speed —
        unlike the float64 tape-oracle reseed it replaces, whose
        f32-rounded rows could flip borderline screen verdicts of
        deeper children relative to a fresh run.  Returns the uids it
        cannot replay (leaves / depth-1 rows, which carry no triple);
        the caller tape-evaluates those.

        Reference analog: resume rebuilds validator pools from the run
        DB (general_method_paper_reproduction.py:973-1107); here the
        device cache is part of the resumable state and must match a
        fresh run exactly for dedup/screen parity."""
        import jax.numpy as jnp

        from .parallel.incremental import OP_INDEX

        enum = self.enumerator
        ops_raw = np.asarray(enum.u_op[lo:total])
        idx = np.arange(lo, total, dtype=np.int64)
        composed = idx[ops_raw >= 0]
        leftovers = idx[ops_raw < 0]
        if composed.size == 0:
            return leftovers
        # surface-op id -> kernel op id (OP_INDEX), via the name table
        op_lut = np.asarray(
            [OP_INDEX.get(n, -1) for n in enum._op_names], np.int32)
        depths = np.asarray(enum.u_depth[composed])
        kops = op_lut[np.asarray(enum.u_op[composed])]
        assert int(kops.min()) >= 0, "unknown surface op in replay"
        order = np.lexsort((composed, kops, depths))
        composed, depths, kops = (composed[order], depths[order],
                                  kops[order])
        a_all = np.asarray(enum.u_a[composed], np.int32)
        b_all = np.asarray(enum.u_b[composed], np.int32)
        b_all = np.where(b_all < 0, 0, b_all)
        saved_screened = self.candidates_screened  # replay is not
        #   screening work — keep the run's counters honest

        use_seg = self._use_segmented() and self.mesh is None
        TILE = 512
        SUPER = max(TILE, (self.config.batch_size // TILE) * TILE)
        n_tiles = SUPER // TILE
        seg = self._seg_kernel() if use_seg else None

        def scatter(uids_np, out_s, out_f, n_real=None):
            sl = slice(None) if n_real is None else slice(0, n_real)
            uids = jnp.asarray(np.asarray(uids_np, np.int32))
            self.cache.screen = self.cache.screen.at[uids].set(
                out_s[sl].astype(self.cache.dtype))
            self.cache.fp = self.cache.fp.at[uids].set(
                out_f[sl].astype(self.cache.dtype))

        pos = 0
        n = composed.size
        while pos < n:
            d = depths[pos]
            dend = pos + int(np.searchsorted(depths[pos:], d, "right"))
            # one depth at a time: a super must never contain a child of
            # a row it also contains (the kernel reads the cache)
            dp = pos
            if not use_seg:
                while dp < dend:
                    oend = dp + int(np.searchsorted(kops[dp:dend],
                                                    kops[dp], "right"))
                    name = None
                    for nm, i in OP_INDEX.items():
                        if i == int(kops[dp]):
                            name = nm
                            break
                    packed, out_s, out_f = self._eval_op_idx(
                        name, a_all[dp:oend], b_all[dp:oend])
                    scatter(composed[dp:oend], out_s, out_f,
                            n_real=oend - dp)
                    dp = oend
                pos = dend
                continue
            # segmented: pack the depth's op-runs into tile-aligned
            # superbatches.  Pads REPEAT the last real row of their run
            # (same op, same operands), so their kernel outputs are
            # bit-identical copies and scatter harmlessly onto that same
            # uid — no scratch row, no fresh executable shapes beyond
            # the production (SUPER, capacity-quantum) ones.
            while dp < dend:
                ab = np.zeros((SUPER, 2), np.int32)
                t_ops = np.zeros(n_tiles, np.int32)
                uids = np.zeros(SUPER, np.int64)
                fill = 0  # in tiles
                while dp < dend and fill < n_tiles:
                    oend = dp + int(np.searchsorted(kops[dp:dend],
                                                    kops[dp], "right"))
                    room = (n_tiles - fill) * TILE
                    take = min(oend - dp, room)
                    ntile = -(-take // TILE)
                    s = fill * TILE
                    ab[s:s + take, 0] = a_all[dp:dp + take]
                    ab[s:s + take, 1] = b_all[dp:dp + take]
                    uids[s:s + take] = composed[dp:dp + take]
                    pad = ntile * TILE - take
                    if pad:
                        ab[s + take:s + take + pad] = ab[s + take - 1]
                        uids[s + take:s + take + pad] = uids[s + take - 1]
                    t_ops[fill:fill + ntile] = kops[dp]
                    fill += ntile
                    dp += take
                if fill < n_tiles:  # depth tail: repeat-fill the super
                    s = fill * TILE
                    ab[s:] = ab[s - 1]
                    uids[s:] = uids[s - 1]
                    t_ops[fill:] = t_ops[fill - 1]
                t0 = time.perf_counter()
                packed, out_s, out_f = seg(
                    self.cache.screen, self.cache.fp, jnp.asarray(ab),
                    jnp.asarray(t_ops), self._spoints, self._fpoints)
                scatter(uids, out_s, out_f)
                self.device_seconds += time.perf_counter() - t0
            pos = dend
        self.candidates_screened = saved_screened
        return leftovers

    # ------------------------------------------------------------------
    def summary(self) -> Dict:
        return {
            "problem": self.problem.slug,
            "depths": [vars(s) for s in self.stats],
            "total_candidates": sum(s.candidates for s in self.stats),
            "total_unique": sum(s.unique for s in self.stats),
            "total_valid": len(self.valid_rows),
            "paper_solutions": sorted({r.paper_solution_name
                                       for r in self.valid_rows
                                       if r.paper_solution_name}),
            "device_seconds": self.device_seconds,
            "candidates_screened": self.candidates_screened,
        }
