"""Discovery pipeline: enumerate → screen/fingerprint on device → dedup →
float64 recheck → symbolic confirm → (optional) heavy checks.

This is the runtime that replaces the reference's orchestrator + process pool
(GeneralFoliationDiscovery.run_parallel_discovery,
general_method_paper_reproduction.py:749-904).  There are no queues and no
worker processes: the depth barrier is the natural synchronization point, and
within a depth candidate batches stream through one fused device kernel.

Validation funnel (preserves the reference's staged semantics, §3.3-3.4 of
SURVEY.md, while fixing its treat-unevaluable-as-zero defect):

  stage 0  f32 on-device screen at P collocation points
           non-finite residual ⇒ reject;   rel > screen_rtol ⇒ reject
  stage 1  fingerprint dedup (on-device hashes; host keeps the fp → uid map)
  stage 2  float64 host recheck of screen survivors (NumPy oracle)
  stage 3  SymPy exact-zero confirm (the reference's "exact zero" semantics)
  stage 4  heavy checks (regularity/finiteness/anchor), deferred by default
           exactly like the reference's defer_heavy_checks fast path
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from .enumerator import Candidate, Enumerator
from .models.base import Problem
from .ops.interpreter import eval_jets_np
from .parallel.search import ScreenResult, make_search_kernel
from .utils.config import SearchConfig


@dataclass
class Row:
    """One stored expression — column parity with the reference's
    expressions_<run_id> table (general:655-678)."""
    id: int
    expression: str
    normalized: str
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


@dataclass
class DepthStats:
    depth: int
    candidates: int = 0
    unique: int = 0
    valid: int = 0
    seconds: float = 0.0


class DiscoveryEngine:

    def __init__(self, problem: Problem, config: Optional[SearchConfig] = None,
                 mesh=None):
        from .utils.compile_cache import enable_compile_cache
        enable_compile_cache()
        import jax.numpy as jnp
        self.problem = problem
        self.config = config or SearchConfig()
        self.mesh = mesh
        self.enumerator = Enumerator(
            problem,
            include_special_ops=self.config.include_special_ops,
            prune=self.config.prune)
        self.screen_rtol = (self.config.screen_rtol
                            if self.config.screen_rtol is not None
                            else problem.screen_rtol)
        self.confirm_rtol = (self.config.confirm_rtol
                             if self.config.confirm_rtol is not None
                             else problem.confirm_rtol)
        self.fp_to_uid: Dict[Tuple[int, int], int] = {}
        self.rows: List[Row] = []
        self.stats: List[DepthStats] = []
        self.valid_rows: List[Row] = []
        self._next_row_id = 1
        self._spoints = jnp.asarray(problem.screen_points, jnp.float32)
        self._fpoints = jnp.asarray(problem.fingerprint_points, jnp.float32)
        self._consts_f32 = None  # rebuilt per batch (table can grow)
        self._known_fp: Dict[Tuple[int, int], str] = {}
        self._known_sympy = {}
        self.candidates_screened = 0
        self.device_seconds = 0.0
        self._prepare_known_solutions()

    # ------------------------------------------------------------------
    def _bucket_len(self, L: int) -> int:
        for b in self.config.buckets:
            if L <= b:
                return b
        raise ValueError(f"tape length {L} exceeds largest bucket "
                         f"{self.config.buckets[-1]}")

    def _kernel(self, bucket: int):
        return make_search_kernel(
            order=self.problem.residual_order,
            max_nodes=bucket,
            residual_key=self.problem.get_residual_key(),
            screen_rtol=float(self.screen_rtol),
            n_screen=len(self.problem.screen_points),
            n_fp=len(self.problem.fingerprint_points),
        )

    def _eval_candidates(self, cands: List[Candidate]):
        """Run the fused kernel over a candidate list (bucketed by tape
        length).  Returns per-candidate dicts aligned with ``cands``."""
        import jax
        import jax.numpy as jnp

        groups: Dict[int, List[int]] = {}
        for i, c in enumerate(cands):
            groups.setdefault(self._bucket_len(len(c.tape)), []).append(i)

        out = [None] * len(cands)
        consts = jnp.asarray(self.problem.consts.as_array(np.float32))
        t0 = time.perf_counter()
        for bucket, idxs in sorted(groups.items()):
            tapes = np.stack([cands[i].tape.padded(bucket) for i in idxs])
            lengths = np.array([len(cands[i].tape) for i in idxs],
                               dtype=np.int32)
            if self.mesh is not None:
                from .parallel.mesh import pad_to_multiple, shard_batch
                n = len(idxs)
                nd = self.mesh.devices.size
                npad = pad_to_multiple(max(n, nd), nd)
                if npad != n:
                    tapes = np.pad(tapes, ((0, npad - n), (0, 0), (0, 0)))
                    lengths = np.pad(lengths, (0, npad - n),
                                     constant_values=1)
                sh = shard_batch(self.mesh)
                tapes_d = jax.device_put(jnp.asarray(tapes), sh)
                lengths_d = jax.device_put(jnp.asarray(lengths), sh)
            else:
                tapes_d = jnp.asarray(tapes)
                lengths_d = jnp.asarray(lengths)
            res: ScreenResult = self._kernel(bucket)(
                tapes_d, lengths_d, consts, self._spoints, self._fpoints)
            res = jax.tree.map(np.asarray, res)
            for j, i in enumerate(idxs):
                out[i] = {
                    "screen_ok": bool(res.screen_ok[j]),
                    "rel_max": float(res.rel_max[j]),
                    "nonfinite": bool(res.nonfinite[j]),
                    "is_const": bool(res.is_const[j]),
                    "fp": (int(res.fp_a[j]), int(res.fp_b[j])),
                    "fp_finite": bool(res.fp_finite[j]),
                    "fp_vals": res.fp_vals[j],
                }
        self.device_seconds += time.perf_counter() - t0
        self.candidates_screened += len(cands)
        return out

    # ------------------------------------------------------------------
    def _prepare_known_solutions(self):
        """Fingerprint the known solutions so generated matches can be
        tagged (reference general:1785-1798)."""
        import sympy as sp
        knowns = list(self.problem.known_solutions.items())
        if not knowns:
            return
        cands = []
        for expr_str, name in knowns:
            t = self.problem.parse(expr_str)
            cands.append(Candidate(tape=t, depth=0, expr_str=expr_str,
                                   top_op="", has_var=True))
        evals = self._eval_candidates(cands)
        for (expr_str, name), ev in zip(knowns, evals):
            if ev["fp_finite"]:
                self._known_fp[name] = np.asarray(ev["fp_vals"],
                                                  dtype=np.float64)
                self._known_sympy[name] = self.problem.tape_to_sympy(
                    self.problem.parse(expr_str))

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
    def _recheck_f64(self, cand: Candidate) -> Tuple[bool, float]:
        jets = eval_jets_np(cand.tape.rows, len(cand.tape),
                            self.problem.consts.as_array(np.float64),
                            self.problem.screen_points,
                            self.problem.residual_order)
        res, scale = self.problem.residual_fn(
            jets, self.problem.screen_points, np)
        with np.errstate(invalid="ignore"):
            rel = np.abs(res) / (scale + 1e-300)
        if not (np.isfinite(res).all() and np.isfinite(scale).all()):
            return False, float("inf")
        return bool(rel.max() < self.confirm_rtol), float(rel.max())

    def _confirm_symbolic(self, cand: Candidate) -> Tuple[Optional[bool], str]:
        """Returns (verdict, method). verdict None => skipped (too large)."""
        if not self.config.confirm_symbolic:
            return None, "numeric"
        if len(cand.expr_str) > self.config.sympy_len_limit:
            return None, "numeric(len-limit)"
        try:
            u = self.problem.tape_to_sympy(cand.tape)
            return self.problem.exact_zero_residual(u), "symbolic"
        except Exception as e:
            return None, f"numeric(symbolic-error)"

    # ------------------------------------------------------------------
    def _process_batch(self, cands: List[Candidate], depth: int,
                       st: DepthStats, on_row=None):
        evals = self._eval_candidates(cands)
        for cand, ev in zip(cands, evals):
            st.candidates += 1
            if ev["fp_finite"]:
                fp = ev["fp"]
            else:
                # structural identity for non-finite expressions (the
                # reference's normalizer also fell back to the raw string)
                fp = ("tape", hash(cand.tape.key()))
            if fp in self.fp_to_uid:
                continue  # duplicate of an earlier unique
            u = self.enumerator.add_unique(cand)
            self.fp_to_uid[fp] = u.uid
            st.unique += 1

            if ev["is_const"] or not cand.has_var:
                if self.config.store_constants:
                    self._add_row(cand, depth, False,
                                  "Zero gradient (constant expression)",
                                  "screen", fp, on_row)
                continue

            if not ev["fp_finite"] or ev["nonfinite"]:
                self._add_row(cand, depth, False,
                              "Non-finite on safe domain (rejected)",
                              "screen", fp, on_row)
                continue

            if not ev["screen_ok"]:
                self._add_row(
                    cand, depth, False,
                    f"PDE residual != 0 (screen relres ≈ {ev['rel_max']:.2e})",
                    "screen", fp, on_row)
                continue

            # stage 2: float64 recheck
            ok64, rel64 = self._recheck_f64(cand)
            if not ok64:
                self._add_row(
                    cand, depth, False,
                    f"Invalid (f64 recheck relres ≈ {rel64:.2e})",
                    "screen+f64", fp, on_row)
                continue

            # stage 3: symbolic confirm
            verdict, method = self._confirm_symbolic(cand)
            if verdict is False:
                self._add_row(
                    cand, depth, False,
                    "Invalid (symbolic residual != 0; numeric zero was "
                    f"relres ≈ {rel64:.2e})",
                    "screen+f64+symbolic", fp, on_row)
                continue
            if verdict is True:
                reason = "Valid (exact zero; heavy checks deferred)"
            else:
                reason = (f"Valid (numeric zero, relres ≈ {rel64:.2e}; "
                          "symbolic confirm skipped)")

            row = self._add_row(cand, depth, True, reason,
                                f"screen+f64+{method}", fp, on_row,
                                known=self._match_known(cand, ev["fp_vals"]))
            st.valid += 1

            # stage 4: heavy checks
            if not self.config.defer_heavy_checks:
                try:
                    hu = self.problem.tape_to_sympy(cand.tape)
                    h_ok, h_reason = self.problem.heavy_checks(hu)
                except Exception as e:
                    h_ok, h_reason = False, f"heavy check error: {e}"
                row.heavy_is_valid = h_ok
                row.heavy_reason = h_reason
                if not h_ok:
                    row.is_valid = False
                    row.validation_reason = h_reason
                    st.valid -= 1
                    self.valid_rows.remove(row)

    def _add_row(self, cand, depth, is_valid, reason, method, fp,
                 on_row=None, known=None) -> Row:
        row = Row(
            id=self._next_row_id,
            expression=cand.expr_str,
            normalized=cand.expr_str,
            signature=(f"{fp[0]:08x}{fp[1]:08x}"
                       if isinstance(fp[0], int) else
                       f"tape{fp[1] & 0xFFFFFFFFFFFFFFFF:016x}"),
            depth=depth,
            is_valid=is_valid,
            validation_reason=reason,
            validator_method=method,
            is_paper_solution=known is not None,
            paper_solution_name=known,
        )
        self._next_row_id += 1
        self.rows.append(row)
        if is_valid:
            self.valid_rows.append(row)
        if on_row is not None:
            on_row(row)
        return row

    # ------------------------------------------------------------------
    def run(self, max_depth: Optional[int] = None, on_row=None,
            on_depth=None, start_depth: int = 1) -> List[DepthStats]:
        max_depth = max_depth or self.config.max_depth
        for depth in range(start_depth, max_depth + 1):
            t0 = time.perf_counter()
            st = DepthStats(depth=depth)
            if depth == 1:
                batch = self.enumerator.primitive_candidates()
                self._process_batch(batch, depth, st, on_row)
            else:
                buf: List[Candidate] = []
                for cand in self.enumerator.candidates_at_depth(depth):
                    buf.append(cand)
                    if len(buf) >= self.config.batch_size:
                        self._process_batch(buf, depth, st, on_row)
                        buf = []
                if buf:
                    self._process_batch(buf, depth, st, on_row)
            st.seconds = time.perf_counter() - t0
            self.stats.append(st)
            if on_depth is not None:
                on_depth(st)
        return self.stats

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
