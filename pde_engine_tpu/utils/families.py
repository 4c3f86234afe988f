"""Array-level family tagging for mega-run post-hoc analysis.

The reference's post-hoc suite (general_method_paper_reproduction.py:
1826-2021, 2024-2136) walks every stored row through SymPy — fine at its
10^3-row scale, unusable on this engine's mega-artifacts (round 3's
force_free depth-6 report: 6.67M valid rows, "novel-class grouping
SKIPPED").  Most of such a valid set is a handful of DEGENERATE FAMILIES
that are detectable from numeric order-1 jets at the fingerprint probe
points with no symbolic work at all:

- ``constant``          — zero gradient everywhere (shouldn't be stored
                          valid, tagged defensively);
- ``no_<var>``          — the expression does not depend on one of the
                          two coordinates.  For force_free this is the
                          dominant degenerate class: any u(rho) makes
                          the foliation determinant vanish identically
                          (u_z ≡ 0 ⇒ det ≡ 0), so millions of valid rows
                          are one physical statement;
- ``general``           — depends on both coordinates: the rows worth
                          SymPy-classing individually.

Problems can refine the split with :meth:`~..models.base.Problem`
``family_probe_points`` / ``family_extra_tag`` (e.g. Grad-Shafranov tags
axis-singular fluxes: physical flux surfaces are even in rho with
u_rho -> 0 on the axis; 1/rho-type fluxes satisfy the residual but are
singular there).

Evaluation rides the float64 tape oracle (ops/interpreter.py) in chunks:
~10^4 rows/s/core including parsing, ~10^6/s when tapes come from the
registry (enumerator.tapes_batch) — minutes for the engine's own
mega-artifacts instead of weeks of per-row SymPy.
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

CHUNK = 8192


def _grad_tol(vals: np.ndarray, grads: np.ndarray) -> np.ndarray:
    """Per-row scale for deciding a gradient component is 'exactly' zero.

    The f64 oracle produces exact zeros for structural independence
    (exact-zero arithmetic propagates), so the test is equality — but a
    relative floor guards against denormal dust from exp/log chains."""
    scale = np.maximum(np.max(np.abs(vals), axis=-1),
                       np.max(np.abs(grads).reshape(grads.shape[0], -1),
                              axis=-1))
    return 1e-250 + 1e-14 * scale


def tag_rows(problem, exprs: Sequence[str],
             tapes_fn=None,
             progress=None) -> Tuple[np.ndarray, List[str]]:
    """Tag each expression with a family id.

    ``tapes_fn(lo, hi) -> (tapes, lengths)`` supplies pre-built tapes for
    rows [lo, hi) (the registry fast path); when None, expressions are
    parsed (the DB-only path).  Returns (codes int32[n], family_names)
    where codes index family_names.  Rows that fail to parse/evaluate get
    family ``unparsed``.
    """
    from ..ops.interpreter import eval_jets_np_many

    v0, v1 = problem.var_names
    names = ["constant", f"no_{v1}", f"no_{v0}", "general", "unparsed"]
    extra_name = getattr(problem, "family_extra_name", None)
    if extra_name:
        names.insert(3, extra_name)  # refined tag precedes 'general'
    name_idx = {nm: i for i, nm in enumerate(names)}

    fpts = np.asarray(problem.fingerprint_points, np.float64)
    apts = np.asarray(getattr(problem, "family_probe_points", None)
                      if getattr(problem, "family_probe_points", None)
                      is not None else np.zeros((0, 2)), np.float64)

    n = len(exprs)
    codes = np.full(n, name_idx["unparsed"], np.int32)
    t0 = time.perf_counter()
    for lo in range(0, n, CHUNK):
        hi = min(lo + CHUNK, n)
        ok_idx = np.arange(lo, hi)
        if tapes_fn is not None:
            tapes, lengths = tapes_fn(lo, hi)
        else:
            tape_list, kept = [], []
            for i in range(lo, hi):
                try:
                    tape_list.append(problem.parse(exprs[i]))
                    kept.append(i)
                except Exception:
                    pass
            if not tape_list:
                continue
            ok_idx = np.asarray(kept)
            L = max(len(t) for t in tape_list)
            tapes = np.stack([t.padded(L) for t in tape_list])
            lengths = np.array([len(t) for t in tape_list], np.int64)
        # snapshot consts AFTER parsing: parse() interns constants the
        # stored spelling needs (e.g. "sqrt(rho**2)+rho" simplifies to
        # 2*rho, interning 2) — a pre-parse snapshot indexes out of the
        # table (caught by eval_jets_native's bounds guard)
        consts = problem.consts.as_array(np.float64)
        with np.errstate(all="ignore"):
            fj = eval_jets_np_many(tapes, lengths, consts, fpts, 1)
            vals = fj[..., 0]                       # [k, F]
            g0 = fj[..., 1]                         # d/d var0
            g1 = fj[..., 2]                         # d/d var1
            tol = _grad_tol(vals, fj[..., 1:])
            z0 = np.all(np.abs(g0) <= tol[:, None], axis=-1)
            z1 = np.all(np.abs(g1) <= tol[:, None], axis=-1)
            c = np.full(ok_idx.size, name_idx["general"], np.int32)
            c[z1] = name_idx[f"no_{v1}"]
            c[z0] = name_idx[f"no_{v0}"]
            c[z0 & z1] = name_idx["constant"]
            if extra_name and apts.size:
                aj = eval_jets_np_many(tapes, lengths, consts, apts, 1)
                refine = problem.family_extra_tag(vals, fj, aj)
                # refine only rows still 'general' (degenerate families
                # keep their primary tag)
                c[(c == name_idx["general"]) & refine] = \
                    name_idx[extra_name]
        codes[ok_idx] = c
        if progress is not None and (hi == n or (lo // CHUNK) % 16 == 15):
            rate = hi / max(time.perf_counter() - t0, 1e-9)
            progress(f"  families: {hi}/{n} rows ({rate:,.0f}/s)")
    return codes, names


def summarize(codes: np.ndarray, names: List[str],
              exprs: Sequence[str],
              reps_per_family: int = 3) -> Dict:
    """Family breakdown dict: counts + shortest-expression representatives
    (cost-ranked cheaply by length — SymPy stays out of the hot path)."""
    out = {}
    order = np.argsort(np.fromiter((len(e) for e in exprs), np.int64,
                                   len(exprs))) if len(exprs) else []
    by_fam: Dict[int, List[str]] = defaultdict(list)
    for i in order:
        c = int(codes[i])
        if len(by_fam[c]) < reps_per_family:
            by_fam[c].append(exprs[int(i)])
    counts = np.bincount(codes, minlength=len(names))
    for ci, nm in enumerate(names):
        if counts[ci]:
            out[nm] = {"count": int(counts[ci]),
                       "representatives": by_fam.get(ci, [])}
    return out
