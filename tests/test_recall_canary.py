"""Recall canaries: planted zero-residual candidates must survive the
funnel (VERDICT round-2 missing #5).

The mega-run false-positive story was one-sided — "0 false positives"
configurations have zero true solutions, so nothing checked that TRUE
solutions keep surviving at scale (dedup, thresholds, no-audit row
elision).  This plants known-valid deep expressions into a full no-audit
depth-4 force_free stream and asserts each is recovered as a stored
valid row, located via its fingerprint dedup key (representative
spellings may differ).

Canary family: any u(rho) alone is a valid (degenerate) foliation —
u_z = 0 makes both Lie columns vanish identically — so deep pure-rho
compositions are a priori valid at every depth.  The 7 Compère knowns
cover the non-degenerate families (recall asserted via the report's
paper-solution tagging, reference general:1785-1798).
"""

import numpy as np

from pde_engine_tpu.models import load_problem
from pde_engine_tpu.pipeline import DiscoveryEngine
from pde_engine_tpu.utils.config import SearchConfig
from pde_engine_tpu.utils.hashing import FP_MASK


# deep (depth-3/4) pure-rho canaries with exactly-zero foliation residual
CANARIES = [
    "square(square(rho))",            # rho^4, depth 3
    "exp_neg(square(rho))",           # exp(-rho^2), depth 3
    "sqrt(square(square(rho)))",      # rho^4 via Abs round-trip, depth 4
]


def _canary_vals(problem, expr_str: str) -> np.ndarray:
    """Fingerprint VALUES of an expression via the f64 oracle, after
    asserting it passes its own screen.  Since the grid snap
    (search.snap_fp_jets), engine dedup KEYS are a function of the
    snapped-parent composition chain, not of a direct evaluation — a
    direct-oracle key can land one quantization cell over — so canaries
    are located by value tolerance + SymPy equality (the same discipline
    as the engine's knowns matching, pipeline._match_known), and the key
    path is asserted via the engine's own stored signature instead."""
    from pde_engine_tpu.ops.interpreter import eval_jets_np_many
    from pde_engine_tpu.parallel.search import verdicts_from_jets_np

    t = problem.parse(expr_str)
    tapes = np.stack([t.padded(max(len(t), 16))])
    lengths = np.array([len(t)], np.int64)
    consts = problem.consts.as_array(np.float64)
    jets = eval_jets_np_many(tapes, lengths, consts,
                             problem.screen_points, problem.residual_order)
    fj = eval_jets_np_many(tapes, lengths, consts,
                           problem.fingerprint_points, 1)
    sr = verdicts_from_jets_np(jets, fj, problem.screen_points,
                               problem.residual_fn,
                               float(problem.screen_rtol))
    assert bool(sr.screen_ok[0]), f"canary {expr_str} fails its own screen"
    assert bool(sr.fp_finite[0])
    return np.asarray(fj[0], np.float64).ravel()


def test_no_audit_stream_recovers_planted_canaries():
    p = load_problem("force_free")
    eng = DiscoveryEngine(p, SearchConfig(max_depth=4,
                                          audit_rejects=False))
    eng.run(4)

    # all 7 Compère knowns recovered in the no-audit stream
    found = {r.paper_solution_name for r in eng.valid_rows
             if r.paper_solution_name}
    assert len(found) == 7, sorted(found)

    # every planted canary survives as a stored valid row: located by
    # fingerprint-value tolerance, confirmed by exact SymPy equality
    # (representative spellings legitimately differ), and the winning
    # row's stored dedup key must map back to its own uid in the engine's
    # map (the key-location path, tested on the engine's OWN snapped
    # values so it cannot drift with the quantization grid)
    import sympy as sp
    for expr in CANARIES:
        vals = _canary_vals(p, expr)
        u_canary = p.tape_to_sympy(p.parse(expr))
        hit = None
        for r in eng.valid_rows:
            row_fp = np.asarray(eng.cache.fp[r.id - 1], np.float64)
            if np.max(np.abs(row_fp - vals) / (np.abs(vals) + 1.0)) < 1e-3:
                u_row = p.tape_to_sympy(p.parse(r.expression))
                if sp.simplify(u_row - u_canary) == 0:
                    hit = r
                    break
        assert hit is not None, \
            f"canary {expr} not recovered as a stored valid row"
        key = int(hit.signature, 16)  # fp-finite: already FP_MASKed
        assert eng.fp_to_uid.get(key) == hit.id - 1, \
            f"canary {expr}: stored key does not map to its own uid"
