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


def _canary_key(problem, expr_str: str) -> int:
    """Fingerprint dedup key of an expression via the f64 oracle (the
    same tolerance-compatible quantization the device path uses)."""
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
    return int(((np.uint64(sr.fp_a[0]) << np.uint64(32))
                | np.uint64(sr.fp_b[0])) & np.uint64(FP_MASK))


def test_no_audit_stream_recovers_planted_canaries():
    p = load_problem("force_free")
    eng = DiscoveryEngine(p, SearchConfig(max_depth=4,
                                          audit_rejects=False))
    eng.run(4)

    # all 7 Compère knowns recovered in the no-audit stream
    found = {r.paper_solution_name for r in eng.valid_rows
             if r.paper_solution_name}
    assert len(found) == 7, sorted(found)

    # every planted canary survives: its fingerprint key maps to a unique
    # whose row is stored valid
    valid_ids = {r.id for r in eng.valid_rows}
    for expr in CANARIES:
        key = _canary_key(p, expr)
        uid = eng.fp_to_uid.get(key)
        assert uid is not None, f"canary {expr} missing from dedup map"
        assert uid + 1 in valid_ids, \
            f"canary {expr} (uid {uid}) not stored as a valid row"
