"""Fingerprint-dedup collision audit (SURVEY.md §7 stage 5).

The numeric fingerprint replaces the reference's normalizer as the dedup
identity; its two failure modes are
- **false merge** — two SymPy-distinct expressions land on one key: a
  candidate (possibly a solution) is silently dropped.  Must be ZERO.
- **false split** — two equivalent forms land on different keys: a
  duplicate survives to validation.  Harmless for correctness, costs
  compute; measured and bounded here.
"""

import numpy as np
import pytest
import sympy as sp

from pde_engine_tpu.enumerator import Enumerator
from pde_engine_tpu.models import load_problem
from pde_engine_tpu.ops.interpreter import eval_jets_np_many
from pde_engine_tpu.parallel.search import verdicts_from_jets_np


@pytest.fixture(scope="module")
def problem():
    return load_problem("force_free")


def _fingerprints(problem, exprs):
    """Finite fingerprint key per expression (None if non-finite)."""
    tapes = [problem.parse(s) for s in exprs]
    L = max(len(t) for t in tapes)
    arr = np.stack([t.padded(L) for t in tapes])
    lengths = np.array([len(t) for t in tapes], np.int64)
    consts = problem.consts.as_array(np.float64)
    jets = eval_jets_np_many(arr, lengths, consts,
                             problem.screen_points, problem.residual_order)
    fj = eval_jets_np_many(arr, lengths, consts,
                           problem.fingerprint_points, 1)
    sr = verdicts_from_jets_np(jets, fj, problem.screen_points,
                               problem.residual_fn,
                               float(problem.screen_rtol))
    out = []
    for i in range(len(exprs)):
        if sr.fp_finite[i]:
            out.append((int(sr.fp_a[i]) << 32) | int(sr.fp_b[i]))
        else:
            out.append(None)
    return out


def _depth2_candidates(problem):
    """Every pruned depth-2 candidate expression (pre-dedup)."""
    enum = Enumerator(problem, include_special_ops=True, prune=True)
    for c in enum.primitive_candidates():
        enum.add_unique(c)
    return [c.expr_str for c in enum.candidates_at_depth(2)]


@pytest.fixture(scope="module")
def depth2_audit(problem):
    exprs = _depth2_candidates(problem)
    fps = _fingerprints(problem, exprs)
    return exprs, fps


def _canon(problem, s):
    u = problem.tape_to_sympy(problem.parse(s))
    return sp.srepr(sp.simplify(sp.together(sp.cancel(u))))


def test_no_false_merges_depth2(problem, depth2_audit):
    """Every multi-expression fingerprint group must be a SymPy-verified
    equivalence class — a false merge silently loses a candidate."""
    exprs, fps = depth2_audit
    groups = {}
    for s, fp in zip(exprs, fps):
        if fp is not None:
            groups.setdefault(fp, []).append(s)
    checked = 0
    for fp, members in groups.items():
        if len(members) < 2:
            continue
        u0 = problem.tape_to_sympy(problem.parse(members[0]))
        for other in members[1:]:
            u1 = problem.tape_to_sympy(problem.parse(other))
            assert sp.simplify(u0 - u1) == 0, (members[0], other)
            checked += 1
    assert checked > 0  # the audit must actually exercise merges


def test_false_split_rate_depth2(problem, depth2_audit):
    """Equivalent forms mapping to different fingerprints only cost
    compute, but the rate must stay small for the dedup to be useful."""
    exprs, fps = depth2_audit
    classes = {}
    for s, fp in zip(exprs, fps):
        if fp is None:
            continue
        classes.setdefault(_canon(problem, s), set()).add(fp)
    n_split = sum(1 for v in classes.values() if len(v) > 1)
    rate = n_split / max(1, len(classes))
    assert rate < 0.05, f"false-split rate {rate:.3f} ({n_split} classes)"


def test_known_equivalent_forms_merge(problem):
    """Forms the reference's normalizer FAILED to merge (SURVEY.md §2 #7:
    op-wrapped strings came back unnormalized) must share a key here."""
    pairs = [
        ("square(rho)", "rho * rho"),
        ("sqrt(rho**2 + z**2)", "(rho**2 + z**2)**(1/2)"),
        ("exp(log(rho))", "rho"),
        ("inv(inv(z + 2))", "z + 2"),
        ("neg(neg(rho))", "rho"),
        ("rho / (1 - z)", "geom_sum(rho, z)"),
        ("pow_3_2(rho**2 + z**2)", "(rho**2 + z**2) * sqrt(rho**2 + z**2)"),
    ]
    for a, b in pairs:
        fa, fb = _fingerprints(problem, [a, b])
        assert fa is not None and fa == fb, (a, b, fa, fb)


def test_known_distinct_forms_split(problem):
    """Inequivalent expressions must never share a key (value+gradient
    fingerprints separate u from u+c and u from 2u even though the
    foliation constraint itself is reparameterization-invariant)."""
    pairs = [
        ("rho**2", "rho**2 + 1"),
        ("rho**2", "2*rho**2"),
        ("rho*z", "z*rho + z"),
        ("sqrt(rho**2 + z**2)", "sqrt(rho**2 + z**2) - z"),
        ("exp(z)", "exp(-z)"),
    ]
    for a, b in pairs:
        fa, fb = _fingerprints(problem, [a, b])
        assert fa != fb, (a, b)
