"""Jet algebra and interpreter agreement with SymPy derivatives.

The reference's de-facto regression suite is its set of known solutions
(SURVEY.md §4 item 1); here we check that the tape interpreter's jets match
SymPy values and partial derivatives (to 4th order) on those expressions.
Reference expressions: problems/__init__.py:85-93.
"""

import numpy as np
import pytest
import sympy as sp

from pde_engine_tpu.ops import optable as ot
from pde_engine_tpu.ops import tape as tp
from pde_engine_tpu.ops.interpreter import eval_jets_np
from pde_engine_tpu.ops.jets import factorial_scale, index_map, monomials, n_coeffs

RHO = sp.Symbol("rho", real=True, positive=True)
Z = sp.Symbol("z", real=True)

KNOWN_FF = [
    RHO**2,
    RHO**2 * Z,
    1 - Z / sp.sqrt(RHO**2 + Z**2),
    RHO**2 / (RHO**2 + Z**2) ** sp.Rational(3, 2),
    sp.sqrt(RHO**2 + Z**2) - Z,
    sp.sqrt(Z**2 + (RHO - 1) ** 2) - sp.sqrt(Z**2 + (RHO + 1) ** 2),
    RHO**2 * sp.exp(-2 * Z),
]

EXTRA = [
    sp.log(RHO) * Z,
    sp.exp(RHO * Z) / (RHO + Z),
    (RHO + Z) ** sp.Rational(-3, 2),
    RHO / (1 - Z),
    sp.Rational(1, 3) * RHO + 2,
]

POINTS = np.array([[0.8, 6 / 7], [0.5, 0.31], [1.2, 0.9]])


def sympy_jet(expr, pt, order):
    """Ground-truth jet from sympy.diff."""
    out = []
    for (i, j) in monomials(order):
        d = sp.diff(expr, RHO, i, Z, j)
        val = float(d.subs({RHO: sp.Rational(pt[0]).limit_denominator(10**12),
                            Z: sp.Rational(pt[1]).limit_denominator(10**12)}))
        out.append(val / (sp.factorial(i) * sp.factorial(j)))
    return np.array(out, dtype=np.float64)


@pytest.mark.parametrize("expr", KNOWN_FF + EXTRA)
@pytest.mark.parametrize("order", [1, 2, 4])
def test_np_interpreter_matches_sympy(expr, order):
    consts = tp.ConstTable()
    t = tp.from_sympy(expr, consts, (RHO, Z))
    jets = eval_jets_np(t.rows, len(t), consts.as_array(), POINTS, order)
    for pi, pt in enumerate(POINTS):
        want = sympy_jet(expr, pt, order)
        got = jets[pi]
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_jax_interpreter_matches_np():
    import jax.numpy as jnp
    from pde_engine_tpu.ops.interpreter import batched_evaluator

    order, max_nodes = 4, 32
    consts = tp.ConstTable()
    tapes, lengths = [], []
    for expr in KNOWN_FF + EXTRA:
        t = tp.from_sympy(expr, consts, (RHO, Z))
        tapes.append(t.padded(max_nodes))
        lengths.append(len(t))
    tapes = np.stack(tapes)
    lengths = np.array(lengths, dtype=np.int32)
    carr = consts.as_array(np.float32, pad_to=8)

    run = batched_evaluator(order, max_nodes)
    got = np.asarray(run(jnp.asarray(tapes), jnp.asarray(lengths),
                         jnp.asarray(carr), jnp.asarray(POINTS, np.float32)))

    for n, expr in enumerate(KNOWN_FF + EXTRA):
        want = eval_jets_np(tapes[n], lengths[n], consts.as_array(),
                            POINTS, order)
        scale = np.maximum(np.abs(want), 1.0)
        np.testing.assert_allclose(got[n] / scale, want / scale,
                                   rtol=0, atol=3e-5,
                                   err_msg=str(expr))


def test_domain_violations_are_nan_not_zero():
    """Non-finite evaluation must surface as NaN/Inf, never silently as 0 —
    the reference's biggest defect class (4,443 bogus `1/(1-1)` Kerr
    survivors, SURVEY.md §4)."""
    consts = tp.ConstTable()
    # 1 / (1 - 1)
    one = tp.leaf_const(1, consts)
    t = tp.apply_binary(ot.BINARY_OPS["geom_sum"], one, one, consts)
    jets = eval_jets_np(t.rows, len(t), consts.as_array(), POINTS, 2)
    assert not np.isfinite(jets[:, 0]).any()

    # sqrt of a negative
    z = tp.leaf_var(1)
    negz = tp.apply_unary(ot.UNARY_OPS["neg"], z, consts)
    s = tp.apply_unary(ot.UNARY_OPS["sqrt"], negz, consts)
    jets = eval_jets_np(s.rows, len(s), consts.as_array(), POINTS, 2)
    assert np.isnan(jets[:, 0]).all()


def test_square_of_zero_is_exact():
    """square must use exact integer-power semantics (0**2 == 0, no NaN
    from 0 * inf in the generic pow derivative table)."""
    consts = tp.ConstTable()
    z = tp.leaf_var(1)
    d = tp.apply_binary(ot.BINARY_OPS["sub"], z, tp.leaf_var(1), consts)
    sq = tp.apply_unary(ot.UNARY_OPS["square"], d, consts)
    jets = eval_jets_np(sq.rows, len(sq), consts.as_array(), POINTS, 4)
    assert np.isfinite(jets).all()
    np.testing.assert_allclose(jets[:, 0], 0.0)
