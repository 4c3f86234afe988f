"""Vmapped branchless tape interpreter (the hot loop).

Replaces the reference's per-expression SymPy ``sympify``/``diff``/``evalf``
validation (problems/force_free/validator.py:260-437,
problems/kerr_magnetosphere/validator.py:210-345) with a single SPMD program:
every candidate tape is executed by the *same* compiled stack-free SSA
interpreter, vmapped over ``(candidates, points)``; derivatives come from the
jet algebra in :mod:`.jets`, not nested autodiff.

Design notes (TPU):
- ``lax.scan`` over node index with a ``(max_nodes, P, T)`` value buffer —
  static shapes, no data-dependent control flow.
- Per node, all candidate results are computed element-wise on the VPU and
  picked with a ``jnp.where`` chain on the opcode (NaNs in unselected
  branches are discarded, never propagated).
- All unary transcendental families (pow/exp/log) share one Horner jet
  composition; its derivative table ``fs`` is opcode-selected.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import optable as ot
from .jets import (
    exp_fs,
    jet_compose,
    jet_const,
    jet_mul,
    jet_var,
    log_fs,
    n_coeffs,
    pow_fs,
)


def _make_eval_one(order: int, max_nodes: int):
    T = n_coeffs(order)

    def eval_one(tape, length, consts, var0j, var1j):
        """Evaluate one tape at all points.

        tape: int32[max_nodes, 3]; length: int32[]; consts: f[K];
        var0j/var1j: f[P, T].  Returns f[P, T] jet of the result register.
        """
        P = var0j.shape[0]
        dtype = var0j.dtype
        buf0 = jnp.zeros((max_nodes, P, T), dtype=dtype)
        idx = jnp.arange(max_nodes, dtype=jnp.int32)

        def step(buf, node_and_i):
            node, i = node_and_i
            opc, a, b = node[0], node[1], node[2]
            av = jax.lax.dynamic_index_in_dim(buf, a, 0, keepdims=False)
            bvr = jax.lax.dynamic_index_in_dim(buf, b, 0, keepdims=False)
            const_val = consts[jnp.clip(b, 0, consts.shape[0] - 1)].astype(dtype)

            add = av + bvr
            sub = av - bvr
            mul = jet_mul(av, bvr, order, jnp)
            neg = -av

            v = av[..., 0]
            fs_pows = [pow_fs(v, p, order, jnp) for p in ot.POW_EXPONENTS]
            fs_exp = exp_fs(v, order, jnp)
            fs_log = log_fs(v, order, jnp)
            is_exp = opc == ot.EXP
            is_log = opc == ot.LOG
            fs_sel = []
            for k in range(order + 1):
                fk = fs_pows[0][k]
                for pi in range(1, len(ot.POW_EXPONENTS)):
                    fk = jnp.where(b == pi, fs_pows[pi][k], fk)
                fk = jnp.where(is_exp, fs_exp[k], fk)
                fk = jnp.where(is_log, fs_log[k], fk)
                fs_sel.append(fk)
            comp = jet_compose(av, fs_sel, order, jnp)

            constj = jet_const(const_val, order, jnp,
                               like=jnp.zeros((P,), dtype=dtype))

            out = jnp.zeros_like(av)
            for code, cand in (
                (ot.VAR0, var0j),
                (ot.VAR1, var1j),
                (ot.CONST, constj),
                (ot.ADD, add),
                (ot.SUB, sub),
                (ot.MUL, mul),
                (ot.NEG, neg),
                (ot.POW, comp),
                (ot.EXP, comp),
                (ot.LOG, comp),
            ):
                out = jnp.where(opc == code, cand, out)

            buf = jax.lax.dynamic_update_index_in_dim(buf, out, i, 0)
            return buf, None

        buf, _ = jax.lax.scan(step, buf0, (tape, idx))
        return jax.lax.dynamic_index_in_dim(buf, length - 1, 0, keepdims=False)

    return eval_one


@functools.lru_cache(maxsize=None)
def batched_evaluator(order: int, max_nodes: int):
    """Returns eval(tapes, lengths, consts, points) -> jets.

    tapes:   int32[N, max_nodes, 3]
    lengths: int32[N]
    consts:  f[K]
    points:  f[P, 2]
    returns: f[N, P, T(order)] jets of each candidate at each point.
    """
    eval_one = _make_eval_one(order, max_nodes)

    def run(tapes, lengths, consts, points):
        var0j = jet_var(points[:, 0], 0, order, jnp)
        var1j = jet_var(points[:, 1], 1, order, jnp)
        return jax.vmap(eval_one, in_axes=(0, 0, None, None, None))(
            tapes, lengths, consts, var0j, var1j)

    return run


# ---------------------------------------------------------------------------
# Batched float64 host interpreter (opcode-grouped dispatch; used to
# re-check the screen's gray zone in bulk).
# ---------------------------------------------------------------------------

def eval_jets_np_many(tapes: np.ndarray, lengths: np.ndarray,
                      consts: np.ndarray, points: np.ndarray,
                      order: int) -> np.ndarray:
    """Float64 jet evaluation of a batch of tapes.

    tapes: int32[N, L, 3] (padded); lengths: int[N]; points: f64[P, 2].
    Returns f64[N, P, T] jets of each tape's result register.

    Prefers the C oracle (csrc ej_eval_many — same math, same operation
    order, ~5x the NumPy path on the one-core axon hosts); falls back to
    the NumPy implementation below, which groups candidates by opcode per
    node so each subgroup takes the exact arithmetic path vectorized."""
    from ..utils.native import eval_jets_native
    native = eval_jets_native(tapes, lengths, consts, points, order)
    if native is not None:
        return native
    return _eval_jets_np_many_numpy(tapes, lengths, consts, points, order)


def _eval_jets_np_many_numpy(tapes: np.ndarray, lengths: np.ndarray,
                             consts: np.ndarray, points: np.ndarray,
                             order: int) -> np.ndarray:
    from .jets import jet_var as _jet_var

    N, L, _ = tapes.shape
    P = points.shape[0]
    T = n_coeffs(order)
    var0 = _jet_var(points[:, 0].astype(np.float64), 0, order, np)  # (P,T)
    var1 = _jet_var(points[:, 1].astype(np.float64), 1, order, np)
    buf = np.zeros((L, N, P, T), dtype=np.float64)
    rowsN = np.arange(N)
    Lmax = int(lengths.max())
    with np.errstate(all="ignore"):
        for i in range(Lmax):
            opc = tapes[:, i, 0]
            a = tapes[:, i, 1]
            b = tapes[:, i, 2]
            av = buf[a, rowsN]                      # (N,P,T)
            out = np.zeros((N, P, T), dtype=np.float64)
            for code in np.unique(opc):
                m = opc == code
                if code == ot.NOP:
                    continue
                elif code == ot.VAR0:
                    out[m] = var0
                elif code == ot.VAR1:
                    out[m] = var1
                elif code == ot.CONST:
                    out[m] = 0.0
                    out[m, :, 0] = consts[b[m], None]
                elif code == ot.ADD:
                    out[m] = av[m] + buf[b[m], rowsN[m]]
                elif code == ot.SUB:
                    out[m] = av[m] - buf[b[m], rowsN[m]]
                elif code == ot.MUL:
                    out[m] = jet_mul(av[m], buf[b[m], rowsN[m]], order, np)
                elif code == ot.NEG:
                    out[m] = -av[m]
                elif code == ot.POW:
                    for pi in np.unique(b[m]):
                        mm = m & (b == pi)
                        v = buf[a[mm], rowsN[mm]][..., 0]
                        fs = pow_fs(v, ot.POW_EXPONENTS[pi], order, np)
                        out[mm] = jet_compose(buf[a[mm], rowsN[mm]], fs,
                                              order, np)
                elif code == ot.EXP:
                    sub = av[m]
                    out[m] = jet_compose(sub, exp_fs(sub[..., 0], order, np),
                                         order, np)
                elif code == ot.LOG:
                    sub = av[m]
                    out[m] = jet_compose(sub, log_fs(sub[..., 0], order, np),
                                         order, np)
                else:
                    raise ValueError(f"bad opcode {code}")
            buf[i] = out
    return buf[lengths - 1, rowsN]


# ---------------------------------------------------------------------------
# Float64 host oracle (exact opcode dispatch, used for survivor re-checks
# and as an independent test oracle against SymPy).
# ---------------------------------------------------------------------------

def eval_jets_np(tape_rows: np.ndarray, length: int, consts: np.ndarray,
                 points: np.ndarray, order: int) -> np.ndarray:
    """NumPy float64 jet evaluation of a single tape.

    tape_rows: int32[L, 3] (may be padded; only the first ``length`` rows
    are executed). points: f64[P, 2]. Returns f64[P, T].
    """
    from .jets import jet_var as _jet_var

    P = points.shape[0]
    T = n_coeffs(order)
    var0j = _jet_var(points[:, 0].astype(np.float64), 0, order, np)
    var1j = _jet_var(points[:, 1].astype(np.float64), 1, order, np)
    buf = np.zeros((int(length), P, T), dtype=np.float64)
    with np.errstate(all="ignore"):
        for i in range(int(length)):
            opc, a, b = (int(tape_rows[i, 0]), int(tape_rows[i, 1]),
                         int(tape_rows[i, 2]))
            if opc == ot.NOP:
                continue
            elif opc == ot.VAR0:
                buf[i] = var0j
            elif opc == ot.VAR1:
                buf[i] = var1j
            elif opc == ot.CONST:
                buf[i] = jet_const(
                    np.full((P,), float(consts[b])), order, np)
            elif opc == ot.ADD:
                buf[i] = buf[a] + buf[b]
            elif opc == ot.SUB:
                buf[i] = buf[a] - buf[b]
            elif opc == ot.MUL:
                buf[i] = jet_mul(buf[a], buf[b], order, np)
            elif opc == ot.NEG:
                buf[i] = -buf[a]
            elif opc == ot.POW:
                v = buf[a][..., 0]
                fs = pow_fs(v, ot.POW_EXPONENTS[b], order, np)
                buf[i] = jet_compose(buf[a], fs, order, np)
            elif opc == ot.EXP:
                v = buf[a][..., 0]
                buf[i] = jet_compose(buf[a], exp_fs(v, order, np), order, np)
            elif opc == ot.LOG:
                v = buf[a][..., 0]
                buf[i] = jet_compose(buf[a], log_fs(v, order, np), order, np)
            else:
                raise ValueError(f"bad opcode {opc}")
    return buf[int(length) - 1]
