"""Lane-major execution dialect for the jet algebra.

The VPU wants candidates on the 128-wide lane axis and (point,
coefficient) on sublanes — measured 4.2× over XLA's candidate-major
layout for the order-4 jet product (PERF.md "lane-major layout").  Rather than
rewriting the jet algebra and the PDE residual operators for that layout,
this module provides a *shim*: a jet is a :class:`LJ` ("lane jet") holding
one ``[P, tile]`` array per Taylor coefficient, and :class:`LanesNS` is an
``xp``-namespace stand-in.  The exact same code in ops/jets.py,
ops/jetops.py and models/residuals.py then runs unmodified inside a Pallas
TPU kernel — every ``a[..., k] * b[..., q]`` becomes a full-width vector
FMA over ``[n_points, tile]`` vregs with no lane-crossing shuffles.

Conventions:
- coefficient k of a jet lives in ``cols[k]``, an array broadcastable to
  ``[P, tile]`` (``[P, 1]`` for point-dependent constants, scalars fold);
- collocation points are passed shaped ``[P, 1, 2]`` so ``points[..., 0]``
  yields the ``[P, 1]`` column the residual code expects.
"""

from __future__ import annotations

import math
from typing import List, Sequence

import jax.numpy as jnp
import numpy as np


class LJ:
    """A jet as a list of per-coefficient lane vectors."""

    __slots__ = ("cols",)

    def __init__(self, cols: Sequence):
        self.cols = list(cols)

    # the jet code indexes exclusively as a[..., k] / a[..., k0:k1]
    def __getitem__(self, idx):
        if isinstance(idx, tuple) and len(idx) == 2 and idx[0] is Ellipsis:
            k = idx[1]
            if isinstance(k, slice):
                return LJ(self.cols[k])
            return self.cols[k]
        raise TypeError(f"LJ only supports [..., k] indexing, got {idx!r}")

    def __add__(self, other):
        if isinstance(other, LJ):
            return LJ([a + b for a, b in zip(self.cols, other.cols)])
        return NotImplemented

    def __sub__(self, other):
        if isinstance(other, LJ):
            return LJ([a - b for a, b in zip(self.cols, other.cols)])
        return NotImplemented

    def __neg__(self):
        return LJ([-c for c in self.cols])

    @property
    def shape(self):
        # jet code only asks for shape[-1] == number of coefficients
        return (len(self.cols),)


class LanesNS:
    """``xp`` namespace over LJ columns (delegates to jnp for vectors)."""

    @staticmethod
    def stack(cols, axis=-1):
        assert axis == -1
        return LJ(cols)

    @staticmethod
    def concatenate(parts, axis=-1):
        assert axis == -1
        cols = []
        for p in parts:
            cols.extend(p.cols if isinstance(p, LJ) else [p])
        return LJ(cols)

    @staticmethod
    def abs(x):
        if isinstance(x, LJ):
            return LJ([LanesNS.abs(c) for c in x.cols])
        if isinstance(x, (float, int)):
            return abs(x)
        return jnp.abs(x)

    @staticmethod
    def zeros_like(x):
        if isinstance(x, LJ):
            return LJ([LanesNS.zeros_like(c) for c in x.cols])
        if isinstance(x, (float, int)):
            return 0.0
        return jnp.zeros_like(x)

    @staticmethod
    def ones_like(x):
        if isinstance(x, (float, int)):
            return 1.0
        return jnp.ones_like(x)

    @staticmethod
    def minimum(x, y):
        if isinstance(x, (float, int)) and isinstance(y, (float, int)):
            return min(x, y)
        return jnp.minimum(x, y)

    @staticmethod
    def maximum(x, y):
        if isinstance(x, (float, int)) and isinstance(y, (float, int)):
            return max(x, y)
        return jnp.maximum(x, y)

    @staticmethod
    def sqrt(x):
        return math.sqrt(x) if isinstance(x, (float, int)) else jnp.sqrt(x)

    @staticmethod
    def exp(x):
        return math.exp(x) if isinstance(x, (float, int)) else jnp.exp(x)

    @staticmethod
    def log(x):
        return math.log(x) if isinstance(x, (float, int)) else jnp.log(x)


lanes = LanesNS()


def lj_from_ref(ref, n_points: int, n_coeff: int) -> LJ:
    """Build an LJ from a ``[T*P, tile]`` kernel ref (coefficient-major row
    blocks: coefficient k occupies rows [k*P, (k+1)*P))."""
    return LJ([ref[k * n_points:(k + 1) * n_points, :]
               for k in range(n_coeff)])


def lj_store(ref, jet: LJ, n_points: int, tile: int):
    """Write an LJ back to a ``[T*P, tile]`` ref (broadcasting constant
    columns up to [P, tile])."""
    for k, c in enumerate(jet.cols):
        ref[k * n_points:(k + 1) * n_points, :] = jnp.broadcast_to(
            c, (n_points, tile)).astype(ref.dtype)


def to_lane_major(x, n_points: int, n_coeff: int):
    """[N, P*T] candidate-major rows -> [T*P, N] lane-major (XLA side)."""
    n = x.shape[0]
    return (x.reshape(n, n_points, n_coeff).transpose(2, 1, 0)
            .reshape(n_coeff * n_points, n))


def from_lane_major(x, n_points: int, n_coeff: int):
    """[T*P, N] lane-major -> [N, P*T] candidate-major rows (XLA side)."""
    n = x.shape[-1]
    return (x.reshape(n_coeff, n_points, n).transpose(2, 1, 0)
            .reshape(n, n_points * n_coeff))


def lane_points(points: np.ndarray) -> np.ndarray:
    """Collocation points shaped for the lanes dialect ([P, 1, 2])."""
    return np.asarray(points, np.float32).reshape(points.shape[0], 1, 2)
