"""Pallas TPU kernels for the hot jet primitives.

The workhorse of the whole engine is the truncated bivariate jet product
(ops/jets.py::jet_mul): ~70 fused multiply-adds per order-4 jet, executed
for every MUL/DIV/GEOM_SUM/… node of every candidate at every collocation
point.  The XLA path keeps candidates on the *last* axis of (N, P, T)
arrays; this Pallas kernel instead uses the layout the VPU actually wants:

    candidates on the 128-wide lane axis, (point, coefficient) on sublanes

so each of the 70 static coefficient-pair FMAs is a full-width vector op
with no lane-crossing shuffles.  The kernel tiles candidates into
128-lane blocks resident in VMEM.

This is an opt-in fast path (`use_pallas=True` on the helpers); the XLA
path remains the default and the correctness oracle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .jets import mul_table, n_coeffs

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=None)
def _mul_pairs(order: int) -> Tuple[Tuple[int, Tuple[Tuple[int, int], ...]], ...]:
    return tuple(enumerate(mul_table(order)))


@functools.lru_cache(maxsize=None)
def make_jet_mul_pallas(order: int, n_points: int, n_tile: int = 512):
    """Fused jet product over a batch.

    Signature of the returned function:
        f(a, b) -> out,  all shaped [P*T, N]  (candidates on lanes)
    N must be a multiple of ``n_tile``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = n_coeffs(order)
    R = n_points * T  # sublane rows

    def kernel(a_ref, b_ref, out_ref):
        a = a_ref[:]            # [R, n_tile]
        b = b_ref[:]
        for p in range(n_points):
            base = p * T
            for k, pairs in _mul_pairs(order):
                acc = a[base + pairs[0][0], :] * b[base + pairs[0][1], :]
                for (i, j) in pairs[1:]:
                    acc += a[base + i, :] * b[base + j, :]
                out_ref[base + k, :] = acc

    def run(a, b):
        N = a.shape[1]
        assert N % n_tile == 0, (N, n_tile)
        grid = (N // n_tile,)
        spec = pl.BlockSpec((R, n_tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
            grid=grid,
            in_specs=[spec, spec],
            out_specs=spec,
            # Mosaic on TPU; interpret mode on the CPU test backend
            interpret=(jax.default_backend() == "cpu"),
            cost_estimate=pl.CostEstimate(
                flops=2 * len(sum((list(t) for _, t in _mul_pairs(order)),
                                  [])) * n_points * N,
                bytes_accessed=3 * R * N * 4,
                transcendentals=0,
            ),
        )(a, b)

    return jax.jit(run)


def jet_mul_pallas(a, b, order: int, n_points: int):
    """Convenience wrapper: accepts/returns the engine's (N, P, T) layout,
    transposing to the lane-major layout around the kernel.  For peak
    throughput keep data in [P*T, N] and call the kernel directly."""
    N = a.shape[0]
    Npad = _round_up(max(N, LANE), 512)
    T = n_coeffs(order)

    def to_lane(x):
        x = x.reshape(N, n_points * T).T          # [R, N]
        if Npad != N:
            x = jnp.pad(x, ((0, 0), (0, Npad - N)))
        return x

    f = make_jet_mul_pallas(order, n_points)
    out = f(to_lane(a), to_lane(b))
    out = out[:, :N].T.reshape(N, n_points, T)
    return out
