"""PDE residual operators, computed from interpreter jets.

Each residual maps a candidate's jet at a collocation point to a
``(residual, scale)`` pair, where ``scale`` is a magnitude proxy of the
constituent terms: verdicts use the *relative* residual ``|res| / scale`` so
the astronomically large/small determinants the force-free constraint
produces (SURVEY.md §7 hard part 2) do not mis-classify.

All functions are array-namespace agnostic (``xp`` in {jax.numpy, numpy}) and
broadcast over arbitrary leading candidate axes; the point axis is the
second-to-last.

References (behavioral parity targets):
- Force-free foliation constraint det[[L_T A, L_T B], [L²_T A, L²_T B]] = 0
  with A = u_ρρ + u_zz - u_ρ/ρ, B = u_ρ² + u_z², T = u_z ∂_ρ - u_ρ ∂_z,
  plus the rigid-rotation Ω ≠ 0 variant:
  reference problems/force_free/validator.py:323-347.
- Kerr magnetosphere linear surrogate
  ∂r[(G/(1-x²)) ∂r u] + ∂x[(G/Δ) ∂x u] = 0:
  reference problems/kerr_magnetosphere/validator.py:77-91.
"""

from __future__ import annotations

from typing import Tuple

from ..ops.jets import index_map, jet_deriv, jet_mul, jet_truncate


def foliation_residual(u4, points, xp, omega: float = 0.0):
    """Force-free foliation determinant from an order-4 jet.

    u4: f[..., P, 15] order-4 jets; points: f[P, 2] (rho, z).
    Returns (residual, scale), each f[..., P].

    ``scale`` is a *magnitude bound*: the same computation run in
    absolute-value arithmetic (every subtraction becomes an addition of
    magnitudes).  This matters because the det can vanish through factor
    cancellation — e.g. the X-point ``rho**2*z`` has A ≡ 0, so
    |t1| + |t2| collapses to roundoff and would misreport the relative
    residual; the magnitude bound stays O(1)-conditioned.
    """
    rho = points[..., 0]

    j3_ur = jet_deriv(u4, 4, 0, xp)        # order-3 jet of u_rho
    j3_uz = jet_deriv(u4, 4, 1, xp)        # order-3 jet of u_z
    j2_urr = jet_deriv(j3_ur, 3, 0, xp)    # order-2 jet of u_rhorho
    j2_uzz = jet_deriv(j3_uz, 3, 1, xp)    # order-2 jet of u_zz
    j2_ur = jet_truncate(j3_ur, 3, 2)
    j2_uz = jet_truncate(j3_uz, 3, 2)

    # magnitude-bound jets (abs arithmetic)
    u4m = xp.abs(u4)
    m3_ur = jet_deriv(u4m, 4, 0, xp)
    m3_uz = jet_deriv(u4m, 4, 1, xp)
    m2_urr = jet_deriv(m3_ur, 3, 0, xp)
    m2_uzz = jet_deriv(m3_uz, 3, 1, xp)
    m2_ur = jet_truncate(m3_ur, 3, 2)
    m2_uz = jet_truncate(m3_uz, 3, 2)

    r1 = 1.0 / rho
    zero = xp.zeros_like(r1)

    if omega:
        w2 = float(omega) ** 2
        # order-2 jets of the rotation coefficients
        # (1 - rho^2 w^2): value, d/drho = -2 rho w^2, (2,0) coeff = -w^2
        c_minus = xp.stack(
            [1.0 - rho * rho * w2, -2.0 * rho * w2, zero,
             zero - w2, zero, zero], axis=-1)
        # (1 + rho^2 w^2)/rho = 1/rho + rho w^2
        c_over = xp.stack(
            [r1 + rho * w2, -r1 * r1 + w2, zero,
             r1 * r1 * r1, zero, zero], axis=-1)
        lap = j2_urr + j2_uzz
        A2 = jet_mul(c_minus, lap, 2, xp) - jet_mul(c_over, j2_ur, 2, xp)
        B2 = jet_mul(
            c_minus,
            jet_mul(j2_ur, j2_ur, 2, xp) + jet_mul(j2_uz, j2_uz, 2, xp),
            2, xp)
        cm_m, co_m = xp.abs(c_minus), xp.abs(c_over)
        A2m = (jet_mul(cm_m, m2_urr + m2_uzz, 2, xp)
               + jet_mul(co_m, m2_ur, 2, xp))
        B2m = jet_mul(
            cm_m,
            jet_mul(m2_ur, m2_ur, 2, xp) + jet_mul(m2_uz, m2_uz, 2, xp),
            2, xp)
    else:
        # order-2 jet of 1/rho: coefficients of rho^{-1} expansion
        inv_rho = xp.stack(
            [r1, -r1 * r1, zero, r1 * r1 * r1, zero, zero], axis=-1)
        A2 = j2_urr + j2_uzz - jet_mul(j2_ur, inv_rho, 2, xp)
        B2 = (jet_mul(j2_ur, j2_ur, 2, xp)
              + jet_mul(j2_uz, j2_uz, 2, xp))
        inv_rho_m = xp.abs(inv_rho)
        A2m = m2_urr + m2_uzz + jet_mul(m2_ur, inv_rho_m, 2, xp)
        B2m = (jet_mul(m2_ur, m2_ur, 2, xp)
               + jet_mul(m2_uz, m2_uz, 2, xp))

    j1_ur = jet_truncate(j2_ur, 2, 1)
    j1_uz = jet_truncate(j2_uz, 2, 1)
    m1_ur = jet_truncate(m2_ur, 2, 1)
    m1_uz = jet_truncate(m2_uz, 2, 1)

    def lie_T1(f2):
        """L_T f for an order-2 jet f -> order-1 jet."""
        return (jet_mul(j1_uz, jet_deriv(f2, 2, 0, xp), 1, xp)
                - jet_mul(j1_ur, jet_deriv(f2, 2, 1, xp), 1, xp))

    def lie_T1m(f2m):
        return (jet_mul(m1_uz, jet_deriv(f2m, 2, 0, xp), 1, xp)
                + jet_mul(m1_ur, jet_deriv(f2m, 2, 1, xp), 1, xp))

    LT_A = lie_T1(A2)
    LT_B = lie_T1(B2)
    LT_Am = lie_T1m(A2m)
    LT_Bm = lie_T1m(B2m)

    ur0 = j1_ur[..., 0]
    uz0 = j1_uz[..., 0]
    ur0m = m1_ur[..., 0]
    uz0m = m1_uz[..., 0]

    def lie_T0(f1):
        """L_T f for an order-1 jet f -> value.  Index 1/2 are the (1,0)
        and (0,1) Taylor coefficients == first partials."""
        return uz0 * f1[..., 1] - ur0 * f1[..., 2]

    def lie_T0m(f1m):
        return uz0m * f1m[..., 1] + ur0m * f1m[..., 2]

    LT2_A = lie_T0(LT_A)
    LT2_B = lie_T0(LT_B)
    LT2_Am = lie_T0m(LT_Am)
    LT2_Bm = lie_T0m(LT_Bm)

    res = LT_A[..., 0] * LT2_B - LT_B[..., 0] * LT2_A
    scale = LT_Am[..., 0] * LT2_Bm + LT_Bm[..., 0] * LT2_Am
    return res, scale


def kerr_residual(u2, points, xp, M: float = 1.0, a: float = 0.1):
    """Kerr linear-surrogate residual from an order-2 jet.

    Expanded divergence form:
      lhs = c1_r u_r + c1 u_rr + c2_x u_x + c2 u_xx,
      c1 = G/(1-x²), c2 = G/Δ  (Δ_x = 0, so c2_x = G_x/Δ).
    """
    r = points[..., 0]
    x = points[..., 1]
    S = r * r + a * a * x * x
    G = 1.0 - 2.0 * M * r / S
    G_r = 2.0 * M * (r * r - a * a * x * x) / (S * S)
    G_x = 4.0 * M * r * a * a * x / (S * S)
    Delta = r * r - 2.0 * M * r + a * a
    omx2 = 1.0 - x * x

    c1 = G / omx2
    c1_r = G_r / omx2
    c2 = G / Delta
    c2_x = G_x / Delta

    im = index_map(2)
    u_r = u2[..., im[(1, 0)]]
    u_x = u2[..., im[(0, 1)]]
    u_rr = 2.0 * u2[..., im[(2, 0)]]
    u_xx = 2.0 * u2[..., im[(0, 2)]]

    res = c1_r * u_r + c1 * u_rr + c2_x * u_x + c2 * u_xx
    # magnitude bound (abs-jet semantics — see foliation_residual)
    m = xp.abs(u2)
    scale = (xp.abs(c1_r) * m[..., im[(1, 0)]]
             + xp.abs(c1) * 2.0 * m[..., im[(2, 0)]]
             + xp.abs(c2_x) * m[..., im[(0, 1)]]
             + xp.abs(c2) * 2.0 * m[..., im[(0, 2)]])
    return res, scale


def laplace_residual(u2, points, xp):
    """Plain 2-D Laplace equation u_xx + u_yy = 0 (new problem family)."""
    im = index_map(2)
    m = xp.abs(u2)
    res = 2.0 * u2[..., im[(2, 0)]] + 2.0 * u2[..., im[(0, 2)]]
    scale = 2.0 * m[..., im[(2, 0)]] + 2.0 * m[..., im[(0, 2)]]
    return res, scale


def grad_shafranov_residual(u2, points, xp):
    """Homogeneous Grad–Shafranov operator Δ* u = u_ρρ - u_ρ/ρ + u_zz = 0
    (new problem family; same elliptic operator as the force-free A)."""
    rho = points[..., 0]
    im = index_map(2)
    m = xp.abs(u2)
    res = (2.0 * u2[..., im[(2, 0)]] - u2[..., im[(1, 0)]] / rho
           + 2.0 * u2[..., im[(0, 2)]])
    scale = (2.0 * m[..., im[(2, 0)]] + m[..., im[(1, 0)]] / rho
             + 2.0 * m[..., im[(0, 2)]])
    return res, scale
