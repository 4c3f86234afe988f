"""The fused device search kernel: screen + fingerprint in one pass.

One compiled program replaces three of the reference's subsystems:

- validation point checks (force_free validator.py:349-402, kerr
  validator.py:163-192)  →  jet evaluation + residual over a collocation
  grid, verdict on the *relative* residual with non-finite ⇒ reject;
- "Lean" normalization dedup (lean_bridge.py:67-117)  →  numeric
  fingerprints: order-1 jets (value + gradient) at probe points, quantized
  and hashed to 2×uint32 on device;
- constant exclusion (kerr validator.py:230-240, force_free
  validator.py:309-312)  →  exact-zero gradient detection (constant jets
  propagate exact floating-point zeros, so this is equality, not tolerance).

Everything is static-shape and branchless; candidates batch along the
leading axis, which is the axis sharded across the device mesh.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interpreter import batched_evaluator
from ..ops.jets import n_coeffs


class ScreenResult(NamedTuple):
    screen_ok: jnp.ndarray    # bool[N]  — passes relative-residual screen
    rel_max: jnp.ndarray      # f32[N]   — max relative residual over points
    nonfinite: jnp.ndarray    # bool[N]  — residual/scale non-finite anywhere
    is_const: jnp.ndarray     # bool[N]  — gradient exactly zero everywhere
    fp_a: jnp.ndarray         # uint32[N] — fingerprint hash (mix A)
    fp_b: jnp.ndarray         # uint32[N] — fingerprint hash (mix B)
    fp_finite: jnp.ndarray    # bool[N]  — fingerprint values all finite
    fp_vals: jnp.ndarray      # f32[N, F*3] — raw fingerprint values
                              # (value + gradient at each probe point; used
                              # for tolerance-based known-solution matching)


_SENTINEL = np.float32(2.9183e7)  # stands in for non-finite fp values


def _quantize_parts(v):
    """Canonical (mantissa-cell, exponent) split shared by the key and the
    grid snap.  12-bit mantissa + exponent = relative quantization ~2.4e-4,
    so equal-but-differently-computed expressions collide onto the same
    key.  The ±4096 rollover (a mantissa that rounds up to 1.0) is
    renormalized to (±2048, e+1) so a value just below a power of two and
    the power of two itself land in the SAME cell — without it the seam
    splits them unconditionally, and the snapped value would not re-derive
    its own key."""
    v = jnp.where(jnp.isfinite(v), v, _SENTINEL)
    m, e = jnp.frexp(v)
    q = jnp.round(m * 4096.0).astype(jnp.int32)
    roll = jnp.abs(q) == 4096
    q = jnp.where(roll, q >> 1, q)
    e = jnp.where(roll, e + 1, e).astype(jnp.int32)
    return q, e


def _quantize(v):
    """f32 -> stable int32 key (see _quantize_parts)."""
    q, e = _quantize_parts(v)
    return q * 1024 + jnp.clip(e, -500, 500)


def snap_fp_jets(v):
    """Snap fingerprint-jet values onto the centers of their quantization
    cells (round the f32 mantissa to 11 explicit bits, ties-to-even).

    Every kernel snaps its order-1 fingerprint jets through this BEFORE
    computing verdicts/keys and before the rows enter the JetCache.  Two
    equivalent candidates that dedup onto the same 64-bit key have equal
    (q, e) for every folded value, so their snapped jets are BIT-IDENTICAL
    — whichever of them is registered first, the cache row (and therefore
    every descendant's fingerprint jets and dedup keys, by induction) is
    the same.  This removes the emission-order drift of the quantized
    fingerprints (VERDICT round 3 weak #1: representative selection used
    to shift near-boundary keys and compound through depths).

    Implemented as pure integer bit-ops so the device (XLA *and* Mosaic)
    and the NumPy mirror are bit-identical by construction: add
    2047+kept_lsb to the bit pattern and clear the low 12 mantissa bits —
    exactly round-to-nearest-even of ``round(frexp_mantissa * 4096)`` with
    the power-of-two seam handled by the natural carry into the exponent
    field (matching :func:`_quantize_parts`'s rollover renormalization).

    Exact zeros snap to exact zeros (constant detection is equality-based);
    SUBNORMALS (and -0.0) flush to +0.0 — XLA backends flush them
    inconsistently (the TPU VPU is FTZ), so the grid treats |v| < 2^-126
    as zero on every path; non-finite values pass through unchanged.  A
    finite value whose mantissa rounds up past f32 max snaps to ±inf
    (its key is then the non-finite sentinel, identically on all paths)."""
    b = jax.lax.bitcast_convert_type(v, jnp.uint32)
    lsb = (b >> jnp.uint32(12)) & jnp.uint32(1)
    r = (b + jnp.uint32(2047) + lsb) & jnp.uint32(0xFFFFF000)
    s = jax.lax.bitcast_convert_type(r, jnp.float32)
    s = jnp.where(jnp.abs(v) < jnp.float32(2.0 ** -126), jnp.float32(0.0), s)
    return jnp.where(jnp.isfinite(v), s, v)


def snap_fp_jets_np(v: np.ndarray) -> np.ndarray:
    """NumPy float32 mirror of :func:`snap_fp_jets` — the same integer
    bit-ops, hence bit-identical to the device snap on every input."""
    vv = np.ascontiguousarray(v, dtype=np.float32)
    with np.errstate(all="ignore"):
        b = vv.view(np.uint32)
        lsb = (b >> np.uint32(12)) & np.uint32(1)
        r = (b + np.uint32(2047) + lsb) & np.uint32(0xFFFFF000)
        s = r.view(np.float32).copy()
        s[np.abs(vv) < np.float32(2.0 ** -126)] = np.float32(0.0)
        fin = np.isfinite(vv)
        s[~fin] = vv[~fin]
    return s


def _fold_hash(keys, mult: int, seed: int):
    """FNV-style fold over the last axis (static unroll)."""
    h = jnp.full(keys.shape[:-1], seed, dtype=jnp.uint32)
    for k in range(keys.shape[-1]):
        h = (h * jnp.uint32(mult)) ^ keys[..., k].astype(jnp.uint32)
    return h


SCALE_FLOOR = 1e-25  # f32 near-underflow: below this a point is blind
JET_TINY = 1e-20     # healthy jet coefficients are exactly 0 or above this
# The float64 oracle paths (gray recheck, tape oracle) have ~600 decades of
# exponent range: their floors sit far lower so that legitimately steep
# expressions (rho^2*exp(-10 z) — a true Bent-family solution whose det
# scale underflows f32) are judged on their actual residual instead of
# being blind-rejected.  Measured in tests/test_screen_thresholds.py.
SCALE_FLOOR64 = 1e-180
JET_TINY64 = 1e-150


def informative_points(res, scale, jets, xp):
    """Which collocation points give a trustworthy verdict.

    Two failure modes must be told apart:
    - *underflow garbage* (e.g. exp(-(1-x)*e^(r^2))): residual AND scale
      underflow to (near-)zero — the float-underflow analog of the
      reference's treat-NaN-as-zero defect (SURVEY.md §4).  Reject.
    - *structural zeros* (e.g. u = rho^2, or any u(rho) alone): the Lie
      terms vanish identically through exact-zero arithmetic, so scale is
      exactly 0 while the expression's own jet is perfectly healthy.
      Accept — the determinant is genuinely degenerate-zero there (the
      reference validator likewise proves these zero symbolically).

    A zero-scale point is informative only when the residual is exactly 0
    and every jet coefficient at the point is exactly 0 or of sane
    magnitude (and not all zero).  Floors are dtype-aware: the f32 device
    screen is blind below ~1e-25, the f64 oracle far lower."""
    f64 = (hasattr(res, "dtype") and res.dtype == xp.float64)
    scale_floor = SCALE_FLOOR64 if f64 else SCALE_FLOOR
    jet_tiny = JET_TINY64 if f64 else JET_TINY
    abs_j = xp.abs(jets)
    coeff_ok = (abs_j == 0.0) | (abs_j > jet_tiny)
    healthy = xp.all(coeff_ok, axis=-1) & ~xp.all(abs_j == 0.0, axis=-1)
    structural = (scale == 0.0) & (res == 0.0) & healthy
    return (scale > scale_floor) | structural


def verdicts_from_jets(jets, fj, spoints, residual_fn,
                       screen_rtol: float) -> ScreenResult:
    """Shared verdict block: residual screen + fingerprint + constant
    detection, given screen-order jets [N,P,T] and order-1 fingerprint jets
    [N,F,3].  Used by both the tape-interpreting kernel and the
    incremental per-op kernels."""
    res, scale = residual_fn(jets, spoints, jnp)          # [N,P]
    return verdicts_from_parts(res, scale, jets, fj, screen_rtol)


def verdicts_from_parts(res, scale, jets, fj,
                        screen_rtol: float) -> ScreenResult:
    """Verdicts from a precomputed (residual, scale) pair — the Pallas
    lane-major kernel computes res/scale in-kernel and hands them here."""
    eps = jnp.asarray(1e-30, res.dtype)
    rel = jnp.abs(res) / (scale + eps)
    finite = jnp.isfinite(res) & jnp.isfinite(scale)
    informative = informative_points(res, scale, jets, jnp)
    nonfinite_any = jnp.any(~finite, axis=-1)
    # Evidence rule: reject on a definite nonzero residual at any
    # informative point, or when NO point is informative (pure underflow
    # garbage); pass when every informative point agrees the residual is
    # zero.  A pass with some blind points is PARTIAL evidence — fine,
    # because every screen passer gets the float64 recheck whose floors
    # sit ~155 decades lower (f64_skip_below = 0.0 by default).
    ok_pt = finite & informative
    any_inform = jnp.any(ok_pt, axis=-1)
    rel_max = jnp.where(
        any_inform,
        jnp.max(jnp.where(ok_pt, rel, 0.0), axis=-1),
        jnp.inf)
    screen_ok = (~nonfinite_any) & any_inform & (rel_max < screen_rtol)

    flat = fj.reshape(fj.shape[0], -1)                    # [N,F*3]
    fp_finite = jnp.all(jnp.isfinite(flat), axis=-1)
    keys = _quantize(flat)
    fp_a = _fold_hash(keys, 0x01000193, 0x811C9DC5)
    fp_b = _fold_hash(keys, 0x85EBCA6B, 0xC2B2AE35)

    grads = jnp.abs(fj[..., 1:])                           # [N,F,2]
    grad_max = jnp.max(grads.reshape(fj.shape[0], -1), axis=-1)
    val_ok = jnp.all(jnp.isfinite(fj[..., 0]), axis=-1)
    is_const = (grad_max == 0.0) & val_ok

    return ScreenResult(screen_ok, rel_max, nonfinite_any, is_const,
                        fp_a, fp_b, fp_finite, flat)


@functools.lru_cache(maxsize=None)
def make_search_kernel_raw(order: int, max_nodes: int, residual_key: str,
                           screen_rtol: float, n_screen: int, n_fp: int):
    """Build the (unjitted) fused kernel for a (problem, bucket) combination.

    ``residual_key`` selects the residual operator from the registry below
    (kernels are cached per key so jit caches hit across batches).
    The raw function is what ``shard_map`` wraps for multi-chip runs.
    """
    residual_fn = _RESIDUALS[residual_key]

    eval_r = batched_evaluator(order, max_nodes)
    eval_1 = batched_evaluator(1, max_nodes)

    def kernel(tapes, lengths, consts, spoints, fpoints):
        jets = eval_r(tapes, lengths, consts, spoints)        # [N,P,T]
        fj = snap_fp_jets(eval_1(tapes, lengths, consts, fpoints))
        return verdicts_from_jets(jets, fj, spoints, residual_fn,
                                  screen_rtol)

    return kernel


N_PACK_HEAD = 9


def pack_screen_result(sr: ScreenResult):
    """Pack the verdict columns into ONE f32 array [N, 9 + F*3].

    Device→host transfers through the axon tunnel cost ~30 ms of latency
    *per array* regardless of size; transferring the ScreenResult's seven
    leaves separately dominated the batch loop.  Hash columns are split
    into two exact 16-bit halves — a raw uint32→f32 bitcast would corrupt
    hashes whose bit patterns are NaNs (canonicalized) or denormals
    (flushed), silently merging distinct fingerprints."""
    fa, fb = sr.fp_a, sr.fp_b
    mask = jnp.uint32(0xFFFF)
    cols = [sr.screen_ok.astype(jnp.float32),
            sr.rel_max.astype(jnp.float32),
            sr.nonfinite.astype(jnp.float32),
            sr.is_const.astype(jnp.float32),
            (fa >> 16).astype(jnp.float32),
            (fa & mask).astype(jnp.float32),
            (fb >> 16).astype(jnp.float32),
            (fb & mask).astype(jnp.float32),
            sr.fp_finite.astype(jnp.float32)]
    return jnp.concatenate(
        [jnp.stack(cols, axis=1), sr.fp_vals.astype(jnp.float32)], axis=1)


def unpack_screen_result(packed: np.ndarray) -> ScreenResult:
    """Host-side inverse of pack_screen_result (numpy arrays)."""
    packed = np.ascontiguousarray(packed, dtype=np.float32)

    def u32(hi, lo):
        return ((hi.astype(np.uint32) << np.uint32(16))
                | lo.astype(np.uint32))

    return ScreenResult(
        screen_ok=packed[:, 0] != 0,
        rel_max=packed[:, 1],
        nonfinite=packed[:, 2] != 0,
        is_const=packed[:, 3] != 0,
        fp_a=u32(packed[:, 4], packed[:, 5]),
        fp_b=u32(packed[:, 6], packed[:, 7]),
        fp_finite=packed[:, 8] != 0,
        fp_vals=packed[:, N_PACK_HEAD:],
    )


def pack_screen_result_compact(sr: ScreenResult):
    """Pack verdicts into ONE uint32 array of 12 B/candidate (vs 108 B
    for :func:`pack_screen_result`) — at depth-5 scale the tunnel's
    device→host bandwidth on the full packing was ~50% of device wall.

    Layout [N, 3]:
      col 0: fp_a    col 1: fp_b
      col 2: rel_max's top 16 bits (bfloat16 truncation) in the high
             half; flags in the low: bit0 screen_ok, bit1 nonfinite,
             bit2 is_const, bit3 fp_finite

    ``fp_vals`` (raw fingerprint values — needed only for the rare
    screen passers' evidence/known-matching) deliberately does NOT ride
    along: the caller gathers passer rows from the device-resident
    fingerprint-jet output after reading the flags.  An earlier design
    packed a passer sidecar inside the kernel via ``jnp.nonzero(size=)``;
    its sort-based lowering cost 2.5× the whole screen kernel."""
    u32 = jnp.uint32
    flags = (sr.screen_ok.astype(u32)
             | (sr.nonfinite.astype(u32) << 1)
             | (sr.is_const.astype(u32) << 2)
             | (sr.fp_finite.astype(u32) << 3))
    rel_bits = jax.lax.bitcast_convert_type(
        sr.rel_max.astype(jnp.float32), u32)
    # round the bf16 truncation UP (+0xFFFF before masking): rel_max is
    # compared against f64_skip_below downstream, and rounding down could
    # let a candidate just above the threshold skip the float64 recheck
    # (ADVICE.md round 2).  Positive-float bit patterns are monotone, and
    # inf/NaN payloads survive the mask unchanged.
    col2 = ((rel_bits + u32(0xFFFF)) & u32(0xFFFF0000)) | flags
    return jnp.stack([sr.fp_a, sr.fp_b, col2], axis=1)


class CompactUnpack(NamedTuple):
    sr: ScreenResult
    n_passers: int          # passer count
    passer_idx: np.ndarray  # batch indices of the passers


def unpack_screen_result_compact(packed: np.ndarray,
                                 n_fp: int) -> CompactUnpack:
    """Host-side inverse of pack_screen_result_compact.  ``fp_vals`` is
    a zeros array — the pipeline scatters in the passer rows it gathers
    from the device (``_ev_at`` reads only passer rows)."""
    body = np.ascontiguousarray(packed, dtype=np.uint32)
    n = body.shape[0]
    col2 = body[:, 2]
    rel = (col2 & np.uint32(0xFFFF0000)).view(np.float32)
    screen_ok = (col2 & 1) != 0
    idx = np.nonzero(screen_ok)[0].astype(np.int32)
    sr = ScreenResult(
        screen_ok=screen_ok,
        rel_max=rel,
        nonfinite=(col2 & 2) != 0,
        is_const=(col2 & 4) != 0,
        fp_a=body[:, 0],
        fp_b=body[:, 1],
        fp_finite=(col2 & 8) != 0,
        fp_vals=np.zeros((n, n_fp * 3), np.float32),
    )
    return CompactUnpack(sr=sr, n_passers=int(idx.size), passer_idx=idx)


def verdicts_from_jets_np(jets, fj, spoints, residual_fn,
                          screen_rtol: float) -> ScreenResult:
    """NumPy port of verdicts_from_jets (same rules, float64 arithmetic,
    f32-quantized fingerprints).  Used for the handful of tape-evaluated
    expressions (primitives, known solutions, resume seeding) — the full
    tape-interpreting device kernel takes ~10 minutes to compile on the
    remote TPU toolchain and is pointless for a dozen expressions.

    Fingerprint hashes are tolerance-compatible with the device path (the
    same quantization absorbs float64-vs-float32 evaluation differences the
    way it absorbs different-tape-same-function differences)."""
    res, scale = residual_fn(jets, spoints, np)
    with np.errstate(all="ignore"):
        rel = np.abs(res) / (scale + 1e-300)
        finite = np.isfinite(res) & np.isfinite(scale)
        informative = informative_points(res, scale, jets, np)
        nonfinite_any = np.any(~finite, axis=-1)
        # same evidence rule as verdicts_from_parts (see there)
        ok_pt = finite & informative
        any_inform = np.any(ok_pt, axis=-1)
        rel_max = np.where(
            any_inform,
            np.max(np.where(ok_pt, rel, 0.0), axis=-1),
            np.inf)
        screen_ok = (~nonfinite_any) & any_inform & (rel_max < screen_rtol)

        # snap to the quantization grid first (the f32 device kernels do
        # the same; fp_vals below feed the JetCache seeding path)
        flat = snap_fp_jets_np(
            fj.reshape(fj.shape[0], -1).astype(np.float32))
        fp_finite = np.all(np.isfinite(flat), axis=-1)
        v = np.where(np.isfinite(flat), flat, _SENTINEL)
        m, e = np.frexp(v)
        q = np.round(m * 4096.0).astype(np.int32)
        roll = np.abs(q) == 4096
        q = np.where(roll, q >> 1, q)
        e = np.where(roll, e + 1, e)
        keys = q * 1024 + np.clip(e, -500, 500)
        h_a = np.full(keys.shape[:-1], 0x811C9DC5, np.uint32)
        h_b = np.full(keys.shape[:-1], 0xC2B2AE35, np.uint32)
        for k in range(keys.shape[-1]):
            kk = keys[..., k].astype(np.uint32)
            h_a = (h_a * np.uint32(0x01000193)) ^ kk
            h_b = (h_b * np.uint32(0x85EBCA6B)) ^ kk

        grads = np.abs(fj[..., 1:])
        grad_max = np.max(grads.reshape(fj.shape[0], -1), axis=-1)
        val_ok = np.all(np.isfinite(fj[..., 0]), axis=-1)
        is_const = (grad_max == 0.0) & val_ok

    return ScreenResult(screen_ok, rel_max.astype(np.float32),
                        nonfinite_any, is_const, h_a, h_b, fp_finite, flat)


@functools.lru_cache(maxsize=None)
def make_tape_jets_kernel(order: int, max_nodes: int, residual_key: str,
                          screen_rtol: float, n_screen: int, n_fp: int):
    """Like make_search_kernel but returns a packed verdict array plus the
    flattened screen/fp jets, so evaluated uniques can seed the incremental
    engine's JetCache (depth-1 primitives, resume reconstruction)."""
    residual_fn = _RESIDUALS[residual_key]
    eval_r = batched_evaluator(order, max_nodes)
    eval_1 = batched_evaluator(1, max_nodes)

    def kernel(tapes, lengths, consts, spoints, fpoints):
        jets = eval_r(tapes, lengths, consts, spoints)
        # snapped fingerprint jets (see snap_fp_jets) — these rows seed
        # the JetCache, so they must be on the same grid as the
        # incremental kernels' rows
        fj = snap_fp_jets(eval_1(tapes, lengths, consts, fpoints))
        sr = verdicts_from_jets(jets, fj, spoints, residual_fn, screen_rtol)
        return (pack_screen_result(sr), jets.reshape(jets.shape[0], -1),
                fj.reshape(fj.shape[0], -1))

    return jax.jit(kernel)


@functools.lru_cache(maxsize=None)
def make_search_kernel(order: int, max_nodes: int, residual_key: str,
                       screen_rtol: float, n_screen: int, n_fp: int):
    """Jitted fused kernel (see make_search_kernel_raw)."""
    return jax.jit(make_search_kernel_raw(
        order, max_nodes, residual_key, screen_rtol, n_screen, n_fp))


# Residual registry (string-keyed so kernels are hashable/cacheable).
def _ff(jets, pts, xp):
    from ..models.residuals import foliation_residual
    return foliation_residual(jets, pts, xp, omega=0.0)


def _ff_rot(omega):
    from ..models.residuals import foliation_residual
    return lambda jets, pts, xp: foliation_residual(jets, pts, xp,
                                                    omega=omega)


def _kerr(jets, pts, xp):
    from ..models.residuals import kerr_residual
    return kerr_residual(jets, pts, xp)


def _laplace(jets, pts, xp):
    from ..models.residuals import laplace_residual
    return laplace_residual(jets, pts, xp)


def _gs(jets, pts, xp):
    from ..models.residuals import grad_shafranov_residual
    return grad_shafranov_residual(jets, pts, xp)


_RESIDUALS = {
    "force_free": _ff,
    "force_free_omega1": _ff_rot(1.0),
    "kerr_magnetosphere": _kerr,
    "laplace": _laplace,
    "grad_shafranov": _gs,
}


def register_residual(key: str, fn) -> None:
    _RESIDUALS[key] = fn
