"""pack/unpack round-trip of the verdict transfer — including hash bit
patterns that a raw uint32→f32 bitcast would corrupt (NaN-space hashes get
canonicalized, denormal-space hashes flushed), which silently merged
distinct fingerprints."""

import numpy as np

from pde_engine_tpu.parallel.search import (N_PACK_HEAD, ScreenResult,
                                            pack_screen_result,
                                            unpack_screen_result)

ADVERSARIAL = np.array([0x7FC00001, 0x7F800001, 0xFFC00000, 0x7FFFFFFF,
                        0x00400000, 0x00000001, 0xFFFFFFFF, 0x00000000,
                        0x811C9DC5, 0xDEADBEEF], dtype=np.uint32)


def test_pack_roundtrip_exact():
    import jax.numpy as jnp

    n = ADVERSARIAL.size
    rng = np.random.default_rng(1)
    sr = ScreenResult(
        screen_ok=jnp.asarray(rng.integers(0, 2, n).astype(bool)),
        rel_max=jnp.asarray(
            np.array([0.0, 1e-7, np.inf, 3.5] * 3)[:n].astype(np.float32)),
        nonfinite=jnp.asarray(rng.integers(0, 2, n).astype(bool)),
        is_const=jnp.asarray(rng.integers(0, 2, n).astype(bool)),
        fp_a=jnp.asarray(ADVERSARIAL),
        fp_b=jnp.asarray(ADVERSARIAL[::-1].copy()),
        fp_finite=jnp.asarray(rng.integers(0, 2, n).astype(bool)),
        fp_vals=jnp.asarray(rng.normal(size=(n, 18)).astype(np.float32)),
    )
    out = unpack_screen_result(np.asarray(pack_screen_result(sr)))
    np.testing.assert_array_equal(out.fp_a, ADVERSARIAL)
    np.testing.assert_array_equal(out.fp_b, ADVERSARIAL[::-1])
    np.testing.assert_array_equal(out.screen_ok, np.asarray(sr.screen_ok))
    np.testing.assert_array_equal(out.nonfinite, np.asarray(sr.nonfinite))
    np.testing.assert_array_equal(out.is_const, np.asarray(sr.is_const))
    np.testing.assert_array_equal(out.fp_finite, np.asarray(sr.fp_finite))
    np.testing.assert_array_equal(out.rel_max, np.asarray(sr.rel_max))
    np.testing.assert_array_equal(out.fp_vals, np.asarray(sr.fp_vals))
    assert out.fp_vals.shape[1] + N_PACK_HEAD == \
        np.asarray(pack_screen_result(sr)).shape[1]


def test_compact_pack_roundtrip():
    """Compact packing: hashes and flags exact; rel_max within bfloat16
    truncation; passer fp_vals recovered exactly through the sidecar."""
    import jax.numpy as jnp

    from pde_engine_tpu.parallel.search import (
        pack_screen_result_compact, unpack_screen_result_compact)

    n = ADVERSARIAL.size
    rng = np.random.default_rng(2)
    screen_ok = rng.integers(0, 2, n).astype(bool)
    rel = np.array([0.0, 1e-7, np.inf, 3.5, 1e12, 7e-3] * 2)[:n].astype(
        np.float32)
    fp_vals = rng.normal(size=(n, 18)).astype(np.float32)
    sr = ScreenResult(
        screen_ok=jnp.asarray(screen_ok),
        rel_max=jnp.asarray(rel),
        nonfinite=jnp.asarray(rng.integers(0, 2, n).astype(bool)),
        is_const=jnp.asarray(rng.integers(0, 2, n).astype(bool)),
        fp_a=jnp.asarray(ADVERSARIAL),
        fp_b=jnp.asarray(ADVERSARIAL[::-1].copy()),
        fp_finite=jnp.asarray(rng.integers(0, 2, n).astype(bool)),
        fp_vals=jnp.asarray(fp_vals),
    )
    packed = np.asarray(pack_screen_result_compact(sr))
    assert packed.dtype == np.uint32 and packed.shape == (n, 3)
    cu = unpack_screen_result_compact(packed, 6)
    out = cu.sr
    np.testing.assert_array_equal(out.fp_a, ADVERSARIAL)
    np.testing.assert_array_equal(out.fp_b, ADVERSARIAL[::-1])
    np.testing.assert_array_equal(out.screen_ok, screen_ok)
    np.testing.assert_array_equal(out.nonfinite, np.asarray(sr.nonfinite))
    np.testing.assert_array_equal(out.is_const, np.asarray(sr.is_const))
    np.testing.assert_array_equal(out.fp_finite, np.asarray(sr.fp_finite))
    # rel: bfloat16 truncation — relative error < 2^-8, inf/0 exact
    fin = np.isfinite(rel) & (rel > 0)
    assert (np.abs(out.rel_max[fin] - rel[fin]) / rel[fin] < 2**-8).all()
    np.testing.assert_array_equal(out.rel_max[~fin], rel[~fin])
    # passer indices recovered; fp_vals left for the caller's device
    # gather (zeros here)
    assert cu.n_passers == int(screen_ok.sum())
    np.testing.assert_array_equal(cu.passer_idx,
                                  np.nonzero(screen_ok)[0])
    assert (out.fp_vals == 0).all()
