"""Multi-host runtime semantics, exercised on the virtual 8-device CPU mesh
(the TPU analog of the reference's "no cluster needed" single-node testing,
SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pde_engine_tpu.models import load_problem
from pde_engine_tpu.ops.jets import n_coeffs
from pde_engine_tpu.parallel.distributed import (initialize, is_writer,
                                                 global_candidate_mesh,
                                                 make_op_kernel_multihost)
from pde_engine_tpu.parallel.incremental import make_op_kernel


def test_initialize_single_process_is_noop(monkeypatch):
    monkeypatch.delenv("PDE_ENGINE_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("PDE_ENGINE_COORDINATOR", raising=False)
    assert initialize() is False
    monkeypatch.setenv("PDE_ENGINE_NUM_PROCESSES", "1")
    assert initialize() is False


def test_single_process_is_writer():
    assert is_writer() is True


def test_global_mesh_covers_all_devices():
    mesh = global_candidate_mesh()
    assert mesh.devices.size == len(jax.devices())


def test_multihost_kernel_matches_single_device():
    """The all-gathered multi-host step must return the FULL batch's packed
    verdicts and jets (replicated), identical to the unsharded kernel."""
    problem = load_problem("force_free")
    mesh = global_candidate_mesh()
    nd = mesh.devices.size
    assert nd >= 2  # conftest forces an 8-device CPU platform

    kw = dict(order=problem.residual_order,
              residual_key=problem.get_residual_key(),
              screen_rtol=float(problem.screen_rtol),
              n_screen=len(problem.screen_points),
              n_fp=len(problem.fingerprint_points))

    # seed a tiny cache with the primitives via the float64 oracle
    from pde_engine_tpu.ops.interpreter import eval_jets_np_many
    prims = problem.primitives
    L = max(len(t) for t in prims)
    tapes = np.stack([t.padded(L) for t in prims])
    lengths = np.array([len(t) for t in prims], np.int64)
    consts = problem.consts.as_array(np.float64)
    jets = eval_jets_np_many(tapes, lengths, consts, problem.screen_points,
                             problem.residual_order)
    fj = eval_jets_np_many(tapes, lengths, consts,
                           problem.fingerprint_points, 1)
    pad = 16
    sdim = len(problem.screen_points) * n_coeffs(problem.residual_order)
    fdim = len(problem.fingerprint_points) * 3
    cache_s = np.zeros((pad, sdim), np.float32)
    cache_f = np.zeros((pad, fdim), np.float32)
    cache_s[:len(prims)] = jets.reshape(len(prims), -1)
    cache_f[:len(prims)] = fj.reshape(len(prims), -1)
    cache_s, cache_f = jnp.asarray(cache_s), jnp.asarray(cache_f)

    n = 4 * nd
    rng = np.random.default_rng(3)
    ab = np.zeros((n, 2), np.int32)
    ab[:, 0] = rng.integers(0, len(prims), n)
    ab[:, 1] = rng.integers(0, len(prims), n)
    spts = jnp.asarray(problem.screen_points, jnp.float32)
    fpts = jnp.asarray(problem.fingerprint_points, jnp.float32)

    packed_1, out_s1, out_f1 = make_op_kernel("mul", compact=True,
                                              **kw)(
        cache_s, cache_f, jnp.asarray(ab), spts, fpts)

    from jax.sharding import NamedSharding, PartitionSpec as P
    ab_sh = jax.device_put(jnp.asarray(ab),
                           NamedSharding(mesh, P("candidates")))
    packed_m, out_sm, out_fm, n_pass = make_op_kernel_multihost(
        mesh, "mul", **kw)(cache_s, cache_f, ab_sh, spts, fpts)

    assert packed_m.shape == packed_1.shape          # full batch, replicated
    np.testing.assert_array_equal(np.asarray(packed_m),
                                  np.asarray(packed_1))
    np.testing.assert_array_equal(np.asarray(out_sm), np.asarray(out_s1))
    np.testing.assert_array_equal(np.asarray(out_fm), np.asarray(out_f1))
    assert int(n_pass) == int((np.asarray(packed_1)[:, 2] & 1).sum())
