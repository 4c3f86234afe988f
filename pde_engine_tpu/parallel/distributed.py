"""Multi-host (multi-slice) runtime: jax.distributed over ICI + DCN.

The reference's only "distributed" backend is single-node
multiprocessing.Queue + a SQLite WAL file (general_method_paper_reproduction
.py:772-775, 1119-1120).  The TPU-native scale-out story (SURVEY.md §2.3) is
the JAX single-controller-per-host model instead:

- each host process calls :func:`initialize` (thin wrapper over
  ``jax.distributed.initialize``, env-driven so launchers only set
  variables);
- a GLOBAL 1-D mesh over every chip of every host shards the candidate
  axis; collectives ride ICI within a slice and DCN across slices;
- determinism replaces queues: every host runs the SAME enumeration
  stream, uploads the same index batch, and — because the multi-host
  kernel all-gathers the packed verdicts AND the kept rows' jets — every
  host ingests identical results and appends identical cache rows.  No
  host ever needs another host's Python state, so there is no
  coordinator, no work queue, and no failure-prone cross-host RPC: the
  depth barrier is the only synchronization point, exactly like the
  single-chip engine.

Host-side audit I/O stays single-writer per the reference's discipline:
only process 0 writes the run DB (:func:`is_writer`).

Testable without a cluster: :func:`initialize` is a no-op for
num_processes == 1, and the all-gather step semantics are exercised on a
virtual 8-device CPU mesh in tests/test_distributed.py (the analog of the
reference's "no cluster needed" property).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize the multi-host JAX runtime; returns True if distributed.

    Resolution order: explicit args > PDE_ENGINE_* env vars > JAX/cluster
    auto-detection (jax.distributed.initialize with no args understands
    TPU pod metadata, SLURM, etc.).  A plain single-process run is a
    no-op, so every code path can call this unconditionally.
    """
    num_processes = num_processes if num_processes is not None else int(
        os.environ.get("PDE_ENGINE_NUM_PROCESSES", "1"))
    coordinator_address = (coordinator_address
                           or os.environ.get("PDE_ENGINE_COORDINATOR"))
    process_id = process_id if process_id is not None else (
        int(os.environ["PDE_ENGINE_PROCESS_ID"])
        if "PDE_ENGINE_PROCESS_ID" in os.environ else None)
    if num_processes <= 1 and coordinator_address is None:
        return False
    import jax
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes if num_processes > 1 else None,
        process_id=process_id)
    return True


def is_writer() -> bool:
    """Single-writer discipline: only process 0 owns the run DB (the
    reference funnelled all writes through one process, general:1109-1220)."""
    import jax
    return jax.process_index() == 0


def registry_shard() -> tuple:
    """(rank, world) for host-registry sharding (SearchConfig
    .shard_registry): which slice of the dedup-key space this process
    owns.  (0, 1) when not distributed."""
    import jax
    return jax.process_index(), jax.process_count()


def or_reduce_mask(mask: np.ndarray) -> np.ndarray:
    """Element-wise OR of a boolean mask across all host processes.

    Used by the sharded-registry dedup exchange: host h marks True at
    batch positions that are NEW and OWNED by h; ownership partitions the
    positions, so the OR is a disjoint union and every host recovers the
    identical global first-occurrence mask.  One uint8 all-gather per
    ingest batch (n bytes/host) riding the same ICI/DCN fabric as the
    verdict all-gather — negligible next to the batch's device compute.
    """
    import jax
    if jax.process_count() <= 1:
        return mask
    from jax.experimental import multihost_utils
    stacked = multihost_utils.process_allgather(
        mask.astype(np.uint8))
    return np.asarray(stacked).any(axis=0)


def global_candidate_mesh():
    """1-D mesh over every chip of every host (candidate axis)."""
    import jax
    from .mesh import CANDIDATE_AXIS
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), (CANDIDATE_AXIS,))


def make_op_kernel_multihost(mesh, op_name: str, order: int,
                             residual_key: str, screen_rtol: float,
                             n_screen: int, n_fp: int):
    """Multi-host-correct variant of the sharded op kernel.

    The single-host sharded kernel (incremental.make_op_kernel_sharded)
    leaves packed verdicts and batch jets SHARDED — fine when one host can
    address every shard.  Across hosts, each process can only read its
    addressable shards, but ingest (dedup, uid assignment, cache append)
    must be IDENTICAL on every host to keep the replicated jet cache and
    the uid <-> row invariant in lockstep.  This kernel therefore
    all-gathers the packed verdicts and the batch jets along the candidate
    axis before returning — every host sees the full batch and ingests
    identically.  Verdicts are ~45 f32/candidate and jets ~140
    f32/candidate; at a 262k batch that is a ~190 MB all_gather riding
    ICI/DCN, well under the per-batch device compute time.
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from .incremental import OP_INDEX, make_universal_kernel_raw
    from .mesh import CANDIDATE_AXIS

    raw = make_universal_kernel_raw(order, residual_key, screen_rtol,
                                    n_screen, n_fp, compact=True)
    op_id = jnp.asarray(OP_INDEX[op_name], jnp.int32)

    def step(cache_screen, cache_fp, ab_idx, spoints, fpoints):
        packed, out_s, out_f = raw(cache_screen, cache_fp, ab_idx, op_id,
                                   spoints, fpoints)
        # compact layout: col 2 bit 0 is screen_ok (12 B/candidate on
        # the wire instead of 108 B — see incremental.py)
        n_pass = jax.lax.psum(
            jnp.sum((packed[:, 2] & jnp.uint32(1)).astype(jnp.int32)),
            CANDIDATE_AXIS)
        # tiled=True keeps the candidate axis order: shard k's rows land
        # at [k*shard : (k+1)*shard], matching the host's batch order
        packed = jax.lax.all_gather(packed, CANDIDATE_AXIS, axis=0,
                                    tiled=True)
        out_s = jax.lax.all_gather(out_s, CANDIDATE_AXIS, axis=0,
                                   tiled=True)
        out_f = jax.lax.all_gather(out_f, CANDIDATE_AXIS, axis=0,
                                   tiled=True)
        return packed, out_s, out_f, n_pass

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P(CANDIDATE_AXIS), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False)
    return jax.jit(sharded)
