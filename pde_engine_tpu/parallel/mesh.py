"""Device-mesh helpers for sharding the candidate axis.

The reference scales by adding validator *processes* fed from a
multiprocessing queue (general_method_paper_reproduction.py:749-904).  The
TPU-native analog is a 1-D ``jax.sharding.Mesh`` over a ``candidates`` axis:
candidate tape batches are sharded across it, each chip screens its shard,
and survivor counts are reduced with ``psum`` — collectives ride ICI, the
host only sees survivor indices.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CANDIDATE_AXIS = "candidates"


def candidate_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (CANDIDATE_AXIS,))


def shard_batch(mesh: Mesh):
    """Sharding for arrays whose leading axis is the candidate axis."""
    return NamedSharding(mesh, P(CANDIDATE_AXIS))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
