"""pde_engine_tpu — a TPU-native symbolic PDE-solution discovery engine.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
PimDeWitte/pde-engine: depth-by-depth enumeration of closed-form candidate
expressions, mathematical-equivalence deduplication, and validation against
problem-specific PDE constraints — redesigned as fixed-width instruction
tapes evaluated by a vmapped Taylor-jet interpreter over collocation grids,
with numeric-fingerprint dedup and mesh-sharded search.
"""

__version__ = "0.1.0"

import os as _os

# The CPU backend compiles with LLVM fast-math by default, which lets
# instcombine reassociate/FMA-contract the jet algebra — that breaks the
# bitwise swap-symmetry the fingerprint dedup keys rely on (see
# ops/jets.jet_mul and tests/test_fp_snap.py).  XLA parses XLA_FLAGS at
# first backend use, which is later than package import even when
# sitecustomize imported jax at interpreter boot, so setting it here
# covers the CLI, tests, bench, and the driver's virtual-device dryrun.
# TPU compilation ignores this flag.  No-op if the user already set it.
if "xla_cpu_enable_fast_math" not in _os.environ.get("XLA_FLAGS", ""):
    _os.environ["XLA_FLAGS"] = (_os.environ.get("XLA_FLAGS", "")
                                + " --xla_cpu_enable_fast_math=false").strip()


def load_problem(name: str):
    """Top-level convenience (the reference exposes problems.load_problem)."""
    from .models import load_problem as _lp
    return _lp(name)
