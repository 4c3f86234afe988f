"""pde_engine_tpu — a TPU-native symbolic PDE-solution discovery engine.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
PimDeWitte/pde-engine: depth-by-depth enumeration of closed-form candidate
expressions, mathematical-equivalence deduplication, and validation against
problem-specific PDE constraints — redesigned as fixed-width instruction
tapes evaluated by a vmapped Taylor-jet interpreter over collocation grids,
with numeric-fingerprint dedup and mesh-sharded search.
"""

__version__ = "0.1.0"


def load_problem(name: str):
    """Top-level convenience (the reference exposes problems.load_problem)."""
    from .models import load_problem as _lp
    return _lp(name)
