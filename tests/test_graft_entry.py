"""Driver entry points: single-chip compile check and the multi-chip
dry-run (8 virtual CPU devices) must keep working."""

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_compiles_and_runs():
    sys.path.insert(0, REPO_ROOT)
    import jax
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.screen_ok.shape[0] == args[0].shape[0]
    # the known solutions in the example batch must pass the screen
    import numpy as np
    assert np.asarray(out.screen_ok).sum() >= 1


def test_dryrun_multichip_8():
    sys.path.insert(0, REPO_ROOT)
    import __graft_entry__ as g

    g.dryrun_multichip(8)
