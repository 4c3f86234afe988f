"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (the analog of the reference's
"single node, no cluster needed" property — SURVEY.md §4).

The env vars alone are NOT enough on hosts whose sitecustomize imports jax
at interpreter boot (the axon harness does: it registers the TPU plugin
before pytest loads this file, latching jax's platform config) — the
config API must be used after the fact, and ``jax_num_cpu_devices`` is the
reliable device-count knob (XLA_FLAGS is ignored once the plugin
registration has run).  Without this the whole suite silently runs on the
one real TPU chip with a 1-device "mesh", testing nothing multi-chip.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # the harness presets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_enable_fast_math" not in flags:
    # LLVM fast-math breaks the bitwise swap-symmetry of the jet algebra
    # that the fingerprint dedup keys rely on (tests/test_fp_snap.py);
    # pde_engine_tpu/__init__ sets this too, but tests must not depend on
    # import order
    flags = (flags + " --xla_cpu_enable_fast_math=false").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402  (sitecustomize may have imported it already)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

assert len(jax.devices()) >= 8 and jax.devices()[0].platform == "cpu", (
    "test session must run on >= 8 virtual CPU devices; got "
    f"{len(jax.devices())}x {jax.devices()[0].platform}")
