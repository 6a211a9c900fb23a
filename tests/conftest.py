"""Test config: run all tests on CPU with 8 virtual devices.

This is the standard JAX fake-backend trick: multi-chip sharding logic is
validated without TPU hardware (SURVEY.md §4). Must run before jax imports.
"""
import os
import resource

# XLA:CPU's compile passes (and cache deserialization) recurse deeply on
# large fused graphs (the 100-step denoise loop); with the default 8 MB
# main-thread stack this intermittently SIGSEGVs mid-suite (reproduced at
# tests/test_pipeline_golden.py inside backend_compile_and_load). Linux
# grows the main-thread stack up to RLIMIT_STACK at fault time, so raising
# the soft limit here — before any deep compile — is a real fix, not a
# band-aid.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = 512 * 1024 * 1024
if _soft != resource.RLIM_INFINITY and _soft < _want:
    new = _hard if _hard != resource.RLIM_INFINITY else _want
    resource.setrlimit(resource.RLIMIT_STACK, (min(_want, new), _hard))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: this box has ONE cpu core, so XLA compiles
# dominate test time. The env vars are not honored on this jax version;
# set via config (after env above).
import jax  # noqa: E402

# The env var JAX_PLATFORMS is ignored on this jax build (the axon TPU
# plugin wins); the config update is authoritative.
jax.config.update("jax_platforms", "cpu")
# Cache dir is keyed by host CPU features: executing another machine type's
# cached AOT executables SIGILL/SIGSEGVs (see utils/compile_cache.py).
from syn3r_tpu.utils.compile_cache import configure as _cc  # noqa: E402

_cc(jax)
# This XLA:CPU build honors the TPU-style default (reduced) matmul
# precision; golden-parity tests need exact f32. Production TPU compute
# uses explicit bf16 dtypes, which this setting does not affect.
jax.config.update("jax_default_matmul_precision", "highest")
# Cache only non-trivial compiles (>= 1 s). Caching EVERYTHING (the
# previous min_compile_time=0 setting) made the suite deserialize
# thousands of sub-millisecond executables, and XLA:CPU's
# deserialize_executable segfaults nondeterministically late in a long
# suite run (reproduced twice at ~test 120, jax 0.9.0, stack through
# compilation_cache.get_executable_and_time). Trivial compiles are cheap
# to redo; the cache exists for the multi-minute UNet/VAE ones.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
