"""Test config: run all tests on CPU with 8 virtual devices.

This is the standard JAX fake-backend trick: multi-chip sharding logic is
validated without TPU hardware (SURVEY.md §4). Must run before jax imports.
"""
import os
import resource
import sys

# SIGSEGV defense layer 1 — stack. XLA:CPU's compile passes (and cache
# deserialization) recurse deeply on large fused graphs (the 100-step
# denoise loop); with the default 8 MB main-thread stack this SIGSEGVs
# inside backend_compile_and_load (reproduced at test_pipeline_golden).
# A runtime setrlimit raise only grows the MAIN stack as far as the
# exec-time gap allows, so pytest_pyfunc_call (bottom) additionally runs
# every test body on a worker thread whose 512 MB stack is PREALLOCATED
# as one mapping — compile recursion depth never depends on process
# history. (An execv re-exec with the limit raised also works but
# silently loses all pytest output to the superseded capture fds.)
_WANT_STACK = 512 * 1024 * 1024
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _soft != resource.RLIM_INFINITY and _soft < _WANT_STACK:
    _new = (_WANT_STACK if _hard == resource.RLIM_INFINITY
            else min(_WANT_STACK, _hard))
    resource.setrlimit(resource.RLIMIT_STACK, (_new, _hard))

# SIGSEGV defense layer 2 — mapping count. The deterministic mid-suite
# crash at test ~86 (reproduced 4x: cold cache, warm cache, exec-time
# 512 MB stack, preallocated worker-thread stack — same test every time)
# is vm.max_map_count exhaustion, NOT stack: every XLA:CPU-compiled
# executable keeps JIT code pages mapped and jax caches every jitted
# function for the whole session — measured 38k mappings after just 50
# tests; the full 159-test suite blows through the 65530 default during
# the direction-parallel denoise compile, mmap fails, and LLVM
# dereferences the failure. Raise the sysctl when permitted (root), and
# drop compiled executables between test modules (the autouse fixture at
# the bottom) so growth stays bounded anywhere.
try:
    with open("/proc/sys/vm/max_map_count", "r+") as _f:
        if int(_f.read()) < 1_048_576:
            _f.seek(0)
            _f.write("1048576")
except OSError:
    pass

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


def pytest_pyfunc_call(pyfuncitem):
    """Run every test body on a worker thread with a preallocated 512 MB
    stack (see the RLIMIT_STACK note at the top: pthread stacks are one
    up-front mmap, so XLA's compile recursion can never be cut short by
    mappings blocking main-stack growth late in the suite)."""
    import threading

    testfunction = pyfuncitem.obj
    testargs = {arg: pyfuncitem.funcargs[arg]
                for arg in pyfuncitem._fixtureinfo.argnames}
    failure = []

    def run():
        try:
            testfunction(**testargs)
        except BaseException:  # noqa: BLE001 — re-raised on the main thread
            failure.append(sys.exc_info())

    old = threading.stack_size(_WANT_STACK)
    try:
        t = threading.Thread(target=run, name=f"test:{pyfuncitem.name}")
    finally:
        threading.stack_size(old)
    t.start()
    t.join()
    if failure:
        _, exc, tb = failure[0]
        raise exc.with_traceback(tb)
    return True


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_executable_maps():
    """Drop jax's compiled-executable caches after each test module: each
    XLA:CPU executable holds JIT code-page mappings for the life of the
    cache, and the suite otherwise exhausts vm.max_map_count (see the
    sysctl note above). The persistent on-disk cache keeps recompiles
    cheap across modules."""
    yield
    jax.clear_caches()
