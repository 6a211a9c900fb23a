"""Host-fingerprinted persistent-compile-cache location.

The XLA:CPU persistent cache stores AOT-compiled executables specialized to
the compiling host's CPU features. This environment's VM migrates between
physical hosts across sessions while /tmp persists, so a shared
``/tmp/jax_cache`` accumulates executables for OTHER machines; loading one
logs "Machine type used for XLA:CPU compilation doesn't match the machine
type for execution ... could lead to execution errors such as SIGILL" and
intermittently SIGSEGVs mid-suite (observed repeatedly). Keying the cache
directory by a digest of the host's CPU feature flags makes each machine
type use its own cache.
"""
import hashlib


def cache_dir(base: str = "/tmp/jax_cache") -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    digest = hashlib.md5(flags.encode()).hexdigest()[:10]
    return f"{base}_{digest}" if flags else base


def configure(jax_module) -> str:
    """Point jax's persistent compilation cache at the host-keyed dir."""
    d = cache_dir()
    jax_module.config.update("jax_compilation_cache_dir", d)
    return d
