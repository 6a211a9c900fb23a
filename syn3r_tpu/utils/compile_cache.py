"""Host-fingerprinted persistent-compile-cache location.

The XLA:CPU persistent cache stores AOT-compiled executables specialized to
the compiling host's CPU (down to LLVM target features like
``prefer-no-gather`` that /proc/cpuinfo does not expose). This
environment's VM migrates between physical hosts across sessions while
/tmp persists, so a shared ``/tmp/jax_cache`` accumulates executables for
OTHER machines; loading one logs "Machine type used for XLA:CPU
compilation doesn't match the machine type for execution ... could lead to
execution errors such as SIGILL" and intermittently SIGSEGVs inside
``compilation_cache.get_executable_and_time`` mid-suite (reproduced three
times). A cpuinfo-flags digest alone proved insufficient — two placements
can share the flag list yet differ in LLVM-detected features — so the key
also includes the kernel ``boot_id``: a migration is a reboot, so cache
entries can never cross physical placements. Within one boot (one round,
typically many sessions) the cache stays warm.
"""
import hashlib


def cache_dir(base: str = "/tmp/jax_cache") -> str:
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            parts.append(next((ln for ln in f if ln.startswith("flags")),
                              ""))
    except OSError:
        pass
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            parts.append(f.read().strip())
    except OSError:
        pass
    if not parts:
        return base
    digest = hashlib.md5("|".join(parts).encode()).hexdigest()[:10]
    return f"{base}_{digest}"


def configure(jax_module) -> str:
    """Point jax's persistent compilation cache at the host-keyed dir."""
    d = cache_dir()
    jax_module.config.update("jax_compilation_cache_dir", d)
    return d
