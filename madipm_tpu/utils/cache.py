"""Machine-keyed persistent-compilation-cache location.

The /tmp cache directories are visible to more than one machine in this
environment (the benchmark driver executes on a different host than the
interactive builds).  XLA:CPU persists AOT executables keyed only by the
computation, so an entry compiled on a host with different CPU
machine-features loads here and then SIGILLs/SIGSEGVs mid-test (observed
repeatedly: ``cpu_aot_loader.cc "machine feature +prefer-no-gather is not
supported"`` warnings when it falls back, hard SIGSEGV in fused kernels
when it does not).  Keying the directory by a fingerprint of the local CPU
flags + jaxlib version makes foreign entries land in a different directory
entirely, eliminating the class of fault instead of requiring the
clear-and-rerun ritual documented in CLAUDE.md.
"""

from __future__ import annotations

import hashlib
import os


def _machine_fingerprint() -> str:
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        parts.append(os.uname().machine)
    try:
        import jaxlib

        parts.append(getattr(jaxlib, "__version__", "?"))
    except Exception:
        pass
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:10]


def jax_cache_dir(backend: str) -> str:
    """Per-backend, per-machine persistent cache directory."""
    return f"/tmp/madipm_jax_cache_{backend}_{_machine_fingerprint()}"


def configure_cache(jax, backend: str | None = None, writes: bool = True) -> str:
    """Point jax's persistent compilation cache at the machine-keyed dir —
    except on CPU, where the cache is DISABLED outright.

    jaxlib 0.9.0's XLA:CPU executable (de)serialization segfaults
    probabilistically on some of this package's programs in BOTH
    directions: ``executable.serialize()`` on write
    (compilation_cache.put_executable_and_time line 265, observed twice)
    AND deserialize on read of entries that were themselves written
    cleanly (compilation_cache.get_executable_and_time line 238, observed
    after a clean per-file seeding pass).  There is no safe mode, so CPU
    runs simply recompile (full test suite ~16 min cold).  Set
    MADIPM_CPU_CACHE=1 to opt back in at your own risk.

    The TPU (axon) cache has been reliable across every round and big
    compiles cost minutes, so it stays on; ``writes=False`` keeps it
    read-only (the min-compile-time gate runs BEFORE serialization).

    Safe to call before device initialization (``backend=None`` resolves
    the default backend, which DOES initialize the platform — pass the
    backend name explicitly to avoid that).
    """
    if backend is None:
        backend = jax.default_backend()
    if backend == "cpu" and os.environ.get("MADIPM_CPU_CACHE") != "1":
        jax.config.update("jax_compilation_cache_dir", None)
        return ""
    path = jax_cache_dir(backend)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", 1.0 if writes else 1e9
    )
    return path
