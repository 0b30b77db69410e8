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
    """Point jax's persistent compilation cache at the machine-keyed dir.

    Safe to call before device initialization (``backend=None`` resolves
    the default backend, which DOES initialize the platform — pass the
    backend name explicitly to avoid that).

    ``writes=False`` keeps cache READS but disables entry writes: jaxlib
    0.9.0's XLA:CPU ``executable.serialize()`` segfaults probabilistically
    on some freshly-compiled executables (observed twice in full-suite
    pytest runs, stack ending in compilation_cache.put_executable_and_time
    line 265), and the min-compile-time gate runs BEFORE serialization, so
    an effectively-infinite threshold skips the crashing path entirely.
    The test suite runs read-only; seed the cache once with
    ``MADIPM_CACHE_WRITE=1 python -m pytest tests/ -q`` (re-run on a crash
    — every completed compile before the crash is already on disk, so
    progress is monotonic).
    """
    if backend is None:
        backend = jax.default_backend()
    path = jax_cache_dir(backend)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", 1.0 if writes else 1e9
    )
    return path
