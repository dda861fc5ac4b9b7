"""Machine-keyed persistent XLA compilation cache.

Round-3 post-mortem (VERDICT.md weakness #1): the bench and the test suite
shared a fixed cache directory (``/tmp/srm_tpu_jax_cache``).  XLA:CPU entries
are AOT-compiled machine code keyed only by the HLO — when the directory is
reused across machines with different CPU feature sets, the loader spews
"Machine type used for XLA:CPU compilation doesn't match" errors and can
SIGILL, and the round-3 driver bench timed out under exactly that.

Fix: key the cache directory by a fingerprint of (CPU feature flags, CPU
model, jax version, python minor version).  A different host gets a different
directory, so stale cross-machine AOT executables can never be loaded.
"""

from __future__ import annotations

import hashlib
import os
import platform
import sys


def machine_fingerprint() -> str:
    """Short stable hash of the execution environment that determines
    whether an XLA AOT executable is safe to reuse."""
    parts = [platform.machine(), sys.version.split()[0]]
    try:
        import jax

        parts.append(jax.__version__)
    except Exception:  # pragma: no cover - jax is always present in practice
        pass
    try:
        seen = set()
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":")[0].strip()
                # both the model AND the feature flags: two hosts can share a
                # model string while exposing different microarch features
                if key in ("flags", "model name", "Features") and key not in seen:
                    seen.add(key)
                    parts.append(line.strip())
                if len(seen) == 2:
                    break
    except OSError:
        parts.append(platform.processor())
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:10]


def cache_dir(base: str | None = None) -> str:
    """Machine-keyed cache directory (created if missing).

    ``SRM_TPU_JAX_CACHE`` overrides the *base*; the fingerprint suffix is
    always appended so even an explicit override stays machine-safe.
    """
    base = base or os.environ.get("SRM_TPU_JAX_CACHE", "/tmp/srm_tpu_jax_cache")
    d = f"{base.rstrip('/')}_{machine_fingerprint()}"
    os.makedirs(d, exist_ok=True)
    return d


def enable_persistent_cache(min_compile_secs: float = 2.0,
                            min_entry_bytes: int | None = None) -> str:
    """Point jax's persistent compilation cache at the machine-keyed dir."""
    import jax

    d = cache_dir()
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    if min_entry_bytes is not None:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          min_entry_bytes)
    return d
