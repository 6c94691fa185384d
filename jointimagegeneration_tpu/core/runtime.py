"""Process-level runtime setup shared by the CLIs."""

from __future__ import annotations

import os

import jax

__all__ = ["enable_persistent_compile_cache"]


def enable_persistent_compile_cache(min_compile_seconds: float = 5.0) -> bool:
    """Enable JAX's persistent compilation cache on accelerator backends.

    The flagship programs here compile in minutes (tens of minutes through
    a remote-compile relay), and the reference's workflow restarts its
    CLIs constantly (ddpm_eval.py / sample_diffusion.py are one-shot
    processes); caching makes every restart after the first cheap.

    Deliberately a NO-OP on the CPU backend: CPU-compiled artifacts carry
    host machine features and can SIGILL when loaded under a different
    machine profile, and the CPU test suite must never populate a cache
    (measured on this relay-compiled stack — see BENCH_NOTES).  On jax
    0.9 the JAX_COMPILATION_CACHE_DIR env var alone does NOT enable the
    cache; the config update below is required.  Returns True when the
    cache was enabled.
    """
    if jax.default_backend() == "cpu":
        return False
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.expanduser("~/.jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_seconds)
    return True
