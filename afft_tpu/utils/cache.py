"""Persistent XLA compilation cache, shared across every entry point.

The flagship programs cost 100-380 s to compile on the tunneled dev TPU
(and tens of seconds on CPU); the repo-local ``.jax_cache/`` directory
makes that a once-per-image cost. bench.py, the test conftest, and the
tools/ harnesses all point at the same directory so any of them can warm
it for the others.
"""

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def enable_compile_cache(cache_dir=None):
    """Route XLA compiles through the repo-local persistent cache.

    Safe to call before or after backend init (jax.config updates apply
    to subsequent compiles); idempotent. No-op (returns None) when
    AFFT_NO_COMPILE_CACHE is set — the one opt-out knob applies to every
    entry point (train/eval CLIs, bench.py, the tools/ harnesses)."""
    if os.environ.get("AFFT_NO_COMPILE_CACHE"):
        return None
    import jax

    cache_dir = cache_dir or os.path.join(_REPO_ROOT, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
