"""Persistent XLA compilation cache.

Every entry point (bench, train, sample, graft entry) funnels through
:func:`enable_persistent_compilation_cache` so repeated process launches hit
warm compiles: the sampling scan-chunk program takes minutes to compile on
the remote-TPU service but milliseconds to deserialize from the cache.

The cache lives inside the repo (``.jax_compilation_cache/``) so it rides
along with a checkout; entries are keyed by JAX version, backend, device
kind and compile options, so stale entries are simply misses, never wrong
programs.
"""

import os

_DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_compilation_cache",
)

_enabled = False


def enable_persistent_compilation_cache(cache_dir: str = None) -> str:
    """Idempotently point JAX's persistent compilation cache at ``cache_dir``.

    Returns the cache directory in use.
    """
    global _enabled
    import jax

    default_dir = _DEFAULT_CACHE_DIR
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        # CPU runs (tests, dev drives) compile in milliseconds; caching them
        # into the repo only churns the committed, bench-traced TPU cache
        # (round-4 verdict: ~20 drifted entries after every dev session).
        # Keep CPU entries out of the tree by default.
        default_dir = os.path.join(
            os.environ.get("TMPDIR", "/tmp"), "dfmsmd_cpu_compile_cache"
        )
    cache_dir = cache_dir or os.environ.get(
        "DFMSMD_COMPILATION_CACHE_DIR", default_dir
    )
    if not _enabled:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything: even sub-second entries help the many small jitted
        # helpers, and the scan-chunk entries are the whole point.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _enabled = True
    # Report the directory actually in use: a second call with a different
    # cache_dir is a no-op (first activation wins).
    return jax.config.jax_compilation_cache_dir
