"""Persistent XLA compilation cache.

The fused PAIRED cycle programs take minutes to compile cold on the TPU
backend; a disk cache makes every process after the first (train restarts,
bench reruns, eval after train) start in seconds. The reference has no
equivalent concern (torch eager). Honors an explicit
``JAX_COMPILATION_CACHE_DIR`` if the caller already set one.
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Enable the JAX persistent compilation cache. Returns the dir used."""
    import jax

    cache_dir = (
        cache_dir
        or os.environ.get('JAX_COMPILATION_CACHE_DIR')
        or os.path.join(
            os.path.expanduser('~'), '.cache', 'dcd_isaac_tpu_xla')
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    # cache anything that took >1s to compile, regardless of size
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    return cache_dir
