"""Persistent XLA compilation cache (measured working over the axon
tunnel: a 6.7 s cold compile replays in 0.64 s from a fresh process).

Cold starts at config-5 scale are compile-dominated — the first TOPN
evaluation at 1M items paid ~583 s of per-bucket serving compiles that
the warm eval runs in 4.3 s (BASELINE.md round-5 Solver showcase) — so
every entry point enables this by default. Controlled by
``CDAE_COMPILE_CACHE``: unset -> ~/.cache/cdae_tpu_xla; a path -> that
directory; ``0``/``off`` -> disabled.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str | None:
    """Turn on the persistent compile cache; returns the dir (or None if
    disabled). Call before the first compilation; safe to call twice."""
    env = os.environ.get("CDAE_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "false", "none"):
        return None
    path = cache_dir or env or os.path.join(
        os.path.expanduser("~"), ".cache", "cdae_tpu_xla"
    )
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything (default only caches compiles > 1s; the
        # tunnel's remote-compile round trips make even small programs
        # worth caching)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # noqa: BLE001 — the cache is an optimization;
        # a read-only HOME or an old jax must never break an entry point
        return None
    return path
