"""Persistent XLA compilation cache.

Over a tunneled TPU a cold ResNet compile costs 30-110 s; with the
persistent cache a fresh process reloads it in seconds. Enabled by the CLI
and bench entry points; opt out with ``SYKEPIC_COMPILE_CACHE=0`` or pick a
directory via ``SYKEPIC_COMPILE_CACHE=/path``.
"""

from __future__ import annotations

import os
from pathlib import Path

DEFAULT_DIR = Path.home() / ".cache" / "sykepic-tpu" / "xla"


def enable(cache_dir=None) -> Path | None:
    """Configure jax's compilation cache (idempotent). Returns the dir or
    None when disabled. Must run before the first compilation."""
    env = os.environ.get("SYKEPIC_COMPILE_CACHE", "")
    if env.lower() in ("0", "false", "no", "off"):
        return None
    if env.lower() in ("", "1", "true", "yes", "on"):
        env = ""  # plain enable spellings mean "use the default dir"
    cache_dir = Path(cache_dir or (env if env else DEFAULT_DIR))
    try:
        cache_dir.mkdir(parents=True, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        # Serialized executables average ~60 MB; an uncapped cache grew
        # to 116 GB in two days of bench/test runs and filled the disk
        # (ENOSPC mid-benchmark). LRU-cap the directory and skip caching
        # fast compiles — only the multi-second tunnel compiles are worth
        # the bytes.
        jax.config.update("jax_compilation_cache_max_size",
                          24 * 1024**3)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        _repair_atimes(cache_dir)
    except Exception:  # pragma: no cover - cache is best-effort
        return None
    return cache_dir


def _repair_atimes(cache_dir: Path) -> int:
    """Recreate missing ``-atime`` companions of ``-cache`` entries.

    jax's size-capped LRU layer reads every entry's atime file during
    eviction and a single missing one (entries written before the cap was
    configured, or a crash between the two writes) makes EVERY subsequent
    cache write fail — new programs then silently recompile in each fresh
    process (~10-30 s each over a tunneled TPU)."""
    import time

    ts = time.time_ns().to_bytes(8, "little")  # jax lru_cache.py format
    fixed = 0
    for entry in cache_dir.glob("*-cache"):
        atime = cache_dir / (entry.name[: -len("-cache")] + "-atime")
        if not atime.exists():
            atime.write_bytes(ts)
            fixed += 1
    return fixed
