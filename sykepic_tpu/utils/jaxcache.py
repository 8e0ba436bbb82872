"""Persistent XLA compilation cache.

Over a tunneled TPU a cold ResNet compile costs 30-110 s; with the
persistent cache a fresh process reloads it in seconds. Enabled by the CLI
and bench entry points; opt out with ``SYKEPIC_COMPILE_CACHE=0`` or pick a
directory via ``SYKEPIC_COMPILE_CACHE=/path``.

The cache is partitioned ``<platform>-<host fingerprint>``: XLA:CPU
entries embed LLVM features of the COMPILE machine (cpu flags AND
model-derived tuning like +prefer-no-gather) and misbehave on a host
whose features differ after a VM migration — best case a permanent
load-fail/recompile loop (measured: the hermetic test suite went
271 s -> 1060 s), worst case the AOT loader accepts the entry with a
feature-mismatch warning and the process SIGILL-aborts mid-run (observed
killing the suite). Every partition carries the fingerprint — even
accelerator platforms compile XLA:CPU programs (model init pins to the
host CPU) — and ``enable`` deletes the active platform's partitions
whose fingerprint differs from the current host's. jax's LRU size cap
governs only the ACTIVE partition, so the bound on total disk is 24 GB
per live platform partition (cpu + accelerator on a bench machine), not
24 GB overall.
"""

from __future__ import annotations

import os
from pathlib import Path

DEFAULT_DIR = Path.home() / ".cache" / "sykepic-tpu" / "xla"


def _host_fingerprint() -> str:
    """12-hex digest of the host CPU's identity + feature flags.

    Fingerprint = flags + MODEL IDENTITY. Flags alone are not enough:
    XLA:CPU bakes LLVM tuning features derived from the cpu MODEL
    (e.g. +prefer-no-gather) into its AOT executables, so a migration
    between hosts with identical cpuinfo flags but different models
    produced entries that LOADED here with a feature-mismatch warning
    and then SIGILL-aborted the process mid-run (observed killing the
    test suite). Model name/family/stepping pins those derived
    features."""
    import hashlib

    parts: list[str] = []
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("vendor_id", "cpu family", "model",
                           "model name", "stepping") and \
                        len(parts) < 5 and line.count(":"):
                    parts.append(line.split(":", 1)[1].strip())
                elif key in ("flags", "Features") and not feats:
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                if feats and len(parts) >= 5:
                    break
    except OSError:  # pragma: no cover - non-Linux fallback
        import platform

        feats = platform.processor()
    return hashlib.sha256(
        ("|".join(parts) + "#" + feats).encode()
    ).hexdigest()[:12]


def _platform_tag() -> str:
    """Partition name for the cache: ``<platform>-<host fingerprint>``.

    EVERY partition carries the host fingerprint — not just the CPU
    backend's — because any process compiles XLA:CPU programs regardless
    of its main platform (``registry.init_variables`` pins model init to
    the host CPU), so an accelerator partition accumulates CPU AOT
    entries that poison post-migration processes exactly like a pure-CPU
    partition does (observed: SIGILL-warning loads from the ``axon``
    partition after the fix had already repartitioned ``cpu``).
    Accelerator executables themselves are host-independent; the split
    costs one re-warm per migration, which the tunnel amortizes in a run.
    Resolution never initializes the jax backend (enable() must run
    before the first compile)."""
    try:
        import jax

        plats = jax.config.jax_platforms or ""
    except Exception:  # pragma: no cover - config introspection best-effort
        plats = ""
    plats = plats or os.environ.get("JAX_PLATFORMS", "")
    first = plats.split(",")[0].strip().lower() or "default"
    return f"{first}-{_host_fingerprint()}"


def enable(cache_dir=None) -> Path | None:
    """Configure jax's compilation cache (idempotent). Returns the dir or
    None when disabled. Must run before the first compilation."""
    env = os.environ.get("SYKEPIC_COMPILE_CACHE", "")
    if env.lower() in ("0", "false", "no", "off"):
        return None
    if env.lower() in ("", "1", "true", "yes", "on"):
        env = ""  # plain enable spellings mean "use the default dir"
    base = Path(cache_dir or (env if env else DEFAULT_DIR))
    cache_dir = base / _platform_tag()
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
        _sweep_legacy_flat_entries(base)
        _sweep_dead_fingerprint_partitions(base, cache_dir.name)
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


def _sweep_dead_fingerprint_partitions(base: Path, active: str) -> int:
    """Delete this platform's sibling partitions whose host fingerprint
    differs from the current host's, plus its legacy fingerprint-less
    directory. Their XLA:CPU entries can SIGILL-abort on this machine
    (feature-set mismatch), jax never overwrites existing keys, and the
    LRU cap only governs the active directory — left alone, each VM
    migration would squat another 24 GB of (partially) dead executables
    forever. Other platforms' partitions are never touched."""
    import shutil

    removed = 0
    prefix = active[: active.rfind("-") + 1]  # "<platform>-"
    for sibling in base.glob(f"{prefix}*"):
        if sibling.is_dir() and sibling.name != active:
            shutil.rmtree(sibling, ignore_errors=True)
            removed += 1
    legacy = base / prefix.rstrip("-")  # pre-fingerprint layout
    if legacy.is_dir():
        shutil.rmtree(legacy, ignore_errors=True)
        removed += 1
    return removed


def _sweep_legacy_flat_entries(base: Path) -> int:
    """One-time migration: remove pre-partition entries sitting flat in the
    base directory (mixed CPU/TPU, the CPU ones dead after a VM migration
    and unidentifiable without deserializing). They are no longer in any
    active cache dir, so they would otherwise squat their bytes forever."""
    removed = 0
    for entry in base.glob("*-cache"):
        if entry.is_file():
            entry.unlink(missing_ok=True)
            removed += 1
    for mark in base.glob("*-atime"):
        if mark.is_file():
            mark.unlink(missing_ok=True)
    return removed
