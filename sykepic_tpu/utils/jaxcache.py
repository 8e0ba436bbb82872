"""Persistent XLA compilation cache.

Over a tunneled TPU a cold ResNet compile costs 30-110 s; with the
persistent cache a fresh process reloads it in seconds. Enabled by the CLI
and bench entry points; opt out with ``SYKEPIC_COMPILE_CACHE=0`` or pick a
directory via ``SYKEPIC_COMPILE_CACHE=/path``.

Partitioning, by ENTRY backend (not just process platform):

- ``cpu-<host fingerprint>``: XLA:CPU executables embed LLVM features of
  the COMPILE machine (cpu flags AND model-derived tuning like
  +prefer-no-gather) and misbehave on a host whose features differ after
  a VM migration — best case a permanent load-fail/recompile loop
  (measured: the hermetic test suite went 271 s -> 1060 s), worst case
  the AOT loader accepts the entry with a feature-mismatch warning and
  the process SIGILL-aborts mid-run (observed killing the suite).
  ``enable`` deletes cpu partitions whose fingerprint differs from the
  current host's.
- ``<platform>`` (e.g. ``axon``), UNfingerprinted: accelerator
  executables are host-independent, so they must SURVIVE a VM migration
  — fingerprinting this partition (the round-3 layout) threw away every
  cached TPU program on migration and stretched the first train epoch
  from ~25 s to ~147 s of re-compiles over the tunnel.

An accelerator-platform process still compiles XLA:CPU programs (model
init pins to the host CPU), so ``enable`` routes cache reads/writes by
the entry's OWN backend: cpu-backend entries go to the fingerprinted cpu
partition, everything else to the platform partition. jax's LRU size cap
governs each partition independently (24 GB per live partition).
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


def _main_platform() -> str:
    """First configured jax platform name, lowercased (``axon``, ``cpu``,
    ...). Resolution never initializes the jax backend (enable() must run
    before the first compile)."""
    try:
        import jax

        plats = jax.config.jax_platforms or ""
    except Exception:  # pragma: no cover - config introspection best-effort
        plats = ""
    plats = plats or os.environ.get("JAX_PLATFORMS", "")
    return plats.split(",")[0].strip().lower() or "default"


def _platform_tag() -> str:
    """Active partition name. ``cpu-<host fingerprint>`` for the CPU
    platform (host-feature-sensitive entries, see module docstring);
    the bare platform name for accelerators (host-independent entries
    that must survive VM migrations)."""
    plat = _main_platform()
    return f"cpu-{_host_fingerprint()}" if plat == "cpu" else plat


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
        _sweep_dead_partitions(base, _main_platform(), cache_dir.name)
        _install_backend_routing(base)
    except Exception:  # pragma: no cover - cache is best-effort
        return None
    return cache_dir


# ---- per-entry-backend routing (see module docstring) -----------------

_route_base: Path | None = None
_route_caches: dict = {}
_routing_installed = False


def _entry_partition(backend_platform: str) -> str:
    """Partition an ENTRY belongs to, by the backend that compiled it."""
    if backend_platform == "cpu":
        return f"cpu-{_host_fingerprint()}"
    return backend_platform if _main_platform() == "cpu" \
        else _platform_tag()


def _install_backend_routing(base: Path) -> None:
    """Patch ``jax._src.compilation_cache._get_cache`` so each entry is
    stored in the partition of its OWN backend: an accelerator-platform
    process routes its XLA:CPU entries (model init) into the
    fingerprinted cpu partition instead of poisoning the shared
    accelerator partition. Idempotent; re-enabling with a new base
    re-points the routes."""
    global _route_base, _routing_installed
    _route_base = base
    _route_caches.clear()
    if _routing_installed:
        return
    import jax._src.compilation_cache as cc

    fallback = cc._get_cache

    def routed(backend):
        try:
            plat = str(backend.platform)
        except Exception:  # pragma: no cover - exotic backend object
            return fallback(backend)
        cache = _route_caches.get(plat)
        if cache is None:
            try:
                sub = _route_base / _entry_partition(plat)
                sub.mkdir(parents=True, exist_ok=True)
                _repair_atimes(sub)
                got = cc.get_file_cache(str(sub))
                if got is None:  # pragma: no cover - jax declined
                    return fallback(backend)
                cache = got[0]
            except Exception:  # pragma: no cover - cache is best-effort
                return fallback(backend)
            _route_caches[plat] = cache
        return cache

    cc._get_cache = routed
    _routing_installed = True


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


def _sweep_dead_partitions(base: Path, platform: str, active: str) -> int:
    """Delete partitions that can only hurt this host:

    - cpu partitions with a DIFFERENT host fingerprint (their XLA:CPU
      entries can SIGILL here; jax never overwrites existing keys, and
      the LRU cap only governs active directories — left alone, each VM
      migration would squat another 24 GB of dead executables forever),
      plus the legacy fingerprint-less ``cpu`` directory;
    - for an accelerator platform: its legacy FINGERPRINTED directories
      (``<platform>-<fp>``, the round-3 layout) — superseded by the
      shared unfingerprinted partition. The CURRENT host's legacy dir is
      MIGRATED (renamed) into the shared partition rather than deleted:
      its accelerator entries are valid everywhere, and its embedded cpu
      entries become unreachable dead weight (reads route by entry
      backend) that the LRU cap eventually evicts.

    Other platforms' partitions are never touched."""
    import shutil

    removed = 0
    doomed: list[Path] = []
    if platform == "cpu":
        doomed += [d for d in base.glob("cpu-*") if d.name != active]
        doomed.append(base / "cpu")
    else:
        own_legacy = base / f"{platform}-{_host_fingerprint()}"
        shared = base / active
        if own_legacy.is_dir():
            # merge-only (no rmdir+rename window): concurrent enable()
            # calls race here, and per-item renames make the loser's
            # failures harmless no-ops instead of cache loss
            for item in list(own_legacy.iterdir()):
                try:
                    item.rename(shared / item.name)
                except OSError:
                    pass  # target exists (duplicate) or already moved
            # delete the legacy dir only once no cache entries remain —
            # a wholesale rename failure must NOT cost the warm cache
            if not any(own_legacy.glob("*-cache")):
                shutil.rmtree(own_legacy, ignore_errors=True)
        doomed += [d for d in base.glob(f"{platform}-*")
                   if d != own_legacy]
    for stale in doomed:
        if stale.is_dir():
            shutil.rmtree(stale, ignore_errors=True)
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
