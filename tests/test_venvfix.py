"""The driver invokes ``python bench.py`` / ``__graft_entry__`` with
whatever interpreter PATH resolves; after a VM migration that was the
venv's *base* python (no third-party packages). ``_venvfix.ensure()``
grafts the venv site-packages in; these tests pin that contract."""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _bare_interpreter() -> Path | None:
    """The venv's base interpreter (no site-packages of its own)."""
    if sys.prefix == sys.base_prefix:
        return None  # already running the base interpreter: nothing to test
    for name in ("python3", "python"):
        cand = Path(sys.base_prefix) / "bin" / name
        if cand.exists():
            return cand
    return None


def test_ensure_is_noop_with_numpy_present():
    import _venvfix

    before = list(sys.path)
    _venvfix.ensure()
    assert sys.path == before


def test_bare_interpreter_gets_numpy():
    bare = _bare_interpreter()
    if bare is None:
        import pytest

        pytest.skip("running on the base interpreter already")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS",)}  # keep hermetic: no TPU
    env["VIRTUAL_ENV"] = sys.prefix
    proc = subprocess.run(
        [str(bare), "-c",
         "import _venvfix; _venvfix.ensure(); import numpy; print('ok')"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=120,
    )
    assert "ok" in proc.stdout, (proc.stdout, proc.stderr)
