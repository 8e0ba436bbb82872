"""Make the project venv importable under a bare system python.

A VM migration once dropped ``/opt/venv/bin`` from PATH, so the driver's
``python bench.py`` resolved to the venv's *base* interpreter
(``/usr/local/bin/python``), which has no third-party packages. The venv
is built from that exact interpreter (``/opt/venv/pyvenv.cfg: home =
/usr/local/bin``), so its site-packages are ABI-compatible — inserting
them on ``sys.path`` is all that's needed. Works for any invocation style
(script, ``-c``, ``-m``), unlike an ``os.execv`` re-exec.
"""

from __future__ import annotations

import os
import sys


def ensure() -> None:
    """If numpy is missing, graft the project venv's site-packages in."""
    try:
        import numpy  # noqa: F401
        return
    except ImportError:
        pass
    major, minor = sys.version_info[:2]
    for venv in filter(None, (os.environ.get("VIRTUAL_ENV"), "/opt/venv")):
        site = os.path.join(venv, "lib", f"python{major}.{minor}",
                            "site-packages")
        if os.path.isdir(site) and site not in sys.path:
            sys.path.insert(0, site)
            try:
                import numpy  # noqa: F401
            except ImportError:
                sys.path.remove(site)
                continue
            _rerun_sitecustomize()
            return


def _rerun_sitecustomize() -> None:
    """Re-run the host's sitecustomize (it registers the tunneled TPU's
    PJRT plugin and needs numpy, so it failed silently at interpreter
    startup in exactly the situation :func:`ensure` just repaired)."""
    for d in os.environ.get("PYTHONPATH", "").split(os.pathsep):
        cand = os.path.join(d, "sitecustomize.py")
        if d and os.path.isfile(cand):
            import runpy

            try:
                runpy.run_path(cand, run_name="sitecustomize")
            except Exception:
                pass  # same contract as startup: interpreter still works
            return
