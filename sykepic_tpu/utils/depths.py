"""Async-pipeline depth knobs, defined ONCE.

Both the engine's in-flight dispatch queues (compute/engine.py) and the
shelf window-buffer pool capacity (ingest/shelf.py) derive from these;
a single source keeps an env override of either depth from silently
overflowing the recycling pool back onto the page-fault path (ADVICE
r04). Rationale for the defaults lives at the engine's definitions.
"""

import os

PIPELINE_DEPTH = int(os.environ.get("SYKEPIC_PIPELINE_DEPTH", "12"))
# Re-A/B'd after the r05 feature-program rework made the fused leg more
# wire-bound (2026-08-21, alternating passes at a 34-40 MB/s link):
# depth 8 median 11,201 ROIs/s vs depth 12's 10,541 and visibly steadier
# pass-to-pass — the deeper queue only adds in-flight buffer pressure
# (each fused dispatch pins TWO result transfers). 8 stays the default.
FUSED_PIPELINE_DEPTH = int(os.environ.get("SYKEPIC_FUSED_PIPELINE_DEPTH", "8"))
