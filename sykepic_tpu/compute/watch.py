"""Continuous monitoring mode: ``sykepic-tpu watch`` polls a raw directory
and processes new IFCB samples as the instrument writes them (fused
classify+features per sample).

The reference is batch-only (run ``sykepic prob``/``feat`` by hand or cron);
this daemon is the deployment shape the pipeline actually runs in at a
monitoring station: the model stays loaded (no per-invocation JAX/compile
cost), outputs are idempotent (existing CSVs skip), and a sample is only
picked up once its ``.roi`` stops growing (the instrument writes for ~20
minutes per sample).
"""

from __future__ import annotations

import time

from ..utils import files, logger
from . import feature_native, pipeline, probability

log = logger.get_logger("watch")


def call(args):
    clf = probability.prepare_model(args.model, batch_size=args.batch_size)
    run(
        args.raw,
        clf,
        args.out,
        feat_out_dir=args.feat_out or args.out,
        interval=args.interval,
        settle_seconds=args.settle,
        max_cycles=None,
    )


def find_ready_samples(raw_dir, settle_seconds: float = 60.0):
    """Sample paths whose raw triplet is complete and whose ``.roi`` has not
    been modified for ``settle_seconds`` (still being written otherwise)."""
    now = time.time()
    ready = []
    for sample_path in files.list_sample_paths(raw_dir):
        roi = sample_path.with_suffix(".roi")
        adc = sample_path.with_suffix(".adc")
        hdr = sample_path.with_suffix(".hdr")
        if not (adc.is_file() and hdr.is_file()):
            continue
        try:
            st = roi.stat()
        except FileNotFoundError:
            continue
        if now - st.st_mtime >= settle_seconds:
            ready.append(sample_path)
    return sorted(ready)


def run(
    raw_dir,
    clf,
    prob_out_dir,
    feat_out_dir=None,
    interval: float = 30.0,
    settle_seconds: float = 60.0,
    max_cycles: int | None = None,
    max_retries: int = 3,
    sleep=time.sleep,
):
    """Poll loop. ``max_cycles``/``sleep`` are injectable for tests.
    A sample that fails ``max_retries`` consecutive cycles is abandoned
    (logged) so a corrupt .roi is not re-decoded forever.

    Returns the set of sample names processed over the run.
    """
    feat_out_dir = feat_out_dir or prob_out_dir
    done: set[str] = set()
    # consecutive failed attempts per sample: transient errors (IO, link)
    # deserve retries, but a permanently corrupt .roi would otherwise be
    # re-read and re-decoded every cycle for the daemon's lifetime
    failures: dict[str, int] = {}
    cycles = 0
    while True:
        try:
            ready = [
                p for p in find_ready_samples(raw_dir, settle_seconds)
                if p.name not in done
            ]
            # same oversize guard as the prob/feat/pipeline CLIs (reference
            # feature_python.py:22-28): never decode a >1 GB .roi in-process
            def _roi_size(p):
                try:
                    return p.with_suffix(".roi").stat().st_size
                except FileNotFoundError:
                    # deleted between find_ready_samples and here: treat as
                    # not ready rather than aborting the whole cycle
                    return -1

            oversized = [
                p for p in ready if _roi_size(p) > probability.MAX_ROI_BYTES
            ]
            for p in oversized:
                log.warning(f"{p.name} .roi is over 1 GB, skipping for good")
            done |= {p.name for p in oversized}
            ready = [p for p in ready if p.name not in done]
            if ready:
                log.info(f"Processing {len(ready)} new sample(s)")
                processed = pipeline.main(
                    ready, clf, prob_out_dir, feat_out_dir=feat_out_dir
                )
                # only successfully processed samples (or ones with BOTH
                # output CSVs already on disk) are done — transient failures
                # retry on the next cycle instead of being dropped for the
                # daemon's lifetime
                done |= processed
                done |= {
                    p.name for p in ready
                    if files.sample_csv_path(
                        p, prob_out_dir, probability.FILE_SUFFIX
                    ).is_file()
                    and files.sample_csv_path(
                        p, feat_out_dir, feature_native.FILE_SUFFIX
                    ).is_file()
                }
                for p in ready:
                    if p.name in done:
                        failures.pop(p.name, None)
                        continue
                    failures[p.name] = failures.get(p.name, 0) + 1
                    if failures[p.name] >= max_retries:
                        log.error(
                            f"{p.name} failed {max_retries} attempts "
                            "(corrupt sample?), giving up on it"
                        )
                        done.add(p.name)
        except Exception:
            log.exception("watch cycle failed; continuing")
        cycles += 1
        if max_cycles is not None and cycles >= max_cycles:
            return done
        sleep(interval)
