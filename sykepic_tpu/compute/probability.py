"""Compute class probabilities for raw IFCB data (reference
``sykepic/compute/probability.py``).

Same contracts as the reference:

- input modes: raw dir / sample list / image dir / image list, with images
  grouped by sample-name prefix (reference ``probability.py:27-43``)
- samples with a ``.roi`` over 1 GB are skipped (``:44-53``)
- per-sample error isolation: faulty raw data logs and continues (``:106-115``)
- skip-if-CSV-exists idempotency with ``force`` override (``:136-141``)
- output: ``out_dir/YYYY/MM/DD/<sample>.prob.csv`` with header
  ``roi,<classes...>`` and probabilities at 5 decimals, roi-ascending
  (``:200-206``)
- softmax temperature ``ln(1.3)`` inside the engine (``:18,191-194``)

What changed (TPU-native): no PNG round trip, no DataLoader workers. ROIs
decode straight from the ``.roi`` payload into packed device batches; the
whole preprocess+CNN+softmax is one XLA program per bucket shape. ROIs of
*different* samples ride in the same device batch, so throughput does not
collapse on many small samples (the reference pays model+DataLoader setup
per sample).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from tqdm import tqdm

from ..ingest import ifcb
from ..utils import files, logger
from .engine import Classifier

FILE_SUFFIX = ".prob"
MAX_ROI_BYTES = 1e9
log = logger.get_logger("prob")


def call(args):
    """CLI adapter (argument surface = reference ``probability.py:27-64``)."""
    if args.image_dir or args.images:
        samples_as_images = True
        if args.image_dir:
            img_paths = sorted(Path(args.image_dir).rglob("*.png"))
        else:
            img_paths = sorted(Path(path) for path in args.images)
        sample_paths = {}
        for sample, img_path in ((p.name.rpartition("_")[0], p) for p in img_paths):
            sample_paths.setdefault(sample, []).append(img_path)
    else:
        samples_as_images = False
        if args.raw:
            sample_paths = files.list_sample_paths(args.raw)
        else:
            sample_paths = [Path(path) for path in args.samples]
        filtered = []
        for sample_path in sample_paths:
            if sample_path.with_suffix(".roi").stat().st_size <= MAX_ROI_BYTES:
                filtered.append(sample_path)
            else:
                log.warning(f"{sample_path.name} is over 1G, skipping")
        sample_paths = filtered

    main(
        sample_paths,
        args.model,
        args.out,
        args.batch_size,
        args.num_workers,
        args.force,
        progress_bar=True,
        samples_as_images=samples_as_images,
    )


def main(
    sample_paths,
    model_dir,
    out_dir,
    batch_size: int = 64,
    num_workers: int = 2,  # accepted for CLI parity; host feed is threaded
    force: bool = False,
    progress_bar: bool = True,
    samples_as_images: bool = False,
    classifier: Classifier | None = None,
):
    """Classify samples and write one ``.prob.csv`` per sample.

    Returns the set of sample names processed (reference ``:105-115``).
    """
    clf = classifier or prepare_model(model_dir, batch_size=max(batch_size, 1))

    if samples_as_images:
        iterator = (
            tqdm(sample_paths.items(), desc="Processing samples")
            if progress_bar
            else sample_paths.items()
        )
        for sample, img_paths in iterator:
            csv_path = Path(out_dir) / f"{sample}{FILE_SUFFIX}.csv"
            process_images(img_paths, clf, csv_path, force)
        return set(sample_paths)

    # High-throughput default: ROIs of all samples share device batches
    # (per-sample error isolation preserved inside). The reference instead
    # pays DataLoader+model setup per sample (probability.py:133-162).
    return process_samples_batched(
        sample_paths, clf, out_dir, force, progress_bar=progress_bar
    )


def prepare_model(model_dir, batch_size: int = 256, dtype: str = "float32",
                  mesh=None):
    """Load the model directory into a ready :class:`Classifier`
    (reference ``probability.py:118-130``). ``mesh`` enables multi-chip
    sharding (data axis; plus tensor parallel when it has a model axis)."""
    return Classifier(model_dir, batch_size=batch_size, dtype=dtype, mesh=mesh)


def precompile_for_samples(sample_paths, clf: Classifier,
                           fused: bool = False,
                           budget_s: float | None = None,
                           with_bytes: bool = False):
    """Compile every (canvas shape, batch size) program the given samples
    will produce through :meth:`Classifier.classify_rois` (or, with
    ``fused``, :meth:`classify_and_feature_rois`), before any timed or
    latency-sensitive processing. Packs the samples exactly like the
    target path (same buckets, batch multiple, pre-shrink) to enumerate
    the shapes, then dispatches one zeros batch per shape. Returns the
    number of distinct programs warmed.

    ``budget_s`` bounds the warm time: shapes are warmed in descending
    ROI-volume order and warming stops once the budget is spent (the
    long-tail shapes then compile on first real use). A cold compile cache
    costs 10-30 s per shape on a tunneled TPU; warmed caches reload in
    ~1-3 s.

    ``with_bytes`` also returns the average shipped canvas bytes per real
    ROI — measured from the same packing pass, so callers (bench.py) do
    not re-decode the workload just to count bytes. Return becomes
    ``(warmed, bytes_per_roi)``."""
    import time

    from ..ingest import pack

    def stream():
        for idx, p in enumerate(sample_paths):
            try:
                rois = ifcb.read_sample(p)
            except Exception:
                continue
            yield pack.RoiBlock(
                sample_idx=idx, roi_ids=rois.roi_ids, heights=rois.heights,
                widths=rois.widths, offsets=rois.starts, base=rois.roi_data,
            )

    volume: dict[tuple, int] = {}
    total_bytes = 0
    total_rois = 0
    if clf.packing == "shelf" and not fused:
        from ..ingest import shelf

        for sbatch in shelf.pack_shelves(
            stream(),
            pre_shrink_to=(clf.spec.target_h, clf.spec.target_w),
            batch_multiple=clf._batch_multiple,
            slot_cap=clf._shelf_slot_cap,  # same program keys as the engine
        ):
            key = (sbatch.windows.shape[0], len(sbatch.win_idx))
            volume[key] = volume.get(key, 0) + sbatch.n_valid
            if with_bytes and clf.wire_codec:
                # count what the stream will actually ship: the encoded
                # payload when it pays, raw windows when it does not
                from ..ingest import wirecodec

                payload = wirecodec.encode(sbatch.windows)
                total_bytes += (payload.nbytes if payload is not None
                                else sbatch.windows.nbytes)
            else:
                total_bytes += sbatch.windows.nbytes
            total_rois += sbatch.n_valid
    else:
        for batch in pack.pack_rois(
            pack.roi_items(stream()), batch_size=clf.batch_size,
            buckets=clf.buckets,
            batch_multiple=clf._batch_multiple,
            # the fused path keeps original pixel units (no pre-shrink) and
            # stable per-ROI FFT windows (no tail consolidation)
            pre_shrink_to=(
                None if fused
                else (clf.spec.target_h, clf.spec.target_w)
            ),
            consolidate_tails=not fused,
        ):
            key = batch.canvas.shape
            volume[key] = volume.get(key, 0) + batch.n_valid
            total_bytes += batch.canvas.nbytes
            total_rois += batch.n_valid
    bytes_per_roi = total_bytes / max(total_rois, 1)
    ordered = sorted(volume, key=volume.get, reverse=True)
    if budget_s is None:
        warmed = clf.precompile(ordered, fused=fused)
        return (warmed, bytes_per_roi) if with_bytes else warmed
    warmed = 0
    t0 = time.time()
    for shape in ordered:
        warmed += clf.precompile([shape], fused=fused)
        if time.time() - t0 > budget_s:
            break
    return (warmed, bytes_per_roi) if with_bytes else warmed


def process_sample(sample_path, clf: Classifier, out_dir, force: bool = False):
    """Decode one sample, classify its ROIs, write the CSV.

    Raises ``ValueError`` on faulty raw data (caller isolates per sample).
    """
    sample_path = Path(sample_path)
    sample = sample_path.name
    csv_path = files.sample_csv_path(sample_path, out_dir, suffix=FILE_SUFFIX)
    if csv_path.is_file():
        if force:
            log.warning(f"{csv_path.name} already exists, overwriting")
        else:
            log.warning(f"{csv_path.name} already exists, skipping")
            return sample
    log.debug(f"Computing probabilities for {sample}")
    rois = ifcb.read_sample(sample_path)  # ValueError on truncated data
    results = sorted(
        (roi_id, probs)
        for _, roi_id, probs in clf.classify_rois(
            (0, rid, img) for rid, img in rois.images()
        )
    )
    probabilities_to_csv(results, clf.classes, csv_path)
    return sample


def process_samples_batched(sample_paths, clf: Classifier, out_dir,
                            force: bool = False, progress_bar: bool = False):
    """High-throughput path: stream ROIs of *all* samples through shared
    device batches; per-sample decode errors are isolated.

    Returns the set of sample names processed (written or skipped-existing,
    matching the reference's accounting, ``probability.py:105-115``).
    """
    sample_paths = [Path(p) for p in sample_paths]
    csv_paths = {}
    skipped = set()
    todo = []
    for idx, sample_path in enumerate(sample_paths):
        csv_path = files.sample_csv_path(sample_path, out_dir, FILE_SUFFIX)
        if csv_path.is_file() and not force:
            log.warning(f"{csv_path.name} already exists, skipping")
            skipped.add(sample_path.name)
            continue
        csv_paths[idx] = csv_path
        todo.append(idx)

    results: dict[int, list] = {}  # idx -> [(roi_ids, probs) blocks]
    counts: dict[int, int] = {}
    expected: dict[int, int] = {}

    def roi_stream():
        # Lazy per-sample decode: memory stays bounded by the in-flight
        # device batches, not the archive size; decode errors are isolated
        # per sample (reference probability.py:106-115). Each sample ships
        # as ONE columnar RoiBlock (decode payload + geometry arrays) —
        # per-ROI Python tuples measured ~25 us/ROI of host CPU, the
        # single biggest cost on the 1-core bench host.
        from ..ingest import pack

        iterator = tqdm(todo, desc="Processing samples") if progress_bar else todo
        for idx in iterator:
            try:
                rois = ifcb.read_sample(sample_paths[idx])
            except ValueError:
                log.exception(f"Faulty raw data for {sample_paths[idx].name}")
                continue
            except Exception:
                log.exception(f"Unexpected error for {sample_paths[idx].name}")
                continue
            results.setdefault(idx, [])
            expected[idx] = len(rois)
            yield pack.RoiBlock(
                sample_idx=idx, roi_ids=rois.roi_ids, heights=rois.heights,
                widths=rois.widths, offsets=rois.starts, base=rois.roi_data,
            )

    # CSV writes overlap classification: a sample flushes on a writer
    # thread the moment its last ROI drains from the device.
    from concurrent.futures import ThreadPoolExecutor

    written = set()
    flushed: set[int] = set()  # only the main thread mutates this
    with ThreadPoolExecutor(max_workers=2) as writer:
        futures = []

        def flush(idx):
            parts = results[idx]
            if parts:
                rids = np.concatenate([p[0] for p in parts])
                probs = np.concatenate([p[1] for p in parts])
                order = np.argsort(rids, kind="stable")  # roi-sorted CSV
                rows = (rids[order], probs[order])
            else:
                rows = (np.zeros(0, np.int64), np.zeros((0, 0)))
            probabilities_to_csv(rows, clf.classes, csv_paths[idx])
            return sample_paths[idx].name

        # block-level consumption: one dict/array op per (sample, batch)
        # pair instead of per ROI (measured ~5 us/ROI of tuple churn)
        for sidx, rids, probs in clf.classify_blocks(roi_stream()):
            for u in np.unique(sidx):
                m = sidx == u
                u = int(u)
                results[u].append((rids[m], probs[m]))
                counts[u] = counts.get(u, 0) + int(m.sum())
                if counts[u] == expected[u]:
                    flushed.add(u)
                    futures.append(writer.submit(flush, u))
        # zero-ROI samples and any stragglers
        for idx in results:
            if idx not in flushed:
                futures.append(writer.submit(flush, idx))
        written = {f.result() for f in futures}
    return written | skipped


def process_images(img_paths, clf: Classifier, csv_path, force: bool = False):
    """Classify loose PNG images (reference ``probability.py:165-177``)."""
    csv_path = Path(csv_path)
    if csv_path.is_file():
        if force:
            log.warning(f"{csv_path.name} already exists, overwriting")
        else:
            log.warning(f"{csv_path.name} already exists, skipping")
            return
    results = sorted(
        (roi_id, probs)
        for _, roi_id, probs in clf.classify_rois(_read_images(img_paths))
    )
    probabilities_to_csv(results, clf.classes, csv_path)


def _read_images(img_paths):
    import cv2

    for path in img_paths:
        path = Path(path)
        roi_id = int(path.stem.split("_")[-1])
        img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
        if img is None:
            log.warning(f"Cannot read image {path}")
            continue
        if img.ndim == 3:
            # IFCB images are grayscale; color PNGs are reduced to luma
            if not (img[..., 0] == img[..., 1]).all():
                log.warning(f"{path.name} is not grayscale; using luminance")
            img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        yield 0, roi_id, img


def probabilities_to_csv(probabilities, classes, csv_path) -> None:
    """Exact CSV contract of reference ``probability.py:200-206``.

    The row body is formatted by the native C++ helper when available
    (5-decimal formatting of a whole probability tree is a measured host
    hot spot); the Python fallback produces identical bytes.
    """
    csv_path = Path(csv_path)
    csv_path.parent.mkdir(parents=True, exist_ok=True)
    header = "roi," + ",".join(classes) + "\n"
    if isinstance(probabilities, tuple):
        # array form: (roi_ids (n,), probs (n, C)), already roi-sorted —
        # the batched path hands blocks over without per-ROI tuples
        roi_ids = np.asarray(probabilities[0], np.int64)
        probs = np.asarray(probabilities[1], np.float64)
    else:
        probabilities = list(probabilities)
        roi_ids = np.asarray([r for r, _ in probabilities], np.int64)
        probs = np.asarray(
            [np.asarray(p, np.float64) for _, p in probabilities],
            np.float64,
        ) if probabilities else np.zeros((0, 0))
    if len(roi_ids):
        from ..ingest import native

        body = native.format_probs(roi_ids, probs)
        if body is not None:
            csv_path.write_bytes(header.encode() + body)
            return
    lines = [header.rstrip("\n")]
    for roi, row in zip(roi_ids.tolist(), probs):
        lines.append(f"{roi}," + ",".join(f"{p:.5f}" for p in row))
    csv_path.write_text("\n".join(lines) + "\n")
