"""Feature extraction pipeline: raw samples -> <sample>.feat.csv
(reference ``sykepic/compute/feature_python.py``).

Exact-parity contracts:

- sample volume: ``0.25 ml/min * (runTime - inhibitTime) / 60`` from the
  ``.hdr`` (``feature_python.py:105-118``),
- px^3 -> um^3 with micron factor 2.8 (``:121-123``), biomass =
  ``um3 / volume_ml / 1000`` (``:125-129``),
- CSV: ``# version=`` + ``# volume_ml=`` comment headers and the 7-column
  schema ``roi,biovolume_px,biovolume_um3,biomass_ugl,area,
  major_axis_length,minor_axis_length`` (``:132-144``),
- optional per-sample multiprocessing pool (``:33-48``), skip-if-exists with
  ``force`` override, 1 GB ``.roi`` filter at the call layer (``:22-28``).

The geometry features themselves come from
:mod:`sykepic_tpu.compute.features` (see its parity note).
"""

from __future__ import annotations

import os
from multiprocessing import get_context
from pathlib import Path

from ..ingest import ifcb
from ..utils import files, logger
from .features import compute_features
from .units import PY_MICRON_FACTOR, biovolume_to_biomass

VERSION = "tpu-v1"
FILE_SUFFIX = ".feat"
log = logger.get_logger("feat")


def call(args):
    """CLI adapter (reference ``feature_python.py:16-30``)."""
    if args.raw:
        sample_paths = files.list_sample_paths(args.raw)
    else:
        sample_paths = [Path(path) for path in args.samples]

    filtered_sample_paths = []
    for sample_path in sample_paths:
        if sample_path.with_suffix(".roi").stat().st_size <= 1e9:
            filtered_sample_paths.append(sample_path)
        else:
            log.warning(f"{sample_path.name} is over 1G, skipping")

    return main(filtered_sample_paths, args.out, args.parallel, args.force)


def main(sample_paths, out_dir, parallel=False, force=False):
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if parallel:
        available_cores = os.cpu_count()
        log.debug(f"Extracting features in parallel with {available_cores} cores")
        with get_context("spawn").Pool(available_cores) as pool:
            samples_processed = pool.starmap(
                process_sample, [(path, out_dir, force) for path in sample_paths]
            )
    else:
        log.debug("Extracting features synchronously")
        samples_processed = []
        for path in sorted(sample_paths):
            samples_processed.append(process_sample(path, out_dir, force))
    return set(filter(None, samples_processed))


def process_sample(sample_path, out_dir, force=False):
    sample_path = Path(sample_path)
    csv_path = files.sample_csv_path(sample_path, out_dir, suffix=FILE_SUFFIX)
    if csv_path.is_file():
        if force:
            log.warning(f"{csv_path.name} already exists, overwriting")
        else:
            log.warning(f"{csv_path.name} already exists, skipping")
            return sample_path.name
    log.info(f"Extracting features for {sample_path.name}")
    result = sample_features(sample_path)
    if result is None:
        return None
    volume_ml, roi_features = result
    features_to_csv(volume_ml, roi_features, csv_path)
    return sample_path.name


def sample_features(sample_path):
    """(volume_ml, [(roi, biovol_px, biovol_um3, biomass, area, major,
    minor), ...]) for one sample (reference ``feature_python.py:68-102``)."""
    root = Path(sample_path)
    try:
        volume_ml = ifcb.sample_volume(root.with_suffix(".hdr"))
    except Exception:
        log.exception(f"Unable to calculate volume for {root.name}")
        return None
    roi_features = []
    for roi_id, roi_array in ifcb.raw_to_numpy(
        root.with_suffix(".adc"), root.with_suffix(".roi")
    ):
        _, all_roi_features = compute_features(roi_array)
        all_roi_features = dict(all_roi_features)
        biovol_px = all_roi_features["Biovolume"]
        biovol_um3 = pixels_to_um3(biovol_px)
        biomass_ugl = biovolume_to_biomass(biovol_um3, volume_ml)
        roi_features.append(
            (
                roi_id,
                biovol_px,
                biovol_um3,
                biomass_ugl,
                all_roi_features["Area"],
                all_roi_features["MajorAxisLength"],
                all_roi_features["MinorAxisLength"],
            )
        )
    return (volume_ml, roi_features)


def pixels_to_um3(pixels, micron_factor: float = PY_MICRON_FACTOR):
    """Pixel volume -> um^3, micron factor 2.8 (reference ``:121-123``)."""
    return pixels / (micron_factor**3)


def features_to_csv(volume_ml, roi_features, csv_path) -> None:
    """Exact CSV contract of reference ``feature_python.py:132-144``."""
    csv_path = Path(csv_path)
    csv_path.parent.mkdir(parents=True, exist_ok=True)
    csv_content = f"# version={VERSION}\n"
    csv_content += f"# volume_ml={volume_ml}\n"
    csv_content += (
        "roi,biovolume_px,biovolume_um3,biomass_ugl,"
        "area,major_axis_length,minor_axis_length\n"
    )
    for roi_feat in roi_features:
        csv_content += ",".join(map(str, roi_feat)) + "\n"
    csv_path.write_text(csv_content)
