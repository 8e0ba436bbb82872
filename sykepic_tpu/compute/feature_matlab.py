"""MATLAB ifcb-analysis feature backend (reference
``sykepic/compute/feature_matlab.py``).

Drives an external MATLAB installation's
``start_blob_batch_user_training`` / ``start_feature_batch_user_training``
batch over symlinked samples (grouped by ``sample[:9]``), reads back the
``*_fea_v2.csv`` outputs, converts px^3 -> um^3 with micron factor 3.5 and
rewrites them into the shared 7-column feat CSV schema.
"""

from __future__ import annotations

import subprocess
from pathlib import Path
from tempfile import TemporaryDirectory

import pandas as pd

from ..ingest import ifcb
from ..utils import files, logger
from .units import MATLAB_MICRON_FACTOR, biovolume_to_biomass, pixels_to_um3

VERSION = 2
FILE_SUFFIX = ".feat"
log = logger.get_logger("feat")


def call(args):
    """CLI adapter (reference ``feature_matlab.py:16-29``)."""
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

    return main(args.matlab, filtered_sample_paths, args.out, args.parallel)


def main(bin, sample_paths, out_dir, parallel):
    out_dir = Path(out_dir)
    out_dir.mkdir(exist_ok=True)
    mat_blob_dir = out_dir / "matlab" / "blob"
    mat_feat_dir = out_dir / "matlab" / "feat"
    # ifcb-analysis errors when run in parallel with a single sample
    parallel = "true" if parallel and len(sample_paths) > 1 else ""
    with TemporaryDirectory(prefix="tmp-", dir=out_dir) as sym_dir:
        sym_dir = Path(sym_dir)
        symlink_samples(sample_paths, sym_dir)
        blob_command = (
            "start_blob_batch_user_training("
            f"'{sym_dir}/', '{mat_blob_dir.resolve()}/', '{parallel}')"
        )
        feat_command = (
            "start_feature_batch_user_training("
            f"'{sym_dir}/', '{mat_blob_dir.resolve()}/', "
            f"'{mat_feat_dir.resolve()}/', '{parallel}')"
        )
        log.debug("Extracting blobs")
        call_matlab(bin, blob_command, "Blob extraction")
        log.debug("Extracting features")
        call_matlab(bin, feat_command, "Feature extraction")

    samples_processed = set()
    for sample_path in sorted(sample_paths):
        result = sample_features(sample_path, mat_feat_dir)
        if result is not None:
            volume, feat_df = result
            out_csv = files.sample_csv_path(sample_path, out_dir, FILE_SUFFIX)
            out_csv.parent.mkdir(parents=True, exist_ok=True)
            with open(out_csv, "w") as fh:
                fh.write(f"# version={VERSION}\n# volume_ml={volume}\n")
                feat_df.to_csv(fh, index=False)
        samples_processed.add(sample_path.stem)
    return samples_processed


def symlink_samples(sample_paths, sym_dir) -> None:
    """Symlink raw triplets grouped by day prefix (reference ``:70-77``)."""
    for sample_path in sample_paths:
        for raw_file in (
            sample_path.with_suffix(ext) for ext in (".adc", ".hdr", ".roi")
        ):
            sample_sym_dir = Path(sym_dir) / sample_path.stem[:9]
            sample_sym_dir.mkdir(exist_ok=True)
            (sample_sym_dir / raw_file.name).symlink_to(raw_file.resolve())


def call_matlab(bin, command, name="Matlab") -> None:
    """Batch-mode MATLAB invocation with try/catch exit (reference ``:80-99``)."""
    res = subprocess.run(
        [
            bin,
            "-nodisplay",
            "-nosplash",
            "-nodesktop",
            "-r",
            f"try {command}; catch me, disp(me.message), exit(1); end; exit(0)",
        ],
        capture_output=True,
    )
    std_output = res.stdout[375:].decode()
    if res.returncode != 0:
        log.error(f"{name} failed: {std_output}")
    else:
        log.debug(std_output)


def sample_features(sample_path, mat_feat_dir):
    """Read one sample's MATLAB feature CSV and convert to the shared schema
    (reference ``:105-153``)."""
    try:
        feat_df = pd.read_csv(
            Path(mat_feat_dir) / f"{sample_path.stem}_fea_v{VERSION}.csv"
        )
        volume_ml = ifcb.sample_volume(sample_path.with_suffix(".hdr"))
    except FileNotFoundError:
        log.exception(f"Matlab features missing for {sample_path.name}")
        return None
    except Exception:
        log.exception(f"Unable to calculate volume for {sample_path.name}")
        return None
    biovolume_um3 = pixels_to_um3(feat_df["Biovolume"], MATLAB_MICRON_FACTOR)
    feat_df["biovolume_um3"] = biovolume_um3
    feat_df["biomass_ugl"] = biovolume_to_biomass(biovolume_um3, volume_ml)
    feat_df.rename(
        columns={
            "roi_number": "roi",
            "Area": "area",
            "Biovolume": "biovolume_px",
            "MajorAxisLength": "major_axis_length",
            "MinorAxisLength": "minor_axis_length",
        },
        inplace=True,
    )
    columns_to_keep = [
        "roi",
        "biovolume_px",
        "biovolume_um3",
        "biomass_ugl",
        "area",
        "major_axis_length",
        "minor_axis_length",
    ]
    return (volume_ml, feat_df[columns_to_keep])
