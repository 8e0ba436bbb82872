"""Filesystem layout helpers (parity with reference ``sykepic/utils/files.py``).

Contracts kept from the reference:

- Output CSVs are sharded by the sample's acquisition date:
  ``out_dir/YYYY/MM/DD/<sample><suffix>.csv`` (reference ``files.py:27-37``).
- Sample discovery is a recursive glob for ``**/*.roi`` with the suffix
  stripped (reference ``files.py:40-44``).
"""

import tarfile
import zipfile
from pathlib import Path

from .timefmt import sample_to_datetime


def sample_csv_path(sample_path, out_dir, suffix=None) -> Path:
    """Date-sharded CSV path for a sample (reference ``files.py:27-37``)."""
    sample = Path(sample_path).name
    out_name = f"{sample}{suffix}.csv" if suffix else f"{sample}.csv"
    return (
        Path(out_dir) / sample_to_datetime(sample).strftime("%Y/%m/%d") / out_name
    )


def list_sample_paths(root_dir, filter=None):
    """All sample paths (``.roi`` stems) under a raw-data tree
    (reference ``files.py:40-44``)."""
    path_gen = (roi.with_suffix("") for roi in Path(root_dir).glob("**/*.roi"))
    if filter is not None:
        path_gen = (path for path in path_gen if path.name in filter)
    return list(path_gen)


def list_sample_csvs(root_dir, filter=None):
    """CSV files under a tree, optionally filtered by sample name
    (reference ``files.py:47-52``)."""
    return [
        path
        for path in Path(root_dir).glob("**/*.csv")
        if not filter or path.with_suffix("").stem in filter
    ]


def create_archive(src, dest, compression) -> None:
    """Tar/zip a directory (reference ``files.py:10-24``)."""
    src = Path(src)
    if not src.is_dir():
        raise ValueError(f"{src} does not exist")
    if compression in ("tar", "gzip", "tar.gz", "gz"):
        mode = "w" if compression == "tar" else "w:gz"
        with tarfile.open(dest, mode) as tar:
            for src_file in src.iterdir():
                tar.add(src_file, arcname=src_file.name)
    elif compression == "zip":
        with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
            for src_file in src.iterdir():
                zf.write(src_file, arcname=src_file.name)
    else:
        raise ValueError(f"Unknown compression {compression}")
