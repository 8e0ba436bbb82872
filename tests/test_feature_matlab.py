"""Hermetic MATLAB-backend contract test (no MATLAB needed).

The real backend (`compute/feature_matlab.py`, mirroring reference
``sykepic/compute/feature_matlab.py:32-137``) drives an external MATLAB
binary. A stub executable stands in for it here and records every
invocation, so the full contract is pinned in the default suite:

- two batch invocations (blob extraction, then feature extraction) with
  the ``-nodisplay -nosplash -nodesktop -r`` flags and a try/catch-exit
  wrapped command string,
- raw triplets staged as SYMLINKS grouped by day prefix (``sample[:9]``),
- the parallel flag suppressed for single-sample batches,
- ``<sample>_fea_v2.csv`` read back from the feature dir, converted
  px^3 -> um^3 with micron factor 3.5, biomass per the .hdr sample
  volume, renamed into the shared 7-column feat schema (extra MATLAB
  columns dropped), written date-sharded with the comment header.

The real-binary path stays exercised via the reference-parity pytest
option ``--matlab PATH`` (tests/conftest.py).
"""

import json
import os
import sys
from pathlib import Path

import numpy as np

FIXTURE = Path(__file__).parent / "data/raw/valid/D20180712T065600_IFCB114"

_STUB_PY = r'''
import json, re, sys
from pathlib import Path

args = sys.argv[1:]
record = Path(sys.argv[0]).resolve().parent / "calls.jsonl"
ri = args.index("-r")
cmd = args[ri + 1]
quoted = [q.rstrip("/") for q in re.findall(r"'([^']*)'", cmd)]
entry = {"flags": args[:ri], "cmd": cmd, "paths": quoted}
if "start_blob_batch_user_training" in cmd:
    staging, blob_dir, par = quoted[0], quoted[1], quoted[2] if len(quoted) > 2 else ""
    entry["par"] = par
    entry["staging"] = sorted(
        str(p.relative_to(staging)) + ("@" if p.is_symlink() else "")
        for p in Path(staging).rglob("*")
    )
    Path(blob_dir).mkdir(parents=True, exist_ok=True)
elif "start_feature_batch_user_training" in cmd:
    staging, blob_dir, feat_dir = quoted[0], quoted[1], quoted[2]
    out = Path(feat_dir)
    out.mkdir(parents=True, exist_ok=True)
    for adc in sorted(Path(staging).rglob("*.adc")):
        (out / (adc.stem + "_fea_v2.csv")).write_text(
            "roi_number,Area,Biovolume,MajorAxisLength,MinorAxisLength,Junk\n"
            "2,100,343,20.5,10.25,9\n"
            "3,50,686,30.0,15.0,9\n"
        )
with record.open("a") as fh:
    fh.write(json.dumps(entry) + "\n")
sys.stdout.write("M" * 375 + "stub ran\n")
'''


def _make_stub(bin_dir: Path) -> Path:
    """An executable that mimics the MATLAB CLI surface."""
    stub_py = bin_dir / "stub_matlab.py"
    stub_py.write_text(_STUB_PY)
    stub = bin_dir / "matlab"
    stub.write_text(f'#!/bin/sh\nexec "{sys.executable}" "{stub_py}" "$@"\n')
    os.chmod(stub, 0o755)
    return stub


def test_matlab_backend_contract_with_stub(tmp_path):
    from sykepic_tpu.compute import feature_matlab
    from sykepic_tpu.ingest import ifcb

    stub = _make_stub(tmp_path)
    out_dir = tmp_path / "out"
    processed = feature_matlab.main(str(stub), [FIXTURE], out_dir,
                                    parallel=False)
    assert processed == {FIXTURE.name}

    # --- invocation contract -------------------------------------------
    calls = [json.loads(line) for line in
             (tmp_path / "calls.jsonl").read_text().splitlines()]
    assert len(calls) == 2, "expected exactly blob + feature invocations"
    blob_call, feat_call = calls
    for call in calls:
        assert call["flags"] == ["-nodisplay", "-nosplash", "-nodesktop"]
        assert call["cmd"].startswith("try ")
        assert "catch me" in call["cmd"] and "exit(1)" in call["cmd"]
    assert "start_blob_batch_user_training" in blob_call["cmd"]
    assert "start_feature_batch_user_training" in feat_call["cmd"]
    # blob output dir feeds the feature call
    assert blob_call["paths"][1] == feat_call["paths"][1]
    # single sample: ifcb-analysis chokes on parfor, so the flag is empty
    assert blob_call["par"] == ""
    # staging: symlinked triplet under the day-prefix directory
    day = FIXTURE.name[:9]
    expected = {day} | {
        f"{day}/{FIXTURE.name}{ext}@" for ext in (".adc", ".hdr", ".roi")
    }
    assert set(blob_call["staging"]) == expected

    # --- collect/convert contract --------------------------------------
    out_csv = out_dir / "2018/07/12" / f"{FIXTURE.name}.feat.csv"
    assert out_csv.is_file(), "output must be date-sharded YYYY/MM/DD"
    lines = out_csv.read_text().splitlines()
    assert lines[0] == "# version=2"
    volume_ml = float(lines[1].split("=")[1])
    assert abs(volume_ml - ifcb.sample_volume(FIXTURE.with_suffix(".hdr"))) < 1e-12
    assert lines[2].split(",") == [
        "roi", "biovolume_px", "biovolume_um3", "biomass_ugl",
        "area", "major_axis_length", "minor_axis_length",
    ]
    rows = [line.split(",") for line in lines[3:]]
    assert [r[0] for r in rows] == ["2", "3"]
    # px^3 -> um^3 via micron factor 3.5 (343 / 3.5^3 == 8.0 exactly)
    row2 = dict(zip(lines[2].split(","), rows[0]))
    assert float(row2["biovolume_px"]) == 343.0
    assert np.isclose(float(row2["biovolume_um3"]), 343.0 / 3.5**3)
    assert np.isclose(
        float(row2["biomass_ugl"]), (343.0 / 3.5**3) / volume_ml / 1000.0
    )
    assert float(row2["area"]) == 100.0
    assert float(row2["major_axis_length"]) == 20.5
    # the stub's extra "Junk" column must not leak into the schema
    assert "Junk" not in lines[2]


def test_matlab_backend_missing_output_isolated(tmp_path):
    """A sample whose fea_v2.csv never appears is skipped, not fatal
    (reference ``feature_matlab.py:101-110`` semantics)."""
    from sykepic_tpu.compute import feature_matlab

    stub_py = tmp_path / "stub_matlab.py"
    stub_py.write_text("import sys; sys.stdout.write('M'*375)\n")
    stub = tmp_path / "matlab"
    stub.write_text(f'#!/bin/sh\nexec "{sys.executable}" "{stub_py}" "$@"\n')
    os.chmod(stub, 0o755)
    processed = feature_matlab.main(str(stub), [FIXTURE], tmp_path / "out",
                                    parallel=False)
    assert processed == set()
    assert not list((tmp_path / "out").glob("**/*.csv"))
