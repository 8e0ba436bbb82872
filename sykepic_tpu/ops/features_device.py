"""Batched on-device geometry features: the whole (B, ch, cw) ROI canvas
batch goes from pixels to (area, biovolume, major/minor axis) without
leaving the chip.

This is the TPU-native counterpart of :mod:`sykepic_tpu.compute.features`
(the host reference implementation used for CSV outputs) and tracks the
same calibrated ifcb-analysis-lineage pipeline:

- per-image **phase congruency** (Kovesi phasecong3-style ``M + m``) —
  the log-Gabor/spread filter bank depends only on the static canvas
  shape and folds into the compiled program. On plankton-sized canvases
  (<= ``_DFT_MATMUL_MAX_PIXELS``) the 2-D transforms run as explicit
  DFT-by-matmul on the MXU (measured ~1.4x the whole program vs XLA's
  TPU FFT at 48x96; identical math to f32 rounding), ``jnp.fft``
  otherwise,
- **hysteresis threshold** (0.2 / 0.08) as a bounded flood of the strong
  mask through the weak mask (``lax.fori_loop`` of 3x3 max-pools),
- **morphological consolidation**: dilate by a radius-2 disk, fill holes
  (background flood from the valid-region border), erode back twice with
  MATLAB border semantics (out-of-image counts as foreground),
- union with the **dark mask** (``img <= 0.7 * otsu``; per-image Otsu via
  one-hot histograms) and a re-fill,
- **largest blob**: candidate floods from the deepest unclaimed pixels
  (4 rounds), keeping the largest-area flood — the host's largest-area
  convention, robust to thin-filament-next-to-compact-cell ROIs,
- area / biovolume ``sum(4D - 3)`` / MATLAB-style ellipse axes from masked
  moment sums; the distance transform is a chamfer 3-4 approximation of
  the exact EDT (error <4% on plankton-scale blobs).

Deviations from the host path (documented, tested in
tests/test_features_device.py, measured on a randomized 40-ROI
fixture-derived set):

- With the FFT window equal to the exact ROI, the pipeline is
  algorithm-identical: area/axes bit-equal on >=90% of ROIs, biovolume
  within the <=3% chamfer-vs-exact-EDT bound. The residual class is a
  float32-vs-float64 hysteresis flip on marginal edges (~1 ROI in 40).
- On packed slots the FFT window carries padding, REPLICATE-FILLED by
  propagating border values outward (:func:`_replicate_fill` — a
  constant fill is catastrophic: phase congruency is amplitude-
  normalized, so even a weak boundary step rings the ROI with phantom
  edges and hole-filling then floods the entire window). The remaining
  spectral difference perturbs marginal decisions: <=10% of ROIs shift
  >20% (threshold flips); the rest track the host at ~0.2% median /
  <=6% p90 (area, axes) and ~1.4% median / <=8% p90 (biovolume).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..compute.features import DARK_OTSU_SCALE, HYST_HIGH, HYST_LOW

# Euclidean disk of radius 2 offsets (matches compute.features.DISK2)
_DISK2_OFFSETS = [
    (dy, dx)
    for dy in range(-2, 3)
    for dx in range(-2, 3)
    if dy * dy + dx * dx <= 4
]


def batched_otsu(canvas, heights, widths):
    """Per-image Otsu threshold over the valid region. (B,) int32.

    The (B, H, W, 256) one-hot histogram is the measured-fastest
    formulation on the v5e (2026-08-21, 2048 x 48x96): a segment-sum
    scatter histogram (b*256+pixel keys) ran 12x SLOWER (85 vs 7.1 ms)
    despite the chip's good batched scatter-add rate — random-key
    9.4M-update scatters do not hit that path. Keep the one-hot.
    """
    b, ch, cw = canvas.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 0)[None]
    cols = jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 1)[None]
    valid = (rows < heights[:, None, None]) & (cols < widths[:, None, None])
    # histogram: one-hot over 256 bins, padding masked out
    bins = jnp.arange(256, dtype=jnp.int32)
    onehot = (canvas[..., None].astype(jnp.int32) == bins) & valid[..., None]
    hist = onehot.sum(axis=(1, 2)).astype(jnp.float32)  # (B, 256)
    total = hist.sum(axis=1, keepdims=True)
    level = bins.astype(jnp.float32)
    w_b = jnp.cumsum(hist, axis=1)
    sum_b = jnp.cumsum(hist * level, axis=1)
    sum_all = sum_b[:, -1:]
    w_f = total - w_b
    mu_b = jnp.where(w_b > 0, sum_b / w_b, 0.0)
    mu_f = jnp.where(w_f > 0, (sum_all - sum_b) / w_f, 0.0)
    var = jnp.where((w_b > 0) & (w_f > 0), w_b * w_f * (mu_b - mu_f) ** 2, -1.0)
    return jnp.argmax(var, axis=1).astype(jnp.int32), valid


# {0,1} mask arithmetic runs in bfloat16: exact for 0/1 (and for the 3x3
# counts of _sum3, integers <= 9), and the flood/morphology loops are
# HBM-bound — halving the bytes per sweep halves their wall clock.
_MASK_DTYPE = jnp.bfloat16


def _dilate3(x):
    """3x3 binary dilation of a (B, H, W) float {0,1} mask."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1),
        [(0, 0), (1, 1), (1, 1)],
    )


def _use_pallas_flood() -> bool:
    """Floods run as a VMEM-resident pallas kernel on real accelerators
    (ops/pallas_flood.py — per-iteration kernel-launch overhead, not
    bandwidth, bounds the XLA while_loop formulation; measured 51 -> ~3 ms
    for two hole fills at the fused-leg shape). CPU keeps the XLA path
    (pallas needs interpret mode there; equality is pinned in
    tests/test_pallas_flood.py). ``SYKEPIC_PALLAS_FLOOD=off`` reverts."""
    import os

    if os.environ.get("SYKEPIC_PALLAS_FLOOD", "on").lower() in (
            "off", "0", "no"):
        return False
    return jax.default_backend() != "cpu"


def _flood(seed, within, iterations: int):
    """Grow ``seed`` through ``within`` by 8-connected steps (bool arrays).

    Runs as a convergence-checked while_loop: ``iterations`` is only a
    pathological-case cap (a serpentine blob's geodesic diameter can far
    exceed ``h + w``, so a fixed short bound would silently truncate curved
    chains); typical masks converge in tens of steps.
    """
    if _use_pallas_flood():
        from . import pallas_flood

        # big canvases exceed the kernel's per-image VMEM budget even at
        # one image per tile (the fused path never pre-shrinks): those
        # keep the XLA formulation, which works at any shape
        if pallas_flood.fits_vmem(*seed.shape[1:]):
            return pallas_flood.flood_pallas(seed, within, iterations)
    within_f = within.astype(_MASK_DTYPE)
    state = seed.astype(_MASK_DTYPE) * within_f

    def cond(carry):
        i, s, changed = carry
        return jnp.logical_and(i < iterations, changed)

    def body(carry):
        i, s, _ = carry
        grown = _dilate3(s) * within_f  # max of {0,1} stays {0,1}
        return i + 1, grown, jnp.any(grown != s)

    _, state, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), state, jnp.bool_(True))
    )
    return state > 0.5


def _shift(mask_f, dy: int, dx: int, pad_value: float):
    padded = jnp.pad(mask_f, ((0, 0), (2, 2), (2, 2)), constant_values=pad_value)
    return jax.lax.dynamic_slice(padded, (0, 2 + dy, 2 + dx), mask_f.shape)


def dilate_disk2(mask, valid):
    """Radius-2 disk dilation confined to the valid region."""
    m = mask.astype(_MASK_DTYPE)
    out = jnp.zeros_like(m)
    for dy, dx in _DISK2_OFFSETS:
        out = jnp.maximum(out, _shift(m, dy, dx, 0.0))
    return (out > 0.5) & valid


def erode_disk2(mask, valid, iterations: int = 1):
    """Radius-2 disk erosion with MATLAB border semantics: everything
    outside the valid region counts as foreground (imerode pads with 1)."""
    m = (mask | ~valid).astype(_MASK_DTYPE)
    for _ in range(iterations):
        acc = jnp.ones_like(m)
        for dy, dx in _DISK2_OFFSETS:
            acc = jnp.minimum(acc, _shift(m, dy, dx, 1.0))
        m = acc
    return (m > 0.5) & valid


def fill_holes(mask, valid, iterations: int):
    """Fill holes within the valid region: flood background from the
    valid-region border; valid pixels unreachable through ``~mask`` are
    holes and join the mask."""
    b, h, w = mask.shape
    free = jnp.asarray(~mask, _MASK_DTYPE)
    invalid = jnp.asarray(~valid, _MASK_DTYPE)
    # seeds: the invalid region plus the canvas border (so the flood starts
    # even when the canvas has no padding)
    border = np.zeros((1, h, w), np.float32)
    border[:, 0, :] = border[:, -1, :] = 1.0
    border[:, :, 0] = border[:, :, -1] = 1.0
    free_or_invalid = jnp.maximum(free, invalid)
    seed = (jnp.minimum(invalid + border, 1.0) * free_or_invalid) > 0.5
    bg = _flood(seed, free_or_invalid > 0.5, iterations)
    return (mask | ~bg) & valid


def chamfer_distance(mask, iterations: int, valid=None):
    """Chamfer 3-4 distance-to-background (scaled back by 1/3), computed as
    convergence-checked min-plus relaxation sweeps. ``mask``: (B, H, W)
    bool. Out-of-image pixels (beyond ``valid`` and beyond the canvas
    border) are NOT background: the host EDT sees no background past the
    array edge either, so an organism clipped by the camera frame keeps its
    large interior distances instead of collapsing to ~1 at the cut."""
    big = jnp.float32(1e6)
    if valid is None:
        background = ~mask
    else:
        background = valid & ~mask
    d = jnp.where(background, 0.0, big)

    def sweep(d):
        # pad with `big` so canvas borders never see phantom background
        # (a wrap-around roll would bleed the opposite edge in)
        padded = jnp.pad(
            d, ((0, 0), (1, 1), (1, 1)), constant_values=big
        )

        def window(dy, dx):
            return jax.lax.dynamic_slice(
                padded, (0, 1 + dy, 1 + dx), d.shape
            )

        # orthogonal cost 3, diagonal cost 4 (Borgefors chamfer 3-4)
        cand = d
        for dy, dx, c in ((1, 0, 3.0), (-1, 0, 3.0), (0, 1, 3.0), (0, -1, 3.0),
                          (1, 1, 4.0), (1, -1, 4.0), (-1, 1, 4.0), (-1, -1, 4.0)):
            cand = jnp.minimum(cand, window(dy, dx) + c)
        return jnp.where(background, 0.0, cand)

    def cond(carry):
        i, d, changed = carry
        return jnp.logical_and(i < iterations, changed)

    def body(carry):
        i, d, _ = carry
        nd = sweep(d)
        return i + 1, nd, jnp.any(nd != d)

    _, d, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), d, jnp.bool_(True))
    )
    d = jnp.where(mask, d, 0.0)
    # Safety clamp: pixels the fixed relaxation never reached (degenerate
    # masks, e.g. serpentine cavities needing more sweeps) still hold the
    # sentinel — cap them at each image's largest relaxed distance instead
    # of letting 1e6 values corrupt the biovolume sum.
    relaxed = d < big / 2.0
    per_image_max = jnp.max(jnp.where(relaxed, d, 0.0), axis=(1, 2),
                            keepdims=True)
    d = jnp.where(relaxed, d, per_image_max)
    return d / 3.0


# ---------------------------------------------------------------------------
# Batched phase congruency (shape-static filter bank, jnp.fft)
# ---------------------------------------------------------------------------

def _pc_filter_bank(rows: int, cols: int, nscale=4, norient=6, minWaveLength=3,
                    mult=2.1, sigmaOnf=0.55):
    """Precompute the (nscale*norient, rows, cols) log-Gabor*spread bank and
    per-orientation angles as NumPy constants (static shapes)."""
    if cols % 2:
        xvals = np.arange(-(cols - 1) / 2.0, ((cols - 1) / 2.0) + 1) / (cols - 1)
    else:
        xvals = np.arange(-cols / 2.0, cols / 2.0) / cols
    if rows % 2:
        yvals = np.arange(-(rows - 1) / 2.0, ((rows - 1) / 2.0) + 1) / (rows - 1)
    else:
        yvals = np.arange(-rows / 2.0, rows / 2.0) / rows
    x, y = np.meshgrid(xvals, yvals)
    radius = np.fft.ifftshift(np.sqrt(x**2 + y**2))
    theta = np.fft.ifftshift(np.arctan2(-y, x))
    radius[0, 0] = 1.0
    lp = np.fft.ifftshift(1.0 / (1.0 + (np.sqrt(x**2 + y**2) / 0.45) ** 30))
    gabors = []
    for s in range(nscale):
        fo = 1.0 / (minWaveLength * mult**s)
        lg = np.exp(-(np.log(radius / fo)) ** 2 / (2 * np.log(sigmaOnf) ** 2))
        lg *= lp
        lg[0, 0] = 0.0
        gabors.append(lg)
    spreads = []
    for o in range(norient):
        angl = o * np.pi / norient
        ds = np.sin(theta) * np.cos(angl) - np.cos(theta) * np.sin(angl)
        dc = np.cos(theta) * np.cos(angl) + np.sin(theta) * np.sin(angl)
        dtheta = np.minimum(np.abs(np.arctan2(ds, dc)) * norient / 2.0, np.pi)
        spreads.append((np.cos(dtheta) + 1) / 2.0)
    bank = np.stack([g * sp for sp in spreads for g in gabors])  # (O*S, H, W)
    return bank.astype(np.float32)


# Below this many canvas pixels the 2-D transforms run as explicit
# DFT-by-matmul on the MXU instead of jnp.fft: XLA's TPU FFT path left
# ~2x on the table at plankton-slot sizes (measured 2026-08-20, 48x96
# slots: 14.0 ms -> 10.6 ms per orientation batch at f32 HIGHEST, with
# eo max abs err 9e-5 on a ~2e2-scale signal). The matmul cost grows as
# O(HW*(H+W)) vs FFT's O(HW log HW), so large canvases keep the FFT.
#
# Lower-precision go/no-go (VERDICT r04 item 8, measured 2026-08-20):
# with the profile attributing the residual phasecong cost to these
# matmuls, f32 HIGHEST (6-pass bf16 emulation) runs at its arithmetic
# roofline (~260 GFLOP/batch in ~10.6 ms); DEFAULT/bf16 inputs measured
# eo max err ~1.8 on a ~2.3e2-scale signal (~8e-3 relative), which blows
# the 5e-3 phasecong parity band (tests/test_features_device.py), and
# Precision.HIGH measured SLOWER than HIGHEST on this chip (73 vs 7.8 ms
# in the standalone A/B) — so reduced precision is a measured no-go, not
# an oversight. int8 quantization of the cos/sin matrices (~2^-7 steps)
# is coarser still.
_DFT_MATMUL_MAX_PIXELS = 16384  # 128x128


@functools.lru_cache(maxsize=8)
def _dft_constants(rows: int, cols: int):
    """NumPy constants for the matmul DFT of a (rows, cols) image.

    Returns ``(FhR, FhI, FwR, FwI, G2h, M2)``: forward per-axis cos/sin
    matrices (``F = exp(-2*pi*i*jk/n)``) and the two block matrices of the
    inverse transform — complex arithmetic folded into ONE real matmul per
    stage (fewer, bigger MXU ops than 4 small ones per stage):

    - ``G2h`` (2H, 2H): ``[Are; Aim] = G2h @ [Yre; Yim]`` stacked along the
      contracted row axis,
    - ``M2`` (2W, 2W): ``[eo_re | eo_im] = [Are | Aim] @ M2`` stacked along
      the contracted column axis.
    """
    def axis_mats(n):
        k = np.arange(n)
        ang = -2.0 * np.pi * np.outer(k, k) / n
        return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)

    FhR, FhI = axis_mats(rows)
    FwR, FwI = axis_mats(cols)
    # inverse row transform: conj(Fh)/rows = (FhR - i*FhI)/rows
    G2h = np.block([
        [FhR / rows, FhI / rows],
        [-FhI / rows, FhR / rows],
    ]).astype(np.float32)
    # inverse column transform: gw = (FwR - i*FwI)/cols
    gwr, gwi = FwR / cols, -FwI / cols
    M2 = np.block([
        [gwr, gwi],
        [-gwi, gwr],
    ]).astype(np.float32)
    return FhR, FhI, FwR, FwI, G2h, M2


def _masked_median(values, valid):
    """Per-image median over the valid region. values/valid: (B, H, W).

    ``values`` must be NON-NEGATIVE (amplitudes): exact order statistics
    are found by a 31-step radix binary search on the float32 bit
    patterns (monotonic for non-negative floats) — each step is one fused
    compare+count pass, which the TPU runs ~5x faster than sorting the
    (B, H*W) rows (measured 45 -> 9.3 ms for phasecong's six medians at
    the 2048 x 48x96 fused-leg shape; result bit-equal to the sort).
    Invalid pixels count as +inf, so an all-invalid image returns inf —
    the same value the sort-based median produced.
    """
    b = values.shape[0]
    flat = jnp.where(valid, values, jnp.inf).reshape(b, -1)
    bits = jax.lax.bitcast_convert_type(flat, jnp.int32)
    n = valid.reshape(b, -1).sum(axis=1)
    # both central order statistics searched side by side: (B, 2)
    ks = jnp.stack([jnp.maximum((n - 1) // 2, 0),
                    jnp.maximum(n // 2, 0)], axis=1)
    lo = jnp.zeros((b, 2), jnp.int32)
    hi = jnp.full((b, 2), jnp.int32(0x7F800000))  # +inf bit pattern

    def body(_, carry):
        lo, hi = carry
        mid = lo + jax.lax.shift_right_logical(hi - lo, 1)
        cnt = (bits[:, None, :] <= mid[:, :, None]).sum(axis=2)
        take = cnt >= ks + 1  # k-th smallest is <= mid
        return jnp.where(take, lo, mid + 1), jnp.where(take, mid, hi)

    lo, hi = jax.lax.fori_loop(0, 31, body, (lo, hi))
    vals = jax.lax.bitcast_convert_type(lo, jnp.float32)
    return (vals[:, 0] + vals[:, 1]) / 2.0


def phasecong_Mm_batched(x, valid, nscale=4, norient=6, mult=2.1,
                         k=2.0, cutOff=0.5, g=10.0):
    """Batched ``M + m`` phase congruency of (B, H, W) float images.
    Mirrors ``compute.features.phasecong_Mm`` (median noise estimate taken
    over the valid region).

    Orientations are processed with a ``lax.scan`` rather than one stacked
    (B, O*S, H, W) tensor: the stacked complex64 responses would be 192x
    the canvas bytes (6.4 GB for a 32 MB canvas at the packer's byte cap),
    while the scan keeps one orientation's (B, S, H, W) working set live
    (~1/6th of that). The per-orientation math is identical; only the
    6-term covariance accumulation order can differ at float32 rounding.
    """
    b, rows, cols = x.shape
    bank = jnp.asarray(_pc_filter_bank(rows, cols, nscale=nscale,
                                       norient=norient, mult=mult))
    bank = bank.reshape(norient, nscale, rows, cols)
    # subtract the per-image mean before the transform: the log-Gabor bank
    # zeroes the DC bin anyway, and removing the ~1e5-magnitude DC term
    # keeps the float32 rounding error ~50x smaller than on the raw image
    x = x - x.mean(axis=(1, 2), keepdims=True)
    use_matmul = rows * cols <= _DFT_MATMUL_MAX_PIXELS
    if use_matmul:
        # MXU path: forward 2-D DFT as per-axis matmuls (see _dft_constants)
        FhR, FhI, FwR, FwI, G2h, M2 = (
            jnp.asarray(a) for a in _dft_constants(rows, cols)
        )
        hp = jax.lax.Precision.HIGHEST
        pre = jnp.einsum("hm,bmn->bhn", FhR, x, precision=hp)
        pim = jnp.einsum("hm,bmn->bhn", FhI, x, precision=hp)
        Xre = (jnp.einsum("bhn,nw->bhw", pre, FwR, precision=hp)
               - jnp.einsum("bhn,nw->bhw", pim, FwI, precision=hp))
        Xim = (jnp.einsum("bhn,nw->bhw", pre, FwI, precision=hp)
               + jnp.einsum("bhn,nw->bhw", pim, FwR, precision=hp))
        IM = None
    else:
        IM = jnp.fft.fft2(x.astype(jnp.complex64))  # (B, H, W)
    epsilon = 1e-4
    # noise-threshold constants (Rayleigh median -> scale estimate)
    tau_div = np.sqrt(np.log(4))
    tau_geo = (1 - (1 / mult) ** nscale) / (1 - (1 / mult))
    tau_mix = np.sqrt(np.pi / 2) + k * np.sqrt((4 - np.pi) / 2)
    angles = jnp.asarray(np.arange(norient) * np.pi / norient, jnp.float32)

    def one_orient(carry, inputs):
        covx2, covy2 = carry
        bank_o, angl = inputs                    # (S, H, W), scalar
        if use_matmul:
            # inverse transforms as two block matmuls (complex arithmetic
            # folded into the stacked axes; _dft_constants docstring)
            hp = jax.lax.Precision.HIGHEST
            Y2 = jnp.concatenate(
                [Xre[:, None] * bank_o[None], Xim[:, None] * bank_o[None]],
                axis=2,
            )                                     # (B, S, 2H, W)
            A2 = jnp.einsum("hm,bsmn->bshn", G2h, Y2, precision=hp)
            A4 = jnp.concatenate([A2[:, :, :rows], A2[:, :, rows:]], axis=3)
            eo2 = jnp.einsum("bshn,nw->bshw", A4, M2, precision=hp)
            e, o_ = eo2[..., :cols], eo2[..., cols:]
        else:
            eo = jnp.fft.ifft2(IM[:, None] * bank_o[None])  # (B, S, H, W)
            e, o_ = jnp.real(eo), jnp.imag(eo)
        an = jnp.sqrt(e * e + o_ * o_)
        sumAn = an.sum(axis=1)                   # (B, H, W)
        sumE = e.sum(axis=1)
        sumO = o_.sum(axis=1)
        x_energy = jnp.sqrt(sumE**2 + sumO**2) + epsilon
        mean_e = sumE / x_energy
        mean_o = sumO / x_energy
        energy = (e * mean_e[:, None] + o_ * mean_o[:, None]
                  - jnp.abs(e * mean_o[:, None] - o_ * mean_e[:, None])
                  ).sum(axis=1)
        # noise threshold from the smallest-scale amplitude
        tau = _masked_median(an[:, 0], valid) / tau_div
        noise_t = tau * tau_geo * tau_mix        # (B,)
        energy = jnp.maximum(energy - noise_t[:, None, None], 0.0)
        maxAn = an.max(axis=1)
        width = (sumAn / (maxAn + epsilon) - 1) / (nscale - 1)
        weight = 1.0 / (1 + jnp.exp(g * (cutOff - width)))
        pc = weight * energy / sumAn             # (B, H, W)
        covx2 = covx2 + (pc * jnp.cos(angl)) ** 2
        covy2 = covy2 + (pc * jnp.sin(angl)) ** 2
        return (covx2, covy2), None

    zeros = jnp.zeros((b, rows, cols), jnp.float32)
    (covx2, covy2), _ = jax.lax.scan(one_orient, (zeros, zeros),
                                     (bank, angles))
    return (covx2 + covy2) / (norient / 2.0)    # == M + m


def moments_features(mask):
    """(area, major, minor) from masked moment sums; MATLAB regionprops
    ellipse-of-equal-second-moments with the +1/12 pixel term."""
    b, h, w = mask.shape
    m = mask.astype(jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)[None]
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)[None]
    n = m.sum(axis=(1, 2))
    safe_n = jnp.maximum(n, 1.0)
    xbar = (m * xs).sum(axis=(1, 2)) / safe_n
    ybar = (m * ys).sum(axis=(1, 2)) / safe_n
    dx = xs - xbar[:, None, None]
    dy = ys - ybar[:, None, None]
    uxx = (m * dx * dx).sum(axis=(1, 2)) / safe_n + 1.0 / 12.0
    uyy = (m * dy * dy).sum(axis=(1, 2)) / safe_n + 1.0 / 12.0
    uxy = (m * dx * dy).sum(axis=(1, 2)) / safe_n
    common = jnp.sqrt((uxx - uyy) ** 2 + 4.0 * uxy * uxy)
    major = 2.0 * jnp.sqrt(2.0) * jnp.sqrt(uxx + uyy + common)
    minor = 2.0 * jnp.sqrt(2.0) * jnp.sqrt(jnp.maximum(uxx + uyy - common, 0.0))
    empty = n < 0.5
    return (
        n,
        jnp.where(empty, 0.0, major),
        jnp.where(empty, 0.0, minor),
    )


def _largest_blob(mask, d, iterations: int, candidates: int = 4):
    """Largest-area blob via candidate floods: flood from the deepest
    (max-distance) unclaimed pixel, remove the claimed blob, repeat
    ``candidates`` times, keep the flood with the largest area.

    A single deepest-pixel flood picks the THICKEST blob, which diverges
    from the host's largest-AREA blob on e.g. a long thin filament next
    to a compact cell (measured on a randomized fixture-derived set: one
    ROI in ~30 picked a 47 px blob over the host's 67 px choice). Four
    candidates cover every multi-blob ROI observed; a blob that is
    neither among the 4 thickest nor the largest would have to hide
    among 5+ comparably-deep blobs, which plankton ROIs do not produce.
    """
    b, h, w = mask.shape

    def pick(carry, _):
        remaining, best, best_area = carry
        flat = jnp.where(remaining, d, -1.0).reshape(b, -1)
        peak = jnp.argmax(flat, axis=1)
        seed = jax.nn.one_hot(peak, h * w, dtype=jnp.float32).reshape(b, h, w) > 0.5
        blob = _flood(seed & remaining, remaining, iterations)
        area = blob.sum(axis=(1, 2))
        take = area > best_area
        best = jnp.where(take[:, None, None], blob, best)
        best_area = jnp.where(take, area, best_area)
        return (remaining & ~blob, best, best_area), None

    init = (mask, jnp.zeros_like(mask), jnp.zeros((b,), jnp.int32))
    (_, best, _), _ = jax.lax.scan(pick, init, None, length=candidates)
    return best


def _sum3(x):
    """3x3 box sum of a (B, H, W) float array (zero padding)."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3), (1, 1, 1),
        [(0, 0), (1, 1), (1, 1)],
    )


def _replicate_fill(x, valid, iterations: int):
    """Fill invalid (slot padding) pixels by propagating the nearest valid
    values outward (mean of already-filled 3x3 neighbors), like an
    edge-replicate pad for a per-image dynamic window.

    Why not fill with the per-ROI mean: phase congruency is amplitude-
    normalized, so even a WEAK step from the ROI's border pixels to a
    constant fill is a coherent edge — it rings the whole valid region
    with phantom edges, and when that ring closes, hole-filling floods the
    entire ROI (measured: a 65x110 ROI in an 81x126 slot reported the full
    7150-px window as its blob, with negative biovolume). Replicated
    values continue the border smoothly, so no boundary step exists and
    the spectrum stays consistent with the host's exact-window FFT.
    """
    filled = valid.astype(jnp.float32)
    vals = x * filled

    def cond(carry):
        i, vals, filled, done = carry
        return jnp.logical_and(i < iterations, jnp.logical_not(done))

    def body(carry):
        i, vals, filled, _ = carry
        cnt = _sum3(filled)
        avg = jnp.where(cnt > 0, _sum3(vals) / jnp.maximum(cnt, 1.0), 0.0)
        new_filled = jnp.minimum(_dilate3(filled), 1.0)
        new_vals = jnp.where(filled > 0.5, vals, avg * new_filled)
        return i + 1, new_vals, new_filled, jnp.all(new_filled > 0.5)

    _, vals, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), vals, filled, jnp.bool_(False))
    )
    return vals


@functools.partial(jax.jit, static_argnames=("fill_iters", "edt_iters"))
def device_features(canvas, heights, widths, fill_iters: int | None = None,
                    edt_iters: int | None = None):
    """(area, biovolume_px, major, minor) float32 arrays of shape (B,) for a
    packed uint8 canvas batch, entirely on device. Tracks the host
    ``compute.features`` pipeline (see module docstring for deviations).

    Floods and the chamfer relaxation are convergence-checked while_loops;
    the iteration counts are only pathological-case caps. The default cap
    is ``ch * cw`` — an absolute bound on any geodesic path, so curved
    chains/serpentine blobs are never silently truncated (typical masks
    converge in tens of steps; remaining degenerate cases are additionally
    handled by the sentinel clamp in :func:`chamfer_distance`).
    """
    b, ch, cw = canvas.shape
    if fill_iters is None:
        fill_iters = ch * cw
    if edt_iters is None:
        edt_iters = ch * cw
    t, valid = batched_otsu(canvas, heights, widths)

    # FFT input: valid pixels, slot padding filled by replicating the
    # nearest border values outward (see _replicate_fill for why a
    # constant fill is catastrophic here).
    xf = canvas.astype(jnp.float32)
    xfill = _replicate_fill(xf, valid, max(ch, cw))

    mm = phasecong_Mm_batched(xfill, valid)
    weak = (mm > HYST_LOW) & valid
    strong = (mm > HYST_HIGH) & valid
    edges = _flood(strong, weak, fill_iters)

    mask = dilate_disk2(edges, valid)
    mask = fill_holes(mask, valid, fill_iters)
    mask = erode_disk2(mask, valid, 2)
    dark = (canvas.astype(jnp.int32)
            <= (t.astype(jnp.float32) * DARK_OTSU_SCALE)[:, None, None]) & valid
    mask = fill_holes(mask | dark, valid, fill_iters)

    d_all = chamfer_distance(mask, edt_iters, valid=valid)
    blob = _largest_blob(mask, d_all, fill_iters)
    d = chamfer_distance(blob, edt_iters, valid=valid)
    area, major, minor = moments_features(blob)
    biovolume = 4.0 * d.sum(axis=(1, 2)) - 3.0 * area
    # one stacked array = ONE device->host transfer for the whole batch
    # (four separate transfers cost 4 tunnel round trips per batch)
    return jnp.stack([area, biovolume, major, minor], axis=1)
