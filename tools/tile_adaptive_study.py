"""Tile-adaptive bit-width study for the wire codec (go/no-go extension).

The entropy-coding no-go (tools/entropy_study.py, wirecodec.py docstring)
rejected bit-granularity Huffman because decode needs per-symbol
variable-position gathers. The remaining family between "fixed 4-bit
plane" and "full entropy coding" is a TILE-adaptive plane: split each
window into fixed P-pixel tiles, pick k in {0, 2, 4} bits per tile by
residual range, ship the concatenated tile planes + 2 bits/tile of width
flags. This script measures the wire bytes that family could save on the
bench mix; the decode-cost argument lives in the wirecodec docstring.
"""
import sys

sys.path.insert(0, "/root/repo")
import _venvfix

_venvfix.ensure()
from pathlib import Path

import cv2
import numpy as np

import bench
from sykepic_tpu.ingest import ifcb, pack, shelf, wirecodec

rng = np.random.default_rng(7)
n = 30000
fixture = Path("/root/repo/tests/data/raw/valid/D20180712T065600_IFCB114")
images = [img for _, img in ifcb.read_sample(fixture).images()]
cache = {}
rois = []
for i, (h, w) in enumerate(bench._roi_shapes(rng, n)):
    img = cache.get((h, w))
    if img is None:
        src = images[(h * 31 + w) % len(images)]
        img = cv2.resize(src, (w, h), interpolation=cv2.INTER_AREA)
        cache[(h, w)] = img
    rois.append((0, i + 1, img))
blocks = []
for s in range(0, n, 500):
    grp = rois[s:s + 500]
    sizes = np.array([im.size for _, _, im in grp], np.int64)
    offs = np.zeros(len(grp), np.int64)
    np.cumsum(sizes[:-1], out=offs[1:])
    blocks.append(pack.RoiBlock(
        sample_idx=s // 500,
        roi_ids=np.array([r for _, r, _ in grp], np.int64),
        heights=np.array([im.shape[0] for _, _, im in grp], np.int64),
        widths=np.array([im.shape[1] for _, _, im in grp], np.int64),
        offsets=offs,
        base=np.concatenate([im.reshape(-1) for _, _, im in grp]),
    ))

# tile shapes to evaluate: (th, tw) in window coordinates
TILES = [(4, 128), (8, 64), (8, 128), (16, 128)]
tot = {t: dict(bytes=0) for t in TILES}
cur = rois_n = raw = 0

for b in shelf.pack_shelves(iter(blocks), pre_shrink_to=(180, 180),
                            compute_modes=True):
    W = b.windows
    payload = wirecodec.encode(W)
    cur += payload.nbytes if payload is not None else W.nbytes
    rois_n += b.n_valid
    raw += W.nbytes
    a = W.astype(np.int16)
    nc, h, w = W.shape
    dv = np.diff(a, axis=1, prepend=np.zeros((nc, 1, w), np.int16))
    dg = np.diff(dv, axis=2, prepend=np.zeros((nc, h, 1), np.int16))
    dh = np.diff(a, axis=2, prepend=np.zeros((nc, h, 1), np.int16))
    best = np.empty_like(dv)
    for c in range(nc):
        cands = (dv[c], dh[c], dg[c])
        costs = [int((((d + 8) & 0xFF) > 15).sum()) for d in cands]
        best[c] = cands[int(np.argmin(costs))]
    signed = (((best & 0xFF) + 128) % 256) - 128  # mod-256 residual, signed
    for th, tw in TILES:
        # reshape into (nc, h//th, th, w//tw, tw) tiles (window dims are
        # multiples of 4/8/16 x 64/128: WIN_H=192, WIN_W=512)
        t = signed.reshape(nc, h // th, th, w // tw, tw)
        lo = t.min(axis=(2, 4))
        hi = t.max(axis=(2, 4))
        # width class per tile: 0 bits (all residuals 0), 2 bits
        # ([-2, 1]), else 4 bits; residuals outside [-8, 7] stay
        # exceptions exactly as today (their count is unchanged: the
        # 4-bit class still carries them, and 0/2-bit tiles by
        # definition have none)
        k0 = (lo == 0) & (hi == 0)
        k2 = ~k0 & (lo >= -2) & (hi <= 1)
        px_tile = th * tw
        n_tiles = k0.size
        plane_bytes = (int(k2.sum()) * px_tile * 2
                       + int((~k0 & ~k2).sum()) * px_tile * 4) // 8
        flag_bytes = (n_tiles * 2 + 7) // 8
        tot[(th, tw)]["bytes"] += plane_bytes + flag_bytes

print(f"rois={rois_n} raw={raw / rois_n:.0f} B/ROI "
      f"current codec={cur / rois_n:.1f} B/ROI (plane+exc+flags)")
# current 4-bit dense plane share of that (exceptions ride on top in
# both designs, so compare planes to planes): raw/2 per window
print(f"dense 4-bit plane alone = {raw / 2 / rois_n:.1f} B/ROI")
for t, d in tot.items():
    print(f"tile {t[0]}x{t[1]}: adaptive plane+flags = "
          f"{d['bytes'] / rois_n:.1f} B/ROI "
          f"(saves {raw / 2 / rois_n - d['bytes'] / rois_n:.1f})")
