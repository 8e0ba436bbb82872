"""Entropy-coding go/no-go study for the wire codec (bench mix)."""
import sys, tempfile
sys.path.insert(0, "/root/repo")
import _venvfix; _venvfix.ensure()
import numpy as np
from pathlib import Path
import bench
from sykepic_tpu.ingest import ifcb, pack, shelf, wirecodec
import cv2

# Build the bench-mix ROI set exactly like host_pack_benchmark
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
    grp = rois[s:s+500]
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

tot = dict(px=0, rois=0, raw=0, cur=0)
# per-window best-predictor residuals (mod-256 int16 in [-128,127])
hist = np.zeros(256, np.int64)          # residual distribution (best predictor)
nib_hist = np.zeros(16, np.int64)       # 4-bit plane symbol distribution
kbits = {2: 0, 3: 0, 4: 0, 5: 0}        # exception counts per k-bit plane

for b in shelf.pack_shelves(iter(blocks), pre_shrink_to=(180, 180),
                            compute_modes=True):
    W = b.windows
    payload = wirecodec.encode(W)
    tot["px"] += W.size; tot["rois"] += b.n_valid; tot["raw"] += W.nbytes
    tot["cur"] += payload.nbytes if payload is not None else W.nbytes
    a = W.astype(np.int16)
    nc, h, w = W.shape
    dv = np.diff(a, axis=1, prepend=np.zeros((nc, 1, w), np.int16))
    dh = np.diff(a, axis=2, prepend=np.zeros((nc, h, 1), np.int16))
    dg = np.diff(dv, axis=2, prepend=np.zeros((nc, h, 1), np.int16))
    # pick best predictor per window by 4-bit-exception count (like encoder)
    best = np.empty_like(dv)
    for c in range(nc):
        cands = (dv[c], dh[c], dg[c])
        costs = [int((((d + 8) & 0xFF) > 15).sum()) for d in cands]
        best[c] = cands[int(np.argmin(costs))]
    r = (best & 0xFF).astype(np.uint8)       # mod-256 residual
    hist += np.bincount(r.reshape(-1), minlength=256)
    nib_hist += np.bincount((r & 0x0F).reshape(-1), minlength=16)
    signed = ((r.astype(np.int16) + 128) % 256) - 128
    for k in kbits:
        lo, hi = -(1 << (k-1)), (1 << (k-1)) - 1
        kbits[k] += int(((signed < lo) | (signed > hi)).sum())

px, R = tot["px"], tot["rois"]
p = hist / hist.sum()
H = float(-(p[p > 0] * np.log2(p[p > 0])).sum())
pn = nib_hist / nib_hist.sum()
Hn = float(-(pn[pn > 0] * np.log2(pn[pn > 0])).sum())
print(f"rois={R} px={px} raw={tot['raw']/R:.0f} B/ROI  current codec={tot['cur']/R:.1f} B/ROI")
print(f"residual entropy H={H:.3f} b/px -> ideal {px*H/8/R:.0f} B/ROI")
print(f"nibble-plane entropy Hn={Hn:.3f} b/nib -> nibble-huffman plane {px*Hn/8/R:.0f} B/ROI + exceptions")
for k, e in sorted(kbits.items()):
    rate = e / px
    one = (px * k / 8 + e * 1) / R
    two = (px * k / 8 + e * 2) / R
    print(f"{k}-bit plane: exc rate {rate*100:.2f}% -> {one:.0f} B/ROI (1B/exc) .. {two:.0f} B/ROI (2B/exc)")
