"""Shelf packer invariants + shelf-vs-slot classification parity.

The shelf path (ingest/shelf.py + the engine's ``_infer_shelf``) must be a
pure wire-layout optimization: every ROI present exactly once, pixels
blitted losslessly, and classification output equal to the slot path
(reference semantics: ``sykepic/compute/probability.py:133-206``).
"""

import numpy as np
import pytest

from sykepic_tpu.ingest import shelf


def _rand_rois(n, rng, h_range=(8, 180), w_range=(8, 180)):
    out = []
    for i in range(n):
        h = int(rng.integers(*h_range))
        w = int(rng.integers(*w_range))
        out.append((i % 7, i + 1, rng.integers(0, 255, (h, w), np.uint8)))
    return out


@pytest.mark.parametrize("n", [1, 5, 37, 400])
def test_every_roi_placed_exactly_once_and_lossless(n):
    rng = np.random.default_rng(n)
    rois = _rand_rois(n, rng)
    batches = list(shelf.pack_shelves(iter(rois), pre_shrink_to=(180, 180),
                                      compute_modes=True))
    seen = {}
    for b in batches:
        nc = b.windows.shape[0]
        assert b.windows.shape[1:] == (shelf.WIN_H, shelf.WIN_W)
        assert nc in shelf.NC_LADDER
        for s in range(b.n_valid):
            key = (int(b.sample_idx[s]), int(b.roi_ids[s]))
            assert key not in seen, f"duplicate {key}"
            h, w = int(b.heights[s]), int(b.widths[s])
            y, x = int(b.y0[s]), int(b.x0[s])
            assert 0 <= y and y + h <= shelf.WIN_H
            assert 0 <= x and x + w <= shelf.WIN_W
            img = b.windows[int(b.win_idx[s]), y : y + h, x : x + w]
            seen[key] = img.copy()
    expect = {(smp, rid): img for smp, rid, img in rois}
    assert set(seen) == set(expect)
    for key in expect:
        assert np.array_equal(seen[key], expect[key]), key


def test_no_overlap_between_rois():
    rng = np.random.default_rng(3)
    rois = _rand_rois(300, rng)
    for b in shelf.pack_shelves(iter(rois), pre_shrink_to=(180, 180)):
        cover = np.zeros(b.windows.shape, np.int32)
        for s in range(b.n_valid):
            w_, y, x = int(b.win_idx[s]), int(b.y0[s]), int(b.x0[s])
            cover[w_, y : y + int(b.heights[s]),
                  x : x + int(b.widths[s])] += 1
        assert cover.max() <= 1


def test_oversized_rois_are_shrunk():
    rng = np.random.default_rng(4)
    big = rng.integers(0, 255, (700, 900), np.uint8)
    (b,) = list(shelf.pack_shelves(iter([(0, 1, big)]),
                                   pre_shrink_to=(180, 180)))
    assert b.n_valid == 1
    assert int(b.heights[0]) <= shelf.WIN_H
    assert int(b.widths[0]) <= shelf.WIN_W


def test_slot_padding_respects_batch_multiple():
    rng = np.random.default_rng(5)
    rois = _rand_rois(10, rng)
    for mult in (1, 3, 8):
        for b in shelf.pack_shelves(iter(rois), pre_shrink_to=(180, 180),
                                    batch_multiple=mult):
            assert len(b.win_idx) % mult == 0
            assert len(b.win_idx) >= b.n_valid


def test_occupancy_on_realistic_mix():
    """Shelf packing must beat the slot packer's wire bytes by a clear
    margin on a realistic IFCB size mix (the point of the exercise)."""
    rng = np.random.default_rng(6)
    sizes = [(0.45, (24, 32), (40, 64)), (0.22, (33, 48), (40, 64)),
             (0.18, (49, 64), (40, 128)), (0.12, (65, 128), (65, 256)),
             (0.03, (129, 256), (257, 512))]
    weights = np.array([s[0] for s in sizes])
    rois = []
    for i in range(3000):
        k = rng.choice(len(sizes), p=weights / weights.sum())
        (h0, h1), (w0, w1) = sizes[k][1], sizes[k][2]
        h, w = int(rng.integers(h0, h1 + 1)), int(rng.integers(w0, w1 + 1))
        rois.append((0, i + 1, rng.integers(0, 255, (h, w), np.uint8)))
    batches = list(shelf.pack_shelves(iter(rois), pre_shrink_to=(180, 180)))
    wire = sum(b.windows.nbytes for b in batches)
    raw = sum(int(b.heights[: b.n_valid].astype(np.int64)
                  @ b.widths[: b.n_valid]) for b in batches)
    occupancy = raw / wire
    assert occupancy > 0.85, occupancy
    # program-shape diversity stays tiny
    shapes = {(b.windows.shape[0], len(b.win_idx)) for b in batches}
    assert len(shapes) <= 4, shapes


def test_shelf_classification_matches_slot_path(model_dir):
    """End-to-end engine parity: same ROIs through the shelf program and
    the slot program give the same probabilities (bit-near: the einsum
    contraction width differs, leaving ~1 ulp of reassociation noise)."""
    from sykepic_tpu.compute import probability

    rng = np.random.default_rng(7)
    # Fixed size palette (still spanning tiny -> oversize-pre-shrunk): a
    # free size range made the SLOT baseline compile one CNN program per
    # snapped canvas shape — minutes of CPU compile that tests nothing new.
    palette = [(10, 14), (24, 50), (40, 40), (61, 90), (120, 77),
               (179, 180), (240, 160), (300, 300)]
    rois = []
    for i in range(150):
        h, w = palette[int(rng.integers(len(palette)))]
        rois.append((i % 7, i + 1, rng.integers(0, 255, (h, w), np.uint8)))

    def run(packing):
        clf = probability.prepare_model(model_dir, batch_size=64)
        clf.packing = packing
        return {(s, r): p for s, r, p in clf.classify_rois(iter(rois))}

    a = run("slots")
    b = run("shelf")
    assert set(a) == set(b)
    worst = max(float(np.abs(a[k] - b[k]).max()) for k in a)
    # one fixed-point D2H quantum (~1.0014e-5 reconstructed): slot-vs-
    # shelf ulp noise straddling a round(p*1e5) boundary is legitimate
    assert worst < 1.2e-5, worst


def test_onchip_rate_shelf_counts(model_dir):
    from sykepic_tpu.compute import probability

    rng = np.random.default_rng(8)
    rois = _rand_rois(40, rng)
    clf = probability.prepare_model(model_dir, batch_size=64)
    clf.packing = "shelf"
    n, secs = clf.onchip_rate(iter(rois), repeats=1)
    assert n == 40
    assert secs > 0.0


def test_nc_full_beyond_ladder_rejected():
    rng = np.random.default_rng(1)
    rois = _rand_rois(4, rng)
    gen = shelf.pack_shelves(iter(rois), pre_shrink_to=(180, 180),
                             nc_full=shelf.NC_LADDER[-1] * 2)
    with pytest.raises(ValueError, match="window-count ladder"):
        next(gen)


def test_slot_cap_bounds_dispatch(model_dir):
    """Classifier.batch_size above the 1024 floor caps slots/dispatch (the
    device-memory knob stays live under shelf packing)."""
    from sykepic_tpu.compute import probability

    clf = probability.prepare_model(model_dir, batch_size=2048)
    assert clf._shelf_slot_cap == 2048
    rng = np.random.default_rng(5)
    rois = _rand_rois(3000, rng, h_range=(8, 12), w_range=(8, 12))
    for b in shelf.pack_shelves(iter(rois), pre_shrink_to=(180, 180),
                                slot_cap=clf._shelf_slot_cap):
        assert len(b.win_idx) <= 2048


def test_off_ladder_slot_cap_never_overshoots():
    """An off-ladder slot cap (1500) must still be a HARD bound: the
    padded dispatch floors onto the ladder below the cap instead of
    pad_slots rounding the fullest pack above it."""
    rng = np.random.default_rng(11)
    rois = _rand_rois(4000, rng, h_range=(8, 12), w_range=(8, 12))
    sizes = set()
    for b in shelf.pack_shelves(iter(rois), pre_shrink_to=(180, 180),
                                slot_cap=1500):
        assert len(b.win_idx) <= 1500
        sizes.add(len(b.win_idx))
    assert max(sizes) == shelf.floor_slots(1500)  # 1280: fullest dispatch


def test_slot_cap_holds_with_non_pow2_multiple():
    """SLOT_CAP with a 6-way batch multiple: the padded slot count must
    not exceed the cap (pad_slots' lcm step would round 4096 -> 4608)."""
    rng = np.random.default_rng(12)
    rois = _rand_rois(9000, rng, h_range=(8, 10), w_range=(8, 10))
    for b in shelf.pack_shelves(iter(rois), pre_shrink_to=(180, 180),
                                batch_multiple=6,
                                slot_cap=shelf.SLOT_CAP):
        assert len(b.win_idx) <= shelf.SLOT_CAP
        assert len(b.win_idx) % 6 == 0


def test_off_ladder_nc_full_snaps_down():
    """nc_full=50 snaps to the 48 rung: full dispatches must not ship
    permanently dead padded windows over the wire."""
    rng = np.random.default_rng(13)
    rois = _rand_rois(6000, rng, h_range=(24, 64), w_range=(40, 128))
    batches = list(shelf.pack_shelves(iter(rois), pre_shrink_to=(180, 180),
                                      nc_full=50))
    ncs = [b.windows.shape[0] for b in batches]
    assert 48 in ncs, ncs  # full dispatches land on the rung below
    assert 56 not in ncs, ncs  # never pad_nc(50): no dead windows shipped


def test_carry_does_not_rethrash_the_buffer():
    """100%-occupancy uniform ROIs pack tighter than the flush factor, so
    every flush used to carry everything and re-shelve the whole buffer
    per appended ROI (quadratic). The packer must re-arm the flush only
    after the missing windows' worth of pixels arrives."""
    import sykepic_tpu.ingest.shelf as shelf_mod

    rng = np.random.default_rng(14)
    rois = [(0, i + 1, rng.integers(0, 255, (32, 64), np.uint8))
            for i in range(12_000)]
    n_packs = 0
    orig = shelf_mod._Shelver.__init__

    def counting(self, heights, widths):
        nonlocal n_packs
        n_packs += 1
        orig(self, heights, widths)

    shelf_mod._Shelver.__init__ = counting
    try:
        batches = list(shelf_mod.pack_shelves(iter(rois),
                                              pre_shrink_to=(180, 180)))
    finally:
        shelf_mod._Shelver.__init__ = orig
    placed = sum(b.n_valid for b in batches)
    assert placed == 12_000
    # one shelving per emitted dispatch plus a small carry overhead
    assert n_packs <= len(batches) * 3 + 4, (n_packs, len(batches))


def test_unknown_border_mode_raises_on_shelf_path(model_dir, tmp_path):
    """A typo'd border mode must fail loudly on the (default) shelf path,
    exactly like the slot path's border_values — not silently classify
    with black fill."""
    import shutil

    from sykepic_tpu.compute import probability

    d = tmp_path / "model"
    shutil.copytree(model_dir, d)
    ini = (d / "config.ini").read_text()
    assert "mode" in ini
    (d / "config.ini").write_text(ini.replace("border = mode",
                                              "border = Mode"))
    clf = probability.prepare_model(d, batch_size=64)
    rng = np.random.default_rng(15)
    (b,) = list(shelf.pack_shelves(iter(_rand_rois(4, rng)),
                                   pre_shrink_to=(180, 180)))
    with pytest.raises(ValueError, match="[Uu]nknown border"):
        clf.dispatch_shelf(b)


def test_precompile_snaps_off_ladder_shelf_keys(model_dir):
    """precompile must warm the ladder shapes pack_shelves actually emits,
    not the raw (nc, slots) pair the caller passed."""
    from sykepic_tpu.compute import probability

    clf = probability.prepare_model(model_dir, batch_size=64)
    seen = []
    orig = clf.dispatch_shelf

    def spy(batch, meta=None):
        seen.append((batch.windows.shape[0], len(batch.win_idx)))
        return orig(batch, meta)

    clf.dispatch_shelf = spy
    try:
        clf.precompile([(3, 100)])
    finally:
        clf.dispatch_shelf = orig
    assert seen == [(shelf.pad_nc(3), shelf.pad_slots(100))]


def test_native_pack_matches_python_fallback():
    """The C++ shelf placement (native.shelf_pack) must reproduce the
    Python fallback EXACTLY — same placements, same window count, same
    leftover order — across random size mixes and cap settings."""
    from sykepic_tpu.ingest import native

    if native.lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(21)
    adversarial = [
        # all one height (single bucket, pure width/tie ordering)
        (np.full(400, 24), rng.integers(4, 181, 400)),
        # full-window widths (one ROI per shelf row)
        (rng.integers(4, 181, 120), np.full(120, shelf.WIN_W)),
        # 1-px slivers (max placements per window, slot-cap pressure)
        (np.full(3000, 1), np.full(3000, 1)),
        # exact window height (one shelf per window)
        (np.full(50, shelf.WIN_H), rng.integers(4, 181, 50)),
    ]
    for trial in range(10):
        if trial < len(adversarial):
            h, w = (a.astype(np.int64) for a in adversarial[trial])
            n = len(h)
        else:
            n = int(rng.integers(50, 3000))
            h = rng.integers(4, 181, n)
            w = rng.integers(4, 181, n)
            # duplicate sizes exercise the stable tie-break
            if n > 100:
                h[::3] = 24
                w[::5] = 40
        max_windows = int(rng.choice([1, 3, 8, 64]))
        max_slots = int(rng.choice([32, 500, 4096]))

        nat = shelf._Shelver(h, w)
        assert nat._native is not None
        py = shelf._Shelver(h, w)
        py._native = None
        while True:
            p_nat, w_nat = nat.pack(max_windows, max_slots)
            p_py, w_py = py.pack(max_windows, max_slots)
            assert w_nat == w_py, trial
            for a, b in zip(p_nat, p_py):
                np.testing.assert_array_equal(a, b, err_msg=str(trial))
            np.testing.assert_array_equal(
                nat.pending_order(), py.pending_order(), err_msg=str(trial))
            if len(p_nat[0]) == 0:
                break


def test_native_blit_rejects_out_of_range_window():
    """A window index past the tensor must be rejected (-1 -> None), not
    silently memcpy'd past the allocation."""
    from sykepic_tpu.ingest import native

    if native.lib() is None:
        pytest.skip("native library unavailable")
    windows = np.zeros((1, shelf.WIN_H, shelf.WIN_W), np.uint8)
    img = np.ones((4, 4), np.uint8)
    assert native.shelf_blit(
        [img], np.array([4], np.int32), np.array([4], np.int32),
        np.array([5], np.int32), np.array([0], np.int32),
        np.array([0], np.int32), windows) is None
    assert not windows.any()


def test_native_pack_overtall_item_matches_python():
    """An item taller than the window stays pending in BOTH paths and
    burns the window budget identically (n_windows parity)."""
    from sykepic_tpu.ingest import native

    if native.lib() is None:
        pytest.skip("native library unavailable")
    h = np.array([shelf.WIN_H + 8, 40])
    w = np.array([50, 60])
    nat = shelf._Shelver(h, w)
    assert nat._native is not None
    py = shelf._Shelver(h, w)
    py._native = None
    p_nat, w_nat = nat.pack(8, 4096)
    p_py, w_py = py.pack(8, 4096)
    assert w_nat == w_py
    for a, b in zip(p_nat, p_py):
        np.testing.assert_array_equal(a, b)
    assert nat.pending() and py.pending()


def test_precompile_clamps_to_floored_slot_cap(model_dir):
    """Warming a raw slot count near the cap must compile the FLOORED
    ladder shape the runtime actually dispatches, not pad_slots' next
    rung above the cap."""
    from sykepic_tpu.compute import probability

    clf = probability.prepare_model(model_dir, batch_size=64)
    clf._batch_multiple = 6  # emulate a 6-way data mesh
    seen = []
    orig = clf.dispatch_shelf

    def spy(batch, meta=None):
        seen.append(len(batch.win_idx))
        return orig(batch, meta)

    clf.dispatch_shelf = spy
    try:
        clf.precompile([(1, clf._shelf_slot_cap - 10)])
    finally:
        clf.dispatch_shelf = orig
    assert seen == [shelf.floor_slots(clf._shelf_slot_cap, 6)]


def test_pure_python_fallback_produces_identical_dispatches(monkeypatch):
    """With the native library entirely absent (lib() -> None), the whole
    pack_shelves flow — placement, blits, border modes — must produce
    byte-identical dispatches to the native path."""
    from sykepic_tpu.ingest import native

    if native.lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(24)
    rois = _rand_rois(700, rng, h_range=(4, 120), w_range=(4, 180))
    fast = list(shelf.pack_shelves(iter(rois), pre_shrink_to=(180, 180),
                                   compute_modes=True))
    monkeypatch.setattr(native, "lib", lambda: None)
    slow = list(shelf.pack_shelves(iter(rois), pre_shrink_to=(180, 180),
                                   compute_modes=True))
    assert len(fast) == len(slow)
    for a, b in zip(fast, slow):
        np.testing.assert_array_equal(a.windows, b.windows)
        np.testing.assert_array_equal(a.win_idx, b.win_idx)
        np.testing.assert_array_equal(a.modes, b.modes)
        np.testing.assert_array_equal(a.roi_ids, b.roi_ids)
        assert a.n_valid == b.n_valid


def test_native_mode_matches_numpy_contract():
    """native.u8_mode must equal the NumPy bincount-argmax contract,
    including first-max tie wins and single-value images."""
    from sykepic_tpu.ingest import native, pack

    if native.lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(23)
    cases = [rng.integers(0, 256, (int(rng.integers(1, 150)),
                                   int(rng.integers(1, 150)))).astype(
                 np.uint8) for _ in range(40)]
    cases.append(np.full((5, 5), 200, np.uint8))
    cases.append((rng.integers(0, 4, (60, 60)) * 3).astype(np.uint8))  # ties
    for img in cases:
        want = int(np.bincount(img.ravel(), minlength=256).argmax())
        assert native.u8_mode(img) == want
        assert pack.mode_pixel(img) == want


def test_emit_native_blit_matches_python(monkeypatch):
    """Windows built by the native blit are byte-identical to the Python
    slice-assignment fallback."""
    from sykepic_tpu.ingest import native

    if native.lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(22)
    rois = _rand_rois(600, rng, h_range=(4, 120), w_range=(4, 180))
    fast = list(shelf.pack_shelves(iter(rois), pre_shrink_to=(180, 180)))
    monkeypatch.setattr(native, "shelf_blit",
                        lambda *a, **k: None)
    slow = list(shelf.pack_shelves(iter(rois), pre_shrink_to=(180, 180)))
    assert len(fast) == len(slow)
    for a, b in zip(fast, slow):
        np.testing.assert_array_equal(a.windows, b.windows)
        np.testing.assert_array_equal(a.win_idx, b.win_idx)
        np.testing.assert_array_equal(a.roi_ids, b.roi_ids)


def test_dispatch_shelf_computes_missing_modes(model_dir):
    """A hand-built ShelfBatch without precomputed modes must classify
    under border=mode by recovering modes from the windows (public
    dispatch_shelf contract)."""
    from sykepic_tpu.compute import probability

    clf = probability.prepare_model(model_dir, batch_size=64)
    assert clf.spec.border == "mode"
    rng = np.random.default_rng(9)
    rois = _rand_rois(20, rng)
    with_modes = list(shelf.pack_shelves(
        iter(rois), pre_shrink_to=(180, 180), compute_modes=True))
    without = list(shelf.pack_shelves(
        iter(rois), pre_shrink_to=(180, 180), compute_modes=False))
    assert len(with_modes) == len(without) == 1
    a = np.asarray(clf.dispatch_shelf(with_modes[0]))
    b = np.asarray(clf.dispatch_shelf(without[0]))
    np.testing.assert_array_equal(a, b)


def test_window_pool_recycling_is_lossless():
    """Recycled window buffers must behave exactly like fresh ones: a
    second stream that reuses the first stream's (dirty) tensors must
    produce byte-identical windows to a pool-free run, including the
    padding fill (the wire codec encodes the whole window)."""
    rng = np.random.default_rng(77)
    rois = _rand_rois(300, rng, h_range=(4, 120), w_range=(4, 180))

    shelf._WINDOW_POOL.clear()
    clean = list(shelf.pack_shelves(iter(rois), pre_shrink_to=(180, 180),
                                    compute_modes=True))
    # drain-side contract: recycle every batch, then stream again --
    # the second run must pop dirty buffers from the pool
    dirty_ids = set()
    for b in clean:
        dirty_ids.add(id(b.windows))
        # keep copies for comparison before the tensor is reused
        b._snapshot = b.windows.copy()
        shelf.recycle_windows(b)
        assert b.windows is None
    again = list(shelf.pack_shelves(iter(rois), pre_shrink_to=(180, 180),
                                    compute_modes=True))
    reused = sum(1 for b in again if id(b.windows) in dirty_ids)
    assert reused > 0, "pool was never used"
    assert len(again) == len(clean)
    for a, b in zip(clean, again):
        np.testing.assert_array_equal(a._snapshot, b.windows)
        np.testing.assert_array_equal(a.win_idx, b.win_idx)
        np.testing.assert_array_equal(a.roi_ids, b.roi_ids)
    shelf._WINDOW_POOL.clear()


def test_recycle_windows_ignores_foreign_shapes():
    """Hand-built batches with non-standard window tensors must not
    poison the pool."""
    shelf._WINDOW_POOL.clear()
    b = shelf.ShelfBatch(
        windows=np.zeros((2, 64, 64), np.uint8),  # wrong (H, W)
        win_idx=np.zeros(1, np.int32), y0=np.zeros(1, np.int32),
        x0=np.zeros(1, np.int32), heights=np.ones(1, np.int32),
        widths=np.ones(1, np.int32), roi_ids=np.zeros(1, np.int64),
        sample_idx=np.zeros(1, np.int32), n_valid=1,
    )
    shelf.recycle_windows(b)
    assert not any(shelf._WINDOW_POOL.values())


def _rois_to_block(rois, sample_idx=0):
    """Pack per-ROI tuples into one columnar RoiBlock (single flat base)."""
    from sykepic_tpu.ingest import pack

    ids = np.array([rid for _, rid, _ in rois], np.int64)
    hs = np.array([im.shape[0] for _, _, im in rois], np.int64)
    ws = np.array([im.shape[1] for _, _, im in rois], np.int64)
    base = np.concatenate([im.reshape(-1) for _, _, im in rois])
    sizes = hs * ws
    offs = np.zeros(len(rois), np.int64)
    np.cumsum(sizes[:-1], out=offs[1:])
    return pack.RoiBlock(sample_idx=sample_idx, roi_ids=ids, heights=hs,
                         widths=ws, offsets=offs, base=base)


def test_block_stream_matches_tuple_stream():
    """Columnar RoiBlock streaming must emit bit-identical dispatches to
    the per-ROI tuple stream: same windows bytes, placements, metadata,
    and modes — the block path is a pure host-CPU optimization. (Small
    stream: one final flush, so flush boundaries — which legitimately
    differ between per-ROI and per-block arrival — cannot diverge.)"""
    rng = np.random.default_rng(11)
    # oversized ROIs exercise the vectorized pre-shrink exception path
    rois = _rand_rois(80, rng, h_range=(4, 320), w_range=(4, 700))
    per_sample = {}
    for smp, rid, img in rois:
        per_sample.setdefault(smp, []).append((smp, rid, img))
    blocks = [_rois_to_block(v, smp) for smp, v in per_sample.items()]
    # tuple stream in the SAME arrival order as the blocks
    tuples = [t for smp in per_sample for t in per_sample[smp]]

    a = list(shelf.pack_shelves(iter(blocks), pre_shrink_to=(180, 180),
                                compute_modes=True))
    b = list(shelf.pack_shelves(iter(tuples), pre_shrink_to=(180, 180),
                                compute_modes=True))
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        assert ba.n_valid == bb.n_valid
        np.testing.assert_array_equal(ba.windows, bb.windows)
        for f in ("win_idx", "y0", "x0", "heights", "widths", "roi_ids",
                  "sample_idx", "modes"):
            np.testing.assert_array_equal(getattr(ba, f), getattr(bb, f), f)


def test_block_stream_content_lossless_across_flushes():
    """On a long mixed stream (many flushes, carries, oversized ROIs) the
    block path must still place every ROI exactly once with the same
    post-shrink pixels the tuple path would produce."""
    from sykepic_tpu.ingest import pack

    rng = np.random.default_rng(12)
    rois = _rand_rois(3000, rng, h_range=(4, 260), w_range=(4, 400))
    per_sample = {}
    for smp, rid, img in rois:
        per_sample.setdefault(smp, []).append((smp, rid, img))
    blocks = [_rois_to_block(v, smp) for smp, v in per_sample.items()]
    seen = {}
    for b in shelf.pack_shelves(iter(blocks), pre_shrink_to=(180, 180)):
        for s in range(b.n_valid):
            key = (int(b.sample_idx[s]), int(b.roi_ids[s]))
            assert key not in seen
            h, w = int(b.heights[s]), int(b.widths[s])
            y, x = int(b.y0[s]), int(b.x0[s])
            seen[key] = b.windows[int(b.win_idx[s]),
                                  y : y + h, x : x + w].copy()
    assert len(seen) == len(rois)
    for smp, rid, img in rois:
        expect = pack.pre_shrink(img, 180, 180)
        np.testing.assert_array_equal(seen[(smp, rid)], expect,
                                      err_msg=str((smp, rid)))


def test_block_stream_native_matches_python_fallback(monkeypatch):
    """The native columnar blit+modes pass and the NumPy fallback must
    produce identical windows and modes."""
    from sykepic_tpu.ingest import native

    if native.lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(13)
    rois = _rand_rois(500, rng)
    blocks = [_rois_to_block(rois)]
    fast = list(shelf.pack_shelves(iter(blocks), pre_shrink_to=(180, 180),
                                   compute_modes=True))
    monkeypatch.setattr(native, "shelf_blit_blocks",
                        lambda *a, **k: None)
    slow = list(shelf.pack_shelves(iter([_rois_to_block(rois)]),
                                   pre_shrink_to=(180, 180),
                                   compute_modes=True))
    assert len(fast) == len(slow)
    for ba, bb in zip(fast, slow):
        np.testing.assert_array_equal(ba.windows, bb.windows)
        np.testing.assert_array_equal(ba.modes, bb.modes)


def test_block_with_bad_geometry_raises():
    """A RoiBlock whose offsets point past its pixel buffer must fail
    loudly at append time, not segfault inside the native blit."""
    from sykepic_tpu.ingest import pack

    blk = pack.RoiBlock(
        sample_idx=0,
        roi_ids=np.array([1], np.int64),
        heights=np.array([64], np.int64),
        widths=np.array([64], np.int64),
        offsets=np.array([100], np.int64),
        base=np.zeros(64 * 64, np.uint8),  # 100 + 64*64 > size
    )
    with pytest.raises(ValueError, match="outside its pixel buffer"):
        list(shelf.pack_shelves(iter([blk]), pre_shrink_to=(180, 180)))


def test_roi_block_items_roundtrip():
    """RoiBlock.items() must reproduce the exact per-ROI views."""
    from sykepic_tpu.ingest import pack

    rng = np.random.default_rng(17)
    rois = _rand_rois(50, rng)
    blk = _rois_to_block(rois, sample_idx=3)
    out = list(pack.roi_items(iter([blk, (9, 99, rois[0][2])])))
    assert len(out) == 51
    for (smp, rid, img), (_, orig_rid, orig_img) in zip(out[:50], rois):
        assert smp == 3 and rid == orig_rid
        np.testing.assert_array_equal(img, orig_img)
    assert out[50][0] == 9 and out[50][1] == 99
