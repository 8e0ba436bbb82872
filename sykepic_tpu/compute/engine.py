"""The inference engine: model dir -> one fused jit program per bucket shape.

Replaces the reference's per-sample ``DataLoader`` + ``net_pass`` flow
(``sykepic/compute/probability.py:118-197``) with a device-resident path:

    packed uint8 canvas --H2D--> [resize+pad+normalize -> CNN -> temperature
    softmax] (single XLA program) --D2H--> per-ROI probability rows

The temperature hack is kept bit-for-bit: logits are multiplied by
``ln(1.3)`` before the softmax (``SOFTMAX_EXP``, reference
``probability.py:18,191-194``).

Recompilation is bounded by the canvas bucketing of
:mod:`sykepic_tpu.ingest.pack`: one compilation per (canvas shape, batch
size) pair, cached by jax.
"""

from __future__ import annotations

import math
import threading
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..ingest import pack
from ..models import checkpoint
from ..ops import preprocess
from ..train import config as train_config
from ..utils import logger, profiling

SOFTMAX_EXP = 1.3

# Async D2H pipeline depths: how many dispatched batches ride in flight
# before the oldest is drained. Tuned for the high-latency tunneled TPU this
# repo benches on: the link's bandwidth jitters second-to-second, and a
# deeper queue lets slow windows borrow from fast ones — an alternating
# A/B (2026-08-20, after the fixed-point D2H rows cut drain cost) had
# depth 12 beat depth 6 in every paired pass, median 17.2k vs 16.2k
# ROIs/s, for ~50 MB of extra in-flight host buffers (each undrained
# shelf batch pins its ~6.3 MB window tensor plus ~2 MB wire payload
# until _drain_block recycles them). On a local chip the
# optimum is smaller (2-3) — override via the env vars without code
# changes. The fused classify+features path carries two transfers per
# batch, so it saturates at a shallower depth.
import os as _os

from ..utils.depths import (  # single source shared with the shelf
    FUSED_PIPELINE_DEPTH,     # window pool (utils/depths.py): fused leg
    PIPELINE_DEPTH,           # is COMPUTE-bound, so depth buys little —
)                             # A/B 2026-08-20: depth 8 beat 4 by ~1.7%

log = logger.get_logger("engine")

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}

# D2H fixed-point compaction (SYKEPIC_D2H_COMPACT=off reverts): the
# DOWNLOAD direction of a tunneled link runs far below upload (~5 MB/s vs
# 30-45 MB/s measured), so a 2048-slot batch's f32 probability rows
# (50 classes x 4 B = 409 KB) cost ~75 ms of drain that the pipeline must
# hide behind a ~100 ms upload — on a slow-download day the drain, not the
# upload, bounds e2e throughput. The CSV contract only carries 5 decimals
# (ceil(log2(100001)) = 17 bits of information), so the device ships
# round(p * 1e5) as a uint16 low-word plane plus a packed overflow-bit
# plane (values > 65535, i.e. p > 0.65535) — ~2.16 B/value instead of 4,
# reconstructed exactly on the host. Reconstruction changes a printed 5th
# decimal only where device-f32 rint and host-double rounding of p*1e5
# disagree (sub-1e-5 events; every downstream contract tolerates >= 1e-4).


# 17-bit all-ones: unreachable for finite rows (clipped to <= 131070), so
# it round-trips non-finite device values back to NaN on the host
_NONFINITE_SENTINEL = (1 << 17) - 1


def _pack_probs_u16(p):
    """(B, C) f32 probabilities -> (B, C + ceil(C/16)) uint16 wire rows:
    columns [0, C) carry round(p*1e5) & 0xFFFF, the tail words pack the
    17th bit of each value, 16 classes per word (bit j of word w belongs
    to class w*16+j). Traced inside the inference programs."""
    n, c = p.shape
    # Non-finite probabilities (corrupt checkpoint, numeric blowup) must
    # stay LOUD: int-casting NaN/Inf is undefined in XLA and would launder
    # them into plausible-looking values. They map to the sentinel 131071
    # (impossible for a clipped finite value: 2^17 - 1), which the host
    # reconstructs as NaN — same visibility as the old f32 rows.
    finite = jnp.isfinite(p)
    safe = jnp.where(finite, jnp.clip(p, 0.0, 1.3107), 0.0)
    v = jnp.rint(safe * jnp.float32(1e5)).astype(jnp.int32)  # 0..131070
    v = jnp.where(finite, v, jnp.int32(_NONFINITE_SENTINEL))
    lo = (v & 0xFFFF).astype(jnp.uint16)
    nw = -(-c // 16)
    ovf = jnp.pad(v >> 16, ((0, 0), (0, nw * 16 - c)))  # 0/1 (v < 2^17)
    weights = jnp.left_shift(jnp.int32(1), jnp.arange(16, dtype=jnp.int32))
    bits = (ovf.reshape(n, nw, 16) * weights).sum(axis=-1).astype(jnp.uint16)
    return jnp.concatenate([lo, bits], axis=1)


def unpack_probs_u16(rows: np.ndarray, num_classes: int) -> np.ndarray:
    """Host inverse of :func:`_pack_probs_u16`: (B, C + ceil(C/16)) uint16
    -> (B, C) float32 probabilities. Exact: the reconstructed value is
    round(p*1e5) / 1e5 to within one f32 ulp, so re-rounding (the CSV
    formatter, threshold comparisons) recovers the device's integer."""
    c = num_classes
    lo = rows[:, :c].astype(np.int32)
    words = rows[:, c:]
    ovf = (words[:, :, None] >> np.arange(16, dtype=np.uint16)) & 1
    # explicit target shape: reshape(n, -1) cannot infer a dim on an
    # empty (0, nw) slice, and zero-valid batches do drain
    ovf = ovf.reshape(len(rows), words.shape[1] * 16)[:, :c].astype(np.int32)
    v = lo + (ovf << 16)
    out = v.astype(np.float32) * np.float32(1e-5)
    if (v >= _NONFINITE_SENTINEL).any():  # device saw NaN/Inf: stay loud
        out[v >= _NONFINITE_SENTINEL] = np.nan
    return out


class Classifier:
    """A loaded model directory, ready to classify packed ROI batches.

    Parameters
    ----------
    model_dir : path
        Directory with ``config.ini``, ``class_names.txt`` and
        ``best_state.msgpack`` (or a reference ``best_state.pth``).
    batch_size : int
        Device batch size (per bucket shape).
    dtype : str
        "float32" (reference-matching softmax CSVs; combine with
        ``SYKEPIC_D2H_COMPACT=off`` for bit-parity with a host-side f32
        formatter — the default fixed-point download can move a printed
        5th decimal by one unit) or "bfloat16" (max MXU throughput;
        probabilities differ in the last printed decimals).
    """

    def __init__(
        self,
        model_dir,
        batch_size: int = 256,
        dtype: str = "float32",
        buckets="auto",
        mesh=None,
    ):
        model_dir = Path(model_dir)
        if buckets == "auto":
            # None = dynamic fine grid (fewest host->device bytes; one
            # compile per observed shape — right when the link is the
            # bottleneck, e.g. a tunneled chip). SYKEPIC_BUCKETS=fixed
            # selects the bounded legacy list (15 shapes total): right on
            # a local chip where PCIe dwarfs the padding cost and compile
            # diversity is the tax that matters.
            mode = _os.environ.get("SYKEPIC_BUCKETS", "grid").lower()
            buckets = pack.DEFAULT_BUCKETS if mode == "fixed" else None
        self.model_dir = model_dir
        self.classes = checkpoint.read_class_names(model_dir)
        self.config = train_config.read_config(model_dir / "config.ini")
        self.spec = train_config.get_preprocess_spec(self.config)
        self.batch_size = batch_size
        self.buckets = buckets
        compute_dtype = _DTYPES[dtype]
        self.model, _ = train_config.get_network(
            self.config, len(self.classes), dtype=compute_dtype
        )
        # Multi-chip: with a Mesh, batches shard over its "data" axis and
        # weights replicate; XLA partitions the whole fused program (the
        # reference is hard-wired single-device, probability.py:127).
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import data_axis_size

            self._data_sharding = NamedSharding(mesh, P("data"))
            # the packed (10, R) slot-metadata array shards along R
            self._meta_sharding = NamedSharding(mesh, P(None, "data"))
            self._replicated = NamedSharding(mesh, P())
            n_data = data_axis_size(mesh)
            if batch_size % n_data != 0:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by the data "
                    f"mesh axis ({n_data})"
                )
            self._batch_multiple = n_data
        else:
            self._data_sharding = None
            self._meta_sharding = None
            self._replicated = None
            self._batch_multiple = 1
        # Device-resident weights: the checkpoint loads as host numpy; put it
        # on device ONCE here, or every infer call would re-upload ~45 MB of
        # parameters (catastrophic over a tunneled TPU: measured 1.8 s/batch
        # versus 40 ms with resident weights).
        variables = checkpoint.load_model_state(model_dir)
        if self._replicated is not None:
            from ..parallel import has_model_axis, shard_wide_kernels

            if has_model_axis(mesh):
                # tensor parallel: wide late-stage kernels shard over the
                # model axis, the rest of the tree replicates
                self.variables = {
                    "params": shard_wide_kernels(variables["params"], mesh),
                    **{
                        k: jax.device_put(v, self._replicated)
                        for k, v in variables.items()
                        if k != "params"
                    },
                }
            else:
                self.variables = jax.device_put(variables, self._replicated)
        else:
            self.variables = jax.device_put(variables)
        # Fixed-point D2H result rows (rationale at _pack_probs_u16): on
        # by default for the same reason as the wire codec — the stream
        # is link-bound whenever the chip is remote, and on a local chip
        # the ~2x smaller result rows still cost nothing. Must be decided
        # before the infer programs build: the packing is traced into them.
        self.d2h_compact = (
            _os.environ.get("SYKEPIC_D2H_COMPACT", "on").lower()
            not in ("off", "0", "no")
        )
        self._infer = self._build_infer()
        self._infer_shelf = self._build_infer_shelf()
        # Shelf packing ships ~16% fewer wire bytes on realistic mixes and
        # compiles a handful of programs instead of one per canvas shape
        # (ingest/shelf.py); "slots" remains for the fused feature path and
        # as an escape hatch (SYKEPIC_PACKING=slots).
        self.packing = _os.environ.get("SYKEPIC_PACKING", "shelf").lower()
        # Shelf dispatches size themselves by WINDOW BYTES (wire-optimal),
        # not batch_size — but batch_size still bounds the slot count when
        # raised above the 1024 floor, and shelf.SLOT_CAP hard-bounds the
        # per-dispatch device working set (~1 MB transient/slot: resize
        # weight+row tensors). The floor exists because tiny dispatches
        # cannot fill the link's bandwidth-delay product through the
        # 6-deep pipeline (1024 slots ~ 3.8 MB in flight each).
        from ..ingest import shelf as _shelf

        self._shelf_slot_cap = min(_shelf.SLOT_CAP, max(batch_size, 1024))
        # Lossless wire codec (ingest/wirecodec.py): ship 4-bit delta
        # planes + exception streams instead of raw windows and decode on
        # device (~1.5x fewer bytes on realistic mixes, bit-identical
        # probabilities). The e2e stream is link-bound wherever the chip
        # is remote, so this is on by default; SYKEPIC_WIRE_CODEC=off
        # reverts to raw windows (e.g. a local chip where host CPU is
        # scarcer than PCIe bandwidth). Per-dispatch payoff gating means
        # incompressible content ships raw either way.
        self.wire_codec = (
            _os.environ.get("SYKEPIC_WIRE_CODEC", "on").lower()
            not in ("off", "0", "no")
        )
        # per-stream accounting: dispatches shipped encoded vs raw
        # (payoff-gated per dispatch), exposed for bench.py and tests
        self.wire_stats = {"encoded": 0, "raw": 0}
        # _encode_wire runs on the metadata worker pool (several threads)
        self._wire_stats_lock = threading.Lock()
        # per-stage wall clocks, printed at stream end when SYKEPIC_PROFILE
        # is set (no-op stages otherwise)
        self.timer = profiling.StageTimer()

    def _build_infer(self):
        # Weights ride in the jit closure as device-resident captured
        # constants rather than call arguments: a Classifier's weights never
        # change, and dropping ~120 parameter leaves from every dispatch
        # saves ~5 ms/batch of host-side argument marshaling (measured
        # 31.6 vs 36.6 ms/batch end-to-end on the tunneled v5e).
        spec = self.spec
        model = self.model
        variables = self.variables
        # Pallas resize kernel on real accelerators; the einsum fallback on
        # CPU (pallas TPU kernels need interpret mode there, and the tests
        # cover both formulations producing identical values).
        use_pallas = jax.default_backend() != "cpu"
        compact = self.d2h_compact

        @partial(jax.jit, static_argnames=("target_h", "target_w"))
        def infer(canvas, heights, widths, new_h, new_w, pad_top,
                  pad_left, border, *, target_h, target_w):
            # canvas shape is static under trace: giant slots would not fit
            # the per-program VMEM working set, so they take the einsum path
            slot_ok = canvas.shape[1] * canvas.shape[2] <= 512 * 512
            x = preprocess.eval_preprocess(
                canvas, heights, widths, new_h, new_w, pad_top, pad_left,
                border,
                target_h=target_h,
                target_w=target_w,
                num_chans=spec.num_chans,
                # The reference appends ImageNet Normalize ONLY to the train
                # transform (config.py:52-56); its eval/inference pixels are
                # never normalized, so neither are ours (parity with
                # reference-trained checkpoints).
                imagenet_normalization=False,
                use_pallas=use_pallas and slot_ok,
            )
            # Keep XLA from fusing the gather-based resize into the first
            # conv (measured ~2x slower without the barrier on TPU).
            x = jax.lax.optimization_barrier(x)
            logits = model.apply(variables, x, train=False)
            # softmax temperature: logits * ln(1.3) (probability.py:191-194)
            probs = jax.nn.softmax(
                logits.astype(jnp.float32) * math.log(SOFTMAX_EXP), axis=-1
            )
            return _pack_probs_u16(probs) if compact else probs

        return infer

    def _build_infer_shelf(self):
        """The shelf-packed program: many ROIs share one (192, 512) window
        (:mod:`sykepic_tpu.ingest.shelf`), each extracted inside the resize
        einsum via its row/col origin. One compiled program per (padded
        window count, padded slot count) pair — a handful per stream,
        versus one per snapped canvas shape on the slot path."""
        spec = self.spec
        model = self.model
        variables = self.variables
        compact = self.d2h_compact

        @partial(jax.jit, static_argnames=("target_h", "target_w"))
        def infer_shelf(windows, meta, *, target_h, target_w):
            # meta is the (10, R) int32 slot-metadata pack (one host
            # upload instead of ten: each per-dispatch device_put held
            # the dispatch thread ~0.4 ms, measured in a profiled pass)
            (win_idx, y0, x0, heights, widths,
             new_h, new_w, pad_top, pad_left) = (meta[i] for i in range(9))
            border = meta[9].astype(jnp.uint8)
            # Per-slot window copy: a CONTIGUOUS row gather (whole 98 KB
            # windows), which this TPU handles at HBM speed — unlike
            # elementwise warps.
            slabs = jnp.take(windows, win_idx, axis=0)
            x = preprocess.eval_preprocess(
                slabs, heights, widths, new_h, new_w, pad_top, pad_left,
                border,
                target_h=target_h, target_w=target_w,
                num_chans=spec.num_chans,
                imagenet_normalization=False,  # parity: see _build_infer
                use_pallas=False,  # origins ride the einsum path only
                y_origin=y0, x_origin=x0,
            )
            x = jax.lax.optimization_barrier(x)
            logits = model.apply(variables, x, train=False)
            probs = jax.nn.softmax(
                logits.astype(jnp.float32) * math.log(SOFTMAX_EXP), axis=-1
            )
            return _pack_probs_u16(probs) if compact else probs

        return infer_shelf

    def _shelf_meta(self, batch):
        """Slot metadata for one shelf batch, packed as ONE (10, R) int32
        array (win_idx, y0, x0, heights, widths, new_h, new_w, pad_top,
        pad_left, border): a single host->device transfer per dispatch
        instead of ten. Built on the producer thread (host numpy).
        Padding slots are 1x1 zero ROIs and flow through harmlessly."""
        new_h, new_w, pad_top, pad_left = preprocess.compute_geometry(
            batch.heights, batch.widths, self.spec.target_h,
            self.spec.target_w
        )
        if self.spec.border == "mode":
            border = batch.modes
            if border is None:
                # a hand-built ShelfBatch (public dispatch_shelf) may lack
                # precomputed modes: recover them from the windows — the
                # engine's own producer always packs with compute_modes
                border = np.zeros(len(batch.heights), np.uint8)
                for i in range(batch.n_valid):
                    w, y, x = (int(batch.win_idx[i]), int(batch.y0[i]),
                               int(batch.x0[i]))
                    roi = batch.windows[
                        w, y : y + int(batch.heights[i]),
                        x : x + int(batch.widths[i])]
                    border[i] = pack.mode_pixel(roi)
        elif self.spec.border == "white":
            border = np.full(len(batch.heights), 255, np.uint8)
        elif self.spec.border == "black":
            border = np.zeros(len(batch.heights), np.uint8)
        else:
            # same loud rejection as the slot path's border_values — a
            # typo'd config must not silently classify with black fill
            raise ValueError(f"Unknown border mode: {self.spec.border}")
        return np.stack([
            np.asarray(batch.win_idx, np.int32),
            np.asarray(batch.y0, np.int32),
            np.asarray(batch.x0, np.int32),
            np.asarray(batch.heights, np.int32),
            np.asarray(batch.widths, np.int32),
            new_h, new_w, pad_top, pad_left,
            np.asarray(border, np.int32),
        ])

    def dispatch_shelf(self, batch, meta=None):
        """Start inference for one shelf batch without blocking."""
        if meta is None:
            meta = self._shelf_meta(batch)
        with self.timer.stage("device.dispatch"):
            if batch.wire is not None:
                windows = self._decode_wire(batch.wire)
            elif self._replicated is not None:
                windows = jax.device_put(batch.windows, self._replicated)
            else:
                windows = batch.windows
            return self._infer_shelf(
                windows, self._put_meta(meta),
                target_h=self.spec.target_h,
                target_w=self.spec.target_w,
            )

    def _prepared_shelf_batches(self, tagged_rois):
        """Shelf-pack ROIs and compute host metadata on a producer thread,
        yielding ``(batch, meta)`` ready to dispatch (same overlap rationale
        as :meth:`_prepared_batches`)."""
        from ..ingest import shelf

        gen = shelf.pack_shelves(
            tagged_rois,
            pre_shrink_to=(self.spec.target_h, self.spec.target_w),
            batch_multiple=self._batch_multiple,
            compute_modes=(self.spec.border == "mode"),
            slot_cap=self._shelf_slot_cap,
        )

        def meta_fn(batch):
            if self.wire_codec:
                # encode on the producer thread so it overlaps the link
                # like the rest of the host work ("host.meta" includes
                # this stage's time)
                self._encode_wire(batch)
            return self._shelf_meta(batch)

        return self._produce_on_thread(gen, meta_fn, "sykepic-shelf")

    def _produce_on_thread(self, gen, meta_fn, name: str,
                           workers: int | None = None):
        """Run a batch generator and its metadata pass off the dispatch
        thread, yielding ``(batch, meta)`` in generator order; exceptions
        relay to the consumer, and abandoning the iterator cancels the
        producers. The dispatch thread spends most of its time inside
        device transfers (GIL released), so this overlaps decode/pack/
        metadata host work with the link instead of serializing it
        (measured 136 us/ROI of metadata work inline — a ~7 kROI/s
        ceiling all by itself on the bench mix).

        With spare cores, the two host stages ALSO pipeline with each
        other (each alone is a ceiling: decode+pack ~50 us/ROI, wire
        encode + geometry ~55 us/ROI serialized on one thread):

        - decode+pack stays sequential on one thread (the packer is a
          stateful stream);
        - ``meta_fn`` (wire encode + resize geometry; batch-independent)
          fans out to a small pool, order preserved by enqueuing futures.

        The native encoder and NumPy release the GIL, so the stages
        genuinely overlap. On a host with <3 cores the pool is pure
        context-switch overhead (measured 7.4k -> 4.6k ROIs/s producer
        throughput on a 1-core host), so ``workers`` defaults to 0 there
        and ``meta_fn`` runs inline on the packing thread."""
        import os
        import queue
        import threading
        from concurrent.futures import ThreadPoolExecutor

        if workers is None:
            workers = 2 if (os.cpu_count() or 1) >= 3 else 0

        q: queue.Queue = queue.Queue(maxsize=max(2 * workers, 4))
        done = object()
        cancel = threading.Event()  # set when the consumer goes away
        pool = (ThreadPoolExecutor(max_workers=workers,
                                   thread_name_prefix=f"{name}-meta")
                if workers else None)

        def offer(item) -> bool:
            while not cancel.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def stage2(batch):
            with self.timer.stage("host.meta"):
                return batch, meta_fn(batch)

        def produce():
            try:
                while True:
                    with self.timer.stage("host.decode+pack"):
                        batch = next(gen, None)
                    if batch is None:
                        break
                    # submit-then-offer: the bounded queue is the
                    # backpressure (at most ~2*workers batches beyond the
                    # one packing are in memory)
                    item = pool.submit(stage2, batch) if pool else \
                        stage2(batch)
                    if not offer(item):
                        return
            except BaseException as e:  # re-raised on the consumer side
                offer(e)
                return
            offer(done)

        threading.Thread(target=produce, daemon=True, name=name).start()
        try:
            while True:
                item = q.get()
                if item is done:
                    return
                if isinstance(item, BaseException):
                    raise item
                # stage2 exceptions re-raise out of .result()
                yield item.result() if pool else item
        finally:
            cancel.set()  # unblock the producer if we exit early
            if pool:
                pool.shutdown(wait=False, cancel_futures=True)

    def _put(self, a):
        """Commit a batch array: sharded over the data mesh axis when one
        exists, host pass-through otherwise (jit transfers it). Keeping one
        placement per path keeps ONE compiled program per bucket shape."""
        if self._data_sharding is not None:
            return jax.device_put(a, self._data_sharding)
        return a

    def _put_meta(self, m):
        """Commit the packed (10, R) slot-metadata array (R shards over
        the data axis when a mesh exists)."""
        if self._meta_sharding is not None:
            return jax.device_put(m, self._meta_sharding)
        return m

    def _encode_wire(self, batch):
        """Producer-thread half of the wire codec: encode the pixel tensor
        (windows or canvas) when it pays; records the per-stream stats."""
        from ..ingest import wirecodec

        pixels = (batch.windows if hasattr(batch, "windows")
                  else batch.canvas)
        with self.timer.stage("host.encode"):
            batch.wire = wirecodec.encode(pixels)
        with self._wire_stats_lock:
            self.wire_stats[
                "encoded" if batch.wire is not None else "raw"] += 1

    def _decode_wire(self, payload):
        """Device half: payload -> decoded uint8 pixel tensor, placed like
        a replicated weight when a mesh exists."""
        from ..ops import wiredecode

        put = (
            (lambda a: jax.device_put(a, self._replicated))
            if self._replicated is not None else jax.device_put
        )
        return wiredecode.decode(payload, put=put)

    def _host_meta(self, batch: pack.PackedBatch):
        """Resize geometry + border fill for one packed batch (host numpy).
        Cheap when the packer pre-computed per-ROI modes; otherwise falls
        back to a histogram pass over the padded canvas."""
        new_h, new_w, pad_top, pad_left = preprocess.compute_geometry(
            batch.heights, batch.widths, self.spec.target_h, self.spec.target_w
        )
        if batch.modes is not None and self.spec.border == "mode":
            border = batch.modes
        else:
            border = preprocess.border_values(
                batch.canvas, batch.heights, batch.widths, self.spec.border
            )
        return new_h, new_w, pad_top, pad_left, border

    def dispatch_packed(self, batch: pack.PackedBatch, meta=None):
        """Start inference for one packed batch; returns the on-device
        result WITHOUT blocking (jax dispatch is asynchronous, so host
        packing of the next batch overlaps device compute)."""
        if meta is None:
            meta = self._host_meta(batch)
        new_h, new_w, pad_top, pad_left, border = meta
        with self.timer.stage("device.dispatch"):
            canvas = (self._decode_wire(batch.wire)
                      if batch.wire is not None
                      else self._put(batch.canvas))
            args = tuple(
                self._put(a)
                for a in (
                    batch.heights, batch.widths,
                    new_h, new_w, pad_top, pad_left, border,
                )
            )
            return self._infer(
                canvas, *args,
                target_h=self.spec.target_h,
                target_w=self.spec.target_w,
            )

    def infer_packed(self, batch: pack.PackedBatch) -> np.ndarray:
        """Class probabilities for one packed batch: (B, num_classes)."""
        return self.result_probs(self.dispatch_packed(batch))

    def result_probs(self, device_result, n: int | None = None) -> np.ndarray:
        """Materialize a :meth:`dispatch_packed`/:meth:`dispatch_shelf`
        result to (B, num_classes) float32 probabilities — the device rows
        are fixed-point uint16 when ``d2h_compact`` is on (the default;
        see :func:`_pack_probs_u16`). With ``n`` only the first n rows are
        decoded (padding slots never pay the host-side unpack)."""
        rows = np.asarray(device_result)
        if n is not None:
            rows = rows[:n]
        if self.d2h_compact:
            return unpack_probs_u16(rows, len(self.classes))
        return rows

    def onchip_rate(self, tagged_rois, repeats: int = 4,
                    max_batches: int = 32):
        """ROIs/s of the compiled inference programs ALONE, wire excluded.

        Packs the stream exactly like :meth:`classify_rois` (same
        pre-shrink, same tail handling), makes every batch's arguments
        device-resident first, then dispatches all programs back-to-back
        ``repeats`` times and drains once at the end. Device execution is
        serial and program-launch latency over even a tunneled link is
        negligible (measured 32 chained calls = 0.05 s), so the wall
        clock is device compute — the throughput ceiling a production
        chip with a local PCIe/HBM feed approaches when the link is no
        longer the bottleneck. Returns ``(n_rois, seconds_per_pass)``.

        Every batch stays device-RESIDENT for the probe's duration, so the
        stream is capped at ``max_batches`` dispatches (~6 MB of windows
        each) — a sample of the workload, not an unbounded archive walk.
        """
        import itertools
        import time

        def put(a):
            return (self._put(a) if self._data_sharding is not None
                    else jax.device_put(a))

        args_list = []
        n_rois = 0
        if self.packing == "shelf":
            fn = self._infer_shelf
            for batch, meta in itertools.islice(
                self._prepared_shelf_batches(tagged_rois), max_batches
            ):
                windows = (
                    jax.device_put(batch.windows, self._replicated)
                    if self._replicated is not None
                    else jax.device_put(batch.windows)
                )
                m = (self._put_meta(meta) if self._meta_sharding is not None
                     else jax.device_put(meta))
                args_list.append((windows, m))
                n_rois += batch.n_valid
        else:
            fn = self._infer
            for batch, meta in itertools.islice(
                self._prepared_batches(
                    tagged_rois,
                    pre_shrink_to=(self.spec.target_h, self.spec.target_w),
                ),
                max_batches,
            ):
                new_h, new_w, pad_top, pad_left, border = meta
                args_list.append(tuple(put(a) for a in (
                    batch.canvas, batch.heights, batch.widths,
                    new_h, new_w, pad_top, pad_left, border)))
                n_rois += batch.n_valid
        kw = dict(target_h=self.spec.target_h, target_w=self.spec.target_w)
        # warm pass: compiles (if any are cold) + buffer warmup, untimed
        out = None
        for args in args_list:
            out = fn(*args, **kw)
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(repeats):
            for args in args_list:
                out = fn(*args, **kw)
        np.asarray(out)  # serial device queue: one drain bounds them all
        return n_rois, (time.perf_counter() - t0) / max(repeats, 1)

    def precompile(self, canvas_shapes, fused: bool = False) -> int:
        """Force-compile the inference program for each shape key by
        dispatching an all-zeros batch: ``(B, Hc, Wc)`` canvas shapes for
        the slot path, ``(n_windows, n_slots)`` pairs for the shelf path.
        With ``fused`` the on-device feature program is warmed too (the
        pipeline/watch path). Compiles land in BOTH the process jit cache
        and the persistent disk cache, so latency-sensitive or timed
        processing afterwards never stalls on a mid-stream compile
        (~10-30 s per shape over a tunneled TPU)."""
        from ..ingest import shelf

        results = []
        # Shelf keys snap onto the same ladders pack_shelves emits on —
        # warming an off-ladder (nc, r) would compile a program the
        # runtime never dispatches and leave the real shape cold.
        slot_ceil = shelf.floor_slots(self._shelf_slot_cap,
                                      self._batch_multiple)
        keys = {
            (shelf.pad_nc(k[0]),
             min(shelf.pad_slots(k[1], self._batch_multiple), slot_ceil))
            if len(k) == 2 else k
            for k in canvas_shapes
        }
        for key in sorted(keys):
            if len(key) == 2:  # shelf program: (window count, slot count)
                nc, r = key
                sbatch = shelf.ShelfBatch(
                    windows=np.zeros((nc, shelf.WIN_H, shelf.WIN_W),
                                     np.uint8),
                    win_idx=np.zeros(r, np.int32),
                    y0=np.zeros(r, np.int32),
                    x0=np.zeros(r, np.int32),
                    heights=np.ones(r, np.int32),
                    widths=np.ones(r, np.int32),
                    roi_ids=np.zeros(r, np.int64),
                    sample_idx=np.zeros(r, np.int32),
                    n_valid=0,
                    modes=np.zeros(r, np.uint8),
                )
                if self.wire_codec:
                    # warm the decode programs for this window count too
                    # (unpack/finalize compile per nc; one nonzero pixel
                    # forces a one-chunk exception stream so the chained
                    # scatter program also compiles)
                    from ..ingest import wirecodec

                    wired = np.zeros((nc, shelf.WIN_H, shelf.WIN_W),
                                     np.uint8)
                    wired[0, 0, 0] = 200
                    sbatch.wire = wirecodec.encode(wired, force=True)
                results.append(self.dispatch_shelf(sbatch))
                continue
            b, hc, wc = key
            batch = pack.PackedBatch(
                canvas=np.zeros((b, hc, wc), np.uint8),
                heights=np.ones(b, np.int32),
                widths=np.ones(b, np.int32),
                roi_ids=np.zeros(b, np.int64),
                sample_idx=np.zeros(b, np.int32),
                n_valid=0,
                modes=np.zeros(b, np.uint8),
            )
            if self.wire_codec and self._data_sharding is None:
                from ..ingest import wirecodec

                wired = np.zeros((b, hc, wc), np.uint8)
                wired[0, 0, 0] = 200  # force one exception chunk (see shelf)
                batch.wire = wirecodec.encode(wired, force=True)
            results.append(self.dispatch_packed(batch))
            if fused:
                from ..ops import features_device

                results.append(features_device.device_features(
                    self._put(batch.canvas), self._put(batch.heights),
                    self._put(batch.widths),
                ))
        for r in results:
            np.asarray(r)  # drain: compilation + first execution done
        return len(results)

    def _prepared_batches(self, tagged_rois, pre_shrink_to=None,
                          consolidate_tails=True):
        """Pack ROIs and compute host metadata on a producer thread,
        yielding ``(batch, meta)`` ready to dispatch (overlap rationale in
        :meth:`_produce_on_thread`)."""
        gen = pack.pack_rois(
            # the slot packer works per ROI; columnar RoiBlocks unwrap here
            pack.roi_items(tagged_rois), batch_size=self.batch_size,
            buckets=self.buckets,
            batch_multiple=self._batch_multiple,
            pre_shrink_to=pre_shrink_to,
            compute_modes=(self.spec.border == "mode"),
            consolidate_tails=consolidate_tails,
        )

        def meta_fn(batch):
            # slot canvases are DATA-sharded over a mesh (dispatch_packed's
            # _put); the decoded tensor would come out replicated instead,
            # so the codec covers the slot path only without a mesh. The
            # shelf path replicates its windows either way and keeps the
            # codec on both.
            if self.wire_codec and self._data_sharding is None:
                self._encode_wire(batch)
            return self._host_meta(batch)

        return self._produce_on_thread(gen, meta_fn, "sykepic-pack")

    def classify_blocks(self, tagged_rois):
        """Classify an iterable of ``(sample_idx, roi_id, uint8 image)``,
        yielding per-batch blocks ``(sample_idx (n,), roi_ids (n,),
        probs (n, C))`` of numpy arrays — the high-throughput consumer
        surface (per-ROI Python tuples cost ~5 us each; a 2048-slot batch
        drains in three array slices instead).

        ROIs from different samples may share device batches; ordering is
        not guaranteed (sort per sample before writing CSVs).

        Pipelined: up to ``PIPELINE_DEPTH`` (default 12) batches stay in
        flight, and every result's
        device->host copy is started asynchronously the moment it is
        dispatched (``copy_to_host_async``), so by drain time the bytes are
        already local. Measured on the tunneled v5e: 37 ms/batch versus
        425 ms/batch with synchronous drains — the blocking D2H round trip
        was serializing the whole pipeline. Result rows ride as uint16
        fixed-point (~108 B/ROI instead of 200 at 50 classes, see
        ``_pack_probs_u16``) because the download direction runs ~5 MB/s
        on this tunnel — f32 rows cost ~75 ms/batch of drain, within
        range of the ~100 ms upload they must hide behind.
        """
        from collections import deque

        if self.packing == "shelf":
            prepared = self._prepared_shelf_batches(tagged_rois)
            dispatch = self.dispatch_shelf
        else:
            prepared = self._prepared_batches(
                tagged_rois,
                # oversized ROIs downsample on the host (the device would
                # downsample them anyway): up to ~8x fewer bytes over the
                # link. The fused features path below must NOT do this (its
                # area / biovolume outputs are in original pixel units).
                pre_shrink_to=(self.spec.target_h, self.spec.target_w),
            )
            dispatch = self.dispatch_packed
        from concurrent.futures import ThreadPoolExecutor

        # Drains run on their own thread: np.asarray of a result blocks on
        # the device->host copy (~75 ms/batch measured over the tunnel —
        # the download direction runs ~5 MB/s), and inline it serialized
        # with the UPLOAD-bound dispatch call on the same thread. One
        # worker keeps completion order; numpy releases the GIL during
        # the copy, so drains genuinely overlap the next dispatch.
        drainer = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="sykepic-drain"
        )
        in_flight: deque = deque()
        try:
            for batch, meta in prepared:
                device_probs = dispatch(batch, meta)
                try:
                    device_probs.copy_to_host_async()
                except AttributeError:  # pragma: no cover - older jax
                    pass
                in_flight.append(
                    drainer.submit(self._drain_block, batch, device_probs))
                if len(in_flight) >= PIPELINE_DEPTH:
                    yield in_flight.popleft().result()
            while in_flight:
                yield in_flight.popleft().result()
        finally:
            drainer.shutdown(wait=False, cancel_futures=True)
        self.timer.report()

    def classify_rois(self, tagged_rois):
        """Per-ROI adapter over :meth:`classify_blocks`: yields
        ``(sample_idx, roi_id, probs_row)`` for every real ROI."""
        for sidx, rids, probs in self.classify_blocks(tagged_rois):
            for i in range(len(rids)):
                yield int(sidx[i]), int(rids[i]), probs[i]

    def _drain_block(self, batch, device_probs):
        # batch is a pack.PackedBatch or a shelf.ShelfBatch — both carry
        # sample_idx / roi_ids / n_valid
        n = batch.n_valid
        with self.timer.stage("device.drain"):
            probs = self.result_probs(device_probs, n=n)
        out = (
            np.asarray(batch.sample_idx[:n]),
            np.asarray(batch.roi_ids[:n]),
            probs,
        )
        # the device result for this dispatch has arrived, so its upload
        # (raw windows or encoded payload) is long done: multi-MB host
        # buffers go back to their pools instead of paying fresh-page
        # faults every dispatch (shelf.py / wirecodec.py)
        if batch.wire is not None:
            from ..ingest import wirecodec as _wc

            _wc.recycle_payload(batch.wire)
            batch.wire = None
        if hasattr(batch, "win_idx"):
            from ..ingest import shelf as _shelf

            _shelf.recycle_windows(batch)
        return out

    def classify_and_feature_rois(self, tagged_rois):
        """Fully on-chip fused pass: each packed batch runs classification
        AND geometry feature extraction (area / biovolume / axes, see
        :mod:`sykepic_tpu.ops.features_device`) on device, sharing one
        canvas upload. Yields ``(sample_idx, roi_id, probs_row,
        (area, biovolume_px, major, minor))``.
        """
        from collections import deque

        from ..ops import features_device

        in_flight: deque = deque()

        def drain(batch, device_probs, device_feats):
            with self.timer.stage("device.drain"):
                probs = self.result_probs(device_probs, n=batch.n_valid)
                feats = np.asarray(device_feats)  # (B, 4): area/biovol/axes
            if batch.wire is not None:  # upload done: pool the payload
                from ..ingest import wirecodec as _wc

                _wc.recycle_payload(batch.wire)
                batch.wire = None
            for i in range(batch.n_valid):
                yield (
                    int(batch.sample_idx[i]),
                    int(batch.roi_ids[i]),
                    probs[i],
                    tuple(float(v) for v in feats[i]),
                )

        # consolidate_tails=False: migrating a tail ROI to a bigger canvas
        # changes its FFT window and therefore its device FEATURE values
        # (pack.pack_rois docstring) — the fused path keeps windows stable
        # so features do not depend on mesh size or stream composition
        for batch, meta in self._prepared_batches(tagged_rois,
                                                  consolidate_tails=False):
            # metadata from the producer thread, canvas uploaded ONCE and
            # shared by both device programs
            new_h, new_w, pad_top, pad_left, border = meta
            with self.timer.stage("device.dispatch"):
                # decoded ONCE on device, shared by both programs (the
                # codec is bit-exact, so device features are unchanged)
                canvas = (self._decode_wire(batch.wire)
                          if batch.wire is not None
                          else self._put(batch.canvas))
                heights = self._put(batch.heights)
                widths = self._put(batch.widths)
                device_probs = self._infer(
                    canvas, heights, widths,
                    self._put(new_h), self._put(new_w),
                    self._put(pad_top), self._put(pad_left),
                    self._put(border),
                    target_h=self.spec.target_h, target_w=self.spec.target_w,
                )
                device_feats = features_device.device_features(
                    canvas, heights, widths
                )
            try:
                device_probs.copy_to_host_async()
                device_feats.copy_to_host_async()
            except AttributeError:  # pragma: no cover - older jax
                pass
            in_flight.append((batch, device_probs, device_feats))
            if len(in_flight) >= FUSED_PIPELINE_DEPTH:
                yield from drain(*in_flight.popleft())
        while in_flight:
            yield from drain(*in_flight.popleft())
        self.timer.report()
