"""sykepic-tpu: a TPU-native (JAX/XLA/Pallas) plankton image classification framework.

A ground-up rebuild of the capabilities of ``sykefi/syke-pic`` (IFCB plankton
image classification at SYKE Marine Research Centre), re-designed TPU-first:

- IFCB raw-binary ingest (``.adc``/``.roi``/``.hdr``) decodes straight to packed
  device tensors -- no PNG round trip (the reference materializes every ROI as a
  PNG on disk: ``sykepic/compute/probability.py:147-154``).
- Preprocessing (aspect-preserving resize, pad-to-square with mode-pixel border,
  normalization) runs batched on device as one fused XLA/Pallas program
  (reference: per-image OpenCV in DataLoader workers, ``sykepic/train/image.py``).
- The CNN classifier is a Flax ResNet compiled by XLA, with data-parallel
  sharding over a ``jax.sharding.Mesh`` for multi-chip scale-out.
- Training is a jit-compiled step with optax, replicating the reference's
  3-stage gradual-unfreezing LR warmup (``sykepic/train/network.py:75-130``).
- Post-processing (thresholded prediction, classification aggregation, size
  groups, abundance, class stats) is vectorized and keeps the reference's CSV
  contracts bit-for-bit.

Public subpackages mirror the reference's layer map (SURVEY.md section 1):

- :mod:`sykepic_tpu.utils`    -- logging, file layout helpers
- :mod:`sykepic_tpu.ingest`   -- IFCB raw decoding + ragged-ROI batching
  (:mod:`sykepic_tpu.ingest.native` holds the C++ hot-path helpers)
- :mod:`sykepic_tpu.ops`      -- device preprocessing / augmentation kernels
- :mod:`sykepic_tpu.models`   -- Flax CNN backbones + configurable head
- :mod:`sykepic_tpu.compute`  -- inference engine, feature extraction
  (:mod:`sykepic_tpu.compute.features`) and CSV post-processing pipelines
- :mod:`sykepic_tpu.train`    -- dataset handling, host input pipeline and
  the jit-compiled training loop
- :mod:`sykepic_tpu.analyze`  -- threshold evaluation, frequency, plotting
- :mod:`sykepic_tpu.parallel` -- mesh/sharding helpers
"""

__version__ = "0.1.0"
