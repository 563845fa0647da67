"""chadavit_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for channel-adaptive
self-supervised representation learning on heterogeneous microscopy images.

Re-designed from scratch with the capabilities of the ChAda-ViT reference
(nicoboou/chadavit, CVPR 2024, arXiv 2311.15264): a channel-adaptive ViT backbone,
DINO self-supervised pretraining, and a zoo of microscopy evaluation pipelines
(kNN / linear probe / regression / attention maps / UMAP) — built TPU-first:

- one pure, jit-compiled train step over a `jax.sharding.Mesh` (data / model axes)
- static dense shapes: `(B, C_max, H, W)` batches + per-image channel counts,
  analytic key-padding masks instead of ragged tensors
- Pallas kernels for the hot ops (masked flash attention over padded channel
  sequences, fused channel-adaptive tokenization)
- optax optimizers (incl. LARS), orbax checkpoints, C++-backed host data loading
"""

__version__ = "0.1.0"
