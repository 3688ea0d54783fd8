"""E3DGE-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
NIRVANALAN/CVPR23-E3DGE (self-supervised geometry-aware encoder for style-based
3D GAN inversion).

This is NOT a port of the reference CUDA/PyTorch code. The compute path is pure
functional JAX compiled by XLA onto the TPU MXU/VPU, the hot ray-marching loop has a
fused Pallas kernel, parallelism is expressed as `jax.sharding` over a device mesh
(data-parallel by default), and data-dependent host work (marching cubes, image IO)
lives behind the jitted core (with a native C++ marching-cubes extension).

Layer map (mirrors SURVEY.md §1 of the reference):
  ops/        L0  resampling / activation / sampling primitives (XLA + Pallas)
  models/     L1-L3  SIREN volume generator, StyleGAN2 decoder, discriminators,
              FPN encoder (E0), PIFu local branch (E1), alignment & fusion
  render/     L1b camera math, ray generation, volume integration
  parallel/   §2.2 mesh construction, sharded train/eval steps (pjit/shard_map)
  training/   L4-L5 losses, GAN-as-dataset sampler, stage runners
  utils/      L7-L8 config system, checkpoint ingestion, mesh export, metrics
  native/     C++ runtime pieces (marching cubes) bound via ctypes
"""

__version__ = "0.1.0"
