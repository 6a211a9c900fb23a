"""syn3r_tpu — a TPU-native (JAX/XLA/Pallas/pjit) novel-view-synthesis framework.

Re-designed from scratch with the capabilities of DecaYale/SYN3R ("Novel View
Synthesis from A Few Glimpses via Test-Time Natural Video Completion",
NeurIPS 2025): test-time optimization alternating 3D Gaussian Splatting with
guided Stable-Video-Diffusion video completion.

Layers (bottom-up):
  utils/     — SE(3)/quaternion math, cameras, COLMAP I/O, image metrics.
  ops/       — compute kernels: warping, grid-sample, KNN, the Pallas
               confidence Gaussian rasterizer, flash attention.
  models/    — Flax modules: Gaussian state, SVD spatio-temporal UNet,
               temporal-decoder VAE, CLIP image encoder, DUSt3R, GMFlow.
  gs/        — the 3DGS test-time trainer (losses, densification, checkpoints).
  diffusion/ — guided Euler scheduler + two-pass uncertainty-guided sampler.
  pipeline/  — the refine-cycle orchestrator (DiffusionGS.run equivalent).
  parallel/  — device meshes, shardings, scene-parallel fleet runner.
  cli/       — train / render / metrics / pcd entry points.
"""

__version__ = "0.1.0"
