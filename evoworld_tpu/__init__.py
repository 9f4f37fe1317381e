"""EvoWorld-TPU: TPU-native panoramic world generation with explicit 3D memory.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
JiahaoPlus/EvoWorld (arXiv 2510.01183): SVD-style panoramic video diffusion
conditioned on Pluecker camera-ray embeddings and rendered 3D-memory panoramas,
with a feed-forward reconstruction loop (VGGT-style) that evolves an explicit
point-cloud memory across generated clips.

Layer map (bottom-up):
  geometry/   pure-JAX camera & spherical geometry (rays, Pluecker, poses, resampling)
  ops/        Pallas/XLA kernels (flash attention, z-buffer splatting, resize)
  models/     Flax modules: spatio-temporal UNet, temporal VAE, CLIP vision, VGGT
  diffusion/  Euler/Karras scheduler, EDM preconditioning, jitted denoise pipeline
  memory/     explicit 3D memory: point filtering, alignment, splat rendering
  loop/       navigator + unified evolving-memory loop
  data/       episode dataset + pose file IO
  train/      sharded EDM fine-tuning step, checkpointing
  eval/       PSNR/SSIM/LPIPS/FVD metric harness
  parallel/   device mesh + sharding rules
"""

__version__ = "0.1.0"
