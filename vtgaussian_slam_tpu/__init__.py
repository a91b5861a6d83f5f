"""vtgaussian_slam_tpu — TPU-native (JAX/XLA/Pallas) rebuild of VTGaussian-SLAM.

A from-scratch online RGB-D SLAM framework that tracks camera poses and maps
scenes as view-tied 3D Gaussian sections, re-designed for TPU hardware:

- differentiable 3D Gaussian splatting rasterizer (EWA projection, tile
  binning, per-tile depth ordering, alpha compositing) built on XLA + Pallas
  (replaces the reference's external CUDA `diff-gaussian-rasterization`
  dependency, /root/reference/requirements.txt:19),
- jit-compiled tracking/mapping optimization loops (camera pose gradient
  descent with silhouette-masked photometric + depth losses),
- fixed-capacity, mask-padded Gaussian sections so jit signatures stay
  stable while densification grows the map,
- `jax.sharding.Mesh`-based scale-out of rasterization for sections that
  outgrow a single chip (parallel/).

Layout:
  ops/       — geometry, rasterizer, SSIM, image ops (pure JAX + Pallas)
  models/    — Gaussian section pytrees and section-store algebra
  core/      — SLAM engine: losses, tracking, mapping, selection, pipeline
  datasets/  — gradslam-style RGB-D loaders + synthetic scenes
  eval/      — PSNR/SSIM/LPIPS/depth/ATE metrics, eval_mode, TSDF mesh
  parallel/  — device-mesh sharding of the render/optimize path
  utils/     — seeding, persistence, config loading
"""

__version__ = "0.1.0"
