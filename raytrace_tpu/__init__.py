"""raytrace_tpu — a TPU-native differentiable photon-mapping renderer in JAX.

A from-scratch reimplementation of the capabilities of wjzhou/cuda-raytrace
(an OptiX 3.0 progressive photon mapper plugged into pbrt-v2), redesigned for
TPU: SoA scene pytrees instead of an OptiX node graph, wavefront `lax` loops
instead of device-side recursion, a spatially-hashed photon grid instead of a
CPU-built kd-tree, and `shard_map` over a device mesh instead of a single GPU.

Layer map (mirrors SURVEY.md §1, reimagined):
  core/       geometry + spectrum + sampling + RNG + typed config
  scene/      scene pytree (SoA), python builder, pbrt-file ingestion, camera
  ops/        intersection (brute-force + BVH + Pallas), photon hash grid
  shading/    BSDFs and lights (batched, differentiable)
  renderers/  "simple" direct-light renderer and the photon-mapping renderer
  parallel/   device-mesh sharding of rays and photon waves
  utils/      film, image IO, logging
"""

__version__ = "0.2.0"

from raytrace_tpu.scene.pbrt import load_pbrt, loads_pbrt  # noqa: F401,E402
