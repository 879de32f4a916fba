"""vings_mono_tpu — a TPU-native (JAX/XLA/Pallas) monocular Gaussian-splatting
visual(-inertial) SLAM framework with the capabilities of VINGS-Mono.

Layer map (mirrors SURVEY.md of the reference, re-designed TPU-first):
  ops/       — SE3/quaternion math, projective geometry, dense BA, 2DGS Pallas
               rasterizer, correlation volumes, convex upsampling, SSIM
  models/    — learned nets in flax (DROID RAFT-GRU frontend, SuperPoint, ...)
  tracker/   — DBA-Fusion style dense-flow VIO frontend (ring-buffer state,
               covisible graph, IMU preintegration, sliding-window factor graph)
  mapper/    — online 2D Gaussian surfel map (capacity-capped state pytree,
               masked sparse-adam, score lifecycle, densify/prune, sky model)
  loop/      — loop closure (detection, PGO, Gaussian re-anchoring)
  storage/   — HBM <-> host paging of the Gaussian map by camera distance
  datasets/  — data loaders sharing the reference's data_packet contract
  runners/   — CLI entry points (run / run_tracking / run_mapping / ...)
  parallel/  — device-mesh sharding helpers (pjit/shard_map over ICI)
  utils/     — config, ply IO, visualization, profiling
"""

__version__ = "0.1.0"
