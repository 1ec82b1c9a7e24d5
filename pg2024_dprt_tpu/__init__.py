"""pg2024_dprt_tpu — TPU-native data-parallel wavefront path tracer.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`Oujidejihe/PG2024-Data-Parallel-Ray-Tracing` (reference mounted read-only at
/root/reference): a distributed wavefront path tracer for scenes partitioned
across devices, where rays migrate between geometry partitions via on-device
collectives and cross-partition visibility/depth for shadow and secondary rays
is predicted by learned neural proxies instead of being traced remotely.

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):
  core/      — SoA path state, bit-exact TEA/LCG RNG, camera, math
  scene/     — scene description, BVH build, partitioner, lights, textures
  ops/       — Pallas + XLA device kernels (traversal, compaction, MLP)
  render/    — wavefront engine: bounce loop, shading, NEE, accumulation
  parallel/  — device mesh, shard_map wavefront migration, psum reduce
  models/    — neural proxy MLP zoo (vis + depth networks)
  train/     — proxy training: data generation, loaders, loop, checkpoints
  utils/     — EXR/PNG IO, timing sections, config
"""

__version__ = "0.1.0"
