"""peanut_tpu — a TPU-native ObjectNav framework (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of ajzhai/PEANUT (ICCV 2023):
RGB-D instance segmentation -> incremental allocentric semantic mapping ->
unseen-target probability prediction -> geodesic value-weighted goal
selection -> fast-marching local planning, plus the training framework for
the target-prediction network.

Layering (bottom-up):
  geometry/   pure-jnp camera + pose math
  kernels/    TPU compute kernels: voxel splat, grid-sample warp, morphology,
              fast-sweeping eikonal distance (FMM replacement)
  mapping/    fused per-step semantic map update
  models/     registry-driven model zoo (ResNet v1c, PSP/FCN heads, Mask R-CNN)
  perception/ segmentation wrapper + depth preprocessing
  prediction/ target-prediction model: inference + training pipeline
  planning/   FMM planner, short-term goal, collision/untrap state machines
  agent/      agent state + facade (batched over parallel episodes)
  envs/       host-side environment adapters (habitat optional)
  core/       mesh/sharding, checkpointing (.pth import, orbax), profiling
"""

__version__ = "0.1.0"
