"""efficient_nerf_tpu: a TPU-native R2L / NeRF-distillation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
MingSun-Tse/Efficient-NeRF (R2L, ECCV'22): NeRF teacher training and
rendering, teacher->student pseudo-data distillation, the R2L neural light
field student, and the surrounding data/metrics/experiment tooling —
restructured for TPU hardware (static shapes, fused kernels, mesh
data-parallelism) rather than translated from the torch reference.
"""

__version__ = "0.1.0"
