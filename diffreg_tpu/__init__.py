"""diffreg_tpu — TPU-native diffusion-based registration framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
wuqianliang/Diff-Reg (ECCV 2024): diffusion-based correspondence search in
doubly-stochastic matrix space for rigid 3D-3D, deformable 3D-3D, and 2D-3D
registration.

Design principles (see SURVEY.md §7):
  * static shapes everywhere — bucketed padding with sentinel indices
  * the DDIM reverse loop is a single ``lax.scan`` with Sinkhorn + batched
    on-device SVD fused into the scanned body (the reference round-trips to
    host CPU for the SVD at every step)
  * data parallel scaling via ``jax.sharding.Mesh`` + ``NamedSharding``;
    collectives are inserted by XLA
"""

__version__ = "0.1.0"
