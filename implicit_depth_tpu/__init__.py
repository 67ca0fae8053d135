"""implicit_depth_tpu — a TPU-native (JAX/XLA/Pallas) implicit-depth framework.

A ground-up reimplementation of the capabilities of nianticlabs/implicit-depth
("Virtual Occlusions Through Implicit Depth", CVPR 2023) designed for TPU:

- pure-functional geometry / warping / volume kernels on NHWC pytrees,
- the plane-sweep warp expressed as closed-form per-(view, plane) homographies
  (no per-plane Python loops, no world-point megatensors),
- flax.linen models jitted end to end,
- SPMD via jax.sharding.Mesh + shard_map (data-parallel training,
  optional plane/view sharding),
- bf16 matmul policy with fp32 pose math.

The reference implementation (PyTorch/Lightning) is cited throughout as
/root/reference/<file>:<line> for behavioural parity checks.
"""

__version__ = "0.1.0"
