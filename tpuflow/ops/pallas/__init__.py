"""Pallas TPU kernels for the hot path, with pure-jnp twins in tpuflow.ops.

The headline kernel is the fused VMEM-resident relaxation
(tpuflow.ops.pallas.relax): the reference launches outer*inner (default 200)
separate CUDA kernels per level with a host sync after every sweep
(reference: cuda_operation_solve_2d.cpp:238-300); here the ENTIRE relaxation
for a level runs inside ONE kernel with every field held in VMEM — zero HBM
traffic between sweeps.
"""

from tpuflow.ops.pallas.relax import relax_fused, relax_supported  # noqa: F401
