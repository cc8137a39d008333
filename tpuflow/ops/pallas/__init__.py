"""Pallas TPU kernels for the hot path, with pure-jnp twins in tpuflow.ops.

The headline kernel is the fused VMEM-resident relaxation
(tpuflow.ops.pallas.relax_bucket): the reference launches outer*inner
(default 200) separate CUDA kernels per level with a host sync after every
sweep (reference: cuda_operation_solve_2d.cpp:238-300); here the ENTIRE
relaxation for a level runs inside ONE kernel with every field held in
VMEM — zero HBM traffic between sweeps.

A static-shape per-level variant (one Mosaic program per level shape) was
built and measured in round 1 and then deleted: it compiled ~46 Mosaic
programs (minutes of cold start on remote-compile backends) and ran no
faster than the XLA scan path, because the tiny coarse levels are
dispatch-floor-bound, not compute-bound. Its surviving lessons live in the
bucket kernel: chunk row loops must step in 8-aligned strides (Mosaic
rejects unprovably-aligned dynamic sublane offsets), unrolled bodies do
not share stack slots (keep loop bodies as fori_loop), and ~16 MB of VMEM
caps the per-field working set.
"""

from tpuflow.ops.pallas.relax_bucket import (  # noqa: F401
    relax_bucket_fused,
    relax_bucket_supported,
)
