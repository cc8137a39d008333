"""Distributed execution: device meshes, sharded pipelines, halo exchange.

The reference is strictly single-GPU (one context on device 0,
reference: src/main.cpp:51-54, src/utils/cuda_utils.cpp:43); everything in
this package is new TPU-native design per SURVEY.md §2.7:

  * data parallelism — a batch axis over independent frame pairs;
  * spatial parallelism — each pyramid level's rows sharded over the mesh,
    with the 1-px stencil halos exchanged via XLA collectives (GSPMD
    partitions the shift-and-pad stencils automatically; the explicit
    shard_map + ppermute path is used by the Pallas kernels);
  * replicate-below-threshold — coarse levels smaller than the mesh run
    replicated instead of sharded.
"""

from tpuflow.parallel.mesh import make_mesh  # noqa: F401
from tpuflow.parallel.batch import compute_flow_batched  # noqa: F401
