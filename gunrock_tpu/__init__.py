"""gunrock_tpu — a TPU-native graph analytics framework.

A brand-new, TPU-first implementation of the data-centric bulk-synchronous
frontier programming model popularized by Gunrock (gunrock/gunrock
"Essentials", see /root/reference): advance / filter / parallel-for /
uniquify operators over CSR/CSC/COO graphs, driving BFS, SSSP, PageRank,
betweenness centrality, graph coloring, k-core, triangle counting, MST, PPR,
HITS, geolocation, SpMV and SpGEMM.

Unlike the CUDA/HIP reference, the design is idiomatic JAX/XLA:

- convergence loops compile into single `jax.lax.while_loop` XLA programs
  (eliminating the reference's host<->device round trip per BSP iteration,
  reference framework/enactor.hxx:243-288),
- per-edge lambdas become pure map + segmented reductions (replacing CUDA
  atomics, deterministic by construction),
- frontiers are dense vertex masks or fixed-capacity padded queues with an
  invalid sentinel (the reference's own design, util/type_limits.hxx:16-71,
  is already XLA-shaped),
- batch parallelism (BC all-sources, PPR multi-seed) is `jax.vmap`,
- scaling past one chip uses an edge-partitioned graph over a
  `jax.sharding.Mesh` with `shard_map` + ICI collectives.

Layout (mirrors the reference's layer map, SURVEY.md section 1):

- `gunrock_tpu.formats`   — host-side CSR/COO/CSC containers (+ conversions)
- `gunrock_tpu.graph`     — device-resident multi-view Graph pytree + build()
- `gunrock_tpu.io`        — matrix-market/smtx/binary loaders, sample graphs
- `gunrock_tpu.ops`       — advance / filter / parallel_for / uniquify /
                            neighbor_reduce / batch operators
- `gunrock_tpu.framework` — frontier types + BSP enactor (lax.while_loop)
- `gunrock_tpu.algorithms`— the 14 graph primitives
- `gunrock_tpu.parallel`  — mesh partitioning + shard_map distributed ops
- `gunrock_tpu.utils`     — sentinels, timers, comparison, metrics JSON
"""

__version__ = "0.1.0"

from gunrock_tpu.graph import Graph, build_graph  # noqa: F401
from gunrock_tpu.framework.frontier import DenseFrontier, QueueFrontier  # noqa: F401

# Algorithm subpackage is imported lazily by most users; re-export the
# high-level entry points for pygunrock-style usage
# (reference python/src/gunrock/__init__.py).
from gunrock_tpu import algorithms  # noqa: F401
from gunrock_tpu.interop import (  # noqa: F401
    bc_run,
    bfs,
    bfs_run,
    color_run,
    geo_run,
    hits_run,
    kcore_run,
    mst_run,
    ppr_run,
    pr_run,
    spgemm_run,
    spmv_run,
    sssp,
    sssp_run,
    tc_run,
)
from gunrock_tpu.ops.configs import Options  # noqa: F401
