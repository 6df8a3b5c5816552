"""Distributed execution over a TPU device mesh.

The capability the reference only scaffolds (multi-GPU contexts exist but
every operator throws on ``context.size() != 1`` — reference
include/gunrock/framework/operators/advance/advance.hxx:129-132, SURVEY.md
section 2.8). Here distribution is first-class and TPU-native:

- the graph is **1-D edge-partitioned** per chip (`partition.py`),
- operators run under ``jax.shard_map`` with XLA collectives over ICI
  (``psum``/``pmin``/``pmax``) combining per-shard segment reductions
  (`primitives.py`),
- whole algorithms (BFS / SSSP / PageRank / SpMV) compile into a single
  SPMD ``lax.while_loop`` program per device (`algorithms.py`).
"""

from gunrock_tpu.parallel.mesh import make_mesh  # noqa: F401
from gunrock_tpu.parallel.partition import (  # noqa: F401
    PartitionedGraph,
    partition_graph,
)
from gunrock_tpu.parallel import algorithms  # noqa: F401
