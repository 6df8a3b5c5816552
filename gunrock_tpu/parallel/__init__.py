"""Distributed execution over a TPU device mesh.

The capability the reference only scaffolds (multi-GPU contexts exist but
every operator throws on ``context.size() != 1`` — reference
include/gunrock/framework/operators/advance/advance.hxx:129-132, SURVEY.md
section 2.8). Here distribution is first-class and TPU-native:

- vertex state is **sharded** (device d owns ids ``[d*Vs, (d+1)*Vs)``) and
  edges are grouped by the owner of the reduction key (`sharded.py` —
  also the semantic form of the reference's striped virtual memory,
  virtual_memory.hxx:120-206),
- operators run under ``jax.shard_map``: local sorted segment reductions
  plus one boundary exchange of the x operand (``all_gather`` or a
  host-routed ``all_to_all`` halo exchange) and O(1) scalar collectives
  for convergence — all riding ICI,
- whole algorithms (13 of 13) compile into a single SPMD
  ``lax.while_loop`` program per device (`algorithms.py` re-exports).

The round-1 edge-sharded replicated-state generation (`partition.py` +
`primitives.py`) was deleted once `sharded.py` covered all algorithms
with 1/n memory — one implementation, no drift.
"""

from gunrock_tpu.parallel.mesh import make_mesh  # noqa: F401
from gunrock_tpu.parallel.sharded import (  # noqa: F401
    ShardedGraph,
    partition_sharded,
)
from gunrock_tpu.parallel import algorithms  # noqa: F401
