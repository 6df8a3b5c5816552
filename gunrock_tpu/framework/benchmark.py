"""Workload metric counters.

Role of reference ``benchmark::`` (include/gunrock/framework/
benchmark.hxx:22-98): device counters (LOG_EDGE_VISITED /
LOG_VERTEX_VISITED) incremented inside operator kernels under the
``ESSENTIALS_COLLECT_METRICS`` compile flag, extracted host-side.

On TPU the counters are ordinary reduced scalars computed from the same
arrays the algorithm already produced — XLA fuses them for free, so there
is no two-build protocol (contrast CMakeLists.txt:457-467) and no timing
perturbation: one run yields both times and workload stats.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class WorkloadStats:
    """Role of the reference's benchmark_t counter struct."""

    edges_visited: int = 0
    vertices_visited: int = 0
    search_depth: int = 0

    def mteps(self, elapsed_ms: float) -> float:
        """MTEPS = edges_visited / time_ms / 1000
        (reference util/performance.hxx:225-235)."""
        return self.edges_visited / elapsed_ms / 1000.0 if elapsed_ms > 0 else 0.0


def frontier_workload(graph, reached_mask, search_depth: int = 0) -> WorkloadStats:
    """Workload of a frontier traversal: every reached vertex's out-edges
    were visited (the reference counts one LOG_EDGE_VISITED per advance
    edge, block_mapped.hxx:177-180)."""
    deg = np.diff(np.asarray(graph.row_offsets))
    reached = np.asarray(reached_mask)
    return WorkloadStats(
        edges_visited=int(deg[reached].sum()),
        vertices_visited=int(reached.sum()),
        search_depth=int(search_depth),
    )


def dense_workload(graph, iterations: int) -> WorkloadStats:
    """Workload of a dense (frontier-less) iteration like PageRank: all
    edges touched every iteration."""
    return WorkloadStats(
        edges_visited=int(graph.n_edges) * int(iterations),
        vertices_visited=int(graph.n_vertices),
        search_depth=int(iterations),
    )


def reached_from_distances(distances) -> jnp.ndarray:
    """Reached mask from a distances vector (int max / +inf = unreached)."""
    d = np.asarray(distances)
    if np.issubdtype(d.dtype, np.floating):
        return np.isfinite(d)
    return d != np.iinfo(d.dtype).max
