"""Shared example-driver scaffolding.

Role of the common flow in every reference example binary
(examples/algorithms/bfs/bfs.cu:11-128, SURVEY.md section 3.1): parse
args -> load graph -> per-run algorithm execution over sources ->
optional CPU validation with mismatch counting -> optional JSON metrics
export -> print head of results.
"""

from __future__ import annotations

import numpy as np

from gunrock_tpu.io.loader import extract_filename, load_graph_file
from gunrock_tpu.io.parameters import Parameters, parse, parse_source_string
from gunrock_tpu.utils.compare import compare
from gunrock_tpu.utils.performance import export_performance_stats


def print_head(arr, k: int = 10, name: str = "result"):
    """Role of reference ``print::head`` (util/print.hxx:32-43)."""
    a = np.asarray(arr)
    print(f"{name}[:{k}] = {a[:k]}")


def load(params: Parameters):
    graph, props = load_graph_file(params.filename)
    print(
        f"Loaded {extract_filename(params.filename)}: "
        f"{graph.n_vertices} vertices, {graph.n_edges} edges "
        f"({'symmetric' if props.symmetric else 'directed'})"
    )
    if getattr(params.extra, "reorder", "none") == "degree":
        from gunrock_tpu.graph.reorder import degree_sort

        graph, params.reordering = degree_sort(graph)
        print("Relabeled vertices hub-first (--reorder degree); "
              "results map back to input ids")
    return graph, props


def map_sources(params: Parameters, sources: list[int]) -> list[int]:
    """Input-space source ids -> execution (relabeled) ids. Identity
    without --reorder."""
    ro = params.reordering
    if ro is None:
        return sources
    return [int(ro.rank[s]) for s in sources]


def to_original(params: Parameters, arr):
    """Per-vertex result from execution space back to the input vertex-id
    space (graph/reorder.py usage contract). Identity without --reorder."""
    ro = params.reordering
    if ro is None:
        return arr
    return np.asarray(arr)[ro.rank]


def to_relabeled(params: Parameters, arr):
    """Per-vertex *input* (labels, x vectors) into execution space."""
    ro = params.reordering
    if ro is None:
        return arr
    return np.asarray(arr)[ro.order]


def finish(
    params: Parameters,
    primitive: str,
    graph,
    times_ms: list[float],
    srcs=None,
    depths=None,
    edges_visited: int = 0,
    nodes_visited: int = 0,
):
    avg = float(np.mean(times_ms)) if times_ms else 0.0
    print(f"{primitive} : {avg:.4f} ms avg over {len(times_ms)} run(s)")
    if params.export_metrics:
        path = export_performance_stats(
            primitive=primitive,
            process_times_ms=times_ms,
            graph_file=params.filename,
            num_vertices=graph.n_vertices,
            num_edges=graph.n_edges,
            srcs=srcs or [],
            search_depths=depths or [],
            edges_visited=edges_visited,
            nodes_visited=nodes_visited,
            tags=params.tags,
            json_dir=params.json_dir,
            json_file=params.json_file,
        )
        print(f"metrics written to {path}")


def validate(name: str, computed, reference, **kw) -> int:
    n = compare(computed, reference, verbose=True, **kw)
    if n == 0:
        print(f"{name} validation: PASSED")
    else:
        print(f"{name} validation: FAILED ({n} errors)")
    return n


def timed_runs(n_runs: int, fn):
    """Timed loop for the distributed CLI branches: each run is fenced
    with block_until_ready so the time covers EXECUTION, not just the
    async dispatch (on a real TPU an unfenced perf_counter pair measures
    ~nothing — round-3 code-review finding). Returns (times_ms, last)."""
    import time

    import jax

    times, out = [], None
    for _ in range(n_runs):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)  # pytree-aware; non-arrays ignored
        times.append((time.perf_counter() - t0) * 1e3)
    return times, out


def maybe_mesh(params: Parameters):
    """(mesh, sharded_graph_builder) for --devices N > 1, else (None, None).
    The distributed path runs the vertex-sharded shard_map suite
    (parallel/sharded.py) over an N-device mesh — multi-chip execution
    from the same CLI (the reference's operators reject multi-GPU
    contexts, advance.hxx:129-132)."""
    n = getattr(params.extra, "devices", 0) or 0
    if n <= 1:
        return None, None
    import jax

    if len(jax.devices()) < n:
        print(f"Error: --devices {n} but only {len(jax.devices())} visible "
              "(set XLA_FLAGS=--xla_force_host_platform_device_count for "
              "CPU simulation)")
        import sys

        sys.exit(1)
    from gunrock_tpu.parallel.mesh import make_mesh
    from gunrock_tpu.parallel.sharded import partition_sharded

    mesh = make_mesh(n)

    def build(graph):
        return partition_sharded(graph, n, mesh)

    return mesh, build
