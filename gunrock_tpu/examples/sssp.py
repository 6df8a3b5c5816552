"""SSSP example driver (role of reference examples/algorithms/sssp/sssp.cu)."""

from __future__ import annotations

import sys

import numpy as np

from gunrock_tpu.algorithms import sssp
from gunrock_tpu.examples import cpu_reference, runner
from gunrock_tpu.io.parameters import parse, parse_source_string


def main(argv=None):
    params = parse(
        "sssp", argv,
        extra_args=[
            (("--mode",), dict(
                default="bsp", choices=("bsp", "async"),
                help="bsp = level/bucket-synchronous (default); async = "
                     "Gauss-Seidel block sweeps (reference experimental "
                     "async runtime role — experimental/async_sweep.py)")),
            (("--ordering",), dict(
                default="natural", choices=("natural", "rcm"),
                help="async mode only: rcm relabels for near-monotone "
                     "paths (best on meshes/roads)")),
        ],
    )
    graph, _ = runner.load(params)
    sources = parse_source_string(params.sources, graph.n_vertices, params.num_runs)
    run_sources = runner.map_sources(params, sources)

    if (getattr(params.extra, "devices", 0) or 0) > 1 and \
            params.extra.mode == "async":
        print("Error: --mode async is single-chip; drop --devices")
        sys.exit(1)
    mesh, build_sharded = runner.maybe_mesh(params)
    times, depths = [], []
    result = None
    if mesh is not None:
        from gunrock_tpu.parallel import sharded

        sg = build_sharded(graph)
        for src in run_sources:
            t, (distances, depth) = runner.timed_runs(
                1, lambda src=src: sharded.sssp(sg, src, mesh))
            times += t
            depths.append(int(depth))
        result = sssp.Result(
            distances=distances, predecessors=None,
            search_depth=depths[-1], elapsed_ms=times[-1],
        )
    elif params.extra.mode == "async":
        import time as _time

        from gunrock_tpu.experimental.async_sweep import sssp_async

        for src in run_sources:
            t0 = _time.perf_counter()
            distances, sweeps, passes = sssp_async(
                graph, src, ordering=params.extra.ordering
            )
            times.append((_time.perf_counter() - t0) * 1e3)
            depths.append(sweeps)
        print(f"async: {sweeps} sweeps, {passes} block passes")
        result = sssp.Result(
            distances=distances, predecessors=None,
            search_depth=depths[-1], elapsed_ms=times[-1],
        )
    else:
        for src in run_sources:
            result = sssp.run(graph, src, options=params.options)
            times.append(result.elapsed_ms)
            depths.append(result.search_depth)

    runner.print_head(runner.to_original(params, result.distances), name="distances")
    dist_np = np.asarray(result.distances)
    deg = np.diff(np.asarray(graph.row_offsets))
    reached = np.isfinite(dist_np)
    runner.finish(
        params, "sssp", graph, times, srcs=sources, depths=depths,
        edges_visited=int(deg[reached].sum()), nodes_visited=int(reached.sum()),
    )

    if params.validate:
        ref = cpu_reference.sssp(graph, run_sources[-1])
        if runner.validate("sssp", result.distances, ref):
            sys.exit(1)


if __name__ == "__main__":
    main()
