"""BC example driver (role of reference examples/algorithms/bc/bc.cu)."""

from __future__ import annotations

import sys

from gunrock_tpu.algorithms import bc
from gunrock_tpu.examples import cpu_reference, runner
from gunrock_tpu.io.parameters import parse, parse_source_string


def main(argv=None):
    params = parse(
        "bc", argv,
        extra_args=[(("--all_sources",), dict(action="store_true",
                    help="accumulate BC over every source"))],
    )
    graph, _ = runner.load(params)

    times = []
    mesh, build_sharded = runner.maybe_mesh(params)
    if params.extra.all_sources:
        result = bc.run_all_sources(graph)
        times.append(result.elapsed_ms)
        sources = []
    elif mesh is not None:
        from gunrock_tpu.parallel import sharded

        sources = parse_source_string(params.sources, graph.n_vertices, params.num_runs)
        run_sources = runner.map_sources(params, sources)
        sg = build_sharded(graph)
        for src in run_sources:
            t, vals = runner.timed_runs(1, lambda: sharded.bc(sg, src, mesh))
            times += t
        result = bc.Result(bc_values=vals, elapsed_ms=times[-1])
    else:
        sources = parse_source_string(params.sources, graph.n_vertices, params.num_runs)
        run_sources = runner.map_sources(params, sources)
        result = None
        for src in run_sources:
            result = bc.run(graph, src, options=params.options)
            times.append(result.elapsed_ms)

    runner.print_head(runner.to_original(params, result.bc_values), name="bc")
    runner.finish(params, "bc", graph, times, srcs=sources)

    if params.validate and not params.extra.all_sources:
        ref = cpu_reference.bc(graph, run_sources[-1])
        if runner.validate("bc", result.bc_values, ref, atol=1e-3):
            sys.exit(1)


if __name__ == "__main__":
    main()
