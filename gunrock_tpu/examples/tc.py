"""TC example driver (role of reference examples/algorithms/tc/tc.cu)."""

from __future__ import annotations

import sys

from gunrock_tpu.algorithms import tc
from gunrock_tpu.examples import cpu_reference, runner
from gunrock_tpu.io.parameters import parse


def main(argv=None):
    params = parse(
        "tc", argv,
        extra_args=[
            (("-r", "--reduce"), dict(action="store_true",
             help="print the single whole-graph triangle count "
             "(reference tc.cu -r,--reduce; per-vertex counts are "
             "always computed)")),
        ],
    )
    graph, _ = runner.load(params)

    times = []
    result = None
    mesh, build_sharded = runner.maybe_mesh(params)
    if mesh is not None:
        from gunrock_tpu.parallel import sharded

        # ring-rotation sharded DAG: per-device residency 2E/n
        times, (counts, total) = runner.timed_runs(
            params.num_runs, lambda: sharded.tc_ring(graph, mesh)
        )
        total = int(total)
        result = tc.Result(vertex_triangles_count=counts,
                           total_triangles_count=total,
                           n_triangles=total // 3, elapsed_ms=times[-1])
    else:
        for _ in range(params.num_runs):
            result = tc.run(graph, options=params.options)
            times.append(result.elapsed_ms)

    runner.print_head(runner.to_original(params, result.vertex_triangles_count),
                      name="triangles")
    if params.extra.reduce:
        print(f"total (3x triangles) = {result.total_triangles_count}; "
              f"distinct triangles = {result.n_triangles}")
    runner.finish(params, "tc", graph, times)

    if params.validate:
        ref = cpu_reference.tc(graph)
        if runner.validate("tc", result.vertex_triangles_count, ref):
            sys.exit(1)


if __name__ == "__main__":
    main()
