"""SpMV example driver (role of reference examples/algorithms/spmv/spmv.cu)."""

from __future__ import annotations

import sys

import numpy as np

from gunrock_tpu.algorithms import spmv
from gunrock_tpu.examples import cpu_reference, runner
from gunrock_tpu.io.parameters import parse


def main(argv=None):
    params = parse("spmv", argv)
    graph, _ = runner.load(params)
    rng = np.random.default_rng(0)
    # x is generated in input-id space, permuted into execution space
    # (identity without --reorder)
    x = runner.to_relabeled(params, rng.random(graph.n_vertices).astype(np.float32))

    mesh, build_sharded = runner.maybe_mesh(params)
    times = []
    result = None
    if mesh is not None:
        from gunrock_tpu.parallel import sharded

        sg = build_sharded(graph)
        times, y = runner.timed_runs(
            params.num_runs, lambda: sharded.spmv(sg, x, mesh)
        )
        result = spmv.Result(y=y, elapsed_ms=times[-1])
    else:
        for _ in range(params.num_runs):
            result = spmv.run(graph, x, options=params.options)
            times.append(result.elapsed_ms)

    runner.print_head(runner.to_original(params, result.y), name="y")
    runner.finish(params, "spmv", graph, times,
                  edges_visited=graph.n_edges, nodes_visited=graph.n_vertices)

    if params.validate:
        ref = cpu_reference.spmv(graph, x)
        if runner.validate("spmv", result.y, ref):
            sys.exit(1)


if __name__ == "__main__":
    main()
