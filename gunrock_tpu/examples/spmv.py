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
    x = rng.random(graph.n_vertices).astype(np.float32)

    times = []
    result = None
    for _ in range(params.num_runs):
        result = spmv.run(graph, x, options=params.options)
        times.append(result.elapsed_ms)

    runner.print_head(result.y, name="y")
    runner.finish(params, "spmv", graph, times,
                  edges_visited=graph.n_edges, nodes_visited=graph.n_vertices)

    if params.validate:
        ref = cpu_reference.spmv(graph, x)
        if runner.validate("spmv", result.y, ref):
            sys.exit(1)


if __name__ == "__main__":
    main()
