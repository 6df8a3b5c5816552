"""PPR example driver (role of reference examples/algorithms/ppr/ppr.cu)."""

from __future__ import annotations

import numpy as np

from gunrock_tpu.algorithms import ppr
from gunrock_tpu.examples import runner
from gunrock_tpu.io.parameters import parse, parse_source_string


def main(argv=None):
    params = parse(
        "ppr", argv,
        extra_args=[
            (("--alpha",), dict(type=float, default=0.15)),
            (("--epsilon",), dict(type=float, default=1e-6)),
        ],
    )
    graph, _ = runner.load(params)
    seeds = parse_source_string(params.sources, graph.n_vertices, params.num_runs)
    run_seeds = runner.map_sources(params, seeds)

    times, depths = [], []
    result = None
    mesh, build_sharded = runner.maybe_mesh(params)
    if mesh is not None:
        from gunrock_tpu.parallel import sharded

        sg = build_sharded(graph)
        for seed in run_seeds:
            t, (p, it) = runner.timed_runs(
                1, lambda seed=seed: sharded.ppr(
                    sg, seed, mesh, alpha=params.extra.alpha,
                    epsilon=params.extra.epsilon))
            times += t
            depths.append(int(it))
        runner.print_head(runner.to_original(params, p), name="p")
    elif len(run_seeds) > 1:
        p, elapsed = ppr.run_batch(
            graph, run_seeds, alpha=params.extra.alpha, epsilon=params.extra.epsilon
        )
        times.append(elapsed)
        runner.print_head(runner.to_original(params, np.asarray(p)[0]),
                          name=f"p[seed={seeds[0]}]")
    else:
        result = ppr.run(graph, run_seeds[0], alpha=params.extra.alpha,
                         epsilon=params.extra.epsilon, options=params.options)
        times.append(result.elapsed_ms)
        depths.append(result.iterations)
        runner.print_head(runner.to_original(params, result.p), name="p")

    runner.finish(params, "ppr", graph, times, srcs=seeds, depths=depths)

    if params.validate and result is not None:
        import sys

        from gunrock_tpu.examples import cpu_reference

        ref = cpu_reference.ppr(
            graph, run_seeds[-1], alpha=params.extra.alpha,
            epsilon=params.extra.epsilon,
        )
        if runner.validate("ppr", result.p, ref, atol=1e-3):
            sys.exit(1)


if __name__ == "__main__":
    main()
