"""HITS example driver (role of reference examples/algorithms/hits/hits.cu)."""

from __future__ import annotations

import sys

from gunrock_tpu.algorithms import hits
from gunrock_tpu.examples import cpu_reference, runner
from gunrock_tpu.io.parameters import parse


def main(argv=None):
    params = parse(
        "hits", argv,
        extra_args=[(("--max_iterations",), dict(type=int, default=20))],
    )
    graph, _ = runner.load(params)

    times = []
    result = None
    mesh, build_sharded = runner.maybe_mesh(params)
    if mesh is not None:
        from gunrock_tpu.parallel import sharded

        sg = build_sharded(graph)
        times, (auth, hub, it) = runner.timed_runs(
            params.num_runs,
            lambda: sharded.hits(
                sg, mesh, max_iterations=params.extra.max_iterations),
        )
        result = hits.Result(auth=auth, hub=hub, iterations=int(it),
                             elapsed_ms=times[-1])
    else:
        for _ in range(params.num_runs):
            result = hits.run(graph, max_iterations=params.extra.max_iterations,
                              options=params.options)
            times.append(result.elapsed_ms)

    runner.print_head(runner.to_original(params, result.auth), name="auth")
    runner.print_head(runner.to_original(params, result.hub), name="hub")
    runner.finish(params, "hits", graph, times, depths=[result.iterations])

    if params.validate:
        ref_auth, ref_hub = cpu_reference.hits(graph, result.iterations)
        bad = runner.validate("hits auth", result.auth, ref_auth, atol=1e-3)
        bad += runner.validate("hits hub", result.hub, ref_hub, atol=1e-3)
        if bad:
            sys.exit(1)


if __name__ == "__main__":
    main()
