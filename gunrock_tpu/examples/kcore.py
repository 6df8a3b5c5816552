"""K-core example driver (role of reference examples/algorithms/kcore/kcore.cu)."""

from __future__ import annotations

import sys

from gunrock_tpu.algorithms import kcore
from gunrock_tpu.examples import cpu_reference, runner
from gunrock_tpu.io.parameters import parse


def main(argv=None):
    params = parse("kcore", argv)
    graph, _ = runner.load(params)

    times = []
    result = None
    mesh, build_sharded = runner.maybe_mesh(params)
    if mesh is not None:
        from gunrock_tpu.parallel import sharded

        sg = build_sharded(graph)
        times, (cores, degen) = runner.timed_runs(
            params.num_runs, lambda: sharded.kcore(sg, mesh)
        )
        result = kcore.Result(k_cores=cores, degeneracy=int(degen),
                              elapsed_ms=times[-1])
    else:
        for _ in range(params.num_runs):
            result = kcore.run(graph, options=params.options)
            times.append(result.elapsed_ms)

    runner.print_head(runner.to_original(params, result.k_cores), name="k_cores")
    print(f"degeneracy = {result.degeneracy}")
    runner.finish(params, "kcore", graph, times)

    if params.validate:
        ref = cpu_reference.kcore(graph)
        if runner.validate("kcore", result.k_cores, ref):
            sys.exit(1)


if __name__ == "__main__":
    main()
