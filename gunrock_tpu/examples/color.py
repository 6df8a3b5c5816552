"""Coloring example driver (role of reference examples/algorithms/color/color.cu)."""

from __future__ import annotations

import sys

import numpy as np

from gunrock_tpu.algorithms import color
from gunrock_tpu.examples import cpu_reference, runner
from gunrock_tpu.io.parameters import parse


def main(argv=None):
    params = parse(
        "color", argv,
        extra_args=[
            (("--strategy",), dict(default="auto",
             choices=("auto", "luby", "rank", "greedy"),
             help="auto = greedy on the Pallas path (measured Pareto "
             "winner), luby on XLA; luby = reference-parity "
             "2-colors/round; rank = multi-color rank JP (~4x fewer "
             "rounds, ~1.35x more colors); greedy = speculative "
             "windowed-mex (fewest passes AND fewest colors; "
             "deterministic)")),
        ],
    )
    graph, _ = runner.load(params)

    times = []
    result = None
    mesh, build_sharded = runner.maybe_mesh(params)
    if mesh is not None:
        from gunrock_tpu.parallel import sharded

        sg = build_sharded(graph)
        for i in range(params.num_runs):
            # auto resolves to greedy here: sharded.color_greedy is
            # bit-identical to the single-chip Pareto winner
            if params.extra.strategy in ("greedy", "auto"):
                t, (cvec, rounds) = runner.timed_runs(
                    1, lambda: sharded.color_greedy(sg, mesh))
            else:
                t, (cvec, rounds) = runner.timed_runs(
                    1, lambda i=i: sharded.color(sg, mesh, seed=i))
            times += t
        result = color.Result(colors=cvec, iterations=int(rounds),
                              elapsed_ms=times[-1])
    else:
        for i in range(params.num_runs):
            result = color.run(graph, seed=i, options=params.options,
                               strategy=params.extra.strategy)
            times.append(result.elapsed_ms)

    colors = np.asarray(result.colors)
    runner.print_head(runner.to_original(params, colors), name="colors")
    print(f"colors used: {int(colors.max()) + 1}")
    runner.finish(params, "color", graph, times)

    if params.validate:
        ok = cpu_reference.color_is_valid(graph, colors)
        print(f"color validation: {'PASSED' if ok else 'FAILED'}")
        if not ok:
            sys.exit(1)


if __name__ == "__main__":
    main()
