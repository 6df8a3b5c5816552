"""MST example driver (role of reference examples/algorithms/mst/mst.cu)."""

from __future__ import annotations

import sys

from gunrock_tpu.algorithms import mst
from gunrock_tpu.examples import cpu_reference, runner
from gunrock_tpu.io.parameters import parse


def main(argv=None):
    params = parse("mst", argv)
    graph, _ = runner.load(params)

    times = []
    result = None
    mesh, build_sharded = runner.maybe_mesh(params)
    if mesh is not None:
        import jax.numpy as jnp

        from gunrock_tpu.parallel import sharded

        sg = build_sharded(graph)
        times, (weight, rounds) = runner.timed_runs(
            params.num_runs, lambda: sharded.mst(sg, mesh)
        )
        result = mst.Result(mst_weight=float(weight),
                            mst_edges=jnp.zeros(0, bool), n_components=-1,
                            elapsed_ms=times[-1])
        print(f"mst weight = {result.mst_weight:.6f} (distributed)")
    else:
        for _ in range(params.num_runs):
            result = mst.run(graph, options=params.options)
            times.append(result.elapsed_ms)

        print(f"mst weight = {result.mst_weight:.6f} "
              f"({result.n_components} component(s))")
    runner.finish(params, "mst", graph, times)

    if params.validate:
        want = cpu_reference.mst_weight(graph)
        ok = abs(result.mst_weight - want) <= 1e-3 * max(1.0, abs(want))
        print(f"mst validation: {'PASSED' if ok else 'FAILED'} "
              f"(cpu={want:.6f})")
        if not ok:
            sys.exit(1)


if __name__ == "__main__":
    main()
