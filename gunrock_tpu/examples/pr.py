"""PageRank example driver (role of reference examples/algorithms/pr/pr.cu)."""

from __future__ import annotations

import sys

from gunrock_tpu.algorithms import pr
from gunrock_tpu.examples import cpu_reference, runner
from gunrock_tpu.io.parameters import parse


def main(argv=None):
    params = parse(
        "pr",
        argv,
        extra_args=[
            (("--alpha",), dict(type=float, default=0.85)),
            (("--alphas",), dict(
                type=str, default=None,
                help="comma-separated damping sweep (e.g. 0.8,0.85,0.9): all "
                     "K rankings computed in ONE batched [V,K] kernel")),
            (("--tol",), dict(type=float, default=1e-6)),
        ],
    )
    graph, _ = runner.load(params)

    if params.extra.alphas:
        if (getattr(params.extra, "devices", 0) or 0) > 1:
            print("Error: --alphas (batched single-chip sweep) and "
                  "--devices are mutually exclusive")
            sys.exit(1)
        alphas = [float(a) for a in params.extra.alphas.split(",") if a]
        times, its = [], None
        for _ in range(params.num_runs):
            batch = pr.run_batch(graph, alphas, tol=params.extra.tol,
                                 options=params.options)
            times.append(batch.elapsed_ms)
            its = batch.iterations
        for k, a in enumerate(alphas):
            runner.print_head(runner.to_original(params, batch.p[:, k]),
                              name=f"rank[alpha={a}]")
        runner.finish(params, "pr", graph, times, depths=[its],
                      edges_visited=graph.n_edges * its * len(alphas),
                      nodes_visited=graph.n_vertices)
        if params.validate:
            import numpy as np

            bad = 0
            for k, a in enumerate(alphas):
                ref = cpu_reference.pr(graph, alpha=a, tol=params.extra.tol)
                bad += runner.validate(
                    f"pr[alpha={a}]", np.asarray(batch.p[:, k]), ref, atol=1e-4
                )
            if bad:
                sys.exit(1)
        return

    mesh, build_sharded = runner.maybe_mesh(params)
    times, depths = [], []
    result = None
    if mesh is not None:
        from gunrock_tpu.parallel import sharded

        sg = build_sharded(graph)
        times, (p, it) = runner.timed_runs(
            params.num_runs,
            lambda: sharded.pagerank(
                sg, mesh, alpha=params.extra.alpha, tol=params.extra.tol),
        )
        depths.append(int(it))
        result = pr.Result(p=p, iterations=depths[-1], elapsed_ms=times[-1])
    else:
        for _ in range(params.num_runs):
            result = pr.run(graph, alpha=params.extra.alpha, tol=params.extra.tol,
                            options=params.options)
            times.append(result.elapsed_ms)
            depths.append(result.iterations)

    runner.print_head(runner.to_original(params, result.p), name="rank")
    runner.finish(params, "pr", graph, times, depths=depths,
                  edges_visited=graph.n_edges * (depths[-1] if depths else 1),
                  nodes_visited=graph.n_vertices)

    if params.validate:
        ref = cpu_reference.pr(graph, alpha=params.extra.alpha, tol=params.extra.tol)
        if runner.validate("pr", result.p, ref, atol=1e-4):
            sys.exit(1)


if __name__ == "__main__":
    main()
