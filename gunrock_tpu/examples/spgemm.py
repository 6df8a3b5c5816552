"""SpGEMM example driver (role of reference examples/algorithms/spgemm/spgemm.cu):
computes C = A.A (or A.B with --market_b)."""

from __future__ import annotations

import sys

import numpy as np

from gunrock_tpu.algorithms import spgemm
from gunrock_tpu.examples import cpu_reference, runner
from gunrock_tpu.io.loader import load_graph_file
from gunrock_tpu.io.parameters import parse


def main(argv=None):
    params = parse(
        "spgemm", argv,
        extra_args=[
            (("--market_b",), dict(default="", help="B matrix (default: A)")),
            (("--strategy",), dict(
                default="esc", choices=("esc", "dense", "auto"),
                help="esc = expand-sort-contract; dense = row-blocked "
                     "SpMM; auto = cost-model pick (GUNROCK_SPGEMM_AUTO_K)",
            )),
        ],
    )
    graph_a, _ = runner.load(params)
    graph_b = (
        load_graph_file(params.extra.market_b)[0]
        if params.extra.market_b
        else graph_a
    )

    times = []
    result = None
    mesh, build_sharded = runner.maybe_mesh(params)
    if mesh is not None:
        import jax.numpy as jnp

        from gunrock_tpu.parallel import sharded

        sg = build_sharded(graph_a)
        # distributed mode is structure analysis: nnz + checksum
        # (materializing C across shards is a host concatenation the
        # reference cannot do at all — advance.hxx rejects >1 GPU)
        times, (nnz, csum) = runner.timed_runs(
            params.num_runs, lambda: sharded.spgemm_count(sg, graph_b, mesh)
        )
        e = jnp.zeros(0)
        result = spgemm.Result(
            row_indices=e.astype(jnp.int32), col_indices=e.astype(jnp.int32),
            values=jnp.asarray([float(csum)], jnp.float32), nnz=int(nnz),
            elapsed_ms=times[-1],
        )
        if params.validate:
            print("note: --devices runs count-only; --validate checks "
                  "nnz/checksum against the CPU product")
    else:
        for _ in range(params.num_runs):
            result = spgemm.run(
                graph_a, graph_b, options=params.options,
                strategy=params.extra.strategy,
            )
            times.append(result.elapsed_ms)

    print(f"C nnz = {result.nnz}")
    runner.finish(params, "spgemm", graph_a, times)

    if params.validate and mesh is not None:
        want = cpu_reference.spgemm(graph_a, graph_b)
        want_nnz = int((np.abs(want) > 0).sum())
        want_sum = float(want.sum())
        ok = result.nnz == want_nnz and abs(
            float(np.asarray(result.values)[0]) - want_sum
        ) <= 1e-3 * max(1.0, abs(want_sum))
        print(f"spgemm validation: {'PASSED' if ok else 'FAILED'}")
        if not ok:
            sys.exit(1)
        return

    if params.validate:
        want = cpu_reference.spgemm(graph_a, graph_b)
        C = result.to_csr(graph_a.n_vertices, graph_b.n_vertices)
        got = np.zeros_like(want)
        for r in range(graph_a.n_vertices):
            for e in range(C.row_offsets[r], C.row_offsets[r + 1]):
                got[r, C.col_indices[e]] = C.values[e]
        n = int((~np.isclose(got, want, rtol=1e-3, atol=1e-4)).sum())
        print(f"spgemm validation: {'PASSED' if n == 0 else f'FAILED ({n} errors)'}")
        if n:
            sys.exit(1)


if __name__ == "__main__":
    main()
