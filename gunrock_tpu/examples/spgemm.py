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
    for _ in range(params.num_runs):
        result = spgemm.run(
            graph_a, graph_b, options=params.options,
            strategy=params.extra.strategy,
        )
        times.append(result.elapsed_ms)

    print(f"C nnz = {result.nnz}")
    runner.finish(params, "spgemm", graph_a, times)

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
