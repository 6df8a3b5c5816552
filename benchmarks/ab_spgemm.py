"""SpGEMM strategy A/B: streamed ESC vs dense row-block SpMM.

Both compute C = A.A in count_only mode (the structure-analysis
measurement contract — materializing C over the tunnel measures the
link, not the chip). One variant per process (axon tunnel). Prints one
JSON line.

Usage: python benchmarks/ab_spgemm.py {esc|dense} [--scale 16]
"""

from __future__ import annotations

import argparse
import json

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("variant", choices=["esc", "dense"])
    p.add_argument("--scale", type=int, default=16)
    p.add_argument("--edge-factor", type=int, default=16)
    p.add_argument("--reorder", default="", choices=["", "degree"])
    p.add_argument("--block-rows", type=int, default=0,
                   help="dense only: rows per SpMM block (0 = default 128)")
    ns = p.parse_args()

    from gunrock_tpu.algorithms import spgemm
    from gunrock_tpu.io.generators import rmat_graph
    from gunrock_tpu.utils.timer import force_real_execution

    graph = rmat_graph(scale=ns.scale, edge_factor=ns.edge_factor, seed=1)
    if ns.reorder == "degree":
        from gunrock_tpu.graph.reorder import degree_sort

        graph, _ = degree_sort(graph)
    force_real_execution()

    kwargs = {}
    if ns.variant == "dense" and ns.block_rows:
        res = spgemm._run_dense(
            graph, graph, count_only=True, warmup=False,
            block_rows=ns.block_rows,
        )
    else:
        res = spgemm.run(
            graph, graph, warmup=False, count_only=True,
            strategy=ns.variant, **kwargs,
        )

    deg = np.diff(np.asarray(graph.row_offsets))
    products = int(deg[np.asarray(graph.col_indices)].sum())
    print(
        json.dumps(
            {
                "variant": ns.variant,
                "scale": ns.scale,
                "reorder": ns.reorder,
                "block_rows": ns.block_rows or 256,
                "elapsed_ms": round(res.elapsed_ms, 1),
                "nnz": res.nnz,
                "checksum": float(res.values[0]),
                "products": products,
            }
        )
    )


if __name__ == "__main__":
    main()
