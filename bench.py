"""Headline benchmark: BFS MTEPS on an R-MAT power-law graph, single chip.

Mirrors the reference measurement contract (BASELINE.md): time one full
``enact()``-equivalent (the whole compiled BFS while_loop, post-warmup),
MTEPS = edges_visited / time_ms / 1000 where edges_visited counts the
out-degrees of reached vertices (the reference's device counter protocol,
framework/benchmark.hxx:53-60).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MTEPS", "vs_baseline": N|null, ...}
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

from gunrock_tpu.graph import hostcache


def main():
    from gunrock_tpu.algorithms.bfs import bfs_kernel, UNREACHED
    from gunrock_tpu.io.generators import rmat_graph

    scale, ef = 18, 16
    graph = rmat_graph(scale=scale, edge_factor=ef, seed=1)

    # Hub-first degree-sort relabeling (graph/reorder.py): concentrates
    # edges into dense bucket windows for the Pallas pull kernels, and
    # flips the direction-optimized budget toward almost-always-pull
    # (properties.hub_ordered -> E/512). A/B at s18
    # (benchmarks/ab_degsort.py): 51.6 ms / 75.7 MTEPS vs 85.5 ms /
    # 45.6 MTEPS random-order — 1.66x. Pure preprocessing (isomorphic
    # graph; results map back by one gather), same contract.
    from gunrock_tpu.graph.reorder import degree_sort

    graph, _ = degree_sort(graph)

    # Degrees via host numpy: running any *other* jitted executable between
    # the warmup and the timed calls poisons per-call latency on the axon
    # tunnel (per-call arg rebinding, ~0.6s/call).
    deg = np.diff(hostcache.host(graph, "row_offsets"))
    # Sources: highest-degree vertices reach the giant component.
    sources = np.argsort(-deg)[:8].tolist()

    from gunrock_tpu.algorithms.bfs import bfs_kernel_do
    from gunrock_tpu.ops.pallas.semiring import pull_layout

    # Doubly-masked Pallas pull for the dense levels (A/B'd vs the XLA
    # cumsum pull at scale 18: 84.9 ms vs 89.4 ms, benchmarks/ab_bfs_do.py)
    layout = pull_layout(graph, unit=True)
    # layout as jit argument (a closure would bake it into the HLO and
    # overflow the axon remote-compile payload on big graphs)
    fn = jax.jit(lambda g, s, lay: bfs_kernel_do(g, s, layout=lay))
    # Leave lazy-future mode BEFORE timing (hostcache removed the degree
    # read that used to do this implicitly).
    from gunrock_tpu.utils.timer import force_real_execution

    force_real_execution()
    # Warmup/compile.
    dist, depth = jax.block_until_ready(fn(graph, 0, layout))

    # Timed loop stays pure: no D2H reads or other executables between calls
    # (each would re-trigger per-call argument rebinding on the axon tunnel).
    outs = []
    t0 = time.perf_counter()
    for src in sources:
        outs.append(fn(graph, src, layout))
    jax.block_until_ready(outs)
    avg_ms = (time.perf_counter() - t0) * 1e3 / len(sources)

    times_ms, mteps_all = [], []
    for (dist, depth), src in zip(outs, sources):
        reached = np.asarray(dist) != int(UNREACHED)
        edges_visited = int(deg[reached].sum())
        times_ms.append(avg_ms)
        mteps_all.append(edges_visited / avg_ms / 1000.0)

    # Batched multi-source BFS throughput (all sources in one SpMM-backed
    # search — the batch-operator workload; reported as a secondary key).
    # Never let this sink the headline: tunnel hiccups get reported as 0.
    batch_mteps, batch_ms = 0.0, 0.0
    try:
        from gunrock_tpu.algorithms.bfs import msbfs_kernel
        K = 32
        batch_srcs = np.argsort(-deg)[:K].astype(np.int32)
        from gunrock_tpu.ops.pallas.layout import build_auto_layout

        layout = build_auto_layout(
            hostcache.host(graph, "col_indices"), hostcache.host(graph, "edge_src"),
            np.ones(graph.n_edges, np.float32), graph.n_vertices,
        )
        import jax.numpy as jnp

        bfn = jax.jit(
            lambda g, ss, lay: msbfs_kernel(g, ss, pull_layout=lay, interpret=False)
        )
        jax.block_until_ready(bfn(graph, jnp.asarray(batch_srcs), layout))
        t0 = time.perf_counter()
        bdist, _ = jax.block_until_ready(
            bfn(graph, jnp.asarray((batch_srcs + 1) % graph.n_vertices), layout)
        )
        batch_ms = (time.perf_counter() - t0) * 1e3
        breached = np.asarray(bdist) != int(UNREACHED)
        bedges = int(sum(deg[breached[:, k]].sum() for k in range(K)))
        batch_mteps = bedges / batch_ms / 1000.0
    except Exception:
        pass

    value = float(np.mean(mteps_all))
    # Baseline: the reference repo publishes no numbers and cannot run here
    # (CUDA-only, no GPU, zero egress — BASELINE.md "Published numbers").
    # The pinned baseline is therefore this framework's round-1 measurement
    # of the SAME workload under the SAME contract (BASELINE.md "Round 1
    # measured results": 43.55 MTEPS, rmat18 ef16, dir-opt BFS, 8 runs) —
    # a real, falsifiable progress ratio.
    ROUND1_BASELINE_MTEPS = 43.55
    result = {
        "batch_mteps_k32": round(batch_mteps, 2),
        "batch_ms_k32": round(batch_ms, 3),
        "metric": f"bfs_mteps_rmat{scale}_ef{ef}",
        "value": round(value, 2),
        "unit": "MTEPS",
        "vs_baseline": round(value / ROUND1_BASELINE_MTEPS, 3),
        "baseline_source": "round-1 self-baseline 43.55 MTEPS (BASELINE.md)",
        "avg_ms": round(float(np.mean(times_ms)), 3),
        "n_vertices": graph.n_vertices,
        "n_edges": graph.n_edges,
        "num_runs": len(sources),
        "reorder": "degree",
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
