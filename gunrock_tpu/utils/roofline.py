"""Bytes-moved roofline model (role of reference NVBench HW-counter
collection, benchmarks/bfs_bench.cu:63-67 — DRAM/L1/L2 throughput per
algorithm; XLA exposes no such counters over the axon tunnel, so every
benchmark row instead carries an analytical LOWER-BOUND streaming model
plus the fraction of the chip's measured ~90 GB/s ceiling it achieved —
the headroom column perf pushes are prioritized by).

Model per edge "touch": the bucketed Pallas layouts stream 12 B/edge
slot (row_local int32 + col_local int32 + value f32); the XLA segment
paths stream the same CSR/CSC triple. Per vertex-vector pass: 8 B
(read f32 + write f32). ``edges_visited`` is whatever workload counter
the benchmark already reports (frontier-sum for traversals, E*iters for
dense iterations), so the model inherits each algorithm's real work
shape. It UNDERCOUNTS reality (no metadata re-reads, no padding, no
wave quantization) — achieved-% figures are therefore optimistic
lower-is-honest bounds; >100% means the model missed reuse, not magic.

``cost_analysis_bytes`` cross-checks the model against XLA's own cost
model for one-shot kernels (test_roofline locks them within 3x).
"""

from __future__ import annotations

BYTES_PER_EDGE = 12  # int32 row + int32 col + f32 value
BYTES_PER_VERTEX_PASS = 8  # f32 read + f32 write
STREAM_GBPS = 90.0  # measured chip streaming ceiling (BASELINE.md)


def model_bytes(algo: str, n_vertices: int, n_edges: int,
                edges_visited: int, extra: dict) -> int:
    """Lower-bound HBM bytes for one timed run of ``algo``."""
    V, E = n_vertices, n_edges
    rounds = int(
        extra.get("search_depth")
        or extra.get("iterations")
        or extra.get("rounds")
        or 1
    )
    base = edges_visited * BYTES_PER_EDGE
    if algo in ("bfs", "sssp"):
        # per level: frontier mask + distance vector touched
        return base + (rounds + 1) * V * BYTES_PER_VERTEX_PASS
    if algo in ("pr", "hits", "geo"):
        # dense power iterations: edges_visited already counts E*rounds
        return base + rounds * V * BYTES_PER_VERTEX_PASS
    if algo == "spmv":
        return base + V * BYTES_PER_VERTEX_PASS
    if algo == "bc":
        # forward + backward pass over E, sigma/delta/labels vectors
        return 2 * E * BYTES_PER_EDGE + 3 * V * BYTES_PER_VERTEX_PASS
    if algo in ("color", "kcore", "mst", "ppr", "tc", "spgemm"):
        # edges_visited approximates the per-algo pass structure already
        return base + V * BYTES_PER_VERTEX_PASS
    return base


def roofline(algo: str, n_vertices: int, n_edges: int, edges_visited: int,
             avg_ms: float, extra: dict) -> dict:
    """JSON-ready roofline columns for a benchmark row."""
    if avg_ms <= 0:
        return {}
    b = model_bytes(algo, n_vertices, n_edges, edges_visited, extra)
    gbps = b / (avg_ms * 1e-3) / 1e9
    return {
        "model_mb": round(b / 1e6, 2),
        "gbps": round(gbps, 3),
        "pct_stream": round(100.0 * gbps / STREAM_GBPS, 2),
    }


def cost_analysis_bytes(fn, *args) -> float | None:
    """XLA compiled-executable bytes-accessed estimate for ``fn(*args)``
    (utils/profiler.cost_analysis), or None when the backend does not
    report it."""
    from gunrock_tpu.utils.profiler import cost_analysis

    ca = cost_analysis(fn, *args)
    if not ca:
        return None
    d = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(d.get("bytes accessed", 0.0)) or None
