"""Bucketed edge layout for Pallas kernels (host-side, built once).

Edges are grouped into (row_block, col_block) windows of size W and
streamed in fixed chunks of C edges; each chunk touches exactly one
x-window and one y-window, so kernels address both through scalar-
prefetched block ids. Chunks are ordered by (row_block, col_block) so the
output window is revisited consecutively and accumulates in VMEM.

This is the load-balancing contract of the reference's merge-path advance
(fixed work per tile regardless of degree skew, merge_path.hxx:9-37)
materialized as a data layout instead of a runtime search.
"""

from __future__ import annotations

import dataclasses
import weakref
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["row_local", "col_local", "values", "chunk_rb", "chunk_cb",
                 "rb_occupied", "src_bits", "dst_bits"],
    meta_fields=["window", "chunk", "n_chunks", "n_row_blocks", "n_col_blocks", "n_vertices"],
)
@dataclasses.dataclass(frozen=True)
class BucketedEdges:
    row_local: jax.Array  # int32[n_chunks * chunk] — row % W (0 if pad)
    col_local: jax.Array  # int32[n_chunks * chunk] — col % W (0 if pad)
    values: jax.Array  # float32[n_chunks * chunk] — 0 for padding
    chunk_rb: jax.Array  # int32[n_chunks] — row block of each chunk
    chunk_cb: jax.Array  # int32[n_chunks] — col block of each chunk
    rb_occupied: jax.Array  # bool[n_row_blocks] — row window touched by >=1 chunk; untouched windows are never written by the kernel and must be post-masked to the semiring identity
    # per-chunk sub-block occupancy for frontier-sparse selection at
    # W/32-vertex resolution: bit b of src_bits[ch] set iff chunk ch has a
    # real edge whose SOURCE falls in sub-block b of its col window (same
    # for dst_bits / rows). Window-level activity tests false-activate
    # every chunk of a hub window under degree sort — one peeled hub
    # vertex used to light up ~half of all chunks (k-core trace: 40% of
    # waves dispatched the FULL grid); 64-vertex resolution keeps the
    # active-chunk count honest.
    src_bits: jax.Array  # uint32[n_chunks]
    dst_bits: jax.Array  # uint32[n_chunks]
    window: int
    chunk: int
    n_chunks: int
    n_row_blocks: int
    n_col_blocks: int
    n_vertices: int


def _pack_subblock_bits(
    chunk_ids: np.ndarray, local: np.ndarray, window: int, n_chunks: int
) -> np.ndarray:
    """uint32[n_chunks]: bit b set iff some edge of the chunk has its
    window-local index in sub-block b (sub-block = window/32 vertices).
    Vectorized as a bincount over the (chunk, sub-block) pair space —
    no ufunc.at scatter."""
    if window < 32 or window % 32:
        raise ValueError(
            f"sub-block bit packing needs window to be a multiple of 32 "
            f"and >= 32, got {window} (non-multiples would silently "
            f"mis-bucket locals into the next chunk's word)"
        )
    sub = window // 32
    pair = chunk_ids.astype(np.int64) * 32 + local.astype(np.int64) // sub
    occ = np.bincount(pair, minlength=n_chunks * 32).reshape(n_chunks, 32) > 0
    weights = np.uint64(1) << np.arange(32, dtype=np.uint64)
    return (occ * weights).sum(axis=1).astype(np.uint32)


def build_bucketed_layout(
    rows: np.ndarray,
    cols: np.ndarray,
    values: np.ndarray,
    n_vertices: int,
    window: int = 512,
    chunk: int = 1024,
    pad_value: float = 0.0,
) -> BucketedEdges:
    """Bucket (row, col, value) edges into the chunked window layout.

    ``pad_value`` fills padding slots' values (use the reduction identity
    of the target semiring, e.g. +inf for min_plus)."""
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    values = np.asarray(values, dtype=np.float32)
    n_rb = -(-n_vertices // window)
    n_cb = -(-n_vertices // window)
    # the kernels pack chunk metadata as rb*65536 + cb in int32 — beyond
    # these bounds the packing would silently route chunks to wrong
    # blocks (auto_window_chunk keeps V/W <= 256, far below the limit)
    if n_rb > 32768 or n_cb > 65536:
        raise ValueError(
            f"window {window} too small for {n_vertices} vertices: "
            f"{n_rb}x{n_cb} blocks overflows the int32 rb*65536+cb "
            f"chunk-metadata packing (max 32768x65536)"
        )
    rb = rows // window
    cb = cols // window
    # sort edges by (rb, cb) — np.lexsort: last key is primary
    order = np.lexsort((cb, rb))
    rows, cols, values, rb, cb = (
        rows[order], cols[order], values[order], rb[order], cb[order]
    )
    bucket = rb * n_cb + cb
    # vectorized per-bucket chunking: edge j with within-bucket rank r goes
    # to slot (chunk_offset[bucket] + r // chunk) * chunk + r % chunk
    uniq, inverse, counts = np.unique(bucket, return_inverse=True, return_counts=True)
    starts = np.zeros_like(counts)
    np.cumsum(counts[:-1], out=starts[1:])
    rank = np.arange(rows.size, dtype=np.int64) - starts[inverse]
    chunks_per_bucket = -(-counts // chunk)
    chunk_off = np.zeros_like(chunks_per_bucket)
    np.cumsum(chunks_per_bucket[:-1], out=chunk_off[1:])
    n_chunks = int(chunks_per_bucket.sum())
    dest = (chunk_off[inverse] + rank // chunk) * chunk + rank % chunk
    E_out = n_chunks * chunk
    # padding slots carry row_local = window: a SENTINEL no one-hot /
    # MXU / min scatter can match, so pad contributions drop even when
    # values carry no identity (the round-5 value-less unit kernels);
    # valued kernels additionally keep the pad_value identity mechanism
    row_local = np.full(E_out, window, dtype=np.int32)
    col_local = np.zeros(E_out, dtype=np.int32)
    vals_out = np.full(E_out, pad_value, dtype=np.float32)
    row_local[dest] = (rows - rb * window).astype(np.int32)
    col_local[dest] = (cols - cb * window).astype(np.int32)
    vals_out[dest] = values
    chunk_rb = np.repeat((uniq // n_cb).astype(np.int32), chunks_per_bucket)
    chunk_cb = np.repeat((uniq % n_cb).astype(np.int32), chunks_per_bucket)
    rb_occupied = np.zeros(n_rb, dtype=bool)
    rb_occupied[(uniq // n_cb).astype(np.int64)] = True
    src_bits = _pack_subblock_bits(
        dest // chunk, (cols - cb * window), window, n_chunks
    )
    dst_bits = _pack_subblock_bits(
        dest // chunk, (rows - rb * window), window, n_chunks
    )
    return BucketedEdges(
        row_local=jnp.asarray(row_local),
        col_local=jnp.asarray(col_local),
        values=jnp.asarray(vals_out),
        chunk_rb=jnp.asarray(chunk_rb),
        chunk_cb=jnp.asarray(chunk_cb),
        rb_occupied=jnp.asarray(rb_occupied),
        src_bits=jnp.asarray(src_bits),
        dst_bits=jnp.asarray(dst_bits),
        window=window,
        chunk=chunk,
        n_chunks=n_chunks,
        n_row_blocks=n_rb,
        n_col_blocks=n_cb,
        n_vertices=n_vertices,
    )


# Per-graph layout cache. Keyed on the id() of an anchor array owned by the
# graph, but validated through a weakref so (a) a recycled id() after GC can
# never alias a different graph's layout and (b) entries are evicted when
# their graph dies — the cache cannot grow without bound.
_GRAPH_LAYOUT_CACHE: dict = {}


def _evictor(cache_key):
    def evict(_ref):
        _GRAPH_LAYOUT_CACHE.pop(cache_key, None)

    return evict


def cached_layout(anchor: jax.Array, build_fn, key):
    """Memoize ``build_fn()`` per (anchor array identity, key).

    ``anchor`` should be an array owned by the graph (e.g. col_indices);
    the entry lives exactly as long as the array does."""
    cache_key = id(anchor)
    ent = _GRAPH_LAYOUT_CACHE.get(cache_key)
    if ent is not None and ent[0]() is not anchor:
        ent = None  # id() was recycled for a different array
    if ent is None:
        ent = (weakref.ref(anchor, _evictor(cache_key)), {})
        _GRAPH_LAYOUT_CACHE[cache_key] = ent
    layouts = ent[1]
    if key not in layouts:
        layouts[key] = build_fn()
    return layouts[key]


# The sparse semiring kernels scalar-prefetch 2 int32[n_chunks] arrays
# (packed rb|cb metadata + the active-chunk permutation); SMEM is 1 MB on
# v5e, so 2*4B*n_chunks + count + spill must stay under it.
_SMEM_BUDGET_CHUNKS = 125_000


def estimate_chunks(rows, cols, n_vertices: int, window: int, chunk: int) -> int:
    """Chunk count a build would produce, without building (one bincount)."""
    n_cb = -(-n_vertices // window)
    bucket = (
        np.asarray(rows, np.int64) // window * n_cb
        + np.asarray(cols, np.int64) // window
    )
    counts = np.bincount(bucket, minlength=1)
    counts = counts[counts > 0]
    return int((-(-counts // chunk)).sum())


def build_auto_layout(
    rows,
    cols,
    values,
    n_vertices: int,
    interpret: bool = False,
    pad_value: float = 0.0,
    max_chunks: int = _SMEM_BUDGET_CHUNKS,
) -> BucketedEdges:
    """Bucketed layout at the smallest window whose chunk metadata fits
    the SMEM scalar-prefetch budget.

    Starts at the measured-fastest W=2048/C=256 and doubles W while the
    estimated chunk count exceeds ``max_chunks`` — on a degree-sorted
    graph (graph/reorder.py) scale 20 fits at W=2048 (~123K chunks);
    under a random vertex permutation the saturated bucket grid forces
    W=4096. Estimation is one bincount, so the real build happens once.

    When the chunk count at W=2048 exceeds the SMEM budget, build a
    paged-metadata layout (ops/pallas/paged.py) at W=2048 instead of
    doubling W — the per-edge one-hot cost is frag*W, so paging wins
    above ~s21. Default ON since the 2026-08-19 chip battery
    (results_r3.jsonl): at equal W the manual-DMA paged kernel matches
    SMEM prefetch within 2% (s20 degsort 160.0 vs 157.5 ms/pass), and
    at s22 the SMEM variant cannot compile AT ALL (W=16384 dense pass =
    VMEM OOM, 128.35M/128M register spills) while paged W=4096 runs
    958 ms/pass. GUNROCK_PAGED_META=0 restores the W-doubling
    fallback. Layouts at or under the budget are unaffected (paging
    never engages there)."""
    import os

    if interpret:
        return build_bucketed_layout(
            rows, cols, values, n_vertices, window=128, chunk=256,
            pad_value=pad_value,
        )
    W, C = 2048, 256
    if (
        os.environ.get("GUNROCK_PAGED_META", "1") == "1"
        and estimate_chunks(rows, cols, n_vertices, W, C) > max_chunks
    ):
        from gunrock_tpu.ops.pallas.paged import build_paged_layout

        return build_paged_layout(
            rows, cols, values, n_vertices, window=W, chunk=C,
            pad_value=pad_value,
        )
    while (
        W < 65536
        and estimate_chunks(rows, cols, n_vertices, W, C) > max_chunks
    ):
        W, C = W * 2, min(C * 2, 512)
    return build_bucketed_layout(
        rows, cols, values, n_vertices, window=W, chunk=C, pad_value=pad_value
    )


def auto_window_chunk(n_vertices: int, interpret: bool = False) -> tuple[int, int]:
    """Pick (window, chunk) for the bucketed kernels.

    W=2048/C=256 measured fastest up to scale 18, but the per-chunk
    metadata rides as int32[n_chunks] scalar-prefetch arrays in SMEM
    (1 MB on v5e), and power-law graphs occupy nearly every
    (row-block, col-block) bucket pair — so n_chunks ~ (V/W)^2 and W
    must grow with V to keep the metadata under SMEM. Keeping
    V/W <= 256 bounds the bucket grid at 64K pairs; the per-edge
    compare cost ~ fragmentation*W stays flat because doubling W
    halves the fragmentation on bucket-saturated graphs (measured at
    scale 20: W=2048 frag 4.17 vs W=4096 frag 2.09)."""
    import os

    if interpret:
        return 128, 256
    # explicit override for A/Bs (benchmarks set these per process)
    env_w = os.environ.get("GUNROCK_WINDOW")
    env_c = os.environ.get("GUNROCK_CHUNK")
    if env_w or env_c:
        W = int(env_w) if env_w else 2048
        return W, int(env_c) if env_c else 256 * max(1, W // 2048)
    W = 2048
    while n_vertices > 256 * W:
        W *= 2
    return W, 256 * (W // 2048)


def dense_window_chunk(n_vertices: int,
                       interpret: bool = False) -> tuple[int, int] | None:
    """(window, chunk) for DENSE-ONLY algorithms (PR, HITS, SpMV — no
    frontier-sparse passes). The v5 kernel's dense pass is per-grid-step
    bound, so fewer/bigger chunks win: W=4096/C=1024 measured 10.8 ms vs
    the default W=2048/C=256's 13.2 at s18 degsort (BASELINE round-4) —
    but coarser windows skip fewer chunks on SPARSE passes, so
    traversal algorithms must NOT use this. Returns None when the
    default (auto) pick should stand (tiny graphs, interpret mode, or
    scales where auto already escalates past W=4096)."""
    if interpret or n_vertices < (1 << 16) or n_vertices > (1 << 20):
        return None
    return 4096, 1024


def layout_for_graph(graph, window: int | None = None, chunk: int | None = None) -> BucketedEdges:
    """CSR edges of a Graph in bucketed layout (cached per (graph, W, C))."""
    from gunrock_tpu.graph import hostcache

    if window is None or chunk is None:
        return build_auto_layout(
            hostcache.host(graph, "edge_src"),
            hostcache.host(graph, "col_indices"),
            hostcache.host(graph, "values"),
            graph.n_vertices,
        )
    return build_bucketed_layout(
        hostcache.host(graph, "edge_src"),
        hostcache.host(graph, "col_indices"),
        hostcache.host(graph, "values"),
        graph.n_vertices,
        window=window,
        chunk=chunk,
    )
