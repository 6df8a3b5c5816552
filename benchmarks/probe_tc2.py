"""Probe: where does slabbed rank-space TC time go at scale 18/20?

Variants (subprocess each — distinct Pallas executables in one process
can fault the device):
  stats    host-only: n_wedges, max_deg, span_rows, slab count
  wedges   per-slab wedge enumeration only (banded gather included)
  wedges_xla  same but use_banded=False (serialized XLA gather A/B)
  join     full slab (wedges + sort-join + counts) — the production path
  total    full slab with tc_total_sortjoin (no counts machinery)

Usage: python benchmarks/probe_tc2.py <variant> [--scale 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variant", choices=("stats", "wedges", "wedges_xla",
                                        "join", "total"))
    ap.add_argument("--scale", type=int, default=20)
    ap.add_argument("--max_wedges", type=int, default=400_000_000)
    ns = ap.parse_args()

    import numpy as np

    from gunrock_tpu.algorithms import tc
    from gunrock_tpu.graph.reorder import degree_sort
    from gunrock_tpu.io.generators import rmat_graph

    g = rmat_graph(scale=ns.scale, edge_factor=16, seed=1, undirected=True)
    g, _ = degree_sort(g)
    rk = tc.build_dag_ranked(g)
    T = 2048
    B = -(-ns.max_wedges // T) * T
    span_rows = -(-(2 * T + rk["max_deg"] + 2) // 128) + 1
    n_slabs = -(-rk["n_wedges"] // B)
    print(f"n_wedges={rk['n_wedges']:,} max_deg={rk['max_deg']} "
          f"span_rows={span_rows} n_slabs={n_slabs} Ew={rk['wadj'].size:,} "
          f"E_dag={rk['eu'].size:,}")
    if ns.variant == "stats":
        return

    import jax
    import jax.numpy as jnp

    from gunrock_tpu.ops.pallas.banded import pad_table
    from gunrock_tpu.utils.timer import force_real_execution

    force_real_execution()
    V = g.n_vertices
    use_banded = ns.variant != "wedges_xla" and span_rows <= 120
    wx = jnp.asarray(rk["wadj"])
    weu = jnp.asarray(rk["weu"])
    whi = jnp.asarray((rk["woff"] >> 30).astype(np.int32))
    wlo = jnp.asarray((rk["woff"] & ((1 << 30) - 1)).astype(np.int32))
    cnt = jnp.asarray(np.diff(rk["woff"]).astype(np.int32))
    wtab = jnp.asarray(pad_table(rk["wadj"], span_rows))
    eu = jnp.asarray(rk["eu"])
    ev = jnp.asarray(rk["ev"])

    def slab_args(w0):
        return (whi, wlo, cnt, jnp.int32(w0 >> 30),
                jnp.int32(w0 & ((1 << 30) - 1)),
                jnp.int32(max(0, min(rk["n_wedges"] - w0, B))))

    if ns.variant in ("wedges", "wedges_xla"):
        import functools

        fn = jax.jit(functools.partial(
            tc._slab_wedges_ranked, V=V, B=B, T=T, span_rows=span_rows,
            interpret=False, use_banded=use_banded))

        def call(w0):
            return fn(wx, weu, *slab_args(w0), wtab)
    elif ns.variant == "join":
        def call(w0):
            return tc._tc_slab_counts(
                eu, ev, wx, weu, *slab_args(w0), wtab, V=V, B=B, T=T,
                span_rows=span_rows, interpret=False,
                use_banded=use_banded)
    else:  # total
        import functools

        @functools.partial(jax.jit, static_argnames=())
        def fn(eu, ev, wx, weu, whi_, wlo_, cnt_, a, b, nv, wtab):
            wv, ww, wu = tc._slab_wedges_ranked(
                wx, weu, whi_, wlo_, cnt_, a, b, nv, wtab, V=V, B=B,
                T=T, span_rows=span_rows, interpret=False,
                use_banded=use_banded)
            return tc.tc_total_sortjoin(eu, ev, wv, ww, wu)

        def call(w0):
            return fn(eu, ev, wx, weu, *slab_args(w0), wtab)

    # warmup on slab 0
    r = jax.block_until_ready(call(0))
    times = []
    for w0 in range(0, rk["n_wedges"], B):
        t0 = time.perf_counter()
        r = jax.block_until_ready(call(w0))
        times.append(time.perf_counter() - t0)
    print(f"{ns.variant}: per-slab " +
          " ".join(f"{t*1e3:.0f}" for t in times) +
          f" ms; total {sum(times):.2f} s")


if __name__ == "__main__":
    main()


def pieces(scale_elems=415_000_000, V=1 << 20):
    """Time the counts-path pieces standalone on synthetic data."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gunrock_tpu.utils.timer import force_real_execution

    force_real_execution()
    N = scale_elems
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, V, N, dtype=np.int32))
    b = jnp.asarray(rng.integers(0, 2 * V, N, dtype=np.int32))
    t = jnp.asarray(rng.integers(0, V, N, dtype=np.int32))

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        jax.block_until_ready(f(*args))
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        print(f"{name}: {(time.perf_counter()-t0)*1e3:.0f} ms")

    from gunrock_tpu.ops.sort import lex_sort
    timeit("sort2key_2op", lambda x, y: lex_sort((x, y), num_keys=2,
                                                 two_pass=False), a, b)
    timeit("sort2key_3op", lambda x, y, z: lex_sort((x, y, z), num_keys=2,
                                                    two_pass=False), a, b, t)
    timeit("sort1key_2N", lambda x: jax.lax.sort(
        (jnp.concatenate([x, x]),), num_keys=1)[0], a)
    timeit("cumsum", lambda x: jnp.cumsum(x), a)
    timeit("cummax", lambda x: jax.lax.cummax(x), a)
    vb = jnp.arange(V + 1, dtype=jnp.int32)
    a_s = jnp.sort(a)
    timeit("searchsorted_V", lambda s, q: jnp.searchsorted(s, q), a_s, vb)
