"""Serial CPU reference implementations for ``--validate``.

Role of the reference's per-example CPU oracles
(examples/algorithms/*/\\*_cpu.hxx, e.g. bfs/bfs_cpu.hxx): straightforward
host implementations compared against device output with
``utils.compare`` mismatch counting.
"""

from __future__ import annotations

import collections

import numpy as np

from gunrock_tpu.graph import hostcache


def _to_scipy(graph):
    import scipy.sparse as sp

    return sp.csr_matrix(
        (
            hostcache.host(graph, "values"),
            hostcache.host(graph, "col_indices"),
            hostcache.host(graph, "row_offsets"),
        ),
        shape=(graph.n_vertices, graph.n_vertices),
    )


def bfs(graph, source: int) -> np.ndarray:
    """Hop distances; int32 max where unreachable (bfs_cpu.hxx role)."""
    offs = hostcache.host(graph, "row_offsets")
    cols = hostcache.host(graph, "col_indices")
    V = graph.n_vertices
    dist = np.full(V, np.iinfo(np.int32).max, dtype=np.int32)
    dist[source] = 0
    q = collections.deque([source])
    while q:
        v = q.popleft()
        for e in range(offs[v], offs[v + 1]):
            u = cols[e]
            if dist[u] == np.iinfo(np.int32).max:
                dist[u] = dist[v] + 1
                q.append(u)
    return dist


def sssp(graph, source: int) -> np.ndarray:
    """Dijkstra distances; +inf where unreachable (sssp_cpu.hxx role)."""
    from scipy.sparse.csgraph import dijkstra

    return dijkstra(_to_scipy(graph), indices=source).astype(np.float32)


def pr(graph, alpha: float = 0.85, tol: float = 1e-6, max_iter: int = 10_000):
    """Weighted power iteration with the reference's dangling handling
    (pr.hxx:107-170 semantics)."""
    A = _to_scipy(graph)
    V = graph.n_vertices
    out_wsum = np.asarray(A.sum(axis=1)).ravel()
    iweights = np.where(out_wsum != 0, alpha / np.where(out_wsum == 0, 1, out_wsum), 0.0)
    p = np.full(V, 1.0 / V)
    for _ in range(max_iter):
        plast = p.copy()
        dsum = np.sum(np.where(iweights == 0.0, alpha * plast, 0.0))
        base = (1.0 - alpha + dsum) / V
        p = base + A.T @ (plast * iweights)
        if np.max(np.abs(p - plast)) < tol:
            break
    return p.astype(np.float32)


def ppr(graph, seed: int, alpha: float = 0.15, epsilon: float = 1e-6,
        max_iterations: int | None = None) -> np.ndarray:
    """Andersen-style frontier-synchronous PPR push — the numpy mirror
    of algorithms/ppr.ppr_kernel (role of reference
    examples/algorithms/ppr/ppr_cpu.hxx, validated by ppr.cu:70).
    float32 arithmetic so knife-edge threshold crossings match the
    device loop."""
    A = _to_scipy(graph)
    V = graph.n_vertices
    deg = np.diff(A.indptr).astype(np.float32)
    srcs = np.repeat(np.arange(V), np.diff(A.indptr))
    c1 = np.float32(2 * alpha / (1 + alpha))
    c2 = np.float32((1 - alpha) / (1 + alpha))
    p = np.zeros(V, np.float32)
    r = np.zeros(V, np.float32)
    r[seed] = 1.0
    front = np.zeros(V, bool)
    front[seed] = True
    thresh = (deg * np.float32(epsilon)).astype(np.float32)
    max_it = (2 * V) if max_iterations is None else max_iterations
    it = 0
    while front.any() and it < max_it:
        p = np.where(front, p + c1 * r, p)
        rp = np.where(front, np.float32(0.0), r)
        push = np.where(
            front[srcs], c2 * r[srcs] / np.maximum(deg[srcs], 1.0), 0.0
        ).astype(np.float32)
        upd = np.bincount(
            A.indices, weights=push, minlength=V
        ).astype(np.float32)
        new_rp = (rp + upd).astype(np.float32)
        front = (rp < thresh) & (new_rp >= thresh)
        r = new_rp
        it += 1
    return p


def geo_invariants(graph, lat0, lon0, out_lat, out_lon,
                   atol: float = 1e-2) -> int:
    """Geolocation invariants check (the reference geo driver ships no
    CPU oracle — geo.cu validates nothing; these are the exact closed
    forms of geo.hxx's 1- and 2-neighbor cases plus label preservation).
    Returns the number of violations:

    1. originally-labeled vertices keep their coordinates,
    2. predicted coordinates lie in valid (lat, lon) ranges,
    3. an unlabeled vertex whose ONLY originally-labeled neighbor is v
       ends exactly at v's coordinates (assigned at iteration 1, stable
       after),
    4. exactly two originally-labeled neighbors -> their haversine
       midpoint (algorithms/geo.midpoint closed form).
    """
    from gunrock_tpu.algorithms.geo import midpoint

    A = _to_scipy(graph)
    V = graph.n_vertices
    lat0 = np.asarray(lat0, np.float32)
    lon0 = np.asarray(lon0, np.float32)
    out_lat = np.asarray(out_lat, np.float32)
    out_lon = np.asarray(out_lon, np.float32)
    labeled0 = ~np.isnan(lat0)
    errors = 0
    keep = labeled0 & (
        ~np.isclose(out_lat, lat0, atol=atol)
        | ~np.isclose(out_lon, lon0, atol=atol)
    )
    errors += int(keep.sum())
    ok = ~np.isnan(out_lat)
    bad_range = ok & (
        (out_lat < -90 - atol) | (out_lat > 90 + atol)
        | (out_lon < -180 - atol) | (out_lon > 180 + atol)
    )
    errors += int(bad_range.sum())
    srcs = np.repeat(np.arange(V), np.diff(A.indptr))
    nb_lab = labeled0[A.indices]
    nlab = np.bincount(srcs, weights=nb_lab, minlength=V)
    # first labeled neighbor per src (edge order, matches the kernel)
    first = np.full(V, -1, np.int64)
    order = np.flatnonzero(nb_lab)[::-1]
    first[srcs[order]] = A.indices[order]
    last = np.full(V, -1, np.int64)
    order_f = np.flatnonzero(nb_lab)
    last[srcs[order_f]] = A.indices[order_f]
    one = (~labeled0) & (nlab == 1) & (first >= 0)
    if one.any():
        errors += int((
            ~np.isclose(out_lat[one], lat0[first[one]], atol=atol)
            | ~np.isclose(out_lon[one], lon0[first[one]], atol=atol)
        ).sum())
    two = (~labeled0) & (nlab == 2) & (first >= 0) & (last >= 0)
    if two.any():
        import jax.numpy as jnp

        mla, mlo = midpoint(
            jnp.asarray(lat0[first[two]]), jnp.asarray(lon0[first[two]]),
            jnp.asarray(lat0[last[two]]), jnp.asarray(lon0[last[two]]),
        )
        # midpoint()'s atan2 form can land outside [-180, 180) while the
        # kernel wraps on assignment — compare longitudes modulo 360
        dlon = np.mod(
            out_lon[two] - np.asarray(mlo) + 180.0, 360.0
        ) - 180.0
        errors += int((
            ~np.isclose(out_lat[two], np.asarray(mla), atol=atol)
            | (np.abs(dlon) > atol)
        ).sum())
    return errors


def spmv(graph, x: np.ndarray) -> np.ndarray:
    return (_to_scipy(graph) @ x).astype(np.float32)


def spgemm(graph_a, graph_b) -> np.ndarray:
    return (_to_scipy(graph_a) @ _to_scipy(graph_b)).toarray()


def tc(graph) -> np.ndarray:
    """Per-vertex triangle membership counts (undirected simple graph).
    Sparse throughout: diag(A^3) = rowsum(A^2 .* A^T) — the dense cube is
    O(V^3) and unusable beyond toy graphs."""
    import scipy.sparse as sp

    A = (_to_scipy(graph) != 0).astype(np.int64).tocsr()
    A.setdiag(0)
    A.eliminate_zeros()
    A = A.maximum(A.T).tocsr()
    diag_a3 = np.asarray((A @ A).multiply(A.T).sum(axis=1)).ravel()
    return (diag_a3 // 2).astype(np.int32)


def kcore(graph) -> np.ndarray:
    """Peeling from k=1 (reference semantics: isolated vertices get 1).
    Self loops are excluded from degrees (deviation: kcore.hxx:79-84
    counts them, which disagrees with the standard core-number
    definition/networkx on non-simple inputs; every other algorithm here
    already drops self loops)."""
    offs = hostcache.host(graph, "row_offsets")
    cols = hostcache.host(graph, "col_indices")
    V = graph.n_vertices
    src = np.repeat(np.arange(V), np.diff(offs))
    deg = np.diff(offs).astype(np.int64) - np.bincount(
        src[src == cols], minlength=V
    )
    cores = np.zeros(V, dtype=np.int32)
    alive = np.ones(V, dtype=bool)
    k = 1
    while alive.any():
        peel = alive & (deg <= k)
        if not peel.any():
            k += 1
            continue
        for v in np.nonzero(peel)[0]:
            cores[v] = k
            alive[v] = False
            for e in range(offs[v], offs[v + 1]):
                deg[cols[e]] -= 1
    return cores


def color_is_valid(graph, colors: np.ndarray) -> bool:
    src = hostcache.host(graph, "edge_src")
    dst = hostcache.host(graph, "col_indices")
    off_diag = src != dst
    return bool(
        (colors >= 0).all()
        and (colors[src[off_diag]] != colors[dst[off_diag]]).all()
    )


def mst_weight(graph) -> float:
    from scipy.sparse.csgraph import minimum_spanning_tree

    return float(minimum_spanning_tree(_to_scipy(graph)).sum())


def hits(graph, iterations: int):
    A = (_to_scipy(graph) != 0).astype(np.float64)
    V = graph.n_vertices
    auth = np.ones(V)
    hub = np.ones(V)
    for _ in range(iterations):
        hub_n = A @ auth
        auth_n = A.T @ hub
        auth = auth_n / (np.linalg.norm(auth_n) or 1.0)
        hub = hub_n / (np.linalg.norm(hub_n) or 1.0)
    return auth.astype(np.float32), hub.astype(np.float32)


def bc(graph, source: int) -> np.ndarray:
    """Single-source Brandes dependencies, 0.5-scaled (bc.hxx parity)."""
    offs = hostcache.host(graph, "row_offsets")
    cols = hostcache.host(graph, "col_indices")
    V = graph.n_vertices
    sigma = np.zeros(V)
    dist = np.full(V, -1)
    sigma[source] = 1.0
    dist[source] = 0
    order = []
    preds = [[] for _ in range(V)]
    q = collections.deque([source])
    while q:
        v = q.popleft()
        order.append(v)
        for e in range(offs[v], offs[v + 1]):
            u = cols[e]
            if dist[u] < 0:
                dist[u] = dist[v] + 1
                q.append(u)
            if dist[u] == dist[v] + 1:
                sigma[u] += sigma[v]
                preds[u].append(v)
    delta = np.zeros(V)
    for v in reversed(order):
        for u in preds[v]:
            delta[u] += sigma[u] / sigma[v] * (1 + delta[v])
    delta[source] = 0.0
    return (0.5 * delta).astype(np.float32)
