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
