"""Geolocation example driver (role of reference examples/algorithms/geo/geo.cu).

The reference driver reads a labels file (``--labels``) with known
lat/long per vertex; here omitted labels default to a deterministic 10%
random labeling so the example runs on any graph.
"""

from __future__ import annotations

import numpy as np

from gunrock_tpu.algorithms import geo
from gunrock_tpu.examples import runner
from gunrock_tpu.io.parameters import parse


def load_labels(path: str, n_vertices: int):
    """Reference labels file (geo.cu:12-100 semantics): ``%`` comments,
    then ONE size line ``N L L``, then ``node_id lat lon`` lines with
    0-BASED node ids; a line carrying only a node id means "coordinates
    missing" (left invalid/NaN). The previous reader treated ids as
    1-based and the size line as a label — vertex 0's label landed on
    the last vertex via numpy's -1 wraparound."""
    lat = np.full(n_vertices, np.nan, np.float32)
    lon = np.full(n_vertices, np.nan, np.float32)
    size_seen = False
    with open(path) as f:
        for line in f:
            if line.startswith("%") or not line.strip():
                continue
            if not size_seen:  # problem-description line: N L L
                size_seen = True
                continue
            parts = line.split()
            v = int(parts[0])
            if len(parts) >= 3 and 0 <= v < n_vertices:
                lat[v], lon[v] = float(parts[1]), float(parts[2])
    return lat, lon


def main(argv=None):
    params = parse(
        "geo", argv,
        extra_args=[
            (("--labels",), dict(default="", help="label file (vertex lat lon)")),
            (("--total_iterations",), dict(type=int, default=10)),
            (("--spatial_iterations",), dict(type=int, default=1000)),
        ],
    )
    graph, _ = runner.load(params)
    V = graph.n_vertices
    if params.extra.labels:
        lat, lon = load_labels(params.extra.labels, V)
    else:
        rng = np.random.default_rng(0)
        lat = np.full(V, np.nan, np.float32)
        lon = np.full(V, np.nan, np.float32)
        known = rng.choice(V, size=max(1, V // 10), replace=False)
        lat[known] = rng.uniform(-60, 60, known.size).astype(np.float32)
        lon[known] = rng.uniform(-180, 180, known.size).astype(np.float32)

    # labels are keyed by input vertex ids; permute into execution space
    lat = runner.to_relabeled(params, lat)
    lon = runner.to_relabeled(params, lon)

    times = []
    result = None
    mesh, build_sharded = runner.maybe_mesh(params)
    if mesh is not None:
        from gunrock_tpu.parallel import sharded

        sg = build_sharded(graph)
        times, (glat, glon) = runner.timed_runs(
            params.num_runs,
            lambda: sharded.geo(
                sg, lat, lon, mesh,
                total_iterations=params.extra.total_iterations,
                spatial_iterations=params.extra.spatial_iterations),
        )
        result = geo.Result(latitude=glat, longitude=glon,
                            elapsed_ms=times[-1])
    else:
        for _ in range(params.num_runs):
            result = geo.run(graph, lat, lon,
                             total_iterations=params.extra.total_iterations,
                             spatial_iterations=params.extra.spatial_iterations,
                             options=params.options)
            times.append(result.elapsed_ms)

    labeled = int((~np.isnan(np.asarray(result.latitude))).sum())
    print(f"located {labeled}/{V} vertices")
    runner.print_head(runner.to_original(params, result.latitude), name="latitude")
    runner.finish(params, "geo", graph, times)

    if params.validate:
        import sys

        from gunrock_tpu.examples import cpu_reference

        n = cpu_reference.geo_invariants(
            graph, lat, lon, result.latitude, result.longitude
        )
        if n == 0:
            print("geo validation: PASSED")
        else:
            print(f"geo validation: FAILED ({n} invariant violations)")
            sys.exit(1)


if __name__ == "__main__":
    main()
