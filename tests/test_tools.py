"""Tools: metrics merge, points generator, dataset writer."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent


def test_collect_metrics_merge(tmp_path):
    sys.path.insert(0, str(REPO / "tools"))
    import collect_metrics

    runs = []
    for i, times in enumerate([[10.0, 11.0, 1000.0], [10.5, 9.5]]):
        p = tmp_path / f"r{i}.json"
        p.write_text(json.dumps({
            "primitive": "bfs", "graph_file": "g.mtx",
            "process_times": times, "edges_visited": 1000,
        }))
        runs.append(str(p))
    merged = collect_metrics.merge(runs)
    assert len(merged) == 1
    m = merged[0]
    # the 1000ms outlier is 2-sigma filtered
    assert m["num_times"] == 4
    assert 9 < m["avg_process_time"] < 12
    assert m["avg_mteps"] > 0


def test_points_generator(tmp_path):
    sys.path.insert(0, str(REPO / "tools"))
    import points

    pts = points.generate_stars(50, 50, 10, seed=1)
    assert pts.shape[1] == 2
    assert len(np.unique(pts, axis=0)) == len(pts)
    assert (pts >= 0).all() and (pts < 50).all()


def test_dataset_generate_roundtrip(tmp_path):
    """generate.py writes a valid .mtx that the loader round-trips."""
    out = tmp_path / "g.mtx"
    # Strip the axon-tunnel trigger: sitecustomize dials the remote TPU at
    # interpreter start when PALLAS_AXON_POOL_IPS is set, and a down tunnel
    # hangs the (pure-numpy) subprocess before main() even runs.
    env = {k: v for k, v in os.environ.items() if not k.startswith("PALLAS_AXON")}
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, str(REPO / "datasets" / "generate.py"),
         "rmat", "--scale", "8", "--edge-factor", "4", "-o", str(out)],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-300:]
    from gunrock_tpu.io import load_graph_file

    g, props = load_graph_file(out)
    assert g.n_vertices == 256 and g.n_edges > 0


def test_roofline_model_vs_xla_cost_analysis():
    """The analytical bytes-moved model (utils/roofline — the NVBench
    HW-counter analog every benchmark row now carries) must sit within
    3x of XLA's own bytes-accessed estimate for the one-shot SpMV kernel;
    wildly-off models would make the pct_stream headroom column lie."""
    from gunrock_tpu.algorithms.spmv import spmv_kernel
    from gunrock_tpu.io.generators import rmat_graph
    from gunrock_tpu.utils.roofline import cost_analysis_bytes, model_bytes, roofline

    g = rmat_graph(scale=10, edge_factor=8, seed=2)
    import jax.numpy as jnp

    x = jnp.ones(g.n_vertices, jnp.float32)
    xla_bytes = cost_analysis_bytes(lambda gg, xx: spmv_kernel(gg, xx), g, x)
    model = model_bytes("spmv", g.n_vertices, g.n_edges, g.n_edges, {})
    if xla_bytes is not None:
        ratio = xla_bytes / model
        assert 1 / 3 <= ratio <= 3, (xla_bytes, model)
    row = roofline("spmv", g.n_vertices, g.n_edges, g.n_edges, 1.0, {})
    assert row["gbps"] > 0 and 0 < row["pct_stream"] < 10000
