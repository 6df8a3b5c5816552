"""Regression suite runner: every example CLI with --validate over real
and structurally-diverse graph families (role of the reference's
regression dataset suite, datasets/Makefile:5-11 — downloaded SuiteSparse
graphs driven through the example binaries; here the families are the
vendored chesapeake + deterministic synthetic proxies for each structural
class), plus recorded-invariant checks (BFS depth histogram, MST weight,
triangle count, PageRank mass) against ``expected.json``.

Usage:
    python regression.py           # run suite, compare against expected.json
    python regression.py --record  # (re)write expected.json
    python regression.py --families chesapeake,delaunay2k

Runs on CPU only — the suite is a correctness gate, never a benchmark.
"""

from __future__ import annotations

import argparse
import contextlib
import io as _io
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # a down tunnel must not hang CI

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

EXPECTED = os.path.join(HERE, "expected.json")

# (family, mtx file, generate.py argv to build it — None = vendored)
FAMILIES = {
    # real graph (SuiteSparse chesapeake, vendored from the reference mount)
    "chesapeake": ("chesapeake.mtx", None),
    # power-law / scale-free (soc-* proxy)
    "rmat12": ("rmat12.mtx",
               ["rmat", "--scale", "12", "--edge-factor", "8"]),
    "rmat12_sym": ("rmat12_sym.mtx",
                   ["rmat", "--scale", "12", "--edge-factor", "8",
                    "--undirected"]),
    # planar mesh / road-like (delaunay_n* proxy; long diameter)
    "delaunay2k": ("delaunay2k.mtx", ["delaunay", "--n", "2048"]),
    # community structure (coAuthorsDBLP proxy)
    "sbm2k": ("sbm2k.mtx", ["sbm", "--n", "2048", "--blocks", "16",
                            "--mixing", "0.05"]),
    # lattice road network
    "grid64": ("grid64.mtx", ["grid", "--side", "64"]),
    # bipartite web-style (cit-Patents / webbase proxy; directed)
    "bipartite2k": ("bipartite2k.mtx",
                    ["bipartite", "--left", "1024", "--right", "1024"]),
}

# CLI battery per family: symmetric families run the full set; directed
# families skip the undirected-only algorithms (mst/kcore/color/tc
# symmetrize internally but their --validate oracles assume symmetric
# input weights for mst).
FULL = [
    ("bfs", ["--src", "0", "--validate"]),
    ("sssp", ["--src", "0", "--validate"]),
    ("pr", ["--validate"]),
    ("bc", ["--src", "0", "--validate"]),
    ("color", ["--validate"]),
    ("color", ["--validate", "--strategy", "greedy"]),
    ("kcore", ["--validate"]),
    ("tc", ["--validate"]),
    ("spmv", ["--validate"]),
    ("hits", ["--validate", "--max_iterations", "20"]),
    ("mst", ["--validate"]),
    ("ppr", ["--src", "0", "--validate"]),
    ("geo", ["--spatial_iterations", "25", "--validate"]),
    ("spgemm", ["--validate"]),
]
DIRECTED = [
    ("bfs", ["--src", "0", "--validate"]),
    ("sssp", ["--src", "0", "--validate"]),
    ("pr", ["--validate"]),
    ("spmv", ["--validate"]),
    ("hits", ["--validate", "--max_iterations", "20"]),
    ("ppr", ["--src", "0"]),
    ("spgemm", ["--validate"]),
    ("tc", ["--validate"]),  # directed input: symmetrized semantics
]


def ensure_graphs(names):
    for fam in names:
        fname, gen = FAMILIES[fam]
        path = os.path.join(HERE, fname)
        if os.path.exists(path):
            continue
        if gen is None:
            raise FileNotFoundError(f"vendored file missing: {path}")
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "generate.py")] + gen
            + ["-o", path],
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
            capture_output=True, text=True, timeout=600,
        )
        if r.returncode != 0:
            raise RuntimeError(f"generate {fam} failed: {r.stderr[-500:]}")
        print(r.stdout.strip())


def run_cli(algo, argv):
    """Drive the example main() in-process; FAIL on any 'FAILED' line."""
    mod = __import__(f"gunrock_tpu.examples.{algo}", fromlist=["main"])
    buf = _io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            mod.main(argv)
    except SystemExit as e:  # validation failures sys.exit(1)
        out = buf.getvalue()
        return (not e.code, out)
    out = buf.getvalue()
    return ("FAILED" not in out), out


def invariants(path):
    """Deterministic per-graph result fingerprints, recorded once and
    checked forever (the reference records expected outputs per dataset
    in its regression flow)."""
    from gunrock_tpu.algorithms import bfs, mst, pr, tc
    from gunrock_tpu.io import load_graph_file

    g, props = load_graph_file(path)
    inv = {"n_vertices": int(g.n_vertices), "n_edges": int(g.n_edges)}
    d = np.asarray(bfs.run(g, 0, warmup=False).distances)
    reached = d[d != np.iinfo(np.int32).max]
    inv["bfs_depth"] = int(reached.max()) if reached.size else 0
    inv["bfs_reached"] = int(reached.size)
    inv["pr_top_vertex"] = int(np.argmax(np.asarray(pr.run(g, warmup=False).p)))
    if props.symmetric:
        inv["mst_weight"] = round(float(mst.run(g, warmup=False).mst_weight), 4)
        inv["n_triangles"] = int(tc.run(g, warmup=False).n_triangles)
    return inv


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--record", action="store_true",
                    help="write expected.json instead of checking")
    ap.add_argument("--families", default=",".join(FAMILIES),
                    help="comma-separated subset")
    ns = ap.parse_args(argv)
    names = [f for f in ns.families.split(",") if f]
    ensure_graphs(names)

    failures = []
    recorded = {}
    for fam in names:
        fname, _ = FAMILIES[fam]
        path = os.path.join(HERE, fname)
        directed = fam in ("rmat12", "bipartite2k")
        battery = DIRECTED if directed else FULL
        for algo, extra in battery:
            t0 = time.perf_counter()
            try:
                ok, out = run_cli(algo, ["--market", path] + extra)
            except Exception as e:  # noqa: BLE001 — record, keep running
                ok, out = False, f"exception: {e!r}"
            dt = time.perf_counter() - t0
            mark = "ok" if ok else "FAIL"
            print(f"[{fam}] {algo} {' '.join(extra)}: {mark} ({dt:.1f}s)")
            if not ok:
                failures.append((fam, algo, out[-800:]))
        recorded[fam] = invariants(path)
        print(f"[{fam}] invariants: {recorded[fam]}")

    if ns.record:
        # merge into existing records: --record with a --families subset
        # must not wipe the other families' invariants
        merged = {}
        if os.path.exists(EXPECTED):
            merged = json.load(open(EXPECTED))
        merged.update(recorded)
        with open(EXPECTED, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
        print(f"recorded {sorted(recorded)} -> {EXPECTED}")
    elif os.path.exists(EXPECTED):
        want = json.load(open(EXPECTED))
        for fam in names:
            if fam not in want:
                continue
            for k, v in want[fam].items():
                got = recorded[fam].get(k)
                if isinstance(v, float):
                    match = got is not None and abs(got - v) <= 1e-3 * max(1.0, abs(v))
                else:
                    match = got == v
                if not match:
                    failures.append((fam, f"invariant {k}", f"want {v} got {got}"))
                    print(f"[{fam}] invariant {k}: FAIL (want {v}, got {got})")

    if failures:
        print(f"\n{len(failures)} FAILURE(S):")
        for fam, what, detail in failures:
            print(f"--- {fam} / {what} ---\n{detail}\n")
        sys.exit(1)
    print(f"\nregression suite PASSED ({len(names)} families)")


if __name__ == "__main__":
    main()
