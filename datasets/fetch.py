"""Network-optional SuiteSparse/SNAP fetcher (role of reference
datasets/Makefile:5-11 + per-graph Makefiles + common.mk, which wget
tarballs from sparse.tamu.edu and extract the .mtx).

This environment has no egress; every fetch is attempted with a short
connect timeout and skipped gracefully offline, so the targets become
live the moment the sandbox gains network. Files land as
datasets/<name>.mtx next to the synthetic suites, and the example CLIs /
benchmarks take them via --market like any other graph.

Usage:
    python fetch.py --suite regression   # reference regression graphs
    python fetch.py --suite standard     # STANDARD/TOPC north stars
    python fetch.py soc-LiveJournal1     # one graph by name
"""

from __future__ import annotations

import argparse
import hashlib
import io
import os
import sys
import tarfile
import urllib.error
import urllib.request

HERE = os.path.dirname(os.path.abspath(__file__))

# SuiteSparse matrix-market tarballs: https://sparse.tamu.edu/MM/<group>/<name>.tar.gz
# (the reference's www.cise.ufl.edu URLs 301-redirect here). sha256 of the
# tarball where published stable; None = verify only the extracted .mtx header.
SUITESPARSE = "https://sparse.tamu.edu/MM/{group}/{name}.tar.gz"

GRAPHS: dict[str, dict] = {
    # STANDARD / TOPC north stars (BASELINE.md headline targets)
    "soc-LiveJournal1": {"group": "SNAP"},
    "hollywood-2009": {"group": "LAW"},
    "indochina-2004": {"group": "LAW"},
    "road_usa": {"group": "DIMACS10"},
    # soc-orkut: the reference pulls nrvis.com's zip; SuiteSparse carries
    # the same graph as SNAP/com-Orkut
    "com-Orkut": {"group": "SNAP"},
    # regression extras
    "ak2010": {"group": "DIMACS10"},
    "belgium_osm": {"group": "DIMACS10"},
    "delaunay_n13": {"group": "DIMACS10"},
    "delaunay_n21": {"group": "DIMACS10"},
    "delaunay_n24": {"group": "DIMACS10"},
    "coAuthorsDBLP": {"group": "DIMACS10"},
    "kron_g500-logn21": {"group": "DIMACS10"},
    "webbase-1M": {"group": "Williams"},
    "europe_osm": {"group": "DIMACS10"},
    "cit-Patents": {"group": "SNAP"},
    "roadNet-CA": {"group": "SNAP"},
    "chesapeake": {"group": "HB"},  # already vendored; fetch = no-op
}

SUITES = {
    "standard": [
        "soc-LiveJournal1", "hollywood-2009", "com-Orkut",
        "indochina-2004", "road_usa",
    ],
    "regression": [
        "ak2010", "belgium_osm", "delaunay_n13", "delaunay_n21",
        "coAuthorsDBLP", "roadNet-CA", "cit-Patents", "webbase-1M",
    ],
}


def fetch(name: str, timeout: float = 15.0) -> bool:
    """Download + extract one graph. Returns True if the .mtx exists
    afterwards (already present counts). Never raises on network
    failure — prints SKIP and returns False."""
    spec = GRAPHS[name]
    dest = os.path.join(HERE, f"{name}.mtx")
    if os.path.exists(dest):
        print(f"{name}: already present ({dest})")
        return True
    url = SUITESPARSE.format(group=spec["group"], name=name)
    try:
        req = urllib.request.Request(url, headers={"User-Agent": "gunrock-tpu"})
        with urllib.request.urlopen(req, timeout=timeout) as r:
            data = r.read()
    except (urllib.error.URLError, OSError, TimeoutError) as e:
        print(f"{name}: SKIP (offline or unreachable: {e})")
        return False
    digest = hashlib.sha256(data).hexdigest()
    want = spec.get("sha256")
    if want and digest != want:
        print(f"{name}: CHECKSUM MISMATCH ({digest[:16]} != {want[:16]})")
        return False
    with tarfile.open(fileobj=io.BytesIO(data), mode="r:gz") as tf:
        member = next(
            (m for m in tf.getmembers()
             if m.name.endswith(f"{name}.mtx")), None,
        )
        if member is None:
            print(f"{name}: no {name}.mtx in tarball")
            return False
        fh = tf.extractfile(member)
        assert fh is not None
        payload = fh.read()
    if not payload.startswith(b"%%MatrixMarket"):
        print(f"{name}: extracted file is not MatrixMarket")
        return False
    with open(dest, "wb") as out:
        out.write(payload)
    print(f"{name}: fetched {len(payload) / 1e6:.1f} MB "
          f"(tarball sha256 {digest[:16]}…)")
    return True


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("names", nargs="*", help="graph names to fetch")
    p.add_argument("--suite", choices=sorted(SUITES), default=None)
    p.add_argument("--timeout", type=float, default=15.0)
    ns = p.parse_args()
    names = list(ns.names)
    if ns.suite:
        names += SUITES[ns.suite]
    if not names:
        p.error("give graph names or --suite")
    unknown = [n for n in names if n not in GRAPHS]
    if unknown:
        p.error(f"unknown graphs: {unknown}; known: {sorted(GRAPHS)}")
    got = sum(fetch(n, ns.timeout) for n in names)
    print(f"{got}/{len(names)} available")
    # offline is not an error: the suites are best-effort by design
    return 0


if __name__ == "__main__":
    sys.exit(main())
