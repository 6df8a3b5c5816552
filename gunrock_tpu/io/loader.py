"""Unified graph-file loader with extension sniffing.

Role of reference include/gunrock/util/filepath.hxx (``is_market``,
``is_binary_csr``, ``extract_dataset``) + the per-example load logic
(examples/algorithms/bfs/bfs.cu:33-37): pick a parser by extension,
preferring the binary CSR cache when present.
"""

from __future__ import annotations

from pathlib import Path

from gunrock_tpu.formats import Csr, coo_to_csr
from gunrock_tpu.graph import Graph, build_graph
from gunrock_tpu.graph.properties import GraphProperties


def is_market(path: str | Path) -> bool:
    s = str(path)
    return s.endswith(".mtx") or s.endswith(".mtx.gz") or s.endswith(".mm")


def is_binary_csr(path: str | Path) -> bool:
    return str(path).endswith(".csr")


def is_smtx(path: str | Path) -> bool:
    return str(path).endswith(".smtx")


def extract_filename(path: str | Path) -> str:
    return Path(path).name


def extract_dataset(filename: str) -> str:
    """Dataset name = filename stem (reference util/filepath.hxx)."""
    name = filename
    for suffix in (".gz", ".mtx", ".csr", ".smtx", ".mm"):
        if name.endswith(suffix):
            name = name[: -len(suffix)]
    return name


def load_graph_file(
    path: str | Path,
    properties: GraphProperties | None = None,
) -> tuple[Graph, GraphProperties]:
    """Load any supported graph file into a device Graph."""
    path = Path(path)
    if is_binary_csr(path):
        csr = Csr.read_binary(path)
        props = properties or GraphProperties(directed=True, weighted=True)
        return build_graph(csr, props), props
    if is_smtx(path):
        from gunrock_tpu.io.smtx import load_smtx

        csr = load_smtx(path)
        props = properties or GraphProperties(directed=True, weighted=True)
        return build_graph(csr, props), props
    if is_market(path):
        from gunrock_tpu.io.matrix_market import load_matrix_market

        props, coo = load_matrix_market(path)
        if properties is not None:
            props = properties
        return build_graph(coo_to_csr(coo), props), props
    raise ValueError(f"unrecognized graph file extension: {path}")
