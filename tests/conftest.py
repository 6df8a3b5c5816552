"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (the distributed-testing capability the
reference lacks entirely — SURVEY.md section 4 "Distributed/multi-node
testing: none"). Environment must be set before jax initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Force CPU even when the session default is the real TPU (JAX_PLATFORMS=axon):
# tests must exercise the 8-virtual-device mesh and never the tunneled chip.
# The axon sitecustomize force-registers its backend, so the env var alone is
# not enough — override through jax.config after import.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


REFERENCE_CHESAPEAKE = "/root/reference/datasets/chesapeake/chesapeake.mtx"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def small_mtx(tmp_path_factory):
    """A tiny 5-vertex weighted general matrix-market file (the pattern of
    reference python/tests/conftest.py:18-37)."""
    content = """%%MatrixMarket matrix coordinate real general
% test graph
5 5 7
1 2 1.0
1 3 2.5
2 3 0.5
3 4 1.5
4 5 2.0
5 1 3.0
2 5 4.5
"""
    path = tmp_path_factory.mktemp("data") / "tiny.mtx"
    path.write_text(content)
    return path


@pytest.fixture(scope="session")
def symmetric_mtx(tmp_path_factory):
    content = """%%MatrixMarket matrix coordinate pattern symmetric
6 6 7
2 1
3 1
3 2
4 3
5 4
6 5
6 4
"""
    path = tmp_path_factory.mktemp("data") / "sym.mtx"
    path.write_text(content)
    return path


def random_graph(rng, n=64, p=0.1, weighted=True, symmetric=False, seed_offset=0):
    """Random directed graph as (Graph, scipy.sparse.csr_matrix oracle)."""
    import scipy.sparse as sp

    from gunrock_tpu.formats import Coo, coo_to_csr
    from gunrock_tpu.graph import build_graph
    from gunrock_tpu.graph.properties import GraphProperties

    local = np.random.default_rng(1234 + seed_offset)
    dense = (local.random((n, n)) < p).astype(np.float32)
    np.fill_diagonal(dense, 0)
    if symmetric:
        dense = np.maximum(dense, dense.T)
    w = local.random((n, n)).astype(np.float32) + 0.1
    if symmetric:
        w = np.triu(w) + np.triu(w, 1).T  # symmetric weights
    mat = dense * (w if weighted else 1.0)
    sp_mat = sp.csr_matrix(mat)
    coo = sp_mat.tocoo()
    g = build_graph(
        coo_to_csr(
            Coo(
                n_rows=n,
                n_cols=n,
                row_indices=coo.row.astype(np.int32),
                col_indices=coo.col.astype(np.int32),
                values=coo.data.astype(np.float32),
            )
        ),
        GraphProperties(directed=not symmetric, weighted=weighted, symmetric=symmetric),
    )
    return g, sp_mat
