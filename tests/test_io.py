"""IO tests: matrix market, smtx, loader sniffing."""

import os

import numpy as np
import pytest

from gunrock_tpu.formats import coo_to_csr
from gunrock_tpu.io import load_matrix_market, load_graph_file
from gunrock_tpu.io.loader import extract_dataset, is_binary_csr, is_market

REFERENCE_CHESAPEAKE = "/root/reference/datasets/chesapeake/chesapeake.mtx"


def test_load_general_mtx(small_mtx):
    props, coo = load_matrix_market(small_mtx)
    assert props.directed and props.weighted and not props.symmetric
    assert coo.n_rows == 5 and coo.nnz == 7
    # 1-based -> 0-based
    assert coo.row_indices.min() == 0
    csr = coo_to_csr(coo)
    np.testing.assert_array_equal(csr.row_offsets, [0, 2, 4, 5, 6, 7])


def test_load_symmetric_pattern_mtx(symmetric_mtx):
    props, coo = load_matrix_market(symmetric_mtx)
    assert props.symmetric and not props.directed and not props.weighted
    # 7 entries, all off-diagonal -> duplicated to 14
    assert coo.nnz == 14
    np.testing.assert_allclose(coo.values, 1.0)  # pattern => unit weights


def test_loader_sniffing():
    assert is_market("foo.mtx") and is_market("foo.mtx.gz")
    assert is_binary_csr("foo.csr")
    assert extract_dataset("chesapeake.mtx") == "chesapeake"
    assert extract_dataset("big.mtx.gz") == "big"


def test_load_graph_file(small_mtx):
    g, props = load_graph_file(small_mtx)
    assert g.n_vertices == 5
    assert g.n_edges == 7


def test_smtx(tmp_path):
    content = """%%MatrixMarket-like smtx
% comment
3 3 4
0 1 3 4
1 2 0 2
"""
    p = tmp_path / "t.smtx"
    p.write_text(content)
    from gunrock_tpu.io import load_smtx

    csr = load_smtx(p)
    assert csr.n_rows == 3 and csr.nnz == 4
    np.testing.assert_array_equal(csr.row_offsets, [0, 1, 3, 4])
    np.testing.assert_array_equal(csr.col_indices, [1, 2, 0, 2])


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_CHESAPEAKE), reason="reference dataset not mounted"
)
def test_chesapeake():
    """The reference's vendored smoke graph: 39 vertices, 170 symmetric
    entries -> 340 directed edges after expansion (SURVEY.md section 4)."""
    props, coo = load_matrix_market(REFERENCE_CHESAPEAKE)
    assert props.symmetric
    assert coo.n_rows == 39
    assert coo.nnz == 340
