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


def _write_skew(tmp_path):
    content = """%%MatrixMarket matrix coordinate real skew-symmetric
4 4 2
2 1 1.5
4 3 -2.0
"""
    p = tmp_path / "skew.mtx"
    p.write_text(content)
    return p


def test_skew_symmetric_no_expansion_native(tmp_path):
    """Reference parity (mmio mm_is_symmetric excludes skew): skew files
    are general/directed with NO mirror expansion — native path."""
    from gunrock_tpu import _native

    if not _native.available():
        pytest.skip("native lib unavailable")
    props, coo = load_matrix_market(_write_skew(tmp_path))
    assert props.directed and not props.symmetric
    assert coo.nnz == 2
    np.testing.assert_allclose(np.sort(coo.values), [-2.0, 1.5])


def test_skew_symmetric_no_expansion_python(tmp_path, monkeypatch):
    """Same semantics through the pure-Python fallback parser."""
    import gunrock_tpu.io.matrix_market as mm

    monkeypatch.setattr(mm, "_load_native", lambda path: None)
    props, coo = mm.load_matrix_market(_write_skew(tmp_path))
    assert props.directed and not props.symmetric
    assert coo.nnz == 2
    np.testing.assert_allclose(np.sort(coo.values), [-2.0, 1.5])


def test_native_python_parser_agreement(tmp_path):
    """Native and Python parsers must return identical edges/properties
    on general, symmetric, and skew-symmetric inputs."""
    import gunrock_tpu.io.matrix_market as mm
    from gunrock_tpu import _native

    if not _native.available():
        pytest.skip("native lib unavailable")
    files = {
        "gen.mtx": "%%MatrixMarket matrix coordinate real general\n3 3 2\n1 2 1.0\n3 1 2.0\n",
        "sym.mtx": "%%MatrixMarket matrix coordinate real symmetric\n3 3 2\n2 1 1.0\n3 3 5.0\n",
        "skew.mtx": "%%MatrixMarket matrix coordinate real skew-symmetric\n3 3 1\n2 1 1.0\n",
    }
    for name, content in files.items():
        p = tmp_path / name
        p.write_text(content)
        props_n, coo_n = mm.load_matrix_market(p)

        real_native = mm._load_native
        try:
            mm._load_native = lambda path: None
            props_p, coo_p = mm.load_matrix_market(p)
        finally:
            mm._load_native = real_native
        assert (props_n.directed, props_n.symmetric, props_n.weighted) == (
            props_p.directed, props_p.symmetric, props_p.weighted), name
        order_n = np.lexsort((coo_n.col_indices, coo_n.row_indices))
        order_p = np.lexsort((coo_p.col_indices, coo_p.row_indices))
        np.testing.assert_array_equal(
            coo_n.row_indices[order_n], coo_p.row_indices[order_p], err_msg=name)
        np.testing.assert_array_equal(
            coo_n.col_indices[order_n], coo_p.col_indices[order_p], err_msg=name)
        np.testing.assert_allclose(
            coo_n.values[order_n], coo_p.values[order_p], err_msg=name)


def test_mtx_eof_no_trailing_newline(tmp_path):
    """A float value flush at EOF with no trailing newline must parse
    (native parser reads the mmap'd tail with a bounded buffer)."""
    p = tmp_path / "eof.mtx"
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n2 2 2\n1 2 1.25\n2 1 3.75")
    props, coo = load_matrix_market(p)
    assert coo.nnz == 2
    np.testing.assert_allclose(np.sort(coo.values), [1.25, 3.75])
