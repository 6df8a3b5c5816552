"""Format container + conversion tests (role of reference
unittests/formats/format.cuh and graph conversion tests)."""

import numpy as np
import pytest

from gunrock_tpu.formats import Coo, Csr, coo_to_csr, coo_to_csc, csr_to_coo, csr_to_csc
from gunrock_tpu.formats.formats import indices_to_offsets, offsets_to_indices


def _sample_coo():
    # reference io/sample.hxx matrix:
    # (1,0)[5] (1,1)[8] (2,2)[3] (3,1)[6]
    return Coo(
        n_rows=4,
        n_cols=4,
        row_indices=np.array([1, 1, 2, 3], dtype=np.int32),
        col_indices=np.array([0, 1, 2, 1], dtype=np.int32),
        values=np.array([5, 8, 3, 6], dtype=np.float32),
    )


def test_coo_to_csr_matches_reference_sample():
    csr = coo_to_csr(_sample_coo())
    np.testing.assert_array_equal(csr.row_offsets, [0, 0, 2, 3, 4])
    np.testing.assert_array_equal(csr.col_indices, [0, 1, 2, 1])
    np.testing.assert_array_equal(csr.values, [5, 8, 3, 6])


def test_coo_to_csc():
    csc = coo_to_csc(_sample_coo())
    np.testing.assert_array_equal(csc.col_offsets, [0, 1, 3, 4, 4])
    np.testing.assert_array_equal(csc.row_indices, [1, 1, 3, 2])
    np.testing.assert_array_equal(csc.values, [5, 8, 6, 3])


def test_csr_roundtrip_coo():
    csr = coo_to_csr(_sample_coo())
    coo = csr_to_coo(csr)
    np.testing.assert_array_equal(coo.row_indices, [1, 1, 2, 3])
    np.testing.assert_array_equal(coo.col_indices, [0, 1, 2, 1])


def test_csr_to_csc_perm():
    csr = coo_to_csr(_sample_coo())
    csc, perm = csr_to_csc(csr)
    # perm maps csc slot -> csr edge id; values must line up
    np.testing.assert_array_equal(csr.values[perm], csc.values)


def test_offsets_indices_roundtrip():
    offsets = np.array([0, 0, 2, 5, 5, 9], dtype=np.int64)
    idx = offsets_to_indices(offsets)
    np.testing.assert_array_equal(idx, [1, 1, 2, 2, 2, 4, 4, 4, 4])
    np.testing.assert_array_equal(indices_to_offsets(idx, 5), offsets)


def test_binary_csr_cache_roundtrip(tmp_path):
    csr = coo_to_csr(_sample_coo())
    path = tmp_path / "g.csr"
    csr.write_binary(path)
    loaded = Csr.read_binary(path)
    assert loaded.n_rows == csr.n_rows
    np.testing.assert_array_equal(loaded.row_offsets, csr.row_offsets)
    np.testing.assert_array_equal(loaded.col_indices, csr.col_indices)
    np.testing.assert_array_equal(loaded.values, csr.values)


def test_binary_csr_rejects_garbage(tmp_path):
    path = tmp_path / "bad.csr"
    path.write_bytes(b"not a csr file at all")
    with pytest.raises(ValueError):
        Csr.read_binary(path)


def test_scipy_oracle_random(rng):
    import scipy.sparse as sp

    n, nnz = 50, 300
    rows = rng.integers(0, n, nnz).astype(np.int32)
    cols = rng.integers(0, n, nnz).astype(np.int32)
    vals = rng.random(nnz).astype(np.float32)
    # scipy sums duplicates; dedupe first for a clean comparison
    keys = rows.astype(np.int64) * n + cols
    _, first = np.unique(keys, return_index=True)
    rows, cols, vals = rows[first], cols[first], vals[first]

    csr = coo_to_csr(Coo(n, n, rows, cols, vals))
    oracle = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    oracle.sort_indices()
    np.testing.assert_array_equal(csr.row_offsets, oracle.indptr)
    np.testing.assert_array_equal(csr.col_indices, oracle.indices)
    np.testing.assert_allclose(csr.values, oracle.data)
