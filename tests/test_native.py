"""Native C++ IO vs the pure-python implementations."""

import numpy as np
import pytest

from gunrock_tpu import _native

CHESAPEAKE = "/root/reference/datasets/chesapeake/chesapeake.mtx"

needs_native = pytest.mark.skipif(
    not _native.available(), reason="native library unavailable (no g++)"
)


@needs_native
def test_native_mtx_matches_python(small_mtx, symmetric_mtx):
    from gunrock_tpu.io.matrix_market import _load_native, load_matrix_market

    for path in (small_mtx, symmetric_mtx, CHESAPEAKE):
        native = _load_native(path)
        assert native is not None
        nprops, ncoo = native
        # force the python path by parsing through a file object
        import gunrock_tpu.io.matrix_market as mm

        orig = mm._load_native
        mm._load_native = lambda p: None
        try:
            pprops, pcoo = load_matrix_market(path)
        finally:
            mm._load_native = orig
        assert nprops == pprops
        # native interleaves mirrored edges, python appends them — compare
        # the edge *sets* (COO order is normalized by coo_to_csr anyway)
        no = np.lexsort((ncoo.col_indices, ncoo.row_indices))
        po = np.lexsort((pcoo.col_indices, pcoo.row_indices))
        np.testing.assert_array_equal(
            ncoo.row_indices[no], pcoo.row_indices[po]
        )
        np.testing.assert_array_equal(
            ncoo.col_indices[no], pcoo.col_indices[po]
        )
        np.testing.assert_allclose(ncoo.values[no], pcoo.values[po])


@needs_native
def test_native_counting_sort_matches_lexsort():
    rng = np.random.default_rng(7)
    n, nnz = 500, 1 << 17  # above the native-dispatch threshold
    major = rng.integers(0, n, nnz).astype(np.int32)
    minor = rng.integers(0, n, nnz).astype(np.int32)
    vals = rng.random(nnz).astype(np.float32)

    out = _native.coo_to_compressed(major, minor, vals, n, n)
    assert out is not None
    offsets, minor_out, vals_out, perm = out

    ref_perm = np.lexsort((minor, major))
    np.testing.assert_array_equal(major[perm], major[ref_perm])
    np.testing.assert_array_equal(minor_out, minor[ref_perm])
    np.testing.assert_allclose(vals_out, vals[ref_perm])
    counts = np.bincount(major, minlength=n)
    np.testing.assert_array_equal(np.diff(offsets), counts)


@needs_native
def test_native_parse_error_contract(tmp_path):
    bad = tmp_path / "bad.mtx"
    bad.write_text("not a matrix market file\n1 2 3\n")
    with pytest.raises(ValueError):
        _native.parse_mtx(bad)
