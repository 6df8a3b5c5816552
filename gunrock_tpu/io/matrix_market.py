"""Matrix Market (.mtx) loader.

Role of the reference's ``io::matrix_market_t::load`` + vendored mmio
(reference include/gunrock/io/matrix_market.hxx:72-256,
io/detail/mmio.hxx): parse the banner (coordinate/array;
real/integer/pattern; general/symmetric/skew-symmetric), convert 1-based to
0-based indices, synthesize unit weights for pattern matrices
(matrix_market.hxx:153-172), and **explicitly duplicate off-diagonal edges
for symmetric matrices** (matrix_market.hxx:203-246), setting
``properties.directed/symmetric`` accordingly.

Implementation is vectorized numpy (np.fromstring-style parsing) rather
than a per-line C loop; a native C++ parser is the planned fast path for
multi-GB files (see gunrock_tpu/_native).
"""

from __future__ import annotations

import gzip
from pathlib import Path

import numpy as np

from gunrock_tpu.formats import Coo
from gunrock_tpu.graph.properties import GraphProperties


class MatrixMarketError(ValueError):
    pass


def _load_native(path):
    """Fast path through the C++ parser (gunrock_tpu/_native); None when
    the native library is unavailable (falls back to numpy parsing)."""
    from gunrock_tpu import _native

    if not _native.available():
        return None
    try:
        parsed = _native.parse_mtx(path)
    except ValueError as e:
        raise MatrixMarketError(str(e)) from e
    if parsed is None:
        return None
    n_rows, n_cols, rows, cols, vals, symmetric, pattern = parsed
    # Native parser already excludes skew-symmetric from `symmetric`
    # (reference mmio parity: skew = general/directed, no expansion).
    properties = GraphProperties(
        directed=not symmetric,
        weighted=not pattern,
        symmetric=bool(symmetric),
    )
    return properties, Coo(
        n_rows=n_rows,
        n_cols=n_cols,
        row_indices=rows,
        col_indices=cols,
        values=vals,
    )


def _open(path: Path):
    if str(path).endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "r")


def load_matrix_market(path: str | Path):
    """Parse a .mtx file.

    Returns ``(properties, coo)`` exactly like the reference loader returns
    ``(graph_properties_t, coo host matrix)`` (matrix_market.hxx:104-255).
    """
    path = Path(path)
    if not str(path).endswith(".gz"):
        native = _load_native(path)
        if native is not None:
            return native
    with _open(path) as f:
        banner = f.readline()
        if not banner.startswith("%%MatrixMarket"):
            raise MatrixMarketError(f"{path}: missing MatrixMarket banner")
        parts = banner.strip().split()
        # %%MatrixMarket matrix coordinate real general
        if len(parts) < 5 or parts[1].lower() != "matrix":
            raise MatrixMarketError(f"{path}: unsupported banner: {banner!r}")
        storage = parts[2].lower()  # coordinate | array
        field = parts[3].lower()  # real | integer | pattern | complex
        symmetry = parts[4].lower()  # general | symmetric | skew-symmetric | hermitian

        if storage != "coordinate":
            raise MatrixMarketError(
                f"{path}: only coordinate (sparse) matrices are supported"
            )
        if field == "complex":
            raise MatrixMarketError(f"{path}: complex matrices not supported")

        # Skip comments
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        dims = line.split()
        n_rows, n_cols, nnz = int(dims[0]), int(dims[1]), int(dims[2])

        # Bulk-parse the remainder with numpy (fast path).
        data = np.loadtxt(f, dtype=np.float64, ndmin=2, max_rows=nnz)

    if data.size == 0:
        rows = np.zeros(0, dtype=np.int32)
        cols = np.zeros(0, dtype=np.int32)
        vals = np.zeros(0, dtype=np.float32)
    else:
        if data.shape[0] != nnz:
            raise MatrixMarketError(
                f"{path}: expected {nnz} entries, found {data.shape[0]}"
            )
        rows = data[:, 0].astype(np.int64) - 1  # 1-based -> 0-based
        cols = data[:, 1].astype(np.int64) - 1
        if field == "pattern" or data.shape[1] < 3:
            # pattern => weight 1.0 (reference matrix_market.hxx:153-172)
            vals = np.ones(nnz, dtype=np.float32)
        else:
            vals = data[:, 2].astype(np.float32)
        rows = rows.astype(np.int32)
        cols = cols.astype(np.int32)

    # skew-symmetric: reference parity (mmio mm_is_symmetric excludes skew)
    # — treated as general/directed, no mirror expansion. This also keeps
    # properties.symmetric False so build_graph does NOT alias the CSC view
    # onto CSR storage (weight symmetry is part of that aliasing contract,
    # graph/build.py).
    properties = GraphProperties(
        directed=(symmetry in ("general", "skew-symmetric")),
        weighted=(field != "pattern"),
        symmetric=(symmetry in ("symmetric", "hermitian")),
    )

    if properties.symmetric and rows.size:
        # Explicitly duplicate off-diagonal entries (reference
        # matrix_market.hxx:203-246).
        off_diag = rows != cols
        rows, cols, vals = (
            np.concatenate([rows, cols[off_diag]]),
            np.concatenate([cols, rows[off_diag]]),
            np.concatenate([vals, vals[off_diag]]),
        )

    coo = Coo(
        n_rows=n_rows,
        n_cols=n_cols,
        row_indices=rows,
        col_indices=cols,
        values=vals,
    )
    return properties, coo
