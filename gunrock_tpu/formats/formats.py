"""Host-side sparse-matrix format containers and conversions.

The TPU-native analog of the reference's ``format::csr_t/coo_t/csc_t``
(reference include/gunrock/formats/csr.hxx:27-230, coo.hxx, csc.hxx):
lightweight numpy containers used on the host for I/O and format
conversion; the device-resident structure is ``gunrock_tpu.graph.Graph``.

Conversions use vectorized counting sorts (the host-side
``csr_t::from_coo`` of formats/csr.hxx:81-140 recast in numpy), and every
CSR/CSC row segment is kept **sorted by the minor index** so device-side
intersection (triangle counting) and binary-searched ``get_edge`` work.

The binary cache (``write_binary``/``read_binary``) mirrors the role of the
reference's raw-struct CSR cache (formats/csr.hxx:142-228 and the
``csr_binary`` tool, examples/tools/csr_binary.cu:6-42): parse a matrix
market file once, then reload multi-GB graphs at disk bandwidth.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

_BINARY_MAGIC = b"GTPUCSR1"  # versioned header for the binary CSR cache


@dataclasses.dataclass
class Coo:
    """Coordinate format: parallel (row, col, val) arrays."""

    n_rows: int
    n_cols: int
    row_indices: np.ndarray  # int32[nnz]
    col_indices: np.ndarray  # int32[nnz]
    values: np.ndarray  # float32[nnz]

    @property
    def nnz(self) -> int:
        return int(self.row_indices.shape[0])


@dataclasses.dataclass
class Csr:
    """Compressed sparse row: offsets + column indices + values."""

    n_rows: int
    n_cols: int
    row_offsets: np.ndarray  # int32[n_rows+1]
    col_indices: np.ndarray  # int32[nnz]
    values: np.ndarray  # float32[nnz]

    @property
    def nnz(self) -> int:
        return int(self.col_indices.shape[0])

    def write_binary(self, path: str | Path) -> None:
        """Raw binary CSR cache (role of reference formats/csr.hxx:142-192)."""
        path = Path(path)
        with open(path, "wb") as f:
            f.write(_BINARY_MAGIC)
            header = np.asarray(
                [self.n_rows, self.n_cols, self.nnz], dtype=np.int64
            )
            header.tofile(f)
            self.row_offsets.astype(np.int64).tofile(f)
            self.col_indices.astype(np.int32).tofile(f)
            self.values.astype(np.float32).tofile(f)

    @staticmethod
    def read_binary(path: str | Path) -> "Csr":
        """Load a binary CSR cache (role of reference formats/csr.hxx:194-228)."""
        path = Path(path)
        with open(path, "rb") as f:
            magic = f.read(len(_BINARY_MAGIC))
            if magic != _BINARY_MAGIC:
                raise ValueError(f"{path}: not a gunrock_tpu binary CSR file")
            n_rows, n_cols, nnz = np.fromfile(f, dtype=np.int64, count=3)
            row_offsets = np.fromfile(f, dtype=np.int64, count=int(n_rows) + 1)
            col_indices = np.fromfile(f, dtype=np.int32, count=int(nnz))
            values = np.fromfile(f, dtype=np.float32, count=int(nnz))
        return Csr(
            n_rows=int(n_rows),
            n_cols=int(n_cols),
            row_offsets=row_offsets.astype(np.int32),
            col_indices=col_indices,
            values=values,
        )


@dataclasses.dataclass
class Csc:
    """Compressed sparse column: offsets + row indices + values."""

    n_rows: int
    n_cols: int
    col_offsets: np.ndarray  # int32[n_cols+1]
    row_indices: np.ndarray  # int32[nnz]
    values: np.ndarray  # float32[nnz]

    @property
    def nnz(self) -> int:
        return int(self.row_indices.shape[0])


def _counting_sort_to_compressed(
    major: np.ndarray,
    minor: np.ndarray,
    values: np.ndarray,
    n_major: int,
):
    """Sort edges by (major, minor) and build offsets — one counting sort.

    Returns (offsets int32[n_major+1], minor_sorted, values_sorted, perm)
    where ``perm`` maps sorted position -> original edge index.
    """
    # Native C++ counting sort when available (gunrock_tpu/_native —
    # the reference's from_coo hot path, formats/csr.hxx:81-140).
    if major.shape[0] >= (1 << 16):
        from gunrock_tpu import _native

        n_minor = int(minor.max()) + 1 if minor.size else 1
        out = (
            _native.coo_to_compressed(major, minor, values, n_major, n_minor)
            if _native.available()
            else None
        )
        if out is not None:
            offsets, minor_out, vals_out, perm = out
            dtype = (
                np.int32 if offsets[-1] <= np.iinfo(np.int32).max else np.int64
            )
            return offsets.astype(dtype), minor_out, vals_out, perm

    # np.lexsort is a stable sort; keys are (least significant first).
    perm = np.lexsort((minor, major))
    major_sorted = major[perm]
    counts = np.bincount(major_sorted, minlength=n_major)
    offsets = np.concatenate(
        [np.zeros(1, dtype=np.int64), np.cumsum(counts, dtype=np.int64)]
    )
    dtype = np.int32 if offsets[-1] <= np.iinfo(np.int32).max else np.int64
    return (
        offsets.astype(dtype),
        minor[perm].astype(np.int32),
        values[perm],
        perm.astype(np.int64),
    )


def coo_to_csr(coo: Coo) -> Csr:
    """COO -> CSR with rows sorted by column (reference formats/csr.hxx:81-140)."""
    offsets, cols, vals, _ = _counting_sort_to_compressed(
        coo.row_indices, coo.col_indices, coo.values, coo.n_rows
    )
    return Csr(coo.n_rows, coo.n_cols, offsets.astype(np.int32), cols, vals)


def coo_to_csc(coo: Coo) -> Csc:
    offsets, rows, vals, _ = _counting_sort_to_compressed(
        coo.col_indices, coo.row_indices, coo.values, coo.n_cols
    )
    return Csc(coo.n_rows, coo.n_cols, offsets.astype(np.int32), rows, vals)


def offsets_to_indices(offsets: np.ndarray) -> np.ndarray:
    """Expand offsets into per-entry segment ids.

    The host analog of reference graph/conversions/convert.hxx:21-47
    (scatter_if + max-scan): ``[0,2,5] -> [0,0,1,1,1]``.
    """
    nnz = int(offsets[-1])
    n = offsets.shape[0] - 1
    return np.repeat(
        np.arange(n, dtype=np.int32), np.diff(offsets).astype(np.int64)
    )[:nnz]


def indices_to_offsets(indices: np.ndarray, n_segments: int) -> np.ndarray:
    """Sorted segment ids -> offsets (reference convert.hxx:50-66)."""
    counts = np.bincount(indices, minlength=n_segments)
    return np.concatenate(
        [np.zeros(1, dtype=np.int64), np.cumsum(counts)]
    ).astype(np.int32)


def csr_to_coo(csr: Csr) -> Coo:
    return Coo(
        n_rows=csr.n_rows,
        n_cols=csr.n_cols,
        row_indices=offsets_to_indices(csr.row_offsets),
        col_indices=csr.col_indices,
        values=csr.values,
    )


def csr_to_csc(csr: Csr):
    """CSR -> CSC. Returns (csc, edge_perm) where ``edge_perm[k]`` is the CSR
    edge index stored at CSC position ``k`` — device code uses it so that
    per-edge lambdas see consistent original edge ids in either view."""
    rows = offsets_to_indices(csr.row_offsets)
    offsets, row_idx, vals, perm = _counting_sort_to_compressed(
        csr.col_indices, rows, csr.values, csr.n_cols
    )
    csc = Csc(csr.n_rows, csr.n_cols, offsets.astype(np.int32), row_idx, vals)
    return csc, perm.astype(np.int32)
