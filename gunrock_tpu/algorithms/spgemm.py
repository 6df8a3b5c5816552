"""SpGEMM: C = A . B for sparse CSR matrices.

Role of reference include/gunrock/algorithms/spgemm.hxx — a 3-phase
upper-bound / scan / naive sorted-merge multiply with a compaction fix-up
(spgemm.hxx:124-250).

TPU redesign: ESC (expand-sort-contract), the formulation that maps to
XLA's strengths (static shapes, vectorized sort, segmented sums):

1. **expand** — every product a_ik * b_kj becomes one triple; the
   expansion offsets (cumsum of deg_B over A's column indices) are
   computed host-side so all device shapes are static,
2. **sort** — ``lax.sort`` lexicographically by (i, j) (multi-operand
   sort; no 64-bit key packing needed),
3. **contract** — run boundaries via adjacent-difference, run ids via
   cumsum, values via a sorted segmented sum; results are compacted into
   fixed-capacity padded COO output with an exact nnz count.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from gunrock_tpu.formats import Csr
from gunrock_tpu.graph import Graph
from gunrock_tpu.ops.configs import Options


@dataclasses.dataclass
class Result:
    row_indices: jax.Array  # int32[capacity] padded with -1
    col_indices: jax.Array  # int32[capacity] padded with -1
    values: jax.Array  # float32[capacity]
    nnz: int
    elapsed_ms: float

    def to_csr(self, n_rows: int, n_cols: int) -> Csr:
        """Materialize a host CSR (drops padding)."""
        nnz = int(self.nnz)
        rows = np.asarray(self.row_indices)[:nnz]
        cols = np.asarray(self.col_indices)[:nnz]
        vals = np.asarray(self.values)[:nnz]
        offsets = np.zeros(n_rows + 1, dtype=np.int32)
        np.add.at(offsets[1:], rows, 1)
        np.cumsum(offsets, out=offsets)
        return Csr(
            n_rows=n_rows,
            n_cols=n_cols,
            row_offsets=offsets,
            col_indices=cols.astype(np.int32),
            values=vals.astype(np.float32),
        )


def spgemm_kernel(
    a_row: jax.Array,  # int32[Ea]  A edge rows (CSR order)
    a_col: jax.Array,  # int32[Ea]
    a_val: jax.Array,
    b_offsets: jax.Array,  # int32[Kb+1]
    b_col: jax.Array,  # int32[Eb]
    b_val: jax.Array,
    exp_offsets: jax.Array,  # int32[Ea+1] host-precomputed expansion offsets
    total: int,  # static expansion size
):
    """ESC SpGEMM. Returns (rows, cols, vals, nnz) padded to ``total``."""
    t = jnp.arange(total, dtype=jnp.int32)
    # which A-edge does product slot t belong to?
    a_id = jnp.searchsorted(exp_offsets, t, side="right").astype(jnp.int32) - 1
    k = a_col[a_id]
    within = t - exp_offsets[a_id]
    b_e = b_offsets[k] + within
    i = a_row[a_id]
    j = b_col[b_e]
    v = a_val[a_id] * b_val[b_e]

    # lexicographic sort by (i, j)
    i_s, j_s, v_s = jax.lax.sort((i, j, v), num_keys=2)

    # contract equal (i, j) runs
    first = jnp.concatenate(
        [
            jnp.ones(1, bool),
            (i_s[1:] != i_s[:-1]) | (j_s[1:] != j_s[:-1]),
        ]
    )
    n_runs = jnp.sum(first.astype(jnp.int32))
    # run values via a per-run segment sum (NOT a global cumsum difference:
    # a single f32 prefix over millions of products loses ~1e-1 absolute
    # precision at the tail). Run ids are sorted; the compacted output
    # position of a run IS its id, so the sums land in place.
    run = jnp.cumsum(first.astype(jnp.int32)) - 1
    vals = jax.ops.segment_sum(
        v_s, run, num_segments=total, indices_are_sorted=True
    )
    # compact row/col of each run end into its run-id slot
    is_end = jnp.concatenate([first[1:], jnp.ones(1, bool)])
    out_idx = jnp.where(is_end, run, total)
    rows = jnp.full(total, -1, jnp.int32).at[out_idx].set(i_s, mode="drop")
    cols = jnp.full(total, -1, jnp.int32).at[out_idx].set(j_s, mode="drop")
    return rows, cols, vals, n_runs


def run(
    A: Graph,
    B: Graph,
    options: Options | None = None,
    warmup: bool = True,
    max_expansion: int = 50_000_000,
) -> Result:
    """Role of reference ``spgemm::run`` (spgemm.hxx:287-315): C = A.B over
    the CSR views of two graphs.

    ESC materializes every partial product, so the expansion size is
    sum over A-edges of deg_B(col) — on power-law graphs this can dwarf
    nnz(A)+nnz(B). ``max_expansion`` guards against accidental
    hundred-GB launches; raise it explicitly for big multiplies
    (row-blocked streaming SpGEMM is the planned next step)."""
    del options
    a_offsets = np.asarray(A.row_offsets)
    a_col = np.asarray(A.col_indices)
    b_offsets_h = np.asarray(B.row_offsets)
    deg_b = np.diff(b_offsets_h)
    # host-side expansion offsets (static shape contract)
    exp_counts = deg_b[a_col]
    exp_offsets = np.zeros(A.n_edges + 1, dtype=np.int32)
    np.cumsum(exp_counts, out=exp_offsets[1:])
    total = int(exp_offsets[-1])
    if total > max_expansion:
        raise ValueError(
            f"SpGEMM expansion {total} exceeds max_expansion={max_expansion}; "
            "pass a larger max_expansion to proceed"
        )
    if total == 0:
        z = jnp.zeros(0)
        return Result(
            row_indices=z.astype(jnp.int32),
            col_indices=z.astype(jnp.int32),
            values=z.astype(jnp.float32),
            nnz=0,
            elapsed_ms=0.0,
        )

    fn = jax.jit(
        lambda ar, ac, av, bo, bc, bv, eo: spgemm_kernel(
            ar, ac, av, bo, bc, bv, eo, total
        )
    )
    args = (
        A.edge_src,
        A.col_indices,
        A.values,
        B.row_offsets,
        B.col_indices,
        B.values,
        jnp.asarray(exp_offsets),
    )
    if warmup:
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    rows, cols, vals, nnz = jax.block_until_ready(fn(*args))
    elapsed_ms = (time.perf_counter() - t0) * 1e3
    return Result(
        row_indices=rows,
        col_indices=cols,
        values=vals,
        nnz=int(nnz),
        elapsed_ms=elapsed_ms,
    )
