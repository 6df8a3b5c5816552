"""Geolocation: predict lat/long for unlabeled vertices from neighbors.

Role of reference include/gunrock/algorithms/geo.hxx — per outer iteration,
every still-unlabeled vertex computes a "spatial center" of its *labeled*
out-neighbors (geo.hxx:300-379):

- 1 labeled neighbor  -> copy its coordinates,
- 2 labeled neighbors -> spherical midpoint (geo.hxx:71-98),
- >2                  -> spatial median: Weiszfeld iteration under the
  haversine metric, starting from the neighborhood mean, with the
  reference's zero-distance / rinv correction (geo.hxx:131-238),

for a fixed number of outer iterations (geo.hxx:392-402). Invalid
coordinates are NaN (the float invalid sentinel, util/type_limits.hxx).

TPU redesign: the per-vertex serial neighbor scans become per-edge masks +
exact segmented sums in CSR order; all unlabeled vertices
run the Weiszfeld loop in lockstep inside a ``fori_loop`` with per-vertex
done-masking; the outer loop is a ``lax.while_loop``.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp

from gunrock_tpu.graph import Graph
from gunrock_tpu.ops.configs import Options


@dataclasses.dataclass
class Param:
    total_iterations: int = 10
    spatial_iterations: int = 1000


@dataclasses.dataclass
class Result:
    latitude: jax.Array  # float32[V]; NaN if undetermined
    longitude: jax.Array  # float32[V]
    elapsed_ms: float


def _radians(a):
    return a * (jnp.pi / 180.0)


def _degrees(a):
    return a * (180.0 / jnp.pi)


def haversine(lat1, lon1, lat2, lon2, radius=6371.0):
    """Great-circle distance in km (reference geo.hxx:105-127)."""
    lat1, lon1 = _radians(lat1), _radians(lon1)
    lat2, lon2 = _radians(lat2), _radians(lon2)
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = jnp.sin(dlat / 2) ** 2 + jnp.cos(lat1) * jnp.cos(lat2) * jnp.sin(dlon / 2) ** 2
    return radius * 2 * jnp.arcsin(jnp.sqrt(jnp.clip(a, 0.0, 1.0)))


def midpoint(lat1, lon1, lat2, lon2):
    """Spherical midpoint in degrees (reference geo.hxx:71-98)."""
    lat1, lon1 = _radians(lat1), _radians(lon1)
    lat2, lon2 = _radians(lat2), _radians(lon2)
    bx = jnp.cos(lat2) * jnp.cos(lon2 - lon1)
    by = jnp.cos(lat2) * jnp.sin(lon2 - lon1)
    mlat = jnp.arctan2(
        jnp.sin(lat1) + jnp.sin(lat2),
        jnp.sqrt((jnp.cos(lat1) + bx) ** 2 + by**2),
    )
    mlon = lon1 + jnp.arctan2(by, jnp.cos(lat1) + bx)
    return _degrees(mlat), _degrees(mlon)


def _seg_sum(vals, seg, n):
    """Exact per-segment sums via scatter (NOT the cumsum difference:
    coordinate sums build ~1e8-magnitude prefixes over millions of edges,
    whose f32 ulp is degrees-scale — unacceptable for geolocation).

    ``vals`` may be [E] or [E, K]: scatter/gather on this chip serialize
    at ~0.1 Gelem/s PER INDEX, so K quantities scattered as one [E, K]
    row-update cost one index op instead of K (measured ~3x on the
    Weiszfeld step, results_r3b)."""
    return jax.ops.segment_sum(vals, seg, num_segments=n, indices_are_sorted=True)


def geo_kernel(
    graph: Graph,
    latitude,
    longitude,
    total_iterations: int = 10,
    spatial_iterations: int = 1000,
    eps: float = 1e-3,
    layout=None,
    slot_dst=None,  # int32[n_chunks*C] global dst per layout slot
    slot_valid=None,  # bool[n_chunks*C] real (non-pad) slot
    interpret: bool = False,
):
    """Pure geolocation. Returns (latitude, longitude) f32[V].

    With ``layout`` (push-oriented bucketed layout + slot tables), the
    Weiszfeld inner step runs through the Pallas kernel
    (ops/pallas/geo_step.py) instead of the serialized [E,2] gather +
    [E,4] scatter per step — the round-3/4 geo wall."""
    V = graph.n_vertices
    src = graph.edge_src
    dst = graph.col_indices
    offs = graph.row_offsets
    E = graph.n_edges
    eid = jnp.arange(E, dtype=jnp.int32)

    def outer(c):
        it, lat, lon = c
        labeled = ~jnp.isnan(lat)
        nb_ok = labeled[dst]
        unl = ~labeled

        # Loop-invariant per-edge neighbor coordinates, gathered ONCE per
        # outer iteration as a [E, 2] row gather (one index op per edge
        # instead of two), masked to 0 where the neighbor is unlabeled
        # (every consumer below already multiplies by an nb_ok-derived
        # factor, and masking keeps neighbor NaNs out of the arithmetic).
        nbco = jnp.stack([lat, lon], axis=1)[dst]
        mlat = jnp.where(nb_ok, nbco[:, 0], 0.0)
        mlon = jnp.where(nb_ok, nbco[:, 1], 0.0)

        # n_valid + mean of valid neighbors (start of the spatial median)
        # in one [E, 3] scatter. Counts in f32: exact while max degree
        # < 2^24.
        base = _seg_sum(
            jnp.stack([nb_ok.astype(jnp.float32), mlat, mlon], axis=1),
            src, V,
        )
        n_valid = base[:, 0]
        denom = jnp.maximum(n_valid, 1.0)
        y_lat, y_lon = base[:, 1] / denom, base[:, 2] / denom

        # first/second valid neighbor per vertex (for the 1- and 2-cases):
        # min/max valid edge id via cumsum trick on monotone masks is not
        # exact, so use scatter-min/max keyed by src (V-sized, acceptable).
        first_e = jnp.full(V, E, jnp.int32).at[src].min(jnp.where(nb_ok, eid, E))
        last_e = jnp.full(V, -1, jnp.int32).at[src].max(jnp.where(nb_ok, eid, -1))
        fe = jnp.minimum(first_e, E - 1)
        le = jnp.maximum(last_e, 0)
        n1_lat, n1_lon = lat[dst[fe]], lon[dst[fe]]
        n2_lat, n2_lon = lat[dst[le]], lon[dst[le]]
        mid_lat, mid_lon = midpoint(n1_lat, n1_lon, n2_lat, n2_lon)

        # Weiszfeld under haversine, all vertices in lockstep
        # (reference geo.hxx:139-238). The reference breaks its serial
        # per-vertex loop on convergence; here the while_loop exits when
        # EVERY median-needing vertex has converged — on power-law inputs
        # that is tens of steps, not the 1000-step worst case, and a
        # single device execution at spatial_iterations=1000 over E~1M
        # exceeds the tunnel's RPC deadline (the round-3 "geo fault").
        if layout is not None:
            # slot-space neighbor coordinates for the Pallas step (one
            # [n_slots, 3] row gather per OUTER iteration)
            from gunrock_tpu.ops.pallas.geo_step import weiszfeld_step_sums

            n_chunks = layout.n_chunks
            Cr = layout.chunk // 128
            sco = jnp.stack(
                [lat, lon, labeled.astype(jnp.float32)], axis=1
            )[slot_dst]
            ok_slot = slot_valid & (sco[:, 2] > 0.0)
            mlat3 = jnp.where(ok_slot, sco[:, 0], 0.0).reshape(
                n_chunks, Cr, 128)
            mlon3 = jnp.where(ok_slot, sco[:, 1], 0.0).reshape(
                n_chunks, Cr, 128)
            ok3 = ok_slot.astype(jnp.float32).reshape(n_chunks, Cr, 128)

        def wcond(s):
            i, *_, done = s
            return (i < spatial_iterations) & ~jnp.all(done)

        def wstep(s):
            i, y_lat, y_lon, out_lat, out_lon, done = s
            if layout is not None:
                # chunk-skipping step: converged rows' windows drop out,
                # so the straggler tail (hundreds of steps on power-law
                # inputs) rides the /8-/64 grids instead of full passes
                from gunrock_tpu.ops.pallas.geo_step import (
                    weiszfeld_step_sums_sparse,
                )

                nonzeros, dinvs, wlat, wlon = weiszfeld_step_sums_sparse(
                    layout, y_lat, y_lon, mlat3, mlon3, ok3, ~done,
                    interpret=interpret,
                )
                sums = jnp.stack([nonzeros, dinvs, wlat, wlon], axis=1)
            else:
                yco = jnp.stack([y_lat, y_lon], axis=1)[src]  # [E,2] gather
                d = haversine(mlat, mlon, yco[:, 0], yco[:, 1])
                ok = nb_ok & (d != 0)
                dinv = jnp.where(ok, 1.0 / jnp.maximum(d, 1e-30), 0.0)
                # nonzero count + dinv sum + both weighted coordinate
                # sums in one [E, 4] scatter (was 4 separate scatters).
                sums = _seg_sum(
                    jnp.stack(
                        [ok.astype(jnp.float32), dinv, dinv * mlat,
                         dinv * mlon],
                        axis=1,
                    ),
                    src, V,
                )
            nonzeros, dinvs = sums[:, 0], sums[:, 1]
            dsafe = jnp.maximum(dinvs, 1e-30)
            t_lat = sums[:, 2] / dsafe
            t_lon = sums[:, 3] / dsafe
            num_zeros = n_valid - nonzeros
            all_zero = num_zeros == n_valid
            r_lat = (t_lat - y_lat) * dinvs
            r_lon = (t_lon - y_lon) * dinvs
            r = jnp.sqrt(r_lat**2 + r_lon**2)
            rinv = jnp.where(r == 0, 0.0, num_zeros / jnp.maximum(r, 1e-30))
            y1_lat = jnp.where(
                num_zeros == 0,
                t_lat,
                jnp.maximum(0.0, 1 - rinv) * t_lat + jnp.minimum(1.0, rinv) * y_lat,
            )
            y1_lon = jnp.where(
                num_zeros == 0,
                t_lon,
                jnp.maximum(0.0, 1 - rinv) * t_lon + jnp.minimum(1.0, rinv) * y_lon,
            )
            step = jnp.sqrt((y_lat - y1_lat) ** 2 + (y_lon - y1_lon) ** 2)
            newly_done = ~done & (all_zero | (step < eps))
            out_lat = jnp.where(newly_done, jnp.where(all_zero, y_lat, y1_lat), out_lat)
            out_lon = jnp.where(newly_done, jnp.where(all_zero, y_lon, y1_lon), out_lon)
            done = done | newly_done
            y_lat = jnp.where(done, y_lat, y1_lat)
            y_lon = jnp.where(done, y_lon, y1_lon)
            return i + 1, y_lat, y_lon, out_lat, out_lon, done

        # Vertices that will not take the median branch are "done" from
        # step 0 so they cannot hold the early exit open; their med_* are
        # discarded by the n_valid selection below either way.
        needs_median = unl & (n_valid > 2)
        med0 = (jnp.int32(0), y_lat, y_lon, y_lat, y_lon, ~needs_median)
        _, my_lat, my_lon, out_lat, out_lon, done = jax.lax.while_loop(
            wcond, wstep, med0
        )
        med_lat = jnp.where(done, out_lat, my_lat)
        med_lon = jnp.where(done, out_lon, my_lon)

        new_lat = jnp.where(
            unl & (n_valid == 1), n1_lat,
            jnp.where(
                unl & (n_valid == 2), mid_lat,
                jnp.where(unl & (n_valid > 2), med_lat, lat),
            ),
        )
        new_lon = jnp.where(
            unl & (n_valid == 1), n1_lon,
            jnp.where(
                unl & (n_valid == 2), mid_lon,
                jnp.where(unl & (n_valid > 2), med_lon, lon),
            ),
        )
        # wrap longitudes into [-180, 180): coordinate-space means and
        # Weiszfeld steps near the date line produce values past 180
        # (caught by the round-5 CLI invariants check: 402 deg outputs
        # on rmat12_sym) — and an unwrapped assignment would poison
        # every later iteration that consumes it as a neighbor label
        new_lon = jnp.where(
            jnp.isnan(new_lon), new_lon,
            jnp.mod(new_lon + 180.0, 360.0) - 180.0,
        )
        return it + 1, new_lat, new_lon

    def cond(c):
        it, lat, lon = c
        return it < total_iterations

    _, lat, lon = jax.lax.while_loop(
        cond,
        outer,
        (jnp.int32(0), jnp.asarray(latitude, jnp.float32), jnp.asarray(longitude, jnp.float32)),
    )
    return lat, lon


def run(
    graph: Graph,
    latitude,
    longitude,
    total_iterations: int = 10,
    spatial_iterations: int = 1000,
    options: Options | None = None,
    warmup: bool = True,
) -> Result:
    """Role of reference ``geo::run`` (geo.hxx:417-447)."""
    from gunrock_tpu.ops.configs import LoadBalance, default_options
    from gunrock_tpu.utils.jitcache import cached_jit

    if options is None:
        options = default_options()
    layout = slot_dst = slot_valid = None
    interpret = False
    if options.load_balance == LoadBalance.PALLAS_MERGE_PATH and graph.n_edges:
        import numpy as np

        from gunrock_tpu.ops.pallas import use_interpret
        from gunrock_tpu.ops.pallas.semiring import push_layout

        interpret = use_interpret()
        # push orientation (rows = src, the reduction key); unit values
        # double as the real-slot mask
        layout = push_layout(graph, unit=True, interpret=interpret)
        C = layout.chunk
        W = layout.window
        cb = np.asarray(layout.chunk_cb)
        cl = np.asarray(layout.col_local)
        sv = np.asarray(layout.values) == 1.0
        sd = (np.repeat(cb, C) * W + cl).astype(np.int32)
        sd[~sv] = 0  # pads read vertex 0, masked by slot_valid
        slot_dst = jnp.asarray(sd)
        slot_valid = jnp.asarray(sv)

    fn = cached_jit(
        ("geo", total_iterations, spatial_iterations,
         None if layout is None else ("pallas", interpret)),
        lambda: lambda g, la, lo, lay, sdst, sval: geo_kernel(
            g, la, lo, total_iterations, spatial_iterations,
            layout=lay, slot_dst=sdst, slot_valid=sval,
            interpret=interpret,
        ),
    )
    args = (graph, jnp.asarray(latitude, jnp.float32),
            jnp.asarray(longitude, jnp.float32), layout, slot_dst,
            slot_valid)
    if warmup:
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    lat, lon = jax.block_until_ready(fn(*args))
    elapsed_ms = (time.perf_counter() - t0) * 1e3
    return Result(latitude=lat, longitude=lon, elapsed_ms=elapsed_ms)
