"""2D spatial domain decomposition of the dense engine over a device mesh.

The second rung of the scaling ladder (SURVEY.md §5 "distributed comm
backend", §7 step 8). The 1D particle-sharded step (parallel/sharding.py)
all-gathers every particle per collision pass — O(total) bytes per device.
This module shards *space* instead: the dense engine's torus cell grid
(ops/dense.py) is cut into a ``(bands, blocks)`` mesh — bands split grid
rows (y), blocks split lane groups (x) — and every collective moves only
O(boundary) bytes over ICI:

- **Halo exchange.** Each device bins its particles into a local plane
  tensor holding its own ``Gb x Lb`` cell window plus ``ROW_PAD`` halo rows
  and ``2K`` halo lanes. Halos are filled with ``ppermute`` ring shifts
  along each mesh axis (rows first, then lanes — the second pass carries the
  corners). On a 1-device axis the ring shift degenerates to a self-copy,
  which IS the single-chip torus wrap (ops/dense.py ``fill_halo``).
- **Plane-resident substeps.** The whole substep pipeline (damped
  integration, follow constraint, Jacobi pair sweep, velocity update) runs
  in the local plane layout exactly like the single-chip dense path
  (ops/solver.py ``_plane_substeps``); only the X/Y field halos are
  re-exchanged after each collision pass's correction.
- **Ring migration.** Ownership follows the torus cell: after the step each
  particle's destination device is recomputed, and movers ride fixed-size
  ``ppermute`` buffers one mesh hop per step (y first, then x, so received
  particles can continue along x immediately; diagonal moves take the two
  phases of the same step). Particles still in transit — or beyond the
  per-step buffer budget — integrate without collision until they arrive,
  exactly like reference particles past the collision-budget cutoff
  (/root/reference/simulation_handler.lua:1656-1658). Free-slot overflow is
  counted and reported so the host can trigger a full redistribute.

The layout invariant: device ``(b, x)`` (mesh-linearized slice ``b*Dx + x``
of the particle axis) holds only particles whose torus cell lies in its
window, padded with inactive slots (``batch_slot < 0``). Use
:func:`redistribute` to (re-)establish the invariant from any state.

On TPU the local sweep runs the PRODUCTION Pallas kernel (the padded local
window is lane-tile aligned by ``SpatialLayout.lp``; see ``_sweep_local``);
off-TPU it falls back to the jnp golden model, and the CPU-mesh equivalence
tests re-enable the kernel in interpret mode
(``ops.pallas.sweep_kernel.FORCE_INTERPRET``) so the sharded kernel path
itself is exercised without hardware. Capability parity: the reference has
no distribution of any kind (SURVEY.md §2) — this subsystem is TPU-native
added capability.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DeviceConfig
from ..state import ParticleState, StepStats
from ..utils.mathx import EPS, jnp_mix
from ..ops import dense as dense_ops
from ..ops import solver as solver_ops
from ..ops.solver import SolverOptions

__all__ = ["SpatialLayout", "make_spatial_mesh", "spatial_step",
           "spatial_multi_step", "redistribute", "owner_of"]

BANDS = "bands"
BLOCKS = "blocks"
RP = dense_ops.ROW_PAD


class SpatialLayout(NamedTuple):
    """Static decomposition geometry."""
    grid_dim: int          # G: torus cells per axis (shared by both pops here)
    slots_per_cell: int    # K
    db: int                # devices along y (bands)
    dx: int                # devices along x (blocks)
    migrate_cap: int       # M: max migrants per direction per step

    @property
    def gb(self) -> int:
        return self.grid_dim // self.db

    @property
    def gx(self) -> int:
        return self.grid_dim // self.dx          # cell columns per block

    @property
    def lb(self) -> int:
        return self.gx * self.slots_per_cell     # real lanes per block

    @property
    def lp(self) -> int:
        # halo lanes per side: >= the 4K-1 roll reach of the WIDE
        # (window=3) violent-phase sweep, rounded up to the 64-lane
        # half-tile so the padded width stays lane-tile aligned for the
        # Pallas sweep kernel; 64 % K == 0 keeps the lane mask's
        # K-periodicity in phase
        return max(4 * self.slots_per_cell, 64)

    def check(self):
        assert self.grid_dim % self.db == 0 and self.grid_dim % self.dx == 0
        assert self.gb >= RP, "band height must cover the row halo"
        assert self.gx >= 2, "block must span at least 2 cell columns"
        # the local lane-mask phase in the sweep relies on the halo width
        # being a whole number of cells (lane phase stays K-periodic across
        # the lp-lane shift); 64 % K == 0 for the usual K in {1,2,4,8,16}
        assert self.lp % self.slots_per_cell == 0, (
            "halo lane count must be a multiple of slots_per_cell; "
            "use a power-of-two K <= 64")

    def collective_bytes_per_step(self, options) -> dict:
        """Per-device ICI bytes moved by one spatial step (analytic).

        The point of the 2D decomposition: every collective is O(boundary).
        Full-field halo exchange once per binning (N_FIELDS + N_AUX planes),
        X/Y-only refresh after each collision pass, and two fixed-size
        migration buffers per axis. Compare with the 1D layer's all-gather of
        ~16 bytes x total particles per collision pass."""
        from ..ops import dense as dense_ops
        from ..ops import solver as solver_ops
        width = self.lb + 2 * self.lp
        rows = self.gb + 2 * RP
        n_fields = dense_ops.N_FIELDS + solver_ops.N_AUX
        row_halo = 2 * RP * width * 4          # one plane, both directions
        lane_halo = 2 * self.lp * rows * 4
        full_exchange = n_fields * (row_halo + lane_halo)
        xy_refresh = 2 * (row_halo + lane_halo)
        passes = options.n_substeps * options.n_collision_steps
        migration = 2 * 2 * self.migrate_cap * (_MIG_FIELDS + 2) * 4
        return {
            "full_halo_exchange": full_exchange,
            "xy_refresh_per_pass": xy_refresh,
            "migration": migration,
            "total_per_step": full_exchange + passes * xy_refresh + migration,
        }


def make_spatial_mesh(db: int, dx: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= db * dx
    arr = np.asarray(devices[:db * dx]).reshape(db, dx)
    return Mesh(arr, (BANDS, BLOCKS))


# ------------------------------------------------------------- ownership --

def owner_of(pos, cell_size, lay: SpatialLayout):
    """(band, block) device coords of each particle's torus cell."""
    cell = jnp.floor(pos / cell_size)
    cell = jnp.clip(jnp.where(jnp.isfinite(cell), cell, 0.0), -1e9, 1e9)
    cxy = jnp.mod(cell.astype(jnp.int32), lay.grid_dim)
    return cxy[:, 1] // lay.gb, cxy[:, 0] // lay.gx


def _ring_dir(dest, mine, size: int):
    """Shortest-direction step (-1/0/+1) from ``mine`` toward ``dest`` on a ring."""
    if size == 1:
        return jnp.zeros_like(dest)
    diff = jnp.mod(dest - mine, size)
    return jnp.where(diff == 0, 0, jnp.where(diff <= size // 2, 1, -1))


# ---------------------------------------------------------- halo exchange --

def _ring_perm(size: int, shift: int):
    """ppermute permutation sending device i's data to device (i + shift) % size."""
    return [(i, (i + shift) % size) for i in range(size)]


def _exchange_rows(t, lay: SpatialLayout):
    """Fill the ROW_PAD halo rows from ring neighbors (torus wrap in y).

    ``t``: (F, RP + Gb + RP, W). Top halo rows are the band-above's last RP
    real rows; with one band this is the tensor's own wrap (fill_halo).
    """
    gb = lay.gb
    top_src = t[:, gb:gb + RP]        # my last RP real rows -> neighbor below's top halo
    bot_src = t[:, RP:2 * RP]         # my first RP real rows -> neighbor above's bottom halo
    if lay.db == 1:
        top, bot = top_src, bot_src
    else:
        # my top halo comes from band b-1's last rows: b-1 sends DOWN (+1)
        top = jax.lax.ppermute(top_src, BANDS, _ring_perm(lay.db, 1))
        bot = jax.lax.ppermute(bot_src, BANDS, _ring_perm(lay.db, -1))
    return t.at[:, :RP].set(top).at[:, RP + gb:].set(bot)


def _exchange_lanes(t, lay: SpatialLayout):
    """Fill the 2K halo lanes from ring neighbors (torus wrap in x)."""
    lb, lp = lay.lb, lay.lp
    left_src = t[..., lb:lb + lp]     # my last lp real lanes
    right_src = t[..., lp:2 * lp]     # my first lp real lanes
    if lay.dx == 1:
        left, right = left_src, right_src
    else:
        left = jax.lax.ppermute(left_src, BLOCKS, _ring_perm(lay.dx, 1))
        right = jax.lax.ppermute(right_src, BLOCKS, _ring_perm(lay.dx, -1))
    return t.at[..., :lp].set(left).at[..., lp + lb:].set(right)


def _exchange_halos(t, lay: SpatialLayout):
    """Rows first, then lanes: the lane pass carries the four corners."""
    return _exchange_lanes(_exchange_rows(t, lay), lay)


# --------------------------------------------------------- local binning --

def _bin_local(pos, inv_mass, radius, batch_slot, active, cell_size,
               band, block, lay: SpatialLayout, aux_cols):
    """Sort-bin local particles into the device's padded plane window.

    Returns ``(planes, aux, slot, in_grid)``; ``slot`` addresses the padded
    (RP + Gb + RP, LP + Lb + LP) layout, out-of-window particles (in transit
    after a teleport or ownership change) get the sentinel and fall back to
    integration-only, like budget-dropped particles.
    """
    n = pos.shape[0]
    g, k = lay.grid_dim, lay.slots_per_cell
    gb, gx, lb, lp = lay.gb, lay.gx, lay.lb, lay.lp
    rows = gb + 2 * RP
    width = lb + 2 * lp

    cell = jnp.floor(pos / cell_size)
    cell = jnp.clip(jnp.where(jnp.isfinite(cell), cell, 0.0), -1e9, 1e9)
    cxy = jnp.mod(cell.astype(jnp.int32), g)
    ly = cxy[:, 1] - band * gb                       # local row
    lx = cxy[:, 0] - block * gx                      # local cell column
    in_win = (ly >= 0) & (ly < gb) & (lx >= 0) & (lx < gx) & active
    local_cell = jnp.where(in_win, ly * gx + lx, gb * gx)

    idx = jnp.arange(n, dtype=jnp.int32)
    # rotate slot winners across rebins by the SAME position-bit hash as the
    # single-chip binning (ops/dense.bin_to_planes rotate=True — without it
    # the lowest-index K members of an over-occupied cell win every rebin
    # and the rest never collide). The hash is layout-independent, so winner
    # sets — and the occupancy-pressure boost below — match the single-chip
    # engine exactly; hash buckets MUST come from the GLOBAL grid_dim for
    # the truncation to agree.
    hb = dense_ops.rotate_hash_buckets(g)
    xb = jax.lax.bitcast_convert_type(pos[:, 0], jnp.int32)
    yb = jax.lax.bitcast_convert_type(pos[:, 1], jnp.int32)
    h = xb * jnp.int32(-1640531535) + yb * jnp.int32(-2048144789)
    h = jnp.bitwise_and(jnp.bitwise_xor(h, jnp.right_shift(h, 15)),
                        jnp.int32(hb - 1))
    key = local_cell * jnp.int32(hb) + h
    key_sorted, pidx_sorted = jax.lax.sort_key_val(key, idx)
    cid_sorted = key_sorted // jnp.int32(hb)
    from ..ops.grid import segment_extent
    rank, cnt_sorted = segment_extent(cid_sorted)
    ok = (rank < k) & (cid_sorted < gb * gx)
    row_s = cid_sorted // gx
    col_s = cid_sorted - row_s * gx
    # padded slot: halo offsets baked in
    slot_sorted = jnp.where(
        ok, (row_s + RP) * width + lp + col_s * k + rank, rows * width)
    slot = jnp.zeros((n,), jnp.int32).at[pidx_sorted].set(slot_sorted)
    # FIELD_OCC carries the cell's true occupancy for the sweep's
    # occupancy-pressure boost (single-chip parity; ops/dense.py FIELD_OCC)
    occ_col = jnp.zeros((n,), jnp.float32).at[pidx_sorted].set(
        cnt_sorted.astype(jnp.float32))

    pack = jnp.stack([
        pos[:, 0], pos[:, 1], inv_mass, radius,
        batch_slot.astype(jnp.float32), jnp.zeros((n,), jnp.float32),
        idx.astype(jnp.float32), jnp.where(active, occ_col, 0.0),
    ], axis=1)
    if aux_cols is not None:
        pack = jnp.concatenate([pack, aux_cols], axis=1)

    grid_idx = jnp.full((rows * width + 1,), -1, jnp.int32)
    grid_idx = grid_idx.at[jnp.where(ok, slot_sorted, rows * width)].set(
        pidx_sorted, mode="drop")[:-1]
    occupied = grid_idx >= 0
    rows_data = pack[jnp.maximum(grid_idx, 0)]
    rows_data = jnp.where(occupied[:, None], rows_data, 0.0)
    all_planes = rows_data.T.reshape(pack.shape[1], rows, width)
    planes = all_planes[:dense_ops.N_FIELDS]
    aux = all_planes[dense_ops.N_FIELDS:] if aux_cols is not None else None
    in_grid = slot < rows * width
    return planes, aux, slot, in_grid


# ----------------------------------------------------------- plane sweep --

def _sweep_local(planes, params, lay: SpatialLayout, cohesion: bool,
                 use_pallas: bool, wide: bool = False):
    """Jacobi pair sweep over the local padded window. (2, Gb, W) corrections.

    Reuses the single-chip lane-roll sweep: the lane mask is K-periodic and
    the halo width is a multiple of K, so local lane phase equals global
    lane phase; halo lanes receive garbage corrections that the subsequent
    halo refresh overwrites. On TPU this runs the production Pallas kernel
    (the padded width is lane-tile aligned by ``SpatialLayout.lp``); off-TPU
    it falls back to the jnp golden model automatically.

    ``wide`` selects the violent-phase window=3 + fresh-cell-mask sweep
    (ops/solver._adaptive_substep_run). It is halo-safe here: the row halo
    (ROW_PAD=8) covers the +-3 row reach and ``lp >= 4K`` covers the 4K-1
    lane roll; the fresh-mask's mod-g cell adjacency is preserved under the
    local window's own modulus because interacting pairs differ by <= 1
    global cell."""
    from ..ops.pallas import sweep_kernel
    # NOTE: always the one-sided kernel here. The symmetric variant
    # (SolverOptions.sweep_symmetric) folds spill rows with a TORUS wrap;
    # local spatial planes are not tori — their halo rows belong to
    # NEIGHBOR devices, and each device must recompute its own half of
    # seam pairs (the halo side's corrections are discarded, not summed).
    return sweep_kernel.sweep_planes(planes, params, lay.slots_per_cell,
                                     cohesion=cohesion, ordered_budget=False,
                                     use_pallas=use_pallas,
                                     window=3 if wide else 1,
                                     fresh_mask=wide)


# ------------------------------------------------------------- migration --

_MIG_FIELDS = 15  # pos2 prev2 vel2 last2 radius mass_t inv_mass batch color4


def _pack_migrants(fields, send_mask, cap: int):
    """Select up to ``cap`` masked rows into a fixed (cap, F+1) buffer.

    Last column is the validity flag. Selection order is ascending particle
    index (stable sort)."""
    n = send_mask.shape[0]
    key = jnp.where(send_mask, 0, 1).astype(jnp.int32)
    _, idx_sorted = jax.lax.sort_key_val(key, jnp.arange(n, dtype=jnp.int32))
    take = idx_sorted[:cap]
    valid = send_mask[take]
    rows = fields[take]                                     # (cap, F)
    rows = jnp.where(valid[:, None], rows, 0.0)
    sent = jnp.zeros((n,), bool).at[take].set(valid)
    return jnp.concatenate([rows, valid[:, None].astype(jnp.float32)],
                           axis=1), sent


def _place_migrants(fields, active, bufs, n_free_needed: int):
    """Scatter received migrant rows into free (inactive) slots.

    Returns (fields, active, n_dropped): rows beyond the free-slot supply are
    dropped and counted (capacity-overflow budget analog)."""
    n = active.shape[0]
    key = jnp.where(active, 1, 0).astype(jnp.int32)          # free slots first
    _, idx_sorted = jax.lax.sort_key_val(key, jnp.arange(n, dtype=jnp.int32))
    free = idx_sorted[:n_free_needed]                        # candidate targets
    free_ok = ~active[free]                                  # truly free?

    total_valid = jnp.zeros((), jnp.int32)
    offset = jnp.zeros((), jnp.int32)
    dropped = jnp.zeros((), jnp.int32)
    for buf in bufs:
        rows, valid = buf[:, :-1], buf[:, -1] > 0.5
        cap = rows.shape[0]
        # pack this buffer's valid rows to the front of its slice window
        vkey = jnp.where(valid, 0, 1).astype(jnp.int32)
        _, vsort = jax.lax.sort_key_val(vkey, jnp.arange(cap, dtype=jnp.int32))
        rows = rows[vsort]
        valid = valid[vsort]
        nv = jnp.sum(valid.astype(jnp.int32))
        dst_i = offset + jnp.arange(cap, dtype=jnp.int32)
        dst_ok = valid & (dst_i < n_free_needed)
        dst = jnp.where(dst_ok, dst_i, n_free_needed)
        target = jnp.concatenate([free, jnp.zeros((1,), jnp.int32)])[dst]
        usable = dst_ok & jnp.concatenate([free_ok, jnp.zeros((1,), bool)])[dst]
        target = jnp.where(usable, target, n)                # drop out of range
        fields = fields.at[target].set(rows, mode="drop")
        active = active.at[target].set(True, mode="drop")
        dropped = dropped + jnp.sum((valid & ~usable).astype(jnp.int32))
        offset = offset + nv
        total_valid = total_valid + nv
    return fields, active, dropped


def _migrate_axis(fields, active, want_dir, axis_name: str, size: int,
                  cap: int):
    """One-hop ring migration along one mesh axis. Returns updated
    (fields, active, n_dropped)."""
    if size == 1:
        return fields, active, jnp.zeros((), jnp.int32)
    up_buf, up_sent = _pack_migrants(fields, active & (want_dir > 0), cap)
    dn_buf, dn_sent = _pack_migrants(fields, active & (want_dir < 0), cap)
    active = active & ~up_sent & ~dn_sent
    up_recv = jax.lax.ppermute(up_buf, axis_name, _ring_perm(size, 1))
    dn_recv = jax.lax.ppermute(dn_buf, axis_name, _ring_perm(size, -1))
    return _place_migrants(fields, active, (up_recv, dn_recv), 2 * cap)


# --------------------------------------------------- shared step pieces --

def _pop_env(cfg, mass_t, active, batch_slot, batch_target, follow_radius,
             sub_dt, options: SolverOptions, lay: SpatialLayout):
    """Per-population step environment (the reference's env, :1726-1786)."""
    damp = 1.0 - jnp.clip(cfg.damping, 0.0, 1.0)
    mass = jnp_mix(cfg.min_mass, cfg.max_mass, mass_t)
    inv_mass = jnp.where(active, 1.0 / jnp.maximum(mass, 1e-12), 0.0)
    radius = jnp.where(
        active, jnp_mix(cfg.min_radius, cfg.max_radius, mass_t), 0.0)
    follow_c = solver_ops.strength_to_compliance(cfg.follow_strength, sub_dt)
    collision_c = solver_ops.strength_to_compliance(cfg.collision_strength,
                                                    sub_dt)
    cohesion_c = solver_ops.strength_to_compliance(cfg.cohesion_strength,
                                                   sub_dt)
    cell_size, params = solver_ops._dense_params(
        cfg, active, collision_c, cohesion_c, options)
    # wide-sweep fresh cells must wrap on the GLOBAL torus: local planes are
    # windows whose width is not a multiple of grid_dim, so the default
    # lanes//k modulus would reject globally-wrap-adjacent pairs (cells
    # G-1 and 0) — found by the G=64 at-scale equivalence test
    params = params._replace(fresh_mod=jnp.float32(lay.grid_dim))
    table = jnp.concatenate([batch_target, follow_radius[:, None]], axis=1)
    rows3 = table[jnp.maximum(batch_slot, 0)]                # small gather
    return dict(damp=damp, inv_mass=inv_mass, radius=radius,
                follow_c=follow_c, cell_size=cell_size, params=params,
                tx=rows3[:, 0], ty=rows3[:, 1], td=2.0 * rows3[:, 2])


def _psum_sum(x):
    """Global scalar sum of an array over the 2D spatial mesh."""
    return jax.lax.psum(jax.lax.psum(jnp.sum(x), BANDS), BLOCKS)


def _plane_run_local(planes, aux, env, sub_dt, relaxation,
                     options: SolverOptions, lay: SpatialLayout,
                     cohesion: bool, n_live=None, wide=None):
    """``n_substeps`` of the substep pipeline in local plane layout; X/Y
    halos re-exchanged after every collision pass (the spatial analog of
    ops/solver._plane_run + the violence-gated wide sweep of
    ops/solver._adaptive_substep_run).

    The wide gate's drift metric reduces over REAL rows/lanes only and is
    ``psum``-ed over the mesh, so every device takes the same
    ``lax.cond`` branch (the ppermutes inside the branches stay uniform).
    Returns ``(planes, aux, wide)`` — resident callers carry ``wide``
    across steps like the single-chip paths."""
    A = solver_ops
    thresh2 = (options.wide_threshold_cells * env["cell_size"]) ** 2
    gb, lb, lp = lay.gb, lay.lb, lay.lp

    def real(x):
        return x[RP:RP + gb, lp:lp + lb]

    # FIELD_OCC holds cell COUNTS — normalize to 0/1 slot weights
    occ = jnp.minimum(real(planes[dense_ops.FIELD_OCC]), 1.0)
    if n_live is None:
        n_live = jnp.maximum(_psum_sum(occ), 1.0)
    n_occ = jnp.maximum(_psum_sum(occ), 1.0)

    def rel_over(dxp, dyp):
        """Count of occupied real slots whose drift relative to the global
        population mean exceeds the violence threshold."""
        mx = _psum_sum(dxp) / n_occ
        my = _psum_sum(dyp) / n_occ
        rel2 = (dxp - mx * occ) ** 2 + (dyp - my * occ) ** 2
        return _psum_sum(rel2 > thresh2)

    rearm = jnp.int32(options.wide_rearm_substeps)
    full_budget = jnp.int32(options.wide_budget_substeps)
    # velocity-predicted movement gates the very first substep (see
    # ops/solver._adaptive_substep_run)
    pred = rel_over(real(aux[A.AUX_VX]) * occ * sub_dt,
                    real(aux[A.AUX_VY]) * occ * sub_dt)
    pred_trip = pred > options.wide_tolerance * n_live
    if wide is None:
        wide = solver_ops.wide_state_init(options)
    trip, budget, calm = wide
    trip = trip | pred_trip

    for _ in range(options.n_substeps):
        # full-substep movement reference (integration + corrections), like
        # the single-chip gate — decisions must match it exactly
        move_ref = (real(planes[dense_ops.FIELD_X]),
                    real(planes[dense_ops.FIELD_Y]))
        px, py = planes[dense_ops.FIELD_X], planes[dense_ops.FIELD_Y]
        vx = aux[A.AUX_VX] * env["damp"]
        vy = aux[A.AUX_VY] * env["damp"]
        aux = (aux.at[A.AUX_PX].set(px).at[A.AUX_PY].set(py)
                  .at[A.AUX_VX].set(vx).at[A.AUX_VY].set(vy))
        x = px + sub_dt * vx
        y = py + sub_dt * vy
        dx, dy = A._follow_delta(x, y, planes[dense_ops.FIELD_W],
                                 planes[dense_ops.FIELD_OCC] > 0.0,
                                 aux[A.AUX_TX], aux[A.AUX_TY],
                                 aux[A.AUX_TD], env["follow_c"])
        planes = (planes.at[dense_ops.FIELD_X].set(x + dx)
                        .at[dense_ops.FIELD_Y].set(y + dy))

        def passes(w):
            def f(pl):
                def collision_pass(_, pl):
                    corr = _sweep_local(pl, env["params"], lay, cohesion,
                                        options.use_pallas, wide=w)
                    pl = (pl.at[dense_ops.FIELD_X, RP:RP + lay.gb]
                            .add(relaxation * corr[0])
                            .at[dense_ops.FIELD_Y, RP:RP + lay.gb]
                            .add(relaxation * corr[1]))
                    # refresh only the X/Y halos the correction touched
                    return pl.at[:2].set(_exchange_halos(pl[:2], lay))

                return jax.lax.fori_loop(0, options.n_collision_steps,
                                         collision_pass, pl)
            return f

        wide_now = trip & (budget > 0)
        planes = jax.lax.cond(wide_now, passes(True), passes(False), planes)
        budget = jnp.where(wide_now, budget - 1, budget)
        # movement DURING this substep decides the next substep's window
        n_over = rel_over(
            (real(planes[dense_ops.FIELD_X]) - move_ref[0]) * occ,
            (real(planes[dense_ops.FIELD_Y]) - move_ref[1]) * occ)
        trip = n_over > options.wide_tolerance * n_live
        calm = jnp.where(trip, 0, calm + 1)
        budget = jnp.where(calm >= rearm, full_budget, budget)
        aux = (aux.at[A.AUX_VX]
                  .set((planes[dense_ops.FIELD_X] - aux[A.AUX_PX]) / sub_dt)
                  .at[A.AUX_VY]
                  .set((planes[dense_ops.FIELD_Y] - aux[A.AUX_PY]) / sub_dt))
    return planes, aux, (trip, budget, calm)


def _extract_local(planes, aux, slot):
    """(pos, prev, vel, in_grid) per local particle; FIELD_OCC guards
    against unplaced slots (see ops/solver._plane_extract)."""
    A = solver_ops
    ext = jnp.stack([planes[dense_ops.FIELD_X], planes[dense_ops.FIELD_Y],
                     aux[A.AUX_PX], aux[A.AUX_PY],
                     aux[A.AUX_VX], aux[A.AUX_VY],
                     planes[dense_ops.FIELD_OCC]], axis=-1).reshape(-1, 7)
    got = ext[jnp.minimum(slot, ext.shape[0] - 1)]
    in_grid = (slot < planes.shape[1] * planes.shape[2]) & (got[:, 6] > 0.0)
    return got[:, 0:2], got[:, 2:4], got[:, 4:6], in_grid


def _fallback_steps(pos, vel, env, active, sub_dt, n_sub: int):
    """Integration-without-collision for out-of-grid particles
    (reference past-cutoff behavior, :1656-1658)."""
    A = solver_ops
    fb_p, fb_v = pos, vel
    fb_prev = pos
    for _ in range(n_sub):
        fb_v = fb_v * env["damp"]
        fb_prev = fb_p
        fb_p = fb_p + sub_dt * fb_v
        fdx, fdy = A._follow_delta(fb_p[:, 0], fb_p[:, 1], env["inv_mass"],
                                   active, env["tx"], env["ty"], env["td"],
                                   env["follow_c"])
        fb_p = fb_p + jnp.stack([fdx, fdy], axis=1)
        fb_v = (fb_p - fb_prev) / sub_dt
    return fb_p, fb_prev, fb_v


# ------------------------------------------------------------- the step --

def spatial_step(mesh: Mesh, lay: SpatialLayout, options: SolverOptions):
    """Build the jitted 2D-spatially-sharded dense step.

    ``step(state, cfg2, step_delta, relaxation) -> (state, stats, info)``
    with ``state.batch_slot < 0`` marking inactive slots (see
    :func:`redistribute`); semantics match the single-chip dense engine with
    ``budget_mode='off'`` and ``dense_rebin='step'``. ``info`` is a (2, 2)
    i32 array of (migration-dropped, in-transit) counts per population.
    """
    lay.check()
    assert options.budget_mode == "off", (
        "spatial_step implements budget_mode='off' semantics (the ordered "
        "0.05 n^2 cutoff is inert at multi-chip counts)")
    n_sub = options.n_substeps

    def _pop_step(pos, prev, vel, last_pos, radius, mass_t, inv_mass,
                  batch_slot, color, active, cfg, batch_target, follow_radius,
                  band, block, sub_dt, relaxation):
        env = _pop_env(cfg, mass_t, active, batch_slot, batch_target,
                       follow_radius, sub_dt, options, lay)
        aux_cols = jnp.stack([pos[:, 0], pos[:, 1], vel[:, 0], vel[:, 1],
                              env["tx"], env["ty"], env["td"]], axis=1)
        planes, aux, slot, in_grid = _bin_local(
            pos, env["inv_mass"], env["radius"], batch_slot, active,
            env["cell_size"], band, block, lay, aux_cols)
        planes = _exchange_halos(planes, lay)
        aux = _exchange_halos(aux, lay)

        cohesion = options.cohesion_mode == "spacing"
        n_live = jnp.maximum(_psum_sum(active), 1).astype(jnp.float32)
        planes, aux, _wide = _plane_run_local(planes, aux, env, sub_dt,
                                              relaxation, options, lay,
                                              cohesion, n_live=n_live)
        p_pl, prev_pl, v_pl, in_grid = _extract_local(planes, aux, slot)

        # fallback: pre-solve + follow only (reference past-cutoff behavior)
        fb_p, fb_prev, fb_v = _fallback_steps(pos, vel, env, active, sub_dt,
                                              n_sub)
        sel = (in_grid & active)[:, None]
        keep = active[:, None]
        new_pos = jnp.where(sel, p_pl, jnp.where(keep, fb_p, pos))
        new_prev = jnp.where(sel, prev_pl, jnp.where(keep, fb_prev, prev))
        new_vel = jnp.where(sel, v_pl, jnp.where(keep, fb_v, vel))
        n_transit = jnp.sum((~in_grid) & active)
        return (new_pos, new_prev, new_vel, env["inv_mass"], env["radius"],
                env["cell_size"], n_transit)

    def _shard_body(state: ParticleState, cfg2: DeviceConfig,
                    step_delta, relaxation):
        sub_dt = jnp.maximum(step_delta / n_sub, EPS)
        band = jax.lax.axis_index(BANDS)
        block = jax.lax.axis_index(BLOCKS)
        follow_radius = jnp.sqrt(jnp.maximum(state.batch_radius, 0.0))
        last_pos = state.pos

        new = {"pos": [], "prev": [], "vel": [], "inv_mass": [], "radius": [],
               "batch_slot": [], "mass_t": [], "color": [], "last_pos": []}
        stats = []
        info = []
        for i in range(2):
            cfg = jax.tree.map(lambda a: a[i], cfg2)
            active = state.batch_slot[i] >= 0
            (pos, prev, vel, inv_mass, radius, cell_size,
             n_transit) = _pop_step(
                state.pos[i], state.prev[i], state.vel[i], state.last_pos[i],
                state.radius[i], state.mass_t[i], state.inv_mass[i],
                state.batch_slot[i], state.color[i], active, cfg,
                state.batch_target, follow_radius[i], band, block,
                sub_dt, relaxation)

            # ---- migration (y then x) ----
            fields = jnp.concatenate([
                pos, prev, vel, last_pos[i], radius[:, None],
                state.mass_t[i][:, None], inv_mass[:, None],
                state.batch_slot[i].astype(jnp.float32)[:, None],
                state.color[i]], axis=1)                     # (C, 15)
            dest_b, dest_x = owner_of(pos, cell_size, lay)
            fields, act2, drop_y = _migrate_axis(
                fields, active, _ring_dir(dest_b, band, lay.db),
                BANDS, lay.db, lay.migrate_cap)
            # x-phase recomputes destinations (received rows migrate on)
            dest_b2, dest_x2 = owner_of(fields[:, 0:2], cell_size, lay)
            fields, act3, drop_x = _migrate_axis(
                fields, act2, _ring_dir(dest_x2, block, lay.dx),
                BLOCKS, lay.dx, lay.migrate_cap)

            new["pos"].append(fields[:, 0:2])
            new["prev"].append(fields[:, 2:4])
            new["vel"].append(fields[:, 4:6])
            new["last_pos"].append(fields[:, 6:8])
            new["radius"].append(jnp.where(act3, fields[:, 8], 0.0))
            new["mass_t"].append(fields[:, 9])
            new["inv_mass"].append(jnp.where(act3, fields[:, 10], 0.0))
            new["batch_slot"].append(jnp.where(
                act3, fields[:, 11].astype(jnp.int32), -1))
            new["color"].append(fields[:, 12:16])

            # ---- stats (global psums) ----
            act = act3
            pos_f = fields[:, 0:2]
            vel_f = fields[:, 4:6]
            rad_f = jnp.where(act, fields[:, 8], 0.0)

            def gsum(x):
                return jax.lax.psum(jax.lax.psum(x, BANDS), BLOCKS)

            def gmax(x):
                return jax.lax.pmax(jax.lax.pmax(x, BANDS), BLOCKS)

            def gmin(x):
                return jax.lax.pmin(jax.lax.pmin(x, BANDS), BLOCKS)

            n_act = jnp.maximum(gsum(jnp.sum(act)), 1)
            centroid = gsum(jnp.sum(jnp.where(act[:, None], pos_f, 0.0),
                                    axis=0)) / n_act
            max_vel = jnp.sqrt(gmax(jnp.max(jnp.where(
                act, jnp.sum(vel_f * vel_f, -1), 0.0))))
            big = jnp.float32(3.4e38)
            lo = gmin(jnp.min(jnp.where(act[:, None], pos_f - rad_f[:, None],
                                        big), axis=0))
            hi = gmax(jnp.max(jnp.where(act[:, None], pos_f + rad_f[:, None],
                                        -big), axis=0))
            mrad = jnp.maximum(gmax(jnp.max(rad_f)), 1.0)
            bsum, bcount = solver_ops.batch_segment_sums(
                pos_f, act, jnp.maximum(new["batch_slot"][i], 0),
                state.max_batches)
            bsum, bcount = gsum(bsum), gsum(bcount)
            last_cent = gsum(jnp.sum(jnp.where(
                act[:, None], fields[:, 6:8], 0.0), axis=0)) / n_act
            stats.append((centroid, max_vel, bsum, bcount, lo, hi, mrad,
                          last_cent))
            info.append(jnp.stack([gsum(drop_y + drop_x),
                                   gsum(n_transit)]))

        stacked = {k: jnp.stack(v) for k, v in new.items()}
        (centroid, max_vel, bsum, bcount, lo, hi, mrad, last_cent) = (
            jax.tree.map(lambda *x: jnp.stack(x), *stats))
        new_state = state.replace(
            pos=stacked["pos"], prev=stacked["prev"], vel=stacked["vel"],
            last_pos=stacked["last_pos"], radius=stacked["radius"],
            mass_t=stacked["mass_t"], inv_mass=stacked["inv_mass"],
            batch_slot=stacked["batch_slot"], color=stacked["color"])
        st = StepStats(aabb_min=lo, aabb_max=hi, centroid=centroid,
                       last_centroid=last_cent, max_radius=mrad,
                       max_velocity=max_vel, batch_pos_sum=bsum,
                       batch_count=bcount)
        return new_state, st, jnp.stack(info)

    pvec = P(None, (BANDS, BLOCKS))
    pmat = P(None, (BANDS, BLOCKS), None)
    state_specs = ParticleState(
        pos=pmat, prev=pmat, vel=pmat, last_pos=pmat, radius=pvec,
        mass_t=pvec, inv_mass=pvec, batch_slot=pvec, color=pmat,
        count=P(), batch_target=P(), batch_radius=P(), batch_used=P())
    cfg_specs = jax.tree.map(lambda _: P(), DeviceConfig(
        *([0.0] * 15), jnp.zeros(4), jnp.zeros(4)))
    stats_specs = StepStats(
        aabb_min=P(), aabb_max=P(), centroid=P(), last_centroid=P(),
        max_radius=P(), max_velocity=P(), batch_pos_sum=P(), batch_count=P())

    from ._compat import shard_map_compat
    fn = shard_map_compat(
        _shard_body, mesh=mesh,
        in_specs=(state_specs, cfg_specs, P(), P()),
        out_specs=(state_specs, stats_specs, P()))
    return jax.jit(fn)


def spatial_multi_step(mesh: Mesh, lay: SpatialLayout, options: SolverOptions):
    """Plane-RESIDENT multi-step over the 2D spatial mesh.

    The multi-chip analog of the single-chip drift-adaptive fast-forward
    (ops/solver._population_multi_dense): each device keeps its local plane
    window resident across steps — per step it pays only the substep sweeps
    plus X/Y halo refreshes (O(boundary) ICI bytes). A fresh binning +
    FULL-field halo exchange + one-hop ring migration runs only when the
    globally-psum'd drift metric trips (every device computes the identical
    predicate from the same psums, so the ``lax.cond`` branches agree and
    the collectives inside stay aligned). Between rebins, particles that
    crossed an ownership boundary stay in their bin-time device's planes —
    pair-correct through the exchanged halos, exactly like the bounded
    staleness argument of the single-chip path.

    Returns ``fn(state, cfg2, step_delta, relaxation, n_steps) ->
    (state, stats, info)`` with ``n_steps`` TRACED (one compile serves every
    length). ``info`` is (2, 2) i32: (migration-dropped, in-transit).
    """
    lay.check()
    assert (options.budget_mode == "off"
            and options.dense_rebin == "step"), (
        "spatial_multi_step requires the plane-resident dense configuration")
    n_sub = options.n_substeps
    cohesion = options.cohesion_mode == "spacing"

    def _gsum(x):
        return jax.lax.psum(jax.lax.psum(x, BANDS), BLOCKS)

    def _shard_body(state: ParticleState, cfg2: DeviceConfig,
                    step_delta, relaxation, n_steps, wide_state):
        sub_dt = jnp.maximum(step_delta / n_sub, EPS)
        band = jax.lax.axis_index(BANDS)
        block = jax.lax.axis_index(BLOCKS)
        follow_radius = jnp.sqrt(jnp.maximum(state.batch_radius, 0.0))

        def bin_pop(i, pos, vel, mass_t, batch_slot, active, cfg):
            env = _pop_env(cfg, mass_t, active, batch_slot,
                           state.batch_target, follow_radius[i], sub_dt,
                           options, lay)
            aux_cols = jnp.stack([pos[:, 0], pos[:, 1], vel[:, 0], vel[:, 1],
                                  env["tx"], env["ty"], env["td"]], axis=1)
            planes, aux, slot, _ = _bin_local(
                pos, env["inv_mass"], env["radius"], batch_slot, active,
                env["cell_size"], band, block, lay, aux_cols)
            planes = _exchange_halos(planes, lay)
            aux = _exchange_halos(aux, lay)
            return env, planes, aux, slot, planes[:2]

        carries = []
        for i in range(2):
            cfg = jax.tree.map(lambda a, i=i: a[i], cfg2)
            active = state.batch_slot[i] >= 0
            env, planes, aux, slot, ref = bin_pop(
                i, state.pos[i], state.vel[i], state.mass_t[i],
                state.batch_slot[i], active, cfg)
            carries.append(dict(
                planes=planes, aux=aux, slot=slot, ref=ref,
                pos=state.pos[i], prev=state.prev[i], vel=state.vel[i],
                last=state.pos[i], mass_t=state.mass_t[i],
                batch_slot=state.batch_slot[i], color=state.color[i],
                inv_mass=env["inv_mass"], radius=env["radius"],
                tx=env["tx"], ty=env["ty"], td=env["td"],
                dropped=jnp.zeros((), jnp.int32)))

        # particle-independent env pieces (stable across migrations)
        static_env = []
        for i in range(2):
            cfg = jax.tree.map(lambda a, i=i: a[i], cfg2)
            active = state.batch_slot[i] >= 0
            e = _pop_env(cfg, state.mass_t[i], active, state.batch_slot[i],
                         state.batch_target, follow_radius[i], sub_dt,
                         options, lay)
            static_env.append(dict(damp=e["damp"], follow_c=e["follow_c"],
                                   cell_size=e["cell_size"],
                                   params=e["params"]))

        def pop_body(i, c):
            se = static_env[i]
            act = c["batch_slot"] >= 0
            env = dict(damp=se["damp"], follow_c=se["follow_c"],
                       cell_size=se["cell_size"], params=se["params"],
                       inv_mass=c["inv_mass"], radius=c["radius"],
                       tx=c["tx"], ty=c["ty"], td=c["td"])
            last = c["pos"]  # pre-step positions anchor frame interpolation
            n_live_f = jnp.maximum(_psum_sum(act), 1).astype(jnp.float32)
            planes, aux, wide = _plane_run_local(c["planes"], c["aux"], env,
                                                 sub_dt, relaxation, options,
                                                 lay, cohesion,
                                                 n_live=n_live_f,
                                                 wide=c["wide"])
            fb_p, fb_prev, fb_v = _fallback_steps(c["pos"], c["vel"], env,
                                                  act, sub_dt, n_sub)
            p_pl, prev_pl, v_pl, in_grid = _extract_local(planes, aux,
                                                          c["slot"])
            sel = (in_grid & act)[:, None]
            p = jnp.where(sel, p_pl, fb_p)
            pr = jnp.where(sel, prev_pl, fb_prev)
            v = jnp.where(sel, v_pl, fb_v)

            # GLOBAL relative-to-mean drift vs bin-time positions
            thresh2 = (0.25 * se["cell_size"]) ** 2
            d = p - c["ref_pos"]
            n_live = jnp.maximum(_gsum(jnp.sum(act)), 1)
            mean_d = _gsum(jnp.sum(jnp.where(act[:, None], d, 0.0),
                                   axis=0)) / n_live
            rel2 = jnp.sum((d - mean_d) ** 2, axis=1)
            n_over = _gsum(jnp.sum(act & (rel2 > thresh2)))
            need = n_over > options.rebin_tolerance * n_live

            c = dict(c, planes=planes, aux=aux, pos=p, prev=pr, vel=v,
                     last=last, wide=wide)

            def rebin(c):
                # migrate movers one mesh hop (y then x), then rebin +
                # full-field halo exchange on the new ownership
                fields = jnp.concatenate([
                    c["pos"], c["prev"], c["vel"], c["last"],
                    c["radius"][:, None], c["mass_t"][:, None],
                    c["inv_mass"][:, None],
                    c["batch_slot"].astype(jnp.float32)[:, None],
                    c["color"]], axis=1)
                act_l = c["batch_slot"] >= 0
                dest_b, _ = owner_of(c["pos"], se["cell_size"], lay)
                fields, act2, drop_y = _migrate_axis(
                    fields, act_l, _ring_dir(dest_b, band, lay.db),
                    BANDS, lay.db, lay.migrate_cap)
                _, dest_x2 = owner_of(fields[:, 0:2], se["cell_size"], lay)
                fields, act3, drop_x = _migrate_axis(
                    fields, act2, _ring_dir(dest_x2, block, lay.dx),
                    BLOCKS, lay.dx, lay.migrate_cap)
                pos = fields[:, 0:2]
                vel = fields[:, 4:6]
                mass_t = fields[:, 9]
                batch_slot = jnp.where(act3, fields[:, 11].astype(jnp.int32),
                                       -1)
                cfg = jax.tree.map(lambda a, i=i: a[i], cfg2)
                env2, planes2, aux2, slot2, ref2 = bin_pop(
                    i, pos, vel, mass_t, batch_slot, act3, cfg)
                return dict(
                    planes=planes2, aux=aux2, slot=slot2, ref=ref2,
                    ref_pos=pos, pos=pos, prev=fields[:, 2:4], vel=vel,
                    last=fields[:, 6:8], mass_t=mass_t,
                    batch_slot=batch_slot, color=fields[:, 12:16],
                    inv_mass=env2["inv_mass"], radius=env2["radius"],
                    tx=env2["tx"], ty=env2["ty"], td=env2["td"],
                    dropped=c["dropped"] + drop_y + drop_x, wide=c["wide"])

            return jax.lax.cond(need, rebin, lambda c: c, c)

        # per-particle bin-time positions for the drift metric; violence
        # (wide-sweep) state carries across steps like the single-chip
        # resident loop
        for i, c in enumerate(carries):
            c["ref_pos"] = c["pos"]
            c["wide"] = wide_state[i]

        def body(_, cs):
            return tuple(pop_body(i, c) for i, c in enumerate(cs))

        carries = jax.lax.fori_loop(0, jnp.asarray(n_steps, jnp.int32),
                                    body, tuple(carries))

        # ---- final merge + migration (restore ownership invariant) + stats
        new = {"pos": [], "prev": [], "vel": [], "last_pos": [],
               "radius": [], "mass_t": [], "inv_mass": [], "batch_slot": [],
               "color": []}
        stats = []
        info = []
        for i, c in enumerate(carries):
            se = static_env[i]
            act_l = c["batch_slot"] >= 0
            fields = jnp.concatenate([
                c["pos"], c["prev"], c["vel"], c["last"],
                c["radius"][:, None], c["mass_t"][:, None],
                c["inv_mass"][:, None],
                c["batch_slot"].astype(jnp.float32)[:, None],
                c["color"]], axis=1)
            dest_b, _ = owner_of(c["pos"], se["cell_size"], lay)
            fields, act2, drop_y = _migrate_axis(
                fields, act_l, _ring_dir(dest_b, band, lay.db),
                BANDS, lay.db, lay.migrate_cap)
            _, dest_x2 = owner_of(fields[:, 0:2], se["cell_size"], lay)
            fields, act3, drop_x = _migrate_axis(
                fields, act2, _ring_dir(dest_x2, block, lay.dx),
                BLOCKS, lay.dx, lay.migrate_cap)
            act = act3
            new["pos"].append(fields[:, 0:2])
            new["prev"].append(fields[:, 2:4])
            new["vel"].append(fields[:, 4:6])
            new["last_pos"].append(fields[:, 6:8])
            new["radius"].append(jnp.where(act, fields[:, 8], 0.0))
            new["mass_t"].append(fields[:, 9])
            new["inv_mass"].append(jnp.where(act, fields[:, 10], 0.0))
            new["batch_slot"].append(jnp.where(
                act, fields[:, 11].astype(jnp.int32), -1))
            new["color"].append(fields[:, 12:16])

            pos_f = fields[:, 0:2]
            vel_f = fields[:, 4:6]
            rad_f = jnp.where(act, fields[:, 8], 0.0)

            def gmax(x):
                return jax.lax.pmax(jax.lax.pmax(x, BANDS), BLOCKS)

            def gmin(x):
                return jax.lax.pmin(jax.lax.pmin(x, BANDS), BLOCKS)

            n_act = jnp.maximum(_gsum(jnp.sum(act)), 1)
            centroid = _gsum(jnp.sum(jnp.where(act[:, None], pos_f, 0.0),
                                     axis=0)) / n_act
            max_vel = jnp.sqrt(gmax(jnp.max(jnp.where(
                act, jnp.sum(vel_f * vel_f, -1), 0.0))))
            big = jnp.float32(3.4e38)
            lo = gmin(jnp.min(jnp.where(act[:, None], pos_f - rad_f[:, None],
                                        big), axis=0))
            hi = gmax(jnp.max(jnp.where(act[:, None], pos_f + rad_f[:, None],
                                        -big), axis=0))
            mrad = jnp.maximum(gmax(jnp.max(rad_f)), 1.0)
            bsum, bcount = solver_ops.batch_segment_sums(
                pos_f, act, jnp.maximum(new["batch_slot"][i], 0),
                state.max_batches)
            bsum, bcount = _gsum(bsum), _gsum(bcount)
            last_cent = _gsum(jnp.sum(jnp.where(
                act[:, None], fields[:, 6:8], 0.0), axis=0)) / n_act
            stats.append((centroid, max_vel, bsum, bcount, lo, hi, mrad,
                          last_cent))
            n_transit = _gsum(jnp.sum(act
                                      & (c["slot"] >= (lay.gb + 2 * RP)
                                         * (lay.lb + 2 * lay.lp))))
            info.append(jnp.stack([_gsum(c["dropped"] + drop_y + drop_x),
                                   n_transit]))

        stacked = {k: jnp.stack(v) for k, v in new.items()}
        (centroid, max_vel, bsum, bcount, lo, hi, mrad, last_cent) = (
            jax.tree.map(lambda *x: jnp.stack(x), *stats))
        new_state = state.replace(
            pos=stacked["pos"], prev=stacked["prev"], vel=stacked["vel"],
            last_pos=stacked["last_pos"], radius=stacked["radius"],
            mass_t=stacked["mass_t"], inv_mass=stacked["inv_mass"],
            batch_slot=stacked["batch_slot"], color=stacked["color"])
        st = StepStats(aabb_min=lo, aabb_max=hi, centroid=centroid,
                       last_centroid=last_cent, max_radius=mrad,
                       max_velocity=max_vel, batch_pos_sum=bsum,
                       batch_count=bcount)
        ws_out = tuple(c["wide"] for c in carries)
        return new_state, st, jnp.stack(info), ws_out

    pvec = P(None, (BANDS, BLOCKS))
    pmat = P(None, (BANDS, BLOCKS), None)
    state_specs = ParticleState(
        pos=pmat, prev=pmat, vel=pmat, last_pos=pmat, radius=pvec,
        mass_t=pvec, inv_mass=pvec, batch_slot=pvec, color=pmat,
        count=P(), batch_target=P(), batch_radius=P(), batch_used=P())
    cfg_specs = jax.tree.map(lambda _: P(), DeviceConfig(
        *([0.0] * 15), jnp.zeros(4), jnp.zeros(4)))
    stats_specs = StepStats(
        aabb_min=P(), aabb_max=P(), centroid=P(), last_centroid=P(),
        max_radius=P(), max_velocity=P(), batch_pos_sum=P(), batch_count=P())

    from ._compat import shard_map_compat
    fn = shard_map_compat(
        _shard_body, mesh=mesh,
        in_specs=(state_specs, cfg_specs, P(), P(), P(), P()),
        out_specs=(state_specs, stats_specs, P(), P()))
    jitted = jax.jit(fn)

    def call(state, cfg2, step_delta, relaxation, n_steps, wide_state=None):
        """``wide_state=None`` starts a fresh violence episode; pass the
        previous call's 4th output to persist the wide-sweep budget."""
        if wide_state is None:
            wide_state = (solver_ops.wide_state_init(options),
                          solver_ops.wide_state_init(options))
        return jitted(state, cfg2, step_delta, relaxation, n_steps,
                      wide_state)

    return call


# ----------------------------------------------------------- redistribute --

def redistribute(state: ParticleState, cfg2_cell_size, lay: SpatialLayout,
                 mesh: Mesh, from_spatial: bool = False) -> ParticleState:
    """Re-establish the spatial layout invariant from any state.

    Sorts each population's live particles into the mesh-linearized device
    slices by torus-cell ownership; inactive padding gets ``batch_slot=-1``.
    ``cfg2_cell_size``: (2,) per-population cell size (host floats ok).
    ``from_spatial=False`` treats the input as a standard prefix-contiguous
    handler state (live = first ``count`` slots); ``True`` reads liveness
    from ``batch_slot >= 0`` (a state already in spatial layout). Raises if
    any device's share exceeds its slice capacity.
    """
    lay.check()
    n_dev = lay.db * lay.dx
    cap = state.capacity
    assert cap % n_dev == 0
    c_loc = cap // n_dev

    host = jax.device_get(state)
    out = {f: np.array(getattr(host, f)) for f in
           ("pos", "prev", "vel", "last_pos", "radius", "mass_t", "inv_mass",
            "batch_slot", "color")}
    counts = np.array(host.count)
    for i in range(2):
        if from_spatial:
            live_idx = np.nonzero(out["batch_slot"][i] >= 0)[0]
        else:
            live_idx = np.arange(int(counts[i]))
        pos = out["pos"][i][live_idx]
        cell = np.floor(pos / float(np.asarray(cfg2_cell_size)[i]))
        cxy = np.mod(cell.astype(np.int64), lay.grid_dim)
        owner = ((cxy[:, 1] // lay.gb) * lay.dx + (cxy[:, 0] // lay.gx))
        per_dev = np.bincount(owner, minlength=n_dev)
        if per_dev.max() > c_loc:
            raise ValueError(
                f"spatial redistribute overflow: a device needs "
                f"{int(per_dev.max())} slots but slice capacity is {c_loc}; "
                f"increase capacity or mesh size")
        order = np.argsort(owner, kind="stable")
        sorted_owner = owner[order]
        # rank within each device's contiguous run
        seg_starts = np.zeros(live_idx.size, np.int64)
        change = np.nonzero(np.diff(sorted_owner))[0] + 1
        seg_starts[change] = change
        seg_starts = np.maximum.accumulate(seg_starts)
        ranks = np.arange(live_idx.size) - seg_starts
        dst_of_sorted = sorted_owner * c_loc + ranks
        for f in out:
            src = out[f][i][live_idx][order]
            fresh = (np.full_like(out[f][i], -1) if f == "batch_slot"
                     else np.zeros_like(out[f][i]))
            fresh[dst_of_sorted] = src
            out[f][i] = fresh

    pvec = P(None, (BANDS, BLOCKS))
    pmat = P(None, (BANDS, BLOCKS), None)

    def put(x, spec):
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))

    return state.replace(
        pos=put(out["pos"], pmat), prev=put(out["prev"], pmat),
        vel=put(out["vel"], pmat), last_pos=put(out["last_pos"], pmat),
        radius=put(out["radius"], pvec), mass_t=put(out["mass_t"], pvec),
        inv_mass=put(out["inv_mass"], pvec),
        batch_slot=put(out["batch_slot"], pvec),
        color=put(out["color"], pmat),
        count=put(host.count, P()), batch_target=put(host.batch_target, P()),
        batch_radius=put(host.batch_radius, P()),
        batch_used=put(host.batch_used, P()),
    )


# ---------------------------------------------------------- sharded render --

def spatial_draw(mesh: Mesh, lay: SpatialLayout, opts2, viewport,
                 threshold: float, smoothness: float, use_lighting: bool):
    """Build a jitted multi-device renderer for spatial-layout states.

    The splat pass distributes perfectly: screen-blend accumulation is
    ``1 - prod(1 - a_i)`` over particles (ops/render.py), and the product
    factorizes over devices — each device splats only ITS particles into the
    full canvas and the per-device canvases combine with one log-space
    ``psum`` (the only render collective, O(canvas) bytes). The outline /
    lighting / composite passes then run replicated (identical on every
    device), so the returned frame is replicated.

    ``opts2``: (white, yolk) RenderOptions (static canvas buckets chosen by
    the host). Per-particle color mode is not supported sharded (its rgb
    accumulator also factorizes, but nothing exercises it multi-chip yet).

    Returns ``draw(state, stats, cfg2, interpolation_alpha) -> (H, W, 4)``.
    Capability note: the reference renders single-GPU only; this is
    TPU-native added capability, matching ops/render.py's passes exactly
    (validated against the single-device frame in tests/test_spatial.py).
    """
    from ..ops import render as render_ops
    assert not (opts2[0].use_particle_color or opts2[1].use_particle_color)
    x, y, vw, vh = viewport
    vw, vh = int(vw), int(vh)
    origin = jnp.asarray([x, y], jnp.float32)

    def _body(state: ParticleState, stats: StepStats, cfg2: DeviceConfig,
              interpolation_alpha):
        centers = (stats.last_centroid
                   + (stats.centroid - stats.last_centroid)
                   * interpolation_alpha)
        screen_rgb = jnp.zeros((vh, vw, 3), jnp.float32)
        screen_a = jnp.zeros((vh, vw), jnp.float32)
        for i in (0, 1):  # white first, then yolk (:2163-2171)
            opts = opts2[i]
            cfg = jax.tree.map(lambda a: a[i], cfg2)
            active = state.batch_slot[i] >= 0
            alpha_local, _, _ = render_ops.splat_population(
                state.pos[i], state.last_pos[i], state.vel[i],
                state.radius[i], state.color[i], active, centers[i],
                interpolation_alpha, cfg.texture_scale, cfg.motion_blur,
                opts, upsample=False)
            # combine device canvases at COARSE resolution (the blend
            # product does not commute with bilinear resampling):
            # 1 - prod_dev(1 - a_dev), via one log-space psum
            log1m = jnp.log(jnp.maximum(1.0 - alpha_local, 1e-30))
            log1m = jax.lax.psum(jax.lax.psum(log1m, BANDS), BLOCKS)
            alpha = 1.0 - jnp.exp(log1m)
            rgba = render_ops.render_population(
                alpha, None, cfg, jnp.float32(threshold),
                jnp.float32(smoothness), use_lighting, opts,
                px_scale=float(opts.downsample))
            if opts.downsample > 1:
                s = opts.canvas_size
                rgba = jax.image.resize(rgba, (s, s, 4), "linear")
            # paste at the RAW centroid like the reference (:2132-2133) —
            # only the splat centers on the interpolated centroid
            corner = stats.centroid[i] - 0.5 * opts.canvas_size - origin
            screen_rgb, screen_a = render_ops._paste_src_over_frac(
                screen_rgb, screen_a, rgba, corner)
        return jnp.concatenate([screen_rgb, screen_a[..., None]], axis=-1)

    pvec = P(None, (BANDS, BLOCKS))
    pmat = P(None, (BANDS, BLOCKS), None)
    state_specs = ParticleState(
        pos=pmat, prev=pmat, vel=pmat, last_pos=pmat, radius=pvec,
        mass_t=pvec, inv_mass=pvec, batch_slot=pvec, color=pmat,
        count=P(), batch_target=P(), batch_radius=P(), batch_used=P())
    stats_specs = StepStats(
        aabb_min=P(), aabb_max=P(), centroid=P(), last_centroid=P(),
        max_radius=P(), max_velocity=P(), batch_pos_sum=P(), batch_count=P())
    cfg_specs = jax.tree.map(lambda _: P(), DeviceConfig(
        *([0.0] * 15), jnp.zeros(4), jnp.zeros(4)))

    from ._compat import shard_map_compat
    fn = shard_map_compat(
        _body, mesh=mesh,
        in_specs=(state_specs, stats_specs, cfg_specs, P()),
        out_specs=P())
    return jax.jit(fn)
