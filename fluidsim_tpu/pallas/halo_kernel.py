"""Per-shard temporally-blocked Jacobi on a halo-extended slab (Pallas).

The explicit halo-exchange solver (``parallel.halo.jacobi_3d_sharded``)
exchanges a T-plane halo every T sweeps and runs the sweeps on the
extended local slab ``[below(T), local(lz), above(T)]``.  Its XLA sweep
streams the slab through HBM every iteration — exactly the cost the
single-chip temporally-blocked kernel (``pallas/jacobi.py``) eliminates.
This module provides that kernel for the *extended slab*, making the
sharded path's local compute kernel-grade: per v5e-8 shard the slab is
(64+2T, 512, 512) with 1 MB planes, the same shape the y-tiled windows
were built for.

Differences from the single-chip kernel (``_jacobi_kernel``):

* **Open z edges.**  The extended array's z edges are halo *data*, not
  walls; validity erodes one plane per sweep from each edge.  The same
  clipped-window argument as the single-chip kernel shows every plane
  ≥ T from the array edge is exact after T sweeps — and the caller
  discards exactly the outer T planes — so no special handling is
  needed beyond NOT applying a wall rule there.
* **Traced wall positions.**  Under ``shard_map`` the rank is a traced
  value, so whether the slab touches the global z walls cannot be
  compiled statically.  The wall face indices arrive as an SMEM scalar
  pair ``(wall_lo, wall_hi)`` (``NO_WALL`` ⇒ none on that side; it must
  be ≤ −2 so ``wall_lo + 1`` matches no plane — −1 would make the
  corrected read fire at extended plane 0): the corrected
  neighbor reads compare against them at trace-free runtime cost.  On
  the first shard ``wall_lo = T`` (the global z=0 face sits at extended
  index T); on the last, ``wall_hi = T + lz − 1``.  y/x walls are
  physical on every shard, exactly as in the single-chip kernel.

Numerics: identical values and add order to ``parallel.halo._ext_sweep``
in the valid region, except multiply-by-``1/c`` instead of divide-by-``c``
(the 1-ulp class trade every Pallas solver here makes).

Reference lineage: FluidSim.cs:1188-1233 (LinearSolveIterationJob) +
:1235-1289 (BoundaryJob), re-designed as a communication-avoiding
on-chip program over the ``ppermute``-exchanged slab.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .jacobi import _signs, tile_geometry, window_cost, window_origin

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

# "No wall on this side" sentinel for the traced wall positions.  Must
# be ≤ −2: the sweep's corrected read compares ``zg == wall_lo + 1``
# (and the face write ``wall_lo >= z0``), so −1 would fire at extended
# plane 0.
NO_WALL = -5


def _ext_jacobi_kernel(walls_smem, *refs, nz: int, n: int, slab: int,
                       halo: int, t_iters: int, a: float, inv_c: float,
                       b: int, tile_y: int | None = None,
                       has_obst: bool = False):
    """T sweeps on z-windows of the (nz, n, n) extended slab.

    ``walls_smem``: int32[2] = (wall_lo, wall_hi) extended-array z indices
    of the global wall faces, ``NO_WALL`` for none.  y-tiling geometry is
    shared
    with the single-chip kernel (``tile_geometry``); y/x wall handling is
    identical (global y/x walls exist on every shard).

    ``has_obst`` inserts the halo-extended int8 obstacle mask after the
    rhs input and an int8 window scratch after ``x0s`` (see
    ``_ext_window_body``).
    """
    if has_obst:
        x_hbm, x0_hbm, obst_hbm, out_hbm, buf0, buf1, x0s, mbuf, sems = refs
    else:
        x_hbm, x0_hbm, out_hbm, buf0, buf1, x0s, sems = refs
        obst_hbm = mbuf = None
    _ext_window_body(walls_smem, x_hbm, x0_hbm, out_hbm, buf0, buf1, x0s,
                     sems, pl.program_id(0), nz=nz, n=n, slab=slab,
                     halo=halo, t_iters=t_iters, a=a, inv_c=inv_c, b=b,
                     tile_y=tile_y, obst_hbm=obst_hbm, mbuf=mbuf)


def _ext_window_body(walls_smem, x_hbm, x0_hbm, out_hbm, buf0, buf1, x0s,
                     sems, idx, *, nz: int, n: int, slab: int, halo: int,
                     t_iters: int, a: float, inv_c: float, b: int,
                     tile_y: int | None = None, obst_hbm=None, mbuf=None):
    """Window body shared by the plain extended-slab kernel and the RDMA
    round kernel: DMA the window in, run T corrected-read sweeps,
    materialize wall faces, ship the slab.

    ``obst_hbm``/``mbuf``: optional halo-extended int8 obstacle mask and
    its window scratch.  The mask expands ONCE per window into an f32
    coefficient ``where(obstacle, 0, 1/c)`` that replaces the scalar
    ``1/c`` in every sweep — the resident kernel's coefficient-volume
    formulation (pallas/resident.py).  Exact copy-through iff the
    iterate is zero in solid cells, which the pressure solve guarantees
    (``p`` enters as ``set_bnd_3d(0, zeros, obst)``; the ``b = 0`` wall
    rule cannot write a nonzero into a solid).  Reference contract:
    FluidSim.cs:1209-1211 (obstacle cells skipped by the sweep).
    """
    p = slab + 2 * halo
    ty, n_ty, halo_y, py = tile_geometry(n, tile_y, halo)
    i, jy, z0, y0, start, ystart, off, off_y = window_origin(
        idx, nz=nz, n=n, slab=slab, halo=halo, ty=ty, n_ty=n_ty,
        halo_y=halo_y, py=py,
    )

    in_dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(start, p), pl.ds(ystart, py)], buf0, sems.at[0]
    )
    x0_dma = pltpu.make_async_copy(
        x0_hbm.at[pl.ds(start, p), pl.ds(ystart, py)], x0s, sems.at[1]
    )
    in_dma.start()
    x0_dma.start()
    m_dma = None
    if obst_hbm is not None:
        m_dma = pltpu.make_async_copy(
            obst_hbm.at[pl.ds(start, p), pl.ds(ystart, py)], mbuf,
            sems.at[2],
        )
        m_dma.start()
    in_dma.wait()
    x0_dma.wait()
    if m_dma is not None:
        m_dma.wait()

    sz, sy, sx = _signs(b)
    az = jnp.asarray(a, jnp.float32)
    ic = jnp.asarray(inv_c, jnp.float32)
    if obst_hbm is not None:
        # Expanded once per window; every sweep then multiplies by the
        # coefficient volume instead of the scalar (zero extra vector
        # ops per sweep beyond the multiply it replaces).
        ic = jnp.where(mbuf[...] != 0, jnp.float32(0.0), ic)
    wall_lo = walls_smem[0]
    wall_hi = walls_smem[1]

    zg = start + jax.lax.broadcasted_iota(jnp.int32, (p, py, n), 0)
    yg = ystart + jax.lax.broadcasted_iota(jnp.int32, (p, py, n), 1)
    xg = jax.lax.broadcasted_iota(jnp.int32, (p, py, n), 2)

    def roll(v, shift, axis):
        m = v.shape[axis]
        return pltpu.roll(v, shift % m, axis)

    def sweep(src_ref, dst_ref):
        v = src_ref[:]
        # y/x: physical walls on every shard — corrected reads exactly as
        # the single-chip kernel.
        right = jnp.where(xg == n - 2, sx * v, roll(v, -1, 2))
        left = jnp.where(xg == 1, sx * v, roll(v, 1, 2))
        up = jnp.where(yg == n - 2, sy * v, roll(v, -1, 1))
        down = jnp.where(yg == 1, sy * v, roll(v, 1, 1))
        # z: wall rule only at the traced global-face positions (the
        # NO_WALL sentinel compares false everywhere); elsewhere the
        # window neighbor is halo data and the erosion margin
        # guarantees validity.
        above = jnp.where(zg == wall_hi - 1, sz * v, roll(v, -1, 0))
        below = jnp.where(zg == wall_lo + 1, sz * v, roll(v, 1, 0))

        nbr = ((right + left) + (up + down)) + (above + below)
        dst_ref[:] = (x0s[:] + az * nbr) * ic

    for t in range(t_iters):
        src, dst = (buf0, buf1) if t % 2 == 0 else (buf1, buf0)
        sweep(src, dst)

    final = buf1 if t_iters % 2 == 1 else buf0

    # In-kernel wall-face materialization on the shipped cells, in the
    # exact z → y → x healing order of ``parallel.halo._ext_faces``
    # (later passes read earlier results) — replaces the caller's
    # per-round XLA face pass, which cost a full-slab HBM round trip.
    # z faces live at traced positions; each is written by the window
    # whose *shipped slab* contains it (sources are window-interior:
    # the halo margin guarantees wall±1 is present).
    @pl.when(jnp.logical_and(wall_lo >= z0, wall_lo < z0 + slab))
    def _():
        i = wall_lo - start
        src = final[pl.ds(i + 1, 1)]
        final[pl.ds(i, 1)] = src if sz == 1.0 else sz * src

    @pl.when(jnp.logical_and(wall_hi >= z0, wall_hi < z0 + slab))
    def _():
        i = wall_hi - start
        src = final[pl.ds(i - 1, 1)]
        final[pl.ds(i, 1)] = src if sz == 1.0 else sz * src

    # Global y faces exist only in the first/last y-tile (window rows
    # 0 / py−1 — the y origin clips to the walls there).
    @pl.when(jy == 0)
    def _():
        src = final[:, 1:2, :]
        final[:, 0:1, :] = src if sy == 1.0 else sy * src

    @pl.when(jy == n_ty - 1)
    def _():
        src = final[:, py - 2:py - 1, :]
        final[:, py - 1:py, :] = src if sy == 1.0 else sy * src

    xsrc_lo = final[:, :, 1:2]
    final[:, :, 0:1] = xsrc_lo if sx == 1.0 else sx * xsrc_lo
    xsrc_hi = final[:, :, n - 2:n - 1]
    final[:, :, n - 1:n] = xsrc_hi if sx == 1.0 else sx * xsrc_hi

    out_dma = pltpu.make_async_copy(
        final.at[pl.ds(off, slab), pl.ds(off_y, ty)],
        out_hbm.at[pl.ds(z0, slab), pl.ds(y0, ty)],
        sems.at[2],
    )
    out_dma.start()
    out_dma.wait()


def _ext_advect_kernel(zoff_smem, *refs, nz: int, n: int,
                       n_fields: int, slab: int, k_win: int, halo: int,
                       n_sub: int, dt0: float, bs,
                       tile_y: int | None = None, self_adv: bool = False,
                       has_obst: bool = False):
    """Windowed K-substep advection over an (nz, n, n) halo-extended
    shard slab.  ``zoff_smem``: int32[1] traced global-z index of the
    extended array's plane 0 (= rank·lz − halo; negative on rank 0,
    where the sub-wall planes are erosion garbage anyway).  Passing
    ``start = zoff + ext_window_start`` into ``_substep_window_vals``
    makes every global-position formula — backtrace clamp to
    ``[0.5, N−1.5]``, intermediate wall faces at global z ∈ {0, N−1} —
    correct verbatim; nothing else in the advection core changes.

    Output contract (``ops.advect._mask_and_bnd_3d``, obstacle-free)
    materializes on the out window exactly like the single-chip
    ``fuse_mask`` path, except the global z faces are written by the
    window whose shipped slab contains them (traced condition) instead
    of the statically first/last program.

    ``has_obst`` (round 5): the int8 obstacle-mask window DMAs in
    alongside the fields and ``_substep_window_vals`` applies the FULL
    per-substep contract — fresh-zero walls/obstacle cells, faces, and
    the obstacle *mirror* for velocity components — on the window,
    exactly as the single-chip obstacle kernel.  The mirror reads ±1
    neighbors, so the caller provisions ``halo = n_sub·(k_win+1)`` and
    the mask rides the same halo exchange as the fields.  The mirror's
    wall/interior predicates are global-position-based (traced
    ``start``), so nothing else changes; the explicit face slice-writes
    below are skipped (the in-values contract already wrote them)."""
    from .advect import _substep_window_vals

    if self_adv:
        # Velocity self-advection: the field windows alias the velocity
        # windows — one in-DMA stream (same as the single-chip
        # ``_advect_kernel`` self_adv path).
        if has_obst:
            vel_hbm, obst_hbm, out_hbm, vbuf, mbuf, obuf, sems = refs
        else:
            vel_hbm, out_hbm, vbuf, obuf, sems = refs
            obst_hbm = mbuf = None
        fbuf = vbuf
    elif has_obst:
        (fields_hbm, vel_hbm, obst_hbm, out_hbm,
         fbuf, vbuf, mbuf, obuf, sems) = refs
    else:
        fields_hbm, vel_hbm, out_hbm, fbuf, vbuf, obuf, sems = refs
        obst_hbm = mbuf = None

    idx = pl.program_id(0)
    p = slab + 2 * halo
    ty, n_ty, halo_y, py = tile_geometry(n, tile_y, halo)
    i, jy, z0, y0, start, ystart, off, off_y = window_origin(
        idx, nz=nz, n=n, slab=slab, halo=halo, ty=ty, n_ty=n_ty,
        halo_y=halo_y, py=py,
    )
    zoff = zoff_smem[0]

    dmas = () if self_adv else (
        pltpu.make_async_copy(
            fields_hbm.at[:, pl.ds(start, p), pl.ds(ystart, py)], fbuf,
            sems.at[0],
        ),
    )
    dmas += (
        pltpu.make_async_copy(
            vel_hbm.at[:, pl.ds(start, p), pl.ds(ystart, py)], vbuf,
            sems.at[1],
        ),
    )
    if has_obst:
        dmas += (
            pltpu.make_async_copy(
                obst_hbm.at[pl.ds(start, p), pl.ds(ystart, py)], mbuf,
                sems.at[3],
            ),
        )
    for d in dmas:
        d.start()
    for d in dmas:
        d.wait()

    f32 = jnp.float32
    vel_vals = tuple(vbuf[c].astype(f32) for c in range(3))
    fields_in = tuple(fbuf[c].astype(f32) for c in range(n_fields))
    omask = mbuf[...].astype(f32) if has_obst else None
    fields_v = _substep_window_vals(
        fields_in, vel_vals, start=zoff + start, n=n, p=p, k_win=k_win,
        n_sub=n_sub, dt0=dt0, bs=bs, omask=omask, ystart=ystart, py=py,
    )
    for c in range(n_fields):
        obuf[c, :, :, :] = fields_v[c].astype(obuf.dtype)

    if has_obst:
        # Full contract already applied on the window values (incl. the
        # final substep) by ``_substep_window_vals``'s omask path.
        out_dma = pltpu.make_async_copy(
            obuf.at[:, pl.ds(off, slab), pl.ds(off_y, ty)],
            out_hbm.at[:, pl.ds(z0, slab), pl.ds(y0, ty)],
            sems.at[2],
        )
        out_dma.start()
        out_dma.wait()
        return

    # Output contract: fresh-zero borders + set_bnd faces z→y→x as slice
    # writes (every border cell is rewritten by a face pass, so no
    # separate zeroing is needed — same argument as the single-chip
    # fuse_mask path).  Global z faces sit at traced ext indices.
    glo = -zoff          # ext index of global plane 0 (may be < 0)
    ghi = n - 1 - zoff   # ext index of global plane n−1
    for c in range(n_fields):
        szf = -1.0 if bs[c] == 3 else 1.0
        syf = -1.0 if bs[c] == 2 else 1.0
        sxf = -1.0 if bs[c] == 1 else 1.0

        @pl.when(jnp.logical_and(glo >= z0, glo < z0 + slab))
        def _(c=c, szf=szf):
            iz = glo - start
            src = obuf[c, pl.ds(iz + 1, 1)]
            obuf[c, pl.ds(iz, 1)] = src if szf == 1.0 else szf * src

        @pl.when(jnp.logical_and(ghi >= z0, ghi < z0 + slab))
        def _(c=c, szf=szf):
            iz = ghi - start
            src = obuf[c, pl.ds(iz - 1, 1)]
            obuf[c, pl.ds(iz, 1)] = src if szf == 1.0 else szf * src

        @pl.when(jy == 0)
        def _(c=c, syf=syf):
            src = obuf[c, :, 1:2, :]
            obuf[c, :, 0:1, :] = src if syf == 1.0 else syf * src

        @pl.when(jy == n_ty - 1)
        def _(c=c, syf=syf):
            src = obuf[c, :, py - 2:py - 1, :]
            obuf[c, :, py - 1:py, :] = src if syf == 1.0 else syf * src

        xsrc_lo = obuf[c, :, :, 1:2]
        obuf[c, :, :, 0:1] = xsrc_lo if sxf == 1.0 else sxf * xsrc_lo
        xsrc_hi = obuf[c, :, :, n - 2:n - 1]
        obuf[c, :, :, n - 1:n] = xsrc_hi if sxf == 1.0 else sxf * xsrc_hi

    out_dma = pltpu.make_async_copy(
        obuf.at[:, pl.ds(off, slab), pl.ds(off_y, ty)],
        out_hbm.at[:, pl.ds(z0, slab), pl.ds(y0, ty)],
        sems.at[2],
    )
    out_dma.start()
    out_dma.wait()


def _pick_ext_advect(nz: int, n: int, n_fields: int, halo: int,
                     self_adv: bool = False, has_obst: bool = False):
    """(slab, tile_y) for the extended-slab advect windows: same VMEM
    model as ``advect._pick_slab`` (nbuf=1 — no double-buffering yet on
    the sharded path), slab divides nz, min-redundancy selection.
    ``self_adv``: field windows alias the velocity windows (no separate
    fields DMA/VMEM).  ``has_obst``: adds the int8 mask window (¼) plus
    the live mirror temporaries measured on the single-chip kernel
    (≈6 window-equivalents; +8 more when self-aliased — see
    ``advect._pick_slab``'s obstacle calibration)."""
    budget = 120 * 1024 * 1024
    best = None
    best_cost = None
    for tile in (n, n // 2, n // 4, n // 8):
        if tile < 8 or n % tile or tile % 8:
            continue
        ty, _, _, py = tile_geometry(n, None if tile == n else tile, halo)
        if py > n:
            continue
        plane = py * n * 4
        tile_budget = budget if tile == n else 110 * 1024 * 1024
        for slab in range(min(32, nz), 0, -1):
            if nz % slab:
                continue
            p = slab + 2 * halo
            f_in = 0 if self_adv else n_fields
            extra = 0.0
            if has_obst:
                extra = 0.25 + 6.0 + (8.0 if self_adv else 0.0)
            need = ((f_in + n_fields + 3) + 28 + extra) * p * plane
            if need > tile_budget or p > nz:
                continue
            cost = window_cost(p, py, slab, ty, n, tile != n)
            if best_cost is None or cost < best_cost:
                best = (slab, (None if tile == n else tile))
                best_cost = cost
            break  # larger slabs dominate at fixed tile
    return best


def advect_ext_pallas(bs, fields_ext, vel_ext, n: int, dt: float,
                      z_offset, window: int = 1, n_sub: int = 1,
                      obst_ext=None, interpret: bool = False, vma=None):
    """Per-shard windowed substepped advection on halo-extended slabs.

    ``fields_ext``: (F, nz, n, n), ``vel_ext``: (3, nz, n, n) with
    ``nz = lz + 2·halo`` (halo-exchanged); ``n`` is the GLOBAL
    grid size; ``z_offset`` the traced global-z index of extended plane
    0.  Returns the advected extended array (outer ``halo``
    planes are erosion garbage — slice them off).  Returns None when no
    VMEM-feasible window exists.

    ``obst_ext`` (round 5): int8 (nz, n, n) halo-extended obstacle mask
    — enables the full in-kernel obstacle contract (zero + faces +
    velocity mirror per substep, ``advect._substep_window_vals`` omask
    path).  The mirror reads ±1 neighbors per substep, so the halo is
    ``n_sub·(window+1)`` instead of ``n_sub·window`` — the caller's
    exchange depth must match (``parallel.halo.advect_multi_3d_sharded``
    provisions it).  Contract lineage: FluidSim.cs:1148-1156 (obstacle
    advection) + :1261-1287 (obstacle mirror)."""
    n_fields = fields_ext.shape[0]
    nz = fields_ext.shape[1]
    has_obst = obst_ext is not None
    halo = n_sub * (window + 1) if has_obst else window * n_sub
    if nz <= 2 * halo:
        return None
    # Velocity self-advection (object identity, as in the single-chip
    # kernel): alias the field windows onto the velocity windows — one
    # in-DMA stream, n_fields fewer VMEM windows.
    self_adv = fields_ext is vel_ext and tuple(bs) == (1, 2, 3) \
        and n_fields == 3
    picked = _pick_ext_advect(nz, n, n_fields, halo, self_adv, has_obst)
    if picked is None:
        return None
    slab, tile_y = picked
    p = slab + 2 * halo
    ty, n_ty, halo_y, py = tile_geometry(n, tile_y, halo)
    dt0 = float(np.float32(dt) * np.float32(n - 2))
    zoff = jnp.asarray(z_offset, jnp.int32).reshape((1,))

    kernel = functools.partial(
        _ext_advect_kernel, nz=nz, n=n, n_fields=n_fields, slab=slab,
        k_win=window, halo=halo, n_sub=n_sub, dt0=dt0, bs=tuple(bs),
        tile_y=tile_y, self_adv=self_adv, has_obst=has_obst,
    )
    out_sds = jax.ShapeDtypeStruct((n_fields, nz, n, n), fields_ext.dtype)
    if vma is not None:
        out_sds = jax.ShapeDtypeStruct((n_fields, nz, n, n),
                                       fields_ext.dtype, vma=vma)
    scratch = [] if self_adv else [
        pltpu.VMEM((n_fields, p, py, n), fields_ext.dtype),
    ]
    scratch += [
        pltpu.VMEM((3, p, py, n), vel_ext.dtype),
    ]
    if has_obst:
        scratch += [pltpu.VMEM((p, py, n), jnp.int8)]
    scratch += [
        pltpu.VMEM((n_fields, p, py, n), fields_ext.dtype),
        pltpu.SemaphoreType.DMA((4 if has_obst else 3,)),
    ]
    operands = (zoff,) + (() if self_adv else (fields_ext,)) + (vel_ext,)
    if has_obst:
        operands += (obst_ext.astype(jnp.int8),)
    n_any = (1 if self_adv else 2) + (1 if has_obst else 0)
    return pl.pallas_call(
        kernel,
        grid=((nz // slab) * n_ty,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_any,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=out_sds,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


def _rdma_jacobi_kernel(walls_smem, *refs, nz: int, n: int,
                        slab: int, halo: int, t_iters: int, a: float,
                        inv_c: float, b: int, axis_name: str, n_win: int,
                        tile_y: int | None = None, has_obst: bool = False):
    """One communication round of the sharded Jacobi solve with the halo
    exchange fused INTO the kernel as inter-chip RDMA.

    Grid = ``n_win + 1`` sequential programs.  Programs ``[0, n_win)`` are
    the plain extended-slab windows (``_ext_window_body``): T corrected-read
    sweeps each, shipping every plane of the (nz, n, n) output.  Program
    ``n_win`` is the communication epilogue:

    1. read back this shard's fresh edge slabs from the output (extended
       planes ``[T, 2T)`` and ``[lz, lz+T)`` — both ≥ T from the array
       edge, so exact after T sweeps),
    2. wait on the entry barrier (each rank announced itself to both
       neighbors from program 0, so a remote write can never target a
       rank that has not yet allocated this call's buffers),
    3. ``make_async_remote_copy`` the slabs into the neighbors' VMEM comm
       buffers over ICI (down: ``comm[0] → comm[3]``, up:
       ``comm[1] → comm[2]``),
    4. wait for the neighbors' symmetric sends and DMA them into this
       shard's output halo planes (``[0, T)`` / ``[lz+T, nz)``), zeroing
       the global-edge halos instead (bitwise-matching the
       ``ppermute``-based path, whose edge exchange returns zeros).

    The round's output is therefore the COMPLETE next extended array —
    local sweep results and refreshed halos — with zero XLA collectives.
    Skew safety: a neighbor can be at most one round ahead (its round-k+1
    windows need this rank's round-k edges, which are sent only after this
    rank's round-k barrier wait), so at any rank's round-k barrier wait
    each neighbor has at most one pending signal — consuming one per
    neighbor implies both are inside their round-k call.

    Reference lineage: this is the TPU-native replacement for the slot the
    reference leaves empty (no NCCL/MPI layer — SURVEY.md §5.8); the
    per-sweep dataflow is still LinearSolveIterationJob + BoundaryJob
    (FluidSim.cs:1188-1233, 1235-1289).

    ``has_obst`` inserts the halo-extended int8 obstacle mask after the
    rhs input and an int8 window scratch after ``x0s`` (the mask's own
    halo is round-invariant — the caller primes it once via
    ``halo_exchange_rdma``; it does NOT ride the per-round exchange).
    """
    if has_obst:
        (x_hbm, x0_hbm, obst_hbm, out_hbm, buf0, buf1, x0s, mbuf,
         comm, sems, send_sems, recv_sems) = refs
    else:
        (x_hbm, x0_hbm, out_hbm, buf0, buf1, x0s,
         comm, sems, send_sems, recv_sems) = refs
        obst_hbm = mbuf = None
    idx = pl.program_id(0)
    rank = jax.lax.axis_index(axis_name)
    ndev = jax.lax.axis_size(axis_name)
    barrier = pltpu.get_barrier_semaphore()
    lz = nz - 2 * halo

    @pl.when(idx == 0)
    def _announce():
        @pl.when(rank > 0)
        def _():
            pltpu.semaphore_signal(
                barrier, inc=1, device_id=rank - 1,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )

        @pl.when(rank < ndev - 1)
        def _():
            pltpu.semaphore_signal(
                barrier, inc=1, device_id=rank + 1,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )

    @pl.when(idx < n_win)
    def _window():
        _ext_window_body(walls_smem, x_hbm, x0_hbm, out_hbm, buf0, buf1,
                         x0s, sems, idx, nz=nz, n=n, slab=slab, halo=halo,
                         t_iters=t_iters, a=a, inv_c=inv_c, b=b,
                         tile_y=tile_y, obst_hbm=obst_hbm, mbuf=mbuf)

    @pl.when(idx == n_win)
    def _exchange():
        # 1. Read back the edge slabs this round just produced.  (An extra
        # HBM round trip of 2T planes — negligible next to the T sweeps —
        # in exchange for not threading edge-capture through every
        # window's shipping logic.)
        dn_dma = pltpu.make_async_copy(
            out_hbm.at[pl.ds(halo, halo)], comm.at[0], sems.at[0]
        )
        up_dma = pltpu.make_async_copy(
            out_hbm.at[pl.ds(lz, halo)], comm.at[1], sems.at[1]
        )
        dn_dma.start()
        up_dma.start()
        dn_dma.wait()
        up_dma.wait()

        # 2. Both neighbors must have entered this round's call before a
        # remote write may target their buffers.
        nnbr = (jnp.where(rank > 0, 1, 0)
                + jnp.where(rank < ndev - 1, 1, 0))
        pltpu.semaphore_wait(barrier, nnbr)

        # 3. Push edges over ICI: my bottom local planes become the lower
        # rank's "from above" halo; my top planes the upper rank's "from
        # below".
        @pl.when(rank > 0)
        def _send_down():
            rdma = pltpu.make_async_remote_copy(
                src_ref=comm.at[0], dst_ref=comm.at[3],
                send_sem=send_sems.at[0], recv_sem=recv_sems.at[0],
                device_id=rank - 1,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            rdma.wait_send()

        @pl.when(rank < ndev - 1)
        def _send_up():
            rdma = pltpu.make_async_remote_copy(
                src_ref=comm.at[1], dst_ref=comm.at[2],
                send_sem=send_sems.at[1], recv_sem=recv_sems.at[1],
                device_id=rank + 1,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            rdma.wait_send()

        # 4a. Halo from below: the lower rank's send-up lands in comm[2]
        # and signals recv_sems[1].  (wait_recv on a same-shape descriptor
        # waits the local recv semaphore for the copy's byte count; the
        # device_id operand is not used by the wait.)
        @pl.when(rank > 0)
        def _recv_below():
            pltpu.make_async_remote_copy(
                src_ref=comm.at[1], dst_ref=comm.at[2],
                send_sem=send_sems.at[1], recv_sem=recv_sems.at[1],
                device_id=rank,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            ).wait_recv()
            d = pltpu.make_async_copy(
                comm.at[2], out_hbm.at[pl.ds(0, halo)], sems.at[0]
            )
            d.start()
            d.wait()

        @pl.when(rank == 0)
        def _zero_below():
            comm[2] = jnp.zeros((halo, n, n), jnp.float32)
            d = pltpu.make_async_copy(
                comm.at[2], out_hbm.at[pl.ds(0, halo)], sems.at[0]
            )
            d.start()
            d.wait()

        # 4b. Halo from above: the upper rank's send-down lands in comm[3]
        # and signals recv_sems[0].
        @pl.when(rank < ndev - 1)
        def _recv_above():
            pltpu.make_async_remote_copy(
                src_ref=comm.at[0], dst_ref=comm.at[3],
                send_sem=send_sems.at[0], recv_sem=recv_sems.at[0],
                device_id=rank,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            ).wait_recv()
            d = pltpu.make_async_copy(
                comm.at[3], out_hbm.at[pl.ds(lz + halo, halo)], sems.at[1]
            )
            d.start()
            d.wait()

        @pl.when(rank == ndev - 1)
        def _zero_above():
            comm[3] = jnp.zeros((halo, n, n), jnp.float32)
            d = pltpu.make_async_copy(
                comm.at[3], out_hbm.at[pl.ds(lz + halo, halo)], sems.at[1]
            )
            d.start()
            d.wait()


# Barrier-semaphore collective id for the RDMA halo kernels (any fixed
# value; must be shared by every rank's compilation of the same kernel).
_RDMA_COLLECTIVE_ID = 0x21


def rdma_comm_bytes(halo: int, n: int) -> int:
    """VMEM footprint of the RDMA round's comm buffers: 4 slabs of
    (halo, n, n) float32 (send down/up + recv below/above)."""
    return 4 * halo * n * n * 4


def jacobi_ext_rdma(xp, x0_ext, a: float, c: float, t_iters: int,
                    wall_lo, wall_hi, b: int = 0, axis_name: str = "z",
                    interpret: bool = False, vma=None, obst_ext=None):
    """One RDMA-fused round: ``t_iters`` sweeps on the halo-extended slab
    ``xp`` ((nz, n, n), nz = lz + 2·T) PLUS the inter-shard halo exchange,
    all inside one ``pallas_call`` (``_rdma_jacobi_kernel``).

    Returns the complete next extended array — sweep results in the local
    planes, the neighbors' fresh edge slabs in the halo planes (zeros at
    the global edges, matching ``parallel.halo.halo_exchange_z``) — so
    rounds chain with no XLA collectives.  Must be called inside
    ``shard_map`` over ``axis_name``.  Returns None when no VMEM-feasible
    window exists.

    ``obst_ext``: optional halo-extended int8 obstacle mask (round-
    invariant — prime it once with ``halo_exchange_rdma``); carried as a
    per-window coefficient volume (see ``_ext_window_body``).
    """
    nz, py_, n = xp.shape
    assert x0_ext.shape == xp.shape and py_ == n
    has_obst = obst_ext is not None
    picked = _pick_ext_block(nz, n, t_iters,
                             extra_bytes=rdma_comm_bytes(t_iters, n),
                             extra_windows=1.25 if has_obst else 0.0)
    if picked is None:
        return None
    slab, tile_y = picked
    p = slab + 2 * t_iters
    ty, n_ty, halo_y, py = tile_geometry(n, tile_y, t_iters)
    n_win = (nz // slab) * n_ty
    inv_c = float(np.float32(1.0) / np.float32(c))
    walls = jnp.stack([jnp.asarray(wall_lo, jnp.int32),
                       jnp.asarray(wall_hi, jnp.int32)])

    kernel = functools.partial(
        _rdma_jacobi_kernel, nz=nz, n=n, slab=slab, halo=t_iters,
        t_iters=t_iters, a=float(np.float32(a)), inv_c=inv_c, b=b,
        axis_name=axis_name, n_win=n_win, tile_y=tile_y,
        has_obst=has_obst,
    )
    operands = (walls, xp, x0_ext) + ((obst_ext,) if has_obst else ())
    scratch = [
        pltpu.VMEM((p, py, n), jnp.float32),
        pltpu.VMEM((p, py, n), jnp.float32),
        pltpu.VMEM((p, py, n), jnp.float32),
    ]
    if has_obst:
        scratch.append(pltpu.VMEM((p, py, n), jnp.int8))
    scratch += [
        pltpu.VMEM((4, t_iters, n, n), jnp.float32),
        pltpu.SemaphoreType.DMA((3,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if interpret:
        interpret = pltpu.InterpretParams()
    return pl.pallas_call(
        kernel,
        grid=(n_win + 1,),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * (3 if has_obst else 2)
        ),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=(
            jax.ShapeDtypeStruct((nz, n, n), xp.dtype) if vma is None
            else jax.ShapeDtypeStruct((nz, n, n), xp.dtype, vma=vma)
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
            collective_id=_RDMA_COLLECTIVE_ID,
        ),
        interpret=interpret,
    )(*operands)


# Separate barrier semaphore for the standalone exchange kernel: its
# announce/wait pairs must never be confused with the round kernel's (a
# neighbor's round-entry wait consuming an exchange-entry signal would
# let it target buffers the exchange call, not the round call, owns).
_RDMA_EXCHANGE_COLLECTIVE_ID = 0x22


def _halo_exchange_kernel(*refs, n_arrays: int, lz: int, h: int,
                          n: int, axis_name: str):
    """Build halo-extended arrays entirely in-kernel: copy each input's
    local planes into the output interior and transport the edge slabs
    between neighbor shards as inter-chip RDMA.

    ``refs`` layout: ``n_arrays`` HBM inputs ``(C_j, lz, n, n)``,
    ``n_arrays`` HBM outputs ``(C_j, lz+2h, n, n)``, per-array VMEM comm
    scratch ``(4, C_j, h, n, n)`` (slots: 0 = send-down staging of my
    bottom planes, 1 = send-up staging of my top planes, 2 = recv from
    below, 3 = recv from above), then DMA semaphores: local ``(3·n_arrays,)``,
    send ``(2·n_arrays,)``, recv ``(2·n_arrays,)``.

    Transport scheme (identical to ``_rdma_jacobi_kernel``'s epilogue and
    to ``parallel.halo.halo_exchange_z``'s ppermute pattern): my bottom
    ``h`` planes become the lower rank's from-above halo, my top planes
    the upper rank's from-below halo; global-edge halos are zeros.  The
    entry barrier (announce to both neighbors, then wait) guarantees a
    remote write only ever targets a rank inside the same call — and
    because announce and wait share this single program, a neighbor's
    send for call k cannot be issued until this rank announced call k,
    i.e. until its previous call fully completed.
    """
    x_hbm = refs[:n_arrays]
    out_hbm = refs[n_arrays:2 * n_arrays]
    comm = refs[2 * n_arrays:3 * n_arrays]
    base = 3 * n_arrays
    sems, send_sems, recv_sems = refs[base], refs[base + 1], refs[base + 2]

    rank = jax.lax.axis_index(axis_name)
    ndev = jax.lax.axis_size(axis_name)
    barrier = pltpu.get_barrier_semaphore()

    @pl.when(rank > 0)
    def _():
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=rank - 1,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    @pl.when(rank < ndev - 1)
    def _():
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=rank + 1,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    # Interior copies (input → output planes [h, h+lz)) and edge staging,
    # all started before any wait so the DMAs overlap.
    interior = []
    stages = []
    for j in range(n_arrays):
        d = pltpu.make_async_copy(
            x_hbm[j], out_hbm[j].at[:, pl.ds(h, lz)], sems.at[3 * j]
        )
        d.start()
        interior.append(d)
        s0 = pltpu.make_async_copy(
            x_hbm[j].at[:, pl.ds(0, h)], comm[j].at[0], sems.at[3 * j + 1]
        )
        s1 = pltpu.make_async_copy(
            x_hbm[j].at[:, pl.ds(lz - h, h)], comm[j].at[1],
            sems.at[3 * j + 2]
        )
        s0.start()
        s1.start()
        stages.append((s0, s1))
    for s0, s1 in stages:
        s0.wait()
        s1.wait()

    # Both neighbors must have entered this call before a remote write
    # may target their comm buffers.
    nnbr = (jnp.where(rank > 0, 1, 0)
            + jnp.where(rank < ndev - 1, 1, 0))
    pltpu.semaphore_wait(barrier, nnbr)

    # Push all arrays' edges over ICI, then drain the sends.
    for j in range(n_arrays):
        @pl.when(rank > 0)
        def _send_down(j=j):
            rdma = pltpu.make_async_remote_copy(
                src_ref=comm[j].at[0], dst_ref=comm[j].at[3],
                send_sem=send_sems.at[2 * j], recv_sem=recv_sems.at[2 * j],
                device_id=rank - 1,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            rdma.wait_send()

        @pl.when(rank < ndev - 1)
        def _send_up(j=j):
            rdma = pltpu.make_async_remote_copy(
                src_ref=comm[j].at[1], dst_ref=comm[j].at[2],
                send_sem=send_sems.at[2 * j + 1],
                recv_sem=recv_sems.at[2 * j + 1],
                device_id=rank + 1,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            rdma.wait_send()

    # Land the symmetric incoming slabs in the output halo planes
    # (zeros at the global edges, matching halo_exchange_z).
    for j in range(n_arrays):
        cshape = comm[j].shape[1:]  # (C, h, n, n)

        @pl.when(rank > 0)
        def _recv_below(j=j):
            pltpu.make_async_remote_copy(
                src_ref=comm[j].at[1], dst_ref=comm[j].at[2],
                send_sem=send_sems.at[2 * j + 1],
                recv_sem=recv_sems.at[2 * j + 1],
                device_id=rank,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            ).wait_recv()
            d = pltpu.make_async_copy(
                comm[j].at[2], out_hbm[j].at[:, pl.ds(0, h)],
                sems.at[3 * j + 1]
            )
            d.start()
            d.wait()

        @pl.when(rank == 0)
        def _zero_below(j=j, cshape=cshape):
            comm[j][2] = jnp.zeros(cshape, comm[j].dtype)
            d = pltpu.make_async_copy(
                comm[j].at[2], out_hbm[j].at[:, pl.ds(0, h)],
                sems.at[3 * j + 1]
            )
            d.start()
            d.wait()

        @pl.when(rank < ndev - 1)
        def _recv_above(j=j):
            pltpu.make_async_remote_copy(
                src_ref=comm[j].at[0], dst_ref=comm[j].at[3],
                send_sem=send_sems.at[2 * j], recv_sem=recv_sems.at[2 * j],
                device_id=rank,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            ).wait_recv()
            d = pltpu.make_async_copy(
                comm[j].at[3], out_hbm[j].at[:, pl.ds(lz + h, h)],
                sems.at[3 * j + 2]
            )
            d.start()
            d.wait()

        @pl.when(rank == ndev - 1)
        def _zero_above(j=j, cshape=cshape):
            comm[j][3] = jnp.zeros(cshape, comm[j].dtype)
            d = pltpu.make_async_copy(
                comm[j].at[3], out_hbm[j].at[:, pl.ds(lz + h, h)],
                sems.at[3 * j + 2]
            )
            d.start()
            d.wait()

    for d in interior:
        d.wait()


def exchange_comm_bytes(arrays, depth: int) -> int:
    """VMEM footprint of ``halo_exchange_rdma``'s comm scratch: 4 slabs
    of (C, depth, n, n) per array."""
    total = 0
    for x in arrays:
        c, _, _, n = x.shape
        total += 4 * c * depth * n * n * x.dtype.itemsize
    return total


def halo_exchange_rdma(arrays, depth: int, axis_name: str = "z",
                       interpret: bool = False, vma=None):
    """Halo-extend channel-stacked shard slabs with the exchange done as
    in-kernel inter-chip RDMA (``_halo_exchange_kernel``) — the
    collective-free replacement for ``halo_exchange_z`` + concatenate.

    ``arrays``: sequence of ``(C_j, lz, n, n)`` local arrays (same lz/n).
    Returns the matching ``(C_j, lz+2·depth, n, n)`` extended arrays:
    local planes in the interior, the neighbors' edge slabs in the halo
    planes (zeros at the global edges).  All arrays ride ONE kernel call,
    so consecutive exchanges of different arrays can never be reordered
    against each other across devices.  Must be called inside
    ``shard_map`` over ``axis_name``.

    Reference lineage: replaces the NCCL/MPI layer slot the reference
    leaves empty (SURVEY.md §5.8) with TPU ICI remote DMAs.
    """
    arrays = list(arrays)
    lz, n = arrays[0].shape[1], arrays[0].shape[-1]
    h = int(depth)
    if h > lz:
        raise ValueError(f"halo depth={h} exceeds local slab depth {lz}")
    for x in arrays:
        if x.shape[1] != lz or x.shape[-1] != n or x.shape[-2] != n:
            raise ValueError("all arrays must share (lz, n, n) geometry")
    budget = 100 * 1024 * 1024
    if exchange_comm_bytes(arrays, h) > budget:
        raise ValueError(
            f"RDMA exchange comm scratch exceeds VMEM budget "
            f"({exchange_comm_bytes(arrays, h)} > {budget} bytes)"
        )
    k = len(arrays)
    kernel = functools.partial(
        _halo_exchange_kernel, n_arrays=k, lz=lz, h=h, n=n,
        axis_name=axis_name,
    )
    nz = lz + 2 * h

    def sds(x):
        if vma is None:
            return jax.ShapeDtypeStruct((x.shape[0], nz, n, n), x.dtype)
        return jax.ShapeDtypeStruct((x.shape[0], nz, n, n), x.dtype,
                                    vma=vma)

    if interpret:
        interpret = pltpu.InterpretParams()
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * k,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * k,
        out_shape=tuple(sds(x) for x in arrays),
        scratch_shapes=(
            [pltpu.VMEM((4, x.shape[0], h, n, n), x.dtype)
             for x in arrays]
            + [pltpu.SemaphoreType.DMA((3 * k,)),
               pltpu.SemaphoreType.DMA((2 * k,)),
               pltpu.SemaphoreType.DMA((2 * k,))]
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
            collective_id=_RDMA_EXCHANGE_COLLECTIVE_ID,
        ),
        interpret=interpret,
    )(*arrays)
    return list(out)


def _pick_ext_block(nz: int, n: int, halo: int, extra_bytes: int = 0,
                    extra_windows: float = 0.0):
    """(slab, tile_y) for an (nz, n, n) extended slab: slab divides nz
    (z is untiled, no alignment needed), tile divides n (8-aligned).
    Same VMEM model and min-redundancy selection as
    ``jacobi._pick_block``, with the ×1.25 tiled penalty below n=256.
    ``extra_bytes``: additional fixed VMEM the caller's kernel holds
    alongside the windows (e.g. the RDMA comm slabs).
    ``extra_windows``: additional per-window footprint in f32
    window-equivalents (e.g. 1.25 for the obstacle path's int8 mask
    window + live f32 coefficient volume)."""
    budget = 120 * 1024 * 1024 - extra_bytes
    best = None
    best_cost = None
    for tile in (n, n // 2, n // 4, n // 8):
        if tile < 8 or n % tile or tile % 8:
            continue
        ty, _, _, py = tile_geometry(n, None if tile == n else tile, halo)
        if py > n:
            continue
        plane_bytes = py * n * 4
        for slab in range(min(64, nz), 0, -1):
            if nz % slab:
                continue
            window = slab + 2 * halo
            if (3 + 12 + extra_windows) * window * plane_bytes > budget \
                    or window > nz:
                continue
            cost = window_cost(window, py, slab, ty, n, tile != n)
            if best_cost is None or cost < best_cost:
                best = (slab, (None if tile == n else tile))
                best_cost = cost
            break  # larger slabs dominate smaller at fixed tile
    return best


def jacobi_ext_pallas(xp, x0_ext, a: float, c: float, t_iters: int,
                      wall_lo, wall_hi, b: int = 0,
                      interpret: bool = False, vma=None, obst_ext=None):
    """Run ``t_iters`` Jacobi sweeps on the halo-extended slab ``xp``
    ((nz, n, n), nz = lz + 2·T) with rhs ``x0_ext``.

    ``wall_lo``/``wall_hi``: traced int32 extended-array indices of the
    global z wall faces (``NO_WALL`` = this shard does not touch that
    wall; any value ≤ −2 works, −1 does NOT — see the constant).  The
    outer ``t_iters`` planes of the result are erosion garbage — callers
    slice them off (``parallel.halo.jacobi_3d_sharded`` does).  Returns
    None when no VMEM-feasible window exists (caller falls back to XLA).

    ``obst_ext``: optional halo-extended int8 obstacle mask, carried as
    a per-window coefficient volume (see ``_ext_window_body`` — the
    pressure-solve contract: the iterate is zero in solids).

    ``vma``: the varying-mesh-axes set for the output when called inside
    ``shard_map`` (e.g. ``frozenset({"z"})``) — shard_map's check_vma
    requires every ``ShapeDtypeStruct`` to declare it.
    """
    nz, py_, n = xp.shape
    assert x0_ext.shape == xp.shape and py_ == n
    has_obst = obst_ext is not None
    picked = _pick_ext_block(nz, n, t_iters,
                             extra_windows=1.25 if has_obst else 0.0)
    if picked is None:
        return None
    slab, tile_y = picked
    p = slab + 2 * t_iters
    ty, n_ty, halo_y, py = tile_geometry(n, tile_y, t_iters)
    inv_c = float(np.float32(1.0) / np.float32(c))
    walls = jnp.stack([jnp.asarray(wall_lo, jnp.int32),
                       jnp.asarray(wall_hi, jnp.int32)])

    kernel = functools.partial(
        _ext_jacobi_kernel, nz=nz, n=n, slab=slab, halo=t_iters,
        t_iters=t_iters, a=float(np.float32(a)), inv_c=inv_c, b=b,
        tile_y=tile_y, has_obst=has_obst,
    )
    operands = (walls, xp, x0_ext) + ((obst_ext,) if has_obst else ())
    scratch = [
        pltpu.VMEM((p, py, n), jnp.float32),
        pltpu.VMEM((p, py, n), jnp.float32),
        pltpu.VMEM((p, py, n), jnp.float32),
    ]
    if has_obst:
        scratch.append(pltpu.VMEM((p, py, n), jnp.int8))
    scratch.append(pltpu.SemaphoreType.DMA((3,)))
    return pl.pallas_call(
        kernel,
        grid=((nz // slab) * n_ty,),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * (3 if has_obst else 2)
        ),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=(
            jax.ShapeDtypeStruct((nz, n, n), xp.dtype) if vma is None
            else jax.ShapeDtypeStruct((nz, n, n), xp.dtype, vma=vma)
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
