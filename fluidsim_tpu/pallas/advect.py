"""Windowed-trilinear semi-Lagrangian advection (Pallas TPU kernel).

Implements the same math as ``ops.advect.advect_multi_3d`` with
``window=K`` — the trilinear backtrace sample expressed as a
``(2K+1)³``-term sum of statically shifted fields weighted by per-cell hat
functions (exact while |displacement| < K; displacement is clamped to K).

The XLA formulation materializes every ``jnp.roll`` through HBM
(~(2K+1)³ full-array round trips); here each grid program DMAs a z-slab
(+halo) of the advected fields and the velocity into VMEM and runs the
whole accumulation on-chip — ONE HBM pass regardless of K.

``n_sub > 1`` additionally runs the *substepped* scheme
(ops/advect.advect_substep_3d) entirely in VMEM: n_sub sub-advections of
``dt/n_sub`` through the same velocity, with the intermediate field's
``set_bnd`` wall faces materialized on-chip between substeps — the fields
never return to HBM until the final write-back.  Halo grows to
``K·n_sub``.

Obstacles run in-kernel on the substepped path (``n_sub > 1``, where the
contract must apply *between* in-VMEM substeps): the int8 mask window
DMAs in alongside the fields and every substep applies the full output
contract — fresh-zero walls/obstacle cells, ``set_bnd`` faces, and the
obstacle *mirror* for velocity components (the reference's advect +
set_bnd semantics, FluidSim.cs:1125-1186 + 1261-1287, generalized to
3D).  The mirror reads ±1 neighbors, so the halo grows to
``n_sub·(K+1)``.  Single-substep obstacle calls instead keep ONE fused
host-side masking pass (``_mask_and_bnd_3d``) — measured faster than
paying the mirror halo in-kernel (see ``advect_multi_3d_pallas``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .jacobi import (
    pallas_supported,
    tile_geometry,
    window_cost,
    window_origin,
)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def _substep_window_vals(fields_v, vel_vals, *, start, n: int, p: int,
                         k_win: int, n_sub: int, dt0: float, bs,
                         omask=None, ystart=0, py: int | None = None):
    """Shared advection core on VMEM window *values*: per-cell clamped
    backtrace fractions and hat weights from ``vel_vals`` (computed once —
    the velocity is the same for every substep), then ``n_sub``
    windowed-sum substeps with intermediate ``set_bnd`` wall faces.
    ``start`` is the window's global z origin (traced).  Returns the final
    f32 field values (pre output-masking).

    ``omask`` (optional f32 window of the obstacle mask, nonzero = solid)
    switches every substep — including the last — to the FULL output
    contract of ``ops.advect._mask_and_bnd_3d``: fresh-zero walls and
    obstacle cells, ``set_bnd`` faces, and the obstacle *mirror* for
    velocity components (``ops.boundary._mirror_obstacles_axis``),
    all on the VMEM window.  The mirror reads ±1 neighbors, so callers
    must provision ``halo = n_sub·(k_win+1)`` instead of ``n_sub·k_win``.
    With ``omask=None`` only wall faces run between substeps and the
    final masking is left to the caller.

    ``ystart``/``py``: y-tiled windows (grids whose full-width planes
    don't fit VMEM, e.g. 512³).  The window is ``(p, py, n)`` with global
    y origin ``ystart`` (traced); defaults are the full-width window.

    Weights/backtrace are f32 even for bf16 storage (coordinates > 256
    are not exact in bf16); callers convert fields on read/write-back.
    """
    if py is None:
        py = n
    f32 = jnp.float32
    dt0f = jnp.asarray(dt0 / n_sub, f32)
    kf = jnp.asarray(k_win, f32)
    n_fields = len(fields_v)

    zg = start + jax.lax.broadcasted_iota(jnp.int32, (p, py, n), 0)
    yg = ystart + jax.lax.broadcasted_iota(jnp.int32, (p, py, n), 1)
    xg = jax.lax.broadcasted_iota(jnp.int32, (p, py, n), 2)

    def frac(coord, v):
        t = coord - dt0f * v
        t = jnp.maximum(t, 0.5)
        t = jnp.minimum(t, jnp.asarray(n - 1.5, f32))
        t = jnp.clip(t, coord - kf, coord + kf)
        return t - coord

    fx = frac(xg.astype(f32), vel_vals[0])
    fy = frac(yg.astype(f32), vel_vals[1])
    fz = frac(zg.astype(f32), vel_vals[2])

    w_sz = 2 * k_win + 1

    def hat(f, d):
        return jnp.maximum(0.0, 1.0 - jnp.abs(f - d.astype(f32)))

    def windowed_sum_k1(fields_v):
        """K=1 two-tap form (ROADMAP item 4).  With the displacement
        clamped to [-1, 1], the per-axis hat taps are
        ``hat(f,-1)=relu(-f), hat(f,0)=1-|f|, hat(f,1)=relu(f)``, so the
        3-tap sum factors exactly as
        ``g0 + relu(f)·(g₊−g0) + relu(−f)·(g₋−g0)`` (the weights always
        sit at the destination cell, so the identity nests per axis:
        x innermost, then y, then z).  Same math as the 27-term
        hat-weighted sum, ~30% fewer vector ops: all hat evaluations and
        wz·wy·wx products disappear and the dx=0/dy=0/dz=0 rolls are
        free.  Unlike the rejected flat 27-term static unroll, the
        nested form keeps ≤ ~8F window-sized values live."""
        fxp, fxm = jnp.maximum(fx, 0.0), jnp.maximum(-fx, 0.0)
        fyp, fym = jnp.maximum(fy, 0.0), jnp.maximum(-fy, 0.0)
        fzp, fzm = jnp.maximum(fz, 0.0), jnp.maximum(-fz, 0.0)

        def comb(gm, g0, gp, wp, wm):
            return g0 + wp * (gp - g0) + wm * (gm - g0)

        def x_interp(h):
            return tuple(
                comb(pltpu.roll(f, 1, 2), f, pltpu.roll(f, n - 1, 2),
                     fxp, fxm)
                for f in h
            )

        def yx_interp(g):
            gm = x_interp(tuple(pltpu.roll(f, 1, 1) for f in g))
            g0 = x_interp(g)
            gp = x_interp(tuple(pltpu.roll(f, py - 1, 1) for f in g))
            return tuple(
                comb(m, z, pl_, fyp, fym) for m, z, pl_ in zip(gm, g0, gp)
            )

        am = yx_interp(tuple(pltpu.roll(f, 1, 0) for f in fields_v))
        a0 = yx_interp(fields_v)
        ap = yx_interp(tuple(pltpu.roll(f, p - 1, 0) for f in fields_v))
        return tuple(
            comb(m, z, pl_, fzp, fzm) for m, z, pl_ in zip(am, a0, ap)
        )

    def windowed_sum(fields_v):
        """Σ over the (2K+1)³ window: nested fori_loops with dynamic
        pltpu.roll shifts keep Mosaic program size O(1) in K; the inner
        x loop unrolls statically (static lane rolls vectorize best).

        A fully static 27-term K=1 unroll (with cheap relu-form hats) was
        tried and rejected: the register allocator keeps too many
        window-sized values live across the unrolled schedule and spills
        ~150 MB of VMEM (compile OOM at 128³); the fori structure bounds
        the live set."""

        def outer(iz, accs):
            dz = iz - k_win
            wz = hat(fz, dz)
            shifted_z = tuple(pltpu.roll(f, (-dz) % p, 0) for f in fields_v)

            def mid(iy, accs):
                dy = iy - k_win
                wzy = wz * hat(fy, dy)
                shifted_zy = tuple(
                    pltpu.roll(f, (-dy) % py, 1) for f in shifted_z
                )
                for dx in range(-k_win, k_win + 1):
                    w = wzy * hat(fx, jnp.int32(dx))
                    accs = tuple(
                        acc + w * pltpu.roll(f, (-dx) % n, 2)
                        for acc, f in zip(accs, shifted_zy)
                    )
                return accs

            return jax.lax.fori_loop(0, w_sz, mid, accs)

        return jax.lax.fori_loop(
            0, w_sz, outer,
            tuple(jnp.zeros((p, py, n), f32) for _ in range(n_fields)),
        )

    def faces(b, v):
        """Materialize set_bnd wall faces (z→y→x order, mirror-negate for
        the normal velocity component) on the VMEM window — the
        intermediate-substep equivalent of the XLA _mask_and_bnd_3d."""
        sz = -1.0 if b == 3 else 1.0
        sy = -1.0 if b == 2 else 1.0
        sx = -1.0 if b == 1 else 1.0
        v = jnp.where(zg == 0, sz * pltpu.roll(v, p - 1, 0),
                      jnp.where(zg == n - 1, sz * pltpu.roll(v, 1, 0), v))
        v = jnp.where(yg == 0, sy * pltpu.roll(v, py - 1, 1),
                      jnp.where(yg == n - 1, sy * pltpu.roll(v, 1, 1), v))
        v = jnp.where(xg == 0, sx * pltpu.roll(v, n - 1, 2),
                      jnp.where(xg == n - 1, sx * pltpu.roll(v, 1, 2), v))
        return v

    if omask is not None:
        solid = omask != 0.0
        interior = (
            (zg > 0) & (zg < n - 1)
            & (yg > 0) & (yg < n - 1)
            & (xg > 0) & (xg < n - 1)
        )
        keep = interior & jnp.logical_not(solid)

        def mirror(v, axis):
            """Obstacle mirror along one axis — the exact arithmetic of
            ``ops.boundary._mirror_obstacles_axis`` on the window.  The
            mask rolls as f32 (Mosaic rotates are 32-bit only)."""
            size = (p, py, n)[axis]
            oprev = pltpu.roll(omask, 1, axis) != 0.0
            onxt = pltpu.roll(omask, size - 1, axis) != 0.0
            total = jnp.where(oprev, 0.0, -pltpu.roll(v, 1, axis)) + (
                jnp.where(onxt, 0.0, -pltpu.roll(v, size - 1, axis))
            )
            count = (
                jnp.logical_not(oprev).astype(f32)
                + jnp.logical_not(onxt).astype(f32)
            )
            mirrored = jnp.where(
                count > 0, total / jnp.maximum(count, 1.0), 0.0
            )
            return jnp.where(interior & solid, mirrored, v)

        def post(b, v):
            # _mask_and_bnd_3d: fresh-zero walls + obstacle cells, then
            # set_bnd_3d = faces (z→y→x) + obstacle mirror (velocity only).
            v = jnp.where(keep, v, 0.0)
            v = faces(b, v)
            if b in (1, 2, 3):
                v = mirror(v, (None, 2, 1, 0)[b])
            return v
    else:
        post = None

    sum_fn = windowed_sum_k1 if k_win == 1 else windowed_sum
    for s in range(n_sub):
        fields_v = sum_fn(fields_v)
        if post is not None:
            fields_v = tuple(
                post(bs[c], f) for c, f in enumerate(fields_v)
            )
        elif s < n_sub - 1:
            fields_v = tuple(
                faces(bs[c], f) for c, f in enumerate(fields_v)
            )
    return fields_v


def _advect_kernel(*refs, n: int, n_fields: int, slab: int, k_win: int,
                   halo: int, dt0: float, n_sub: int, bs, nbuf: int = 1,
                   n_prog: int = 1, fuse_mask: bool = False,
                   has_obst: bool = False, tile_y: int | None = None,
                   self_adv: bool = False, buoy: tuple | None = None,
                   has_src: bool = False):
    """``nbuf=2`` double-buffers across the (sequential) grid programs:
    program i prefetches window i+1's fields+velocity while computing
    window i, and defers each out-DMA's wait to the next reuse of its
    slot — hiding the DMA time (measured ≈ half the kernel) under the
    windowed-sum compute.  ``nbuf=1`` is the serial flow for grids whose
    doubled windows don't fit VMEM.

    ``has_obst`` adds the int8 obstacle-mask window (``mbuf``); the full
    per-substep output contract (zero + faces + obstacle mirror) then
    runs in-kernel — see ``_substep_window_vals``.

    ``tile_y``: y-tiled windows for grids whose full-width z-slabs exceed
    VMEM (512³: 1 MB planes).  The flat 1-D grid covers z-slab × y-tile
    pairs (y fastest, so the double-buffer prefetch logic is unchanged);
    each window is ``(p, tile_y + 2·halo_y, n)`` with its own y halo and
    clipped y origin, mirroring the z handling exactly.  ``halo_y`` is
    the semantic halo rounded up to a multiple of 8: Mosaic requires HBM
    slice shapes/offsets on the sublane dimension to be 8-aligned, and
    extra halo rows are simply more valid data (every formula is
    global-position-based)."""
    dens_hbm = dbuf = None
    src_smem = None
    if has_src:
        # Folded-emitter descriptor (scene.sources.emitter_fold_operand):
        # a (5,) f32 SMEM operand, always the first ref.
        src_smem, *refs = refs
    if self_adv:
        # Self-advection (fields IS the velocity): the field windows
        # alias the velocity windows — one DMA stream instead of two
        # identical ones, and nbuf·3 fewer VMEM windows (bigger slabs
        # where the footprint was the binding constraint).
        # ``buoy=(dt, buoyancy, ambient, gravity)`` additionally folds
        # the buoyancy body force into the window loads: the density
        # window rides its own DMA stream and the y velocity component
        # gets the exact ``ops.forces.buoyancy_force`` FMA before the
        # backtrace — eliminating the standalone XLA pass (a full
        # velocity read+write per step, ~26 µs measured at 128³, which
        # nothing overlaps with) at the cost of one density window read.
        if has_obst:
            if buoy is not None:
                (vel_hbm, dens_hbm, obst_hbm, out_hbm,
                 vbuf, dbuf, mbuf, obuf, sems) = refs
            else:
                vel_hbm, obst_hbm, out_hbm, vbuf, mbuf, obuf, sems = refs
        else:
            if buoy is not None:
                vel_hbm, dens_hbm, out_hbm, vbuf, dbuf, obuf, sems = refs
                obst_hbm = mbuf = None
            else:
                vel_hbm, out_hbm, vbuf, obuf, sems = refs
                obst_hbm = mbuf = None
        fields_hbm, fbuf = None, vbuf
    elif has_obst:
        (fields_hbm, vel_hbm, obst_hbm, out_hbm,
         fbuf, vbuf, mbuf, obuf, sems) = refs
    else:
        fields_hbm, vel_hbm, out_hbm, fbuf, vbuf, obuf, sems = refs
        obst_hbm = mbuf = None
    idx = pl.program_id(0)
    p = slab + 2 * halo
    ty, n_ty, halo_y, py = tile_geometry(n, tile_y, halo)

    def origin(j):
        # Shared clipped-origin math (jacobi.window_origin) — the
        # double-buffer logic needs it for programs j±1/j−2 too.
        return window_origin(j, nz=n, n=n, slab=slab, halo=halo, ty=ty,
                             n_ty=n_ty, halo_y=halo_y, py=py)

    i, jy, z0, _, _, _, _, _ = origin(idx)

    def in_dmas(slot, j):
        _, _, _, _, s, sy, _, _ = origin(j)
        # The density window of the folded buoyancy reuses sem row 0 —
        # unused in self-advect mode (no separate fields stream).
        dmas = () if self_adv else (
            pltpu.make_async_copy(
                fields_hbm.at[:, pl.ds(s, p), pl.ds(sy, py)], fbuf.at[slot],
                sems.at[0, slot],
            ),
        )
        if dbuf is not None:
            dmas += (
                pltpu.make_async_copy(
                    dens_hbm.at[pl.ds(s, p), pl.ds(sy, py)], dbuf.at[slot],
                    sems.at[0, slot],
                ),
            )
        dmas += (
            pltpu.make_async_copy(
                vel_hbm.at[:, pl.ds(s, p), pl.ds(sy, py)], vbuf.at[slot],
                sems.at[1, slot],
            ),
        )
        if has_obst:
            dmas += (
                pltpu.make_async_copy(
                    obst_hbm.at[pl.ds(s, p), pl.ds(sy, py)], mbuf.at[slot],
                    sems.at[3, slot],
                ),
            )
        return dmas

    def out_dma(slot, j):
        _, _, jz0, jy0, _, _, off_j, off_y = origin(j)
        return pltpu.make_async_copy(
            obuf.at[slot, :, pl.ds(off_j, slab), pl.ds(off_y, ty)],
            out_hbm.at[:, pl.ds(jz0, slab), pl.ds(jy0, ty)],
            sems.at[2, slot],
        )

    if nbuf == 2:
        slot = jax.lax.rem(idx, 2)
        nslot = jax.lax.rem(idx + 1, 2)

        @pl.when(idx == 0)
        def _():
            for d in in_dmas(jnp.int32(0), jnp.int32(0)):
                d.start()

        @pl.when(idx + 1 < n_prog)
        def _():
            for d in in_dmas(nslot, idx + 1):
                d.start()

        for d in in_dmas(slot, idx):
            d.wait()

        @pl.when(idx >= 2)
        def _():
            # reclaim this slot's out buffer before overwriting it
            out_dma(slot, idx - 2).wait()
    else:
        slot = jnp.int32(0)
        for d in in_dmas(slot, idx):
            d.start()
        for d in in_dmas(slot, idx):
            d.wait()

    _, _, _, _, start, ystart, _, _ = origin(idx)
    fbuf = fbuf.at[slot]
    vbuf = vbuf.at[slot]
    obuf_slot = obuf.at[slot]

    f32 = jnp.float32
    vel_vals = tuple(vbuf[c].astype(f32) for c in range(3))
    if buoy is not None:
        # Exact ``ops.forces.buoyancy_force`` dataflow on the window:
        # accel = b·(ρ − ambient) − g·ρ, v_y += dt·accel — the same f32
        # expression (including the constant-zero gravity term); the
        # only deviation from the XLA-composed step is XLA's FMA
        # contraction clustering (≤1 ulp on the force FMA).  Pointwise,
        # so halo cells compute the same values their home window does.
        dtv, b_f, amb, grav = buoy
        if src_smem is not None:
            # Folded emitter: the buoyancy must see the post-source
            # density (the composed step adds the emitter before the
            # force).  Pointwise in global coordinates, so halo cells
            # match their home windows.  In-place on the VMEM window
            # (re-DMA'd every program), gated to windows the ball
            # intersects — elsewhere the add is exactly +0.0.
            from ..scene.sources import src_field_add, src_window_hit

            @pl.when(src_window_hit(src_smem, start, p, ystart, py))
            def _():
                dw = dbuf.at[slot]
                dw[...] = src_field_add(
                    dw[...].astype(f32), src_smem, z0=start, y0=ystart
                ).astype(dbuf.dtype)
        dwin = dbuf.at[slot][...].astype(f32)
        accel = (jnp.asarray(np.float32(b_f), f32)
                 * (dwin - jnp.asarray(np.float32(amb), f32))
                 - jnp.asarray(np.float32(grav), f32) * dwin)
        vel_vals = (
            vel_vals[0],
            vel_vals[1] + jnp.asarray(np.float32(dtv), f32) * accel,
            vel_vals[2],
        )
        fields_in = vel_vals  # self-advect: fields ARE the velocity
    else:
        fields_in = tuple(fbuf[c].astype(f32) for c in range(n_fields))
    omask = mbuf.at[slot][...].astype(f32) if has_obst else None
    fields_v = _substep_window_vals(
        fields_in, vel_vals, start=start, n=n, p=p, k_win=k_win,
        n_sub=n_sub, dt0=dt0, bs=bs, omask=omask, ystart=ystart, py=py,
    )

    for c in range(n_fields):
        obuf_slot[c, :, :, :] = fields_v[c].astype(obuf.dtype)

    if fuse_mask:
        # The output contract (ops.advect._mask_and_bnd_3d, obstacle-free):
        # fresh-zero borders, then set_bnd faces z→y→x.  Done here as
        # slice writes on the out window — saves the caller a full XLA
        # pass over every field.  The fresh-zero step needs no writes of
        # its own: every border cell is rewritten by the face passes
        # below, and every value those passes read is either interior or
        # produced by an earlier pass (verified value-equal to the XLA
        # zero-then-faces composition).  y/x faces are local to the
        # window; global z faces exist only in the first/last program
        # (window halo planes are outside the shipped slab).
        for c in range(n_fields):
            szf = -1.0 if bs[c] == 3 else 1.0
            syf = -1.0 if bs[c] == 2 else 1.0
            sxf = -1.0 if bs[c] == 1 else 1.0

            @pl.when(i == 0)
            def _(c=c, szf=szf):
                obuf_slot[c, 0:1] = (
                    obuf_slot[c, 1:2] if szf == 1.0
                    else szf * obuf_slot[c, 1:2]
                )

            @pl.when(i == (n // slab) - 1)
            def _(c=c, szf=szf):
                obuf_slot[c, p - 1:p] = (
                    obuf_slot[c, p - 2:p - 1] if szf == 1.0
                    else szf * obuf_slot[c, p - 2:p - 1]
                )

            # Global y faces exist only in the first/last y-tile (window
            # rows 0 / py−1 — the y origin clips to the walls there).
            @pl.when(jy == 0)
            def _(c=c, syf=syf):
                ysrc_lo = obuf_slot[c, :, 1:2, :]
                obuf_slot[c, :, 0:1, :] = (
                    ysrc_lo if syf == 1.0 else syf * ysrc_lo
                )

            @pl.when(jy == n_ty - 1)
            def _(c=c, syf=syf):
                ysrc_hi = obuf_slot[c, :, py - 2:py - 1, :]
                obuf_slot[c, :, py - 1:py, :] = (
                    ysrc_hi if syf == 1.0 else syf * ysrc_hi
                )

            xsrc_lo = obuf_slot[c, :, :, 1:2]
            obuf_slot[c, :, :, 0:1] = xsrc_lo if sxf == 1.0 else sxf * xsrc_lo
            xsrc_hi = obuf_slot[c, :, :, n - 2:n - 1]
            obuf_slot[c, :, :, n - 1:n] = (
                xsrc_hi if sxf == 1.0 else sxf * xsrc_hi
            )

    mine = out_dma(slot, idx)
    mine.start()
    if nbuf == 2:
        @pl.when(idx == n_prog - 1)
        def _():
            # drain: the previous program's out-DMA was never reclaimed
            if n_prog >= 2:
                out_dma(jax.lax.rem(idx - 1, 2), idx - 1).wait()
            out_dma(slot, idx).wait()
    else:
        mine.wait()


def _pick_slab(n: int, n_fields: int, halo: int, has_obst: bool = False,
               self_adv: bool = False, has_buoy: bool = False,
               has_src: bool = False):
    """Returns (slab, nbuf, tile_y).  The VMEM model is *total* footprint:
    declared buffers (nbuf·(2F+3) windows, plus nbuf·¼ for the int8 mask)
    plus the kernel's live temporaries + register-allocator spill slots,
    which measure ≈28 window-equivalents on the compiled kernel (103 MB
    total at 128³/slab 32/nbuf 2; a 16-plane pick at 256³ spilled 145 MB
    and OOM'd the 128 MB VMEM).  Prefers the double-buffered variant
    (nbuf=2: prefetch + deferred out-DMA waits — DMA is ~half the serial
    kernel's time), then single-buffered; when no full-width z-slab fits
    (512³: 1 MB planes), windows additionally tile in y (``tile_y < n``,
    window rows ``tile_y + 2·halo``) under a shaved budget (the model's
    temporaries term is least certain there).  Among the feasible
    (slab, nbuf, tile) triples the pick minimizes the *redundancy ratio*
    ``(p·py)/(slab·ty)`` — halo DMA+compute wasted per shipped cell —
    preferring nbuf=2 on ties; first-fit previously let a
    small-slab/huge-tile candidate (4, 2, 128 at 512³) shadow the
    strictly cheaper (8, 2, 64).  Tiled candidates carry a measured
    ×1.25 cost penalty — but only for ``n < 256``: a y-tiled window's
    HBM rows are contiguous only along x (``n·4`` bytes), so at n=128
    the DMA degrades to 512-byte bursts (a nominally 2%-cheaper tiled
    pick measured 15% *slower* than full-width on vortex128), while at
    n≥256 bursts are ≥1 KB and the ratio model holds (256³: tiled
    12.29 ms vs full-width 13.91 ms for the K=1×2 advect, matching the
    ratio prediction).  Falls back to XLA only when even the smallest
    tiled window exceeds the budget."""
    budget = 120 * 1024 * 1024
    best = None
    best_key = None
    for tile in (n, n // 2, n // 4, n // 8):
        if tile < 8 or n % tile or tile % 8:
            continue
        ty, _, _, py = tile_geometry(n, None if tile == n else tile, halo)
        if py > n:
            continue
        plane = py * n * 4
        tile_budget = budget if tile == n else 110 * 1024 * 1024
        for nbuf in (2, 1):
            for slab in (32, 16, 8, 4):
                if n % slab:
                    continue
                p = slab + 2 * halo
                # Obstacles: nbuf int8 mask windows (≈¼ each, counted as
                # 1) plus ~6 window-equivalents of live mirror
                # temporaries (f32 mask rolls, neighbor-value rolls,
                # totals) — the (32, nbuf=2, halo=4) pick at 128³/K=3
                # OOM'd the compile without this term.  The aliased
                # self-advect variant needs ~8 more: sharing the input
                # windows saves DMA/VMEM but not the live mirror
                # pressure of all 3 components — the (32, nbuf=1,
                # halo=6) pick at 128³ (vortex128's velocity
                # self-advect) spilled 131 MB of register-allocator
                # slots and OOM'd the 128 MB VMEM (measured on-chip,
                # r3) without this term.
                mask_w = ((nbuf + 6 + (8 if self_adv else 0))
                          if has_obst else 0)
                # Self-advection aliases the field windows onto the
                # velocity windows (no separate fields DMA/VMEM).  The
                # folded-buoyancy density window adds one per buffer.
                f_in = 0 if self_adv else n_fields
                # has_src: the in-window emitter falloff's live f32
                # temporaries (coordinate iotas, distance, falloff).
                need = (nbuf * (f_in + n_fields + 3 + (1 if has_buoy else 0))
                        + mask_w + 28 + (4 if has_src else 0)) * p * plane
                if need > tile_budget or p > n:
                    continue
                key = (window_cost(p, py, slab, ty, n, tile != n), -nbuf)
                if best_key is None or key < best_key:
                    best = (slab, nbuf, (None if tile == n else tile))
                    best_key = key
    return best


def advect_multi_3d_pallas(bs, fields, vel, dt: float, obst=None,
                           window: int = 2, n_sub: int = 1,
                           interpret: bool = False,
                           force_tile_y: int | None = None,
                           buoy=None, src=None):
    """Pallas drop-in for ``ops.advect.advect_multi_3d`` (windowed mode)
    and, with ``n_sub > 1``, for ``advect_substep_3d`` — with or without
    obstacles (the mask rides along as an int8 window).

    ``buoy = (density, buoyancy, ambient, gravity)`` — self-advect calls
    only — folds ``ops.forces.buoyancy_force`` (with the call's ``dt``)
    into the kernel's window loads: the step then skips the standalone
    XLA body-force pass (a full velocity read+write that nothing
    overlaps — ~26 µs/step measured at 128³) for one extra density
    window stream.  Matches the ``advect(buoyancy_force(vel), …)``
    composition exactly up to XLA FMA contraction — ≤1 ulp on the force
    FMA (tests/test_pallas_interpret.py).

    ``src`` (requires ``buoy``): folded-emitter descriptor
    (``scene.sources.emitter_fold_operand``) — the buoyancy's density
    window additionally gets the emitter's in-window add, so the step
    can skip the standalone full-grid emitter pass entirely (the
    fused projection kernel applies the same add to its density
    windows; ``models.stable3d.emitter_folds`` is the gate).

    Falls back to the XLA path when unsupported (non-TPU backend, grids
    whose lane dim isn't 128-aligned, or VMEM-infeasible shapes).
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU
    tests; skips the backend check, keeps the shape checks).
    """
    from ..ops.advect import (
        _mask_and_bnd_3d,
        advect_multi_3d,
        advect_substep_3d,
    )

    if buoy is not None:
        from ..ops.forces import buoyancy_force

        if not (fields is vel and tuple(bs) == (1, 2, 3)):
            raise ValueError("buoy folding requires a self-advect call")
    if src is not None and buoy is None:
        raise ValueError("src folding rides the buoy density window")

    def xla_fallback():
        f, v = fields, vel
        if buoy is not None:
            dens, b_f, amb, grav = buoy
            if src is not None:
                from ..scene.sources import src_field_add

                dens = src_field_add(dens.astype(jnp.float32), src, 0)
            v = buoyancy_force(v, dens, dt, b_f, amb, grav)
            f = v  # self-advect: the advected fields ARE the velocity
        if n_sub > 1:
            return advect_substep_3d(bs, f, v, dt, obst, window,
                                     n_sub=n_sub)
        return advect_multi_3d(bs, f, v, dt, obst, window)

    n = fields.shape[-1]
    n_fields = fields.shape[0]
    # In-kernel obstacle masking only where it's structurally required —
    # between in-VMEM substeps (n_sub > 1).  For single-substep calls the
    # host-side mask is ONE fused XLA pass, and paying for it in-kernel
    # (mirror halo +1 → smaller slabs, mask temporaries) measured SLOWER
    # at 128³/K=3: 65 vs 84 steps/s.  The per-substep obstacle mirror
    # reads ±1 neighbors, eroding one extra halo plane per substep on
    # top of the K-cell windowed sum.
    obst_in_kernel = obst is not None and n_sub > 1
    halo = n_sub * (window + 1) if obst_in_kernel else window * n_sub
    # Velocity self-advection: the advected fields ARE the advecting
    # velocity (object identity at trace time — models/stable3d.py passes
    # the same array).  The kernel then aliases the field windows onto
    # the velocity windows: one in-DMA stream instead of two identical
    # ones and nbuf·3 fewer VMEM windows, which at 256³ moves the picked
    # slab from 4 to 8 (window redundancy 2.0 → 1.5).
    self_adv = fields is vel and tuple(bs) == (1, 2, 3) and n_fields == 3
    picked = _pick_slab(n, n_fields, halo, obst_in_kernel, self_adv,
                        has_buoy=buoy is not None,
                        has_src=src is not None)
    supported = interpret or (pallas_supported() and n % 128 == 0)
    if not supported or picked is None:
        return xla_fallback()

    slab, nbuf, tile_y = picked
    if force_tile_y is not None:
        tile_y = force_tile_y
    p = slab + 2 * halo
    ty, n_ty, halo_y, py = tile_geometry(n, tile_y, halo)
    dt0 = float(np.float32(dt) * np.float32(n - 2))

    buoy_static = None
    if buoy is not None:
        dens, b_f, amb, grav = buoy
        buoy_static = (float(dt), float(b_f), float(amb), float(grav))
    kernel = functools.partial(
        _advect_kernel, n=n, n_fields=n_fields, slab=slab, k_win=window,
        halo=halo, dt0=dt0, n_sub=n_sub, bs=tuple(bs), nbuf=nbuf,
        n_prog=(n // slab) * n_ty, fuse_mask=obst is None,
        has_obst=obst_in_kernel, tile_y=tile_y, self_adv=self_adv,
        buoy=buoy_static, has_src=src is not None,
    )
    n_in = (1 if self_adv else 2) + obst_in_kernel + (buoy is not None)
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                if src is not None else []) \
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_in
    scratch = [] if self_adv else [
        pltpu.VMEM((nbuf, n_fields, p, py, n), fields.dtype),
    ]
    scratch.append(pltpu.VMEM((nbuf, 3, p, py, n), vel.dtype))
    if buoy is not None:
        scratch.append(pltpu.VMEM((nbuf, p, py, n), buoy[0].dtype))
    if obst_in_kernel:
        scratch.append(pltpu.VMEM((nbuf, p, py, n), jnp.int8))
    scratch += [
        pltpu.VMEM((nbuf, n_fields, p, py, n), fields.dtype),
        pltpu.SemaphoreType.DMA((4 if obst_in_kernel else 3, nbuf)),
    ]
    operands = (
        ((src,) if src is not None else ())
        + (() if self_adv else (fields,)) + (vel,)
        + ((buoy[0],) if buoy is not None else ())
        + ((obst.astype(jnp.int8),) if obst_in_kernel else ())
    )
    vals = pl.pallas_call(
        kernel,
        grid=((n // slab) * n_ty,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n_fields, n, n, n), fields.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)

    if obst is None or obst_in_kernel:
        # The full output contract ran in-kernel: fresh-zero + set_bnd
        # faces as slice writes on the out window (fuse_mask, no
        # obstacles), or zero + faces + obstacle mirror per substep
        # (obst_in_kernel).
        return vals
    # Single-substep with obstacles: one fused host-side masking pass
    # (measured faster than paying the mirror halo in-kernel).
    return jnp.stack(
        [
            _mask_and_bnd_3d(b, vals[c], fields[c], obst)
            for c, b in enumerate(bs)
        ]
    )
