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
``K·n_sub``.  Obstacle masking stays outside the kernel (the caller's
``_mask_and_bnd_3d``), so in-kernel substepping requires ``obst=None``.

The kernel writes the raw interpolated values; the caller applies the
fresh-zero-buffer masking + ``set_bnd_3d``, matching the reference's
advect semantics (FluidSim.cs:1125-1186).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .jacobi import pallas_supported  # re-exported convenience

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def _substep_window_vals(fields_v, vel_vals, *, start, n: int, p: int,
                         k_win: int, n_sub: int, dt0: float, bs):
    """Shared advection core on VMEM window *values*: per-cell clamped
    backtrace fractions and hat weights from ``vel_vals`` (computed once —
    the velocity is the same for every substep), then ``n_sub``
    windowed-sum substeps with intermediate ``set_bnd`` wall faces.
    ``start`` is the window's global z origin (traced).  Returns the final
    f32 field values (pre output-masking).

    Weights/backtrace are f32 even for bf16 storage (coordinates > 256
    are not exact in bf16); callers convert fields on read/write-back.
    """
    f32 = jnp.float32
    dt0f = jnp.asarray(dt0 / n_sub, f32)
    kf = jnp.asarray(k_win, f32)
    n_fields = len(fields_v)

    zg = start + jax.lax.broadcasted_iota(jnp.int32, (p, n, n), 0)
    yg = jax.lax.broadcasted_iota(jnp.int32, (p, n, n), 1)
    xg = jax.lax.broadcasted_iota(jnp.int32, (p, n, n), 2)

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
                    pltpu.roll(f, (-dy) % n, 1) for f in shifted_z
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
            tuple(jnp.zeros((p, n, n), f32) for _ in range(n_fields)),
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
        v = jnp.where(yg == 0, sy * pltpu.roll(v, n - 1, 1),
                      jnp.where(yg == n - 1, sy * pltpu.roll(v, 1, 1), v))
        v = jnp.where(xg == 0, sx * pltpu.roll(v, n - 1, 2),
                      jnp.where(xg == n - 1, sx * pltpu.roll(v, 1, 2), v))
        return v

    for s in range(n_sub):
        fields_v = windowed_sum(fields_v)
        if s < n_sub - 1:
            fields_v = tuple(
                faces(bs[c], f) for c, f in enumerate(fields_v)
            )
    return fields_v


def _advect_kernel(fields_hbm, vel_hbm, out_hbm, fbuf, vbuf, obuf, sems,
                   *, n: int, n_fields: int, slab: int, k_win: int,
                   dt0: float, n_sub: int, bs, nbuf: int = 1, n_prog: int = 1,
                   fuse_mask: bool = False):
    """``nbuf=2`` double-buffers across the (sequential) grid programs:
    program i prefetches window i+1's fields+velocity while computing
    window i, and defers each out-DMA's wait to the next reuse of its
    slot — hiding the DMA time (measured ≈ half the kernel) under the
    windowed-sum compute.  ``nbuf=1`` is the serial flow for grids whose
    doubled windows don't fit VMEM."""
    i = pl.program_id(0)
    halo = k_win * n_sub
    p = slab + 2 * halo
    z0 = i * slab

    def win_start(j):
        return jnp.clip(j * slab - halo, 0, n - p)

    def in_dmas(slot, j):
        s = win_start(j)
        return (
            pltpu.make_async_copy(
                fields_hbm.at[:, pl.ds(s, p)], fbuf.at[slot],
                sems.at[0, slot],
            ),
            pltpu.make_async_copy(
                vel_hbm.at[:, pl.ds(s, p)], vbuf.at[slot], sems.at[1, slot]
            ),
        )

    def out_dma(slot, j):
        s = win_start(j)
        off_j = j * slab - s
        return pltpu.make_async_copy(
            obuf.at[slot, :, pl.ds(off_j, slab)],
            out_hbm.at[:, pl.ds(j * slab, slab)],
            sems.at[2, slot],
        )

    if nbuf == 2:
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)

        @pl.when(i == 0)
        def _():
            for d in in_dmas(jnp.int32(0), jnp.int32(0)):
                d.start()

        @pl.when(i + 1 < n_prog)
        def _():
            for d in in_dmas(nslot, i + 1):
                d.start()

        for d in in_dmas(slot, i):
            d.wait()

        @pl.when(i >= 2)
        def _():
            # reclaim this slot's out buffer before overwriting it
            out_dma(slot, i - 2).wait()
    else:
        slot = jnp.int32(0)
        for d in in_dmas(slot, i):
            d.start()
        for d in in_dmas(slot, i):
            d.wait()

    start = win_start(i)
    off = z0 - start
    fbuf = fbuf.at[slot]
    vbuf = vbuf.at[slot]
    obuf_slot = obuf.at[slot]

    f32 = jnp.float32
    vel_vals = tuple(vbuf[c].astype(f32) for c in range(3))
    fields_in = tuple(fbuf[c].astype(f32) for c in range(n_fields))
    fields_v = _substep_window_vals(
        fields_in, vel_vals, start=start, n=n, p=p, k_win=k_win,
        n_sub=n_sub, dt0=dt0, bs=bs,
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

            @pl.when(i == n_prog - 1)
            def _(c=c, szf=szf):
                obuf_slot[c, p - 1:p] = (
                    obuf_slot[c, p - 2:p - 1] if szf == 1.0
                    else szf * obuf_slot[c, p - 2:p - 1]
                )

            ysrc_lo = obuf_slot[c, :, 1:2, :]
            obuf_slot[c, :, 0:1, :] = ysrc_lo if syf == 1.0 else syf * ysrc_lo
            ysrc_hi = obuf_slot[c, :, n - 2:n - 1, :]
            obuf_slot[c, :, n - 1:n, :] = (
                ysrc_hi if syf == 1.0 else syf * ysrc_hi
            )
            xsrc_lo = obuf_slot[c, :, :, 1:2]
            obuf_slot[c, :, :, 0:1] = xsrc_lo if sxf == 1.0 else sxf * xsrc_lo
            xsrc_hi = obuf_slot[c, :, :, n - 2:n - 1]
            obuf_slot[c, :, :, n - 1:n] = (
                xsrc_hi if sxf == 1.0 else sxf * xsrc_hi
            )

    mine = out_dma(slot, i)
    mine.start()
    if nbuf == 2:
        @pl.when(i == n_prog - 1)
        def _():
            # drain: the previous program's out-DMA was never reclaimed
            if n_prog >= 2:
                out_dma(jax.lax.rem(i - 1, 2), i - 1).wait()
            out_dma(slot, i).wait()
    else:
        mine.wait()


def _pick_slab(n: int, n_fields: int, halo: int):
    """Returns (slab, nbuf).  The VMEM model is *total* footprint:
    declared buffers (nbuf·(2F+3) windows) plus the kernel's live
    temporaries + register-allocator spill slots, which measure ≈28
    window-equivalents on the compiled kernel (103 MB total at 128³/
    slab 32/nbuf 2; a 16-plane pick at 256³ spilled 145 MB and OOM'd the
    128 MB VMEM).  Prefers the double-buffered variant (nbuf=2: prefetch
    + deferred out-DMA waits — DMA is ~half the serial kernel's time);
    falls back to single-buffered, then to XLA (512³)."""
    plane = n * n * 4
    budget = 120 * 1024 * 1024
    for nbuf in (2, 1):
        for slab in (32, 16, 8):
            if n % slab:
                continue
            p = slab + 2 * halo
            need = (nbuf * (2 * n_fields + 3) + 28) * p * plane
            if need <= budget and p <= n:
                return slab, nbuf
    return None


def advect_multi_3d_pallas(bs, fields, vel, dt: float, obst=None,
                           window: int = 2, n_sub: int = 1,
                           interpret: bool = False):
    """Pallas drop-in for ``ops.advect.advect_multi_3d`` (windowed mode)
    and, with ``n_sub > 1``, for ``advect_substep_3d`` (obstacle-free).

    Falls back to the XLA path when unsupported (non-TPU backend, grids
    whose lane dim isn't 128-aligned, VMEM-infeasible shapes, or
    obstacles with n_sub > 1).  ``interpret=True`` runs the kernel in the
    Pallas interpreter (CPU tests; skips the backend check, keeps the
    shape checks).
    """
    from ..ops.advect import (
        _mask_and_bnd_3d,
        advect_multi_3d,
        advect_substep_3d,
    )

    def xla_fallback():
        if n_sub > 1:
            return advect_substep_3d(bs, fields, vel, dt, obst, window,
                                     n_sub=n_sub)
        return advect_multi_3d(bs, fields, vel, dt, obst, window)

    n = fields.shape[-1]
    n_fields = fields.shape[0]
    halo = window * n_sub
    picked = _pick_slab(n, n_fields, halo)
    supported = interpret or (pallas_supported() and n % 128 == 0)
    if not supported or picked is None or (n_sub > 1 and obst is not None):
        return xla_fallback()

    slab, nbuf = picked
    p = slab + 2 * halo
    dt0 = float(np.float32(dt) * np.float32(n - 2))

    fuse_mask = obst is None
    kernel = functools.partial(
        _advect_kernel, n=n, n_fields=n_fields, slab=slab, k_win=window,
        dt0=dt0, n_sub=n_sub, bs=tuple(bs), nbuf=nbuf, n_prog=n // slab,
        fuse_mask=fuse_mask,
    )
    vals = pl.pallas_call(
        kernel,
        grid=(n // slab,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((n_fields, n, n, n), fields.dtype),
        scratch_shapes=[
            pltpu.VMEM((nbuf, n_fields, p, n, n), fields.dtype),
            pltpu.VMEM((nbuf, 3, p, n, n), vel.dtype),
            pltpu.VMEM((nbuf, n_fields, p, n, n), fields.dtype),
            pltpu.SemaphoreType.DMA((3, nbuf)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(fields, vel)

    if fuse_mask:
        # fresh-zero + set_bnd were applied in-kernel (slice writes on the
        # out window) — no host-side masking pass needed.
        return vals
    return jnp.stack(
        [
            _mask_and_bnd_3d(b, vals[c], fields[c], obst)
            for c, b in enumerate(bs)
        ]
    )
