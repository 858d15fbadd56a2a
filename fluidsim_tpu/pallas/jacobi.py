"""VMEM-resident temporally-blocked Jacobi sweep (Pallas TPU kernel).

The XLA path (ops/linsolve.jacobi_3d) streams the full grid through HBM
every iteration: 60 iterations ≈ 60×(read+write) of the whole volume.
This kernel is **communication-avoiding**: each grid program DMAs a z-slab
of ``S`` planes plus a ``T``-plane halo into VMEM, runs ``T`` Jacobi
iterations entirely on-chip, and writes the slab back — HBM traffic drops
by ~T× (one pass per T iterations instead of T).

Numerics match ``ops.linsolve.jacobi_3d`` (no-obstacle path) exactly:

* interior: ``x ← (x0 + a·Σ₆ x) / c``;
* wall faces follow ``set_bnd_3d``: each face copies (or negates, for the
  velocity component normal to the wall) the adjacent interior plane after
  every sweep.  Inside the kernel this is implemented as *corrected
  neighbor reads* — an interior cell next to a face reads ``s·itself``
  (s = ±1) instead of the stale face cell, which is algebraically
  identical to materializing the face copy each iteration; the faces are
  materialized once at the end (host-side ``set_bnd_3d``).

Validity argument for the halo: after t in-VMEM iterations, only planes
≥ t away from the slab window's edge are correct, shrinking by one per
iteration — except at *global* z boundaries, where the stencil is closed
by the face rule and nothing outside the window is needed.  Writing back
``S`` planes after ``T`` iterations therefore requires the window to
extend ``T`` planes past the slab on each non-boundary side, which the
clamped window ``[clip(z0−T, 0, N−P), +P)`` provides.

Grid sweep order is sequential on a TPU core, so one ``pallas_call``
performs T iterations globally; ``n_iters`` chains ⌈n/T⌉ calls,
ping-ponging two HBM buffers.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas requires a TPU-capable jaxlib; import lazily-safe
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def pallas_supported() -> bool:
    """Pallas TPU kernels need a real TPU backend (tests run CPU/XLA)."""
    if not _PALLAS_OK:
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _signs(b: int):
    """(sz, sy, sx) face mirror signs for boundary code b (set_bnd_3d)."""
    return (
        -1.0 if b == 3 else 1.0,
        -1.0 if b == 2 else 1.0,
        -1.0 if b == 1 else 1.0,
    )


def tile_geometry(n: int, tile_y, halo: int):
    """Shared y-tiling geometry for the windowed kernels: returns
    ``(ty, n_ty, halo_y, py)`` for a grid of width ``n``, requested tile
    ``tile_y`` (None = full width) and semantic halo ``halo``.

    ``halo_y`` is the halo rounded up to a multiple of 8 — Mosaic
    requires sublane (y) slice shapes and offsets to be 8-aligned — and
    ``py`` the window row count.  Kernel, driver, and VMEM picker must
    all use THIS function so DMA slice shapes and scratch shapes agree.
    Offsets built from these values must be written in explicit ``8·k``
    form for Mosaic's divisibility prover (see call sites).
    """
    ty = n if tile_y is None else tile_y
    n_ty = n // ty
    halo_y = -(-halo // 8) * 8
    py = n if n_ty == 1 else ty + 2 * halo_y
    return ty, n_ty, halo_y, py


def window_cost(p: int, py: int, slab: int, ty: int, n: int,
                tiled: bool) -> float:
    """Calibrated window cost shared by every slab picker: the
    *redundancy ratio* ``(p·py)/(slab·ty)`` — halo DMA+compute wasted
    per shipped cell — with a measured ×1.25 penalty for y-tiled windows
    below n=256, where tiled DMA rows degrade to 512-byte bursts (see
    ``advect._pick_slab`` for the calibration data)."""
    penalty = 1.25 if (tiled and n < 256) else 1.0
    return penalty * (p * py) / (slab * ty)


def window_origin(idx, *, nz: int, n: int, slab: int, halo: int,
                  ty: int, n_ty: int, halo_y: int, py: int):
    """Clipped window origins for grid program ``idx`` over z-slab ×
    y-tile pairs (y fastest) on a (nz, …, n) array (``nz = n`` for the
    single-chip kernels, ``lz + 2·halo`` for the extended-slab ones).

    Returns ``(i, jy, z0, y0, start, ystart, off, off_y)``: slab/tile
    indices, the shipped slab's z origin and HBM y origin, the window's
    clipped z/y origins, and the shipped region's offsets inside the
    window.  Every sublane (y) offset is built in explicit ``8·k`` form
    for Mosaic's divisibility prover.  Like ``tile_geometry``, every
    kernel must use THIS function so DMA slice offsets and scratch
    shapes agree."""
    p = slab + 2 * halo
    i = idx // n_ty
    jy = idx % n_ty
    z0 = i * slab
    start = jnp.clip(z0 - halo, 0, nz - p)
    ystart8 = jnp.clip(jy * (ty // 8) - halo_y // 8, 0, (n - py) // 8)
    ystart = 8 * ystart8
    off = z0 - start
    off_y = 8 * (jy * (ty // 8) - ystart8)
    y0 = 8 * (jy * (ty // 8))
    return i, jy, z0, y0, start, ystart, off, off_y


def _jacobi_kernel(x_hbm, x0_hbm, out_hbm, buf0, buf1, x0s, sems,
                   *, n: int, slab: int, halo: int, t_iters: int,
                   a: float, inv_c: float, b: int, tile_y: int | None = None):
    """``tile_y``: y-tiled windows for grids whose full-width planes
    exceed VMEM (512³).  The validity argument is the z one verbatim, per
    axis: t sweeps invalidate t window-edge rows on non-boundary sides,
    so the clipped window extends ``halo = T`` rows past the shipped tile
    — global y walls are closed by the corrected reads (``yg`` is
    global), exactly like z."""
    idx = pl.program_id(0)
    p = slab + 2 * halo
    ty, n_ty, halo_y, py = tile_geometry(n, tile_y, halo)
    i, jy, z0, y0, start, ystart, off, off_y = window_origin(
        idx, nz=n, n=n, slab=slab, halo=halo, ty=ty, n_ty=n_ty,
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
    in_dma.wait()
    x0_dma.wait()

    sz, sy, sx = _signs(b)
    az = jnp.asarray(a, jnp.float32)
    ic = jnp.asarray(inv_c, jnp.float32)

    zg = start + jax.lax.broadcasted_iota(jnp.int32, (p, py, n), 0)
    yg = ystart + jax.lax.broadcasted_iota(jnp.int32, (p, py, n), 1)
    xg = jax.lax.broadcasted_iota(jnp.int32, (p, py, n), 2)

    def roll(v, shift, axis):
        # pltpu.roll wants non-negative shifts; rotating by −1 along an
        # axis of size m equals rotating by m−1.
        m = v.shape[axis]
        return pltpu.roll(v, shift % m, axis)

    def sweep(src_ref, dst_ref):
        v = src_ref[:]
        # x-direction neighbors (lane rolls), with face-corrected reads:
        # the interior cell at x=1 reads the x=0 face, whose set_bnd value
        # is sx·(itself); same at x=n−2.
        right = jnp.where(xg == n - 2, sx * v, roll(v, -1, 2))
        left = jnp.where(xg == 1, sx * v, roll(v, 1, 2))
        # y-direction (sublane rolls)
        up = jnp.where(yg == n - 2, sy * v, roll(v, -1, 1))
        down = jnp.where(yg == 1, sy * v, roll(v, 1, 1))
        # z-direction (plane rolls inside the window); global faces closed
        # by the corrected read, window edges are in the discard margin.
        above = jnp.where(zg == n - 2, sz * v, roll(v, -1, 0))
        below = jnp.where(zg == 1, sz * v, roll(v, 1, 0))

        nbr = ((right + left) + (up + down)) + (above + below)
        dst_ref[:] = (x0s[:] + az * nbr) * ic

    for t in range(t_iters):
        src, dst = (buf0, buf1) if t % 2 == 0 else (buf1, buf0)
        sweep(src, dst)

    final = buf1 if t_iters % 2 == 1 else buf0
    out_dma = pltpu.make_async_copy(
        final.at[pl.ds(off, slab), pl.ds(off_y, ty)],
        out_hbm.at[pl.ds(z0, slab), pl.ds(y0, ty)],
        sems.at[2],
    )
    out_dma.start()
    out_dma.wait()


def _pick_block(n: int, t_iters: int):
    """Choose (slab, halo, tile_y) for temporal blocking.  The VMEM model
    is *total* footprint: 3 declared windows plus ~12 window-equivalents
    of live sweep temporaries/spills (v, six rolled neighbors, partial
    sums) against the chip's 128 MB, which keeps full-width z-slab
    windows viable through 256³ (28-plane windows).  At 512³ (1 MB
    planes) the windows additionally tile in y (``tile_y + 2·halo``
    rows).  Among the feasible (slab, tile) pairs the pick minimizes the
    *redundancy ratio* ``(window·py)/(slab·ty)`` — the fraction of halo
    DMA+compute wasted per shipped cell — rather than first-fit, so a
    small-slab/huge-tile candidate can't shadow a strictly cheaper one
    (at fixed T the per-pass DMA term is monotone in the ratio, so
    min-ratio = min-cost).  Returns ``((slab, halo, tile_y), ratio)`` or
    ``None``; the *driver* compares candidates across T values with the
    calibrated cost model ``ratio + 2.4·(2·ratio+1)/T`` — see
    ``jacobi_3d_pallas``."""
    budget = 120 * 1024 * 1024
    halo = t_iters
    best = None
    best_cost = None
    for tile in (n, n // 2, n // 4, n // 8):
        if tile < 8 or n % tile or tile % 8:
            continue
        ty, _, _, py = tile_geometry(n, None if tile == n else tile, halo)
        if py > n:
            continue
        plane_bytes = py * n * 4
        for slab in (64, 32, 16, 8):
            if n % slab:
                continue
            window = slab + 2 * halo
            if (3 + 12) * window * plane_bytes > budget or window > n:
                continue
            cost = window_cost(window, py, slab, ty, n, tile != n)
            if best_cost is None or cost < best_cost:
                best = (slab, halo, (None if tile == n else tile))
                best_cost = cost
    return None if best is None else (best, best_cost)


def pick_blocking(n: int, block_iters: int):
    """Choose ((slab, halo, tile_y), T) across temporal blocks
    T = block_iters, /2, /4 … by the calibrated per-iteration cost
    ``ratio + 2.4·(2·ratio+1)/T`` (compute ∝ ratio is T-independent;
    each of the iters/T passes pays 2 window reads + 1 slab write of HBM
    DMA).  The 2.4 weight is fitted to on-chip 20-iter solves at 256³ —
    it reproduces the measured ordering there exactly ((64,T10,tile64)
    13.6 ms < (16,T5,full) 13.8 < (16,T2,full) 17.1 ≈ (8,T10,full)
    17.2; tools/microbench_kernels.py) and the 512³ microbench
    ((32,T5,t64) 71.6 ms < (16,T2,t128) 78.7 < (16,T5,t128) 86.3).
    Returns (None, block_iters) when no blocking fits."""
    picked = None
    best_cost = None
    t = block_iters
    while t >= 2:
        cand = _pick_block(n, t)
        if cand is not None:
            ratio = cand[1]
            cost = ratio + 2.4 * (2.0 * ratio + 1.0) / t
            if best_cost is None or cost < best_cost:
                picked, best_cost = cand[0], cost
                block_iters = t
        t //= 2
    return picked, block_iters


def jacobi_3d_pallas(b: int, x, x0, a: float, c: float, iters: int,
                     block_iters: int = 10, interpret: bool = False,
                     force_tile_y: int | None = None):
    """Drop-in (no-obstacle) replacement for ``ops.linsolve.jacobi_3d``.

    Runs ⌈iters/block_iters⌉ temporally-blocked passes, then applies the
    final ``set_bnd_3d`` face materialization (the in-kernel corrected
    reads keep faces implicit).  ``interpret=True`` runs the kernel in the
    Pallas interpreter (CPU tests).

    Input contract: wall faces must be set_bnd-consistent (every solver
    call site guarantees this); the input is normalized regardless.
    """
    from ..ops.boundary import set_bnd_3d

    n = x.shape[-1]
    assert x.shape == (n, n, n) and x0.shape == (n, n, n)

    # Whole-volume-in-VMEM solve: one HBM round trip for any iteration
    # count (pallas/resident.py) — preferred whenever 3 volumes fit.
    from .resident import jacobi_3d_resident, resident_fits

    if resident_fits(n, 3):
        return jacobi_3d_resident(b, x, x0, a, c, iters, interpret=interpret)

    if x.dtype != jnp.float32:
        # Slab kernel scratch is f32; narrow storage upcasts at the edge.
        out = jacobi_3d_pallas(
            b, x.astype(jnp.float32), x0.astype(jnp.float32), a, c, iters,
            block_iters, interpret, force_tile_y,
        )
        return out.astype(x.dtype)

    picked, block_iters = pick_blocking(n, block_iters)
    if picked is None:  # grid too small/odd for blocking — XLA fallback
        from ..ops.linsolve import jacobi_3d

        return jacobi_3d(b, x, x0, a, c, None, iters)

    # Precondition: the corrected neighbor reads assume the input's wall
    # faces already satisfy set_bnd (face = s·adjacent interior).  Every
    # solver call site guarantees this (fields end each op with set_bnd);
    # normalize anyway so standalone use matches ops.linsolve.jacobi_3d on
    # consistent inputs.
    x = set_bnd_3d(b, x, None)
    slab, halo, tile_y = picked
    if force_tile_y is not None:
        tile_y = force_tile_y
    p = slab + 2 * halo
    ty, n_ty, halo_y, py = tile_geometry(n, tile_y, halo)
    inv_c = float(np.float32(1.0) / np.float32(c))

    n_passes = math.ceil(iters / block_iters)
    grid = ((n // slab) * n_ty,)

    def one_pass(x, t_iters):
        kernel = functools.partial(
            _jacobi_kernel, n=n, slab=slab, halo=halo, t_iters=t_iters,
            a=float(np.float32(a)), inv_c=inv_c, b=b, tile_y=tile_y,
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((n, n, n), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((p, py, n), jnp.float32),
                pltpu.VMEM((p, py, n), jnp.float32),
                pltpu.VMEM((p, py, n), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
            interpret=interpret,
        )(x, x0)

    remaining = iters
    while remaining > 0:
        t = min(block_iters, remaining)
        x = one_pass(x, t)
        remaining -= t

    # Materialize wall faces once (iterations used corrected reads).
    return set_bnd_3d(b, x, None)
