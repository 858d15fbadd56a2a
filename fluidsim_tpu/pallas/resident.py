"""Fully VMEM-resident Jacobi solve and pressure projection (Pallas TPU).

At the headline grid (128³) one float32 field is only 8.4 MB while the chip
has ~128 MB of VMEM (empirically ≥109 MB of scratch compiles and runs), so
the entire 60-iteration pressure solve — and the divergence/gradient passes
bracketing it — fits on-chip in ONE kernel:

* HBM traffic per projection drops from ~300 MB (slab-blocked kernels:
  6 temporally-blocked passes × windows + div + grad round trips,
  pallas/jacobi.py + pallas/project.py) to **read vel + write vel + write
  p ≈ 59 MB** — a ~5× cut on the step's dominant term.
* Zero redundant compute: no halo margins, no per-pass re-normalization.
* Boundary handling: each sweep ends with six *slice writes* that
  materialize the ``set_bnd_3d`` faces in-place (z→y→x, later write wins —
  the exact sequential dataflow of ``ops.boundary.apply_faces_3d``), so the
  iterate is face-consistent at every step and no host-side ``set_bnd`` or
  per-cell select is needed.  This also cuts the sweep body from ~18 vector
  ops/cell (6 rolls + 6 face-correction selects + arith, pallas/jacobi.py)
  to ~13 (6 rolls + arith) plus O(n²) slice writes.

Numerics: identical to ``ops.linsolve.jacobi_3d`` / ``ops.project.project_3d``
(no-obstacle path) except the Jacobi update multiplies by a precomputed
``1/c`` instead of dividing by ``c`` (1-ulp class difference; the slab
kernels make the same trade).  Unlike ``jacobi_3d_pallas`` this path does
NOT require face-consistent inputs — the first sweep reads the input's
faces exactly as the XLA oracle does.

Reference lineage: the solve replaces ``LinearSolveIterationJob`` +
``BoundaryJob`` chains (FluidSim.cs:1188-1233, 1235-1289) and the
projection replaces ``ProjectWithJobs`` (FluidSim.cs:1417-1521), re-designed
as one on-chip program instead of per-sweep job dispatches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .jacobi import _signs, pallas_supported

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


# Empirical: ≥109 MB of VMEM scratch compiles and runs on the target chip;
# stay under 100 MB to leave headroom for spills/temporaries.
_VMEM_BUDGET = 100 * 1024 * 1024


def resident_fits(n: int, nvols: int) -> bool:
    """Whether ``nvols`` full (n,n,n) float32 volumes fit in VMEM scratch."""
    return n % 8 == 0 and n >= 16 and nvols * n * n * n * 4 <= _VMEM_BUDGET


def _roll(v, shift, axis):
    # pltpu.roll wants non-negative shifts; −1 ≡ m−1 on an axis of size m.
    return pltpu.roll(v, shift % v.shape[axis], axis)


def _scaled(s: float, v):
    return v if s == 1.0 else s * v


def _write_faces(ref, n: int, sz: float, sy: float, sx: float, c=None):
    """Materialize the ``apply_faces_3d`` wall faces in-place via slice
    writes, z→y→x so shared edges/corners take the later write — the same
    sequential dataflow as the XLA formulation (each pass reads the
    previous pass's result, healing edge cells from interior values).

    ``c``: optional static leading index when ``ref`` is (3, n, n, n).
    """
    p = () if c is None else (c,)
    a = (slice(None),)
    ref[p + (slice(0, 1),)] = _scaled(sz, ref[p + (slice(1, 2),)])
    ref[p + (slice(n - 1, n),)] = _scaled(sz, ref[p + (slice(n - 2, n - 1),)])
    ref[p + a + (slice(0, 1),)] = _scaled(sy, ref[p + a + (slice(1, 2),)])
    ref[p + a + (slice(n - 1, n),)] = _scaled(
        sy, ref[p + a + (slice(n - 2, n - 1),)]
    )
    ref[p + a + a + (slice(0, 1),)] = _scaled(
        sx, ref[p + a + a + (slice(1, 2),)]
    )
    ref[p + a + a + (slice(n - 1, n),)] = _scaled(
        sx, ref[p + a + a + (slice(n - 2, n - 1),)]
    )


def _nbr_sum(v):
    """6-neighbor sum, exact add order of ``ops.linsolve._nbr_sum_3d``."""
    return (
        (_roll(v, -1, 2) + _roll(v, 1, 2))
        + (_roll(v, -1, 1) + _roll(v, 1, 1))
    ) + (_roll(v, -1, 0) + _roll(v, 1, 0))


def _rollf(v, shift, axis):
    """Roll in the stored dtype (narrow VMEM read), accumulate in f32."""
    return _roll(v, shift, axis).astype(jnp.float32)


def _nbr_sum_f32(v):
    """6-neighbor sum of a narrow-dtype iterate: each rolled operand is
    read at its stored width and upcast before the f32 adds (same add
    order as ``_nbr_sum``)."""
    return (
        (_rollf(v, -1, 2) + _rollf(v, 1, 2))
        + (_rollf(v, -1, 1) + _rollf(v, 1, 1))
    ) + (_rollf(v, -1, 0) + _rollf(v, 1, 0))


def _solve_loop(x0_ref, pb0, pb1, *, n: int, b: int, a: float, inv_c: float,
                iters: int, coef_ref=None, frozen_ref=None):
    """Run ``iters`` face-maintained Jacobi sweeps ping-ponging pb0↔pb1.

    Obstacle handling (the reference's skip semantics, FluidSim.cs:1205 —
    obstacle cells copy the previous iterate) is folded into two
    *precomputed f32 volumes* instead of a per-sweep int8 compare+select:

    * ``coef_ref`` = ``where(obstacle, 0, 1/c)`` — the sweep multiplies the
      rhs by this volume instead of the scalar ``inv_c``, zeroing obstacle
      cells at no extra vector-op cost (and no int8→f32 relayout per
      sweep; the old select formulation measured 2.7× the no-obstacle
      sweep on-chip).
    * ``frozen_ref`` = ``where(obstacle, x_init, 0)`` — added back so
      obstacle cells hold their initial value, which is exactly what
      iterated copy-through converges to (each sweep copies the previous
      iterate; faces never overwrite interior cells).  Omit when the
      initial iterate is zero at obstacle cells (the pressure solve:
      ``p`` starts at zeros), where ``rhs·coef`` alone reproduces
      copy-through bit-for-bit up to the sign of zero.

    Only valid for ``b == 0`` (scalar solves, where ``set_bnd`` applies no
    obstacle mirror).  Returns the ref holding the final iterate (static).

    A slice-z sweep variant (update planes 1..n−2 with the z neighbors as
    leading-axis slices instead of ``pltpu.roll``s) was tried and measured
    *exactly neutral* on-chip (1.033 vs 1.038 ms per 60-iter projection at
    128³) — Mosaic already lowers untiled-axis rolls to addressing, and
    the sweep is bound by VMEM operand bandwidth / the iteration
    dependency chain, not by the roll copies.  Kept in the simpler rolled
    form.
    """
    sz, sy, sx = _signs(b)
    az = jnp.asarray(a, jnp.float32)
    ic = jnp.asarray(inv_c, jnp.float32)
    f32_solve = pb0.dtype == jnp.float32

    def sweep(src, dst):
        prev = src[:]
        # Narrow (bfloat16) solve buffers: every operand is read at its
        # stored width — halving the sweep's VMEM operand traffic, which
        # is what bounds it — and the arithmetic runs in f32.
        nbr = _nbr_sum(prev) if f32_solve else _nbr_sum_f32(prev)
        rhs = x0_ref[:].astype(jnp.float32) + (nbr if a == 1.0 else az * nbr)
        # Border obstacle cells are irrelevant either way: faces are
        # rewritten below, matching the XLA oracle's interior-only
        # copy-through.
        upd = rhs * (ic if coef_ref is None else coef_ref[:])
        if frozen_ref is not None:
            upd = upd + frozen_ref[:]
        dst[:] = upd.astype(dst.dtype)
        _write_faces(dst, n, sz, sy, sx)

    def two(_, carry):
        sweep(pb0, pb1)
        sweep(pb1, pb0)
        return carry

    jax.lax.fori_loop(0, iters // 2, two, 0)
    if iters % 2:
        sweep(pb0, pb1)
        return pb1
    return pb0


def _jacobi_kernel(x_hbm, x0_hbm, out_hbm, pb0, pb1, x0s, sems,
                   *, n: int, b: int, a: float, inv_c: float, iters: int):
    in_dma = pltpu.make_async_copy(x_hbm, pb0, sems.at[0])
    x0_dma = pltpu.make_async_copy(x0_hbm, x0s, sems.at[1])
    in_dma.start()
    x0_dma.start()
    in_dma.wait()
    x0_dma.wait()

    final = _solve_loop(x0s, pb0, pb1, n=n, b=b, a=a, inv_c=inv_c,
                        iters=iters)

    out_dma = pltpu.make_async_copy(final, out_hbm, sems.at[2])
    out_dma.start()
    out_dma.wait()


def _jacobi_obst_kernel(x_hbm, x0_hbm, obst_hbm, out_hbm, pb0, pb1, x0s,
                        omask, coef, frozen, sems, *, n: int, b: int,
                        a: float, inv_c: float, iters: int):
    dmas = [
        pltpu.make_async_copy(x_hbm, pb0, sems.at[0]),
        pltpu.make_async_copy(x0_hbm, x0s, sems.at[1]),
        pltpu.make_async_copy(obst_hbm, omask, sems.at[2]),
    ]
    for d in dmas:
        d.start()
    for d in dmas:
        d.wait()

    # One-time mask expansion: all per-sweep obstacle work becomes a
    # volume multiply (+ add), see _solve_loop.  Arithmetic (not select):
    # Mosaic cannot relayout full-volume i1 vectors.
    mf = omask[:].astype(jnp.float32)  # 1.0 at obstacle cells
    coef[:] = (1.0 - mf) * jnp.asarray(inv_c, jnp.float32)
    frozen[:] = mf * pb0[:]

    final = _solve_loop(x0s, pb0, pb1, n=n, b=b, a=a, inv_c=inv_c,
                        iters=iters, coef_ref=coef, frozen_ref=frozen)

    out_dma = pltpu.make_async_copy(final, out_hbm, sems.at[3])
    out_dma.start()
    out_dma.wait()


def jacobi_3d_resident(b: int, x, x0, a: float, c: float, iters: int,
                       obst=None, interpret: bool = False):
    """Whole-volume-in-VMEM ``ops.linsolve.jacobi_3d``.

    One kernel, one HBM read of (x, x0[, obst]) and one write of the
    result, regardless of ``iters``.  Matches the XLA oracle on arbitrary
    inputs (first sweep reads the given faces, as the oracle does).
    ``obst`` (bool mask, scalar solves ``b == 0`` only — set_bnd applies
    no obstacle mirror there) makes obstacle cells copy the previous
    iterate, exactly the oracle's skip semantics.
    """
    n = x.shape[-1]
    assert x.shape == (n, n, n) and x0.shape == (n, n, n)
    assert obst is None or b == 0, "obstacle copy-through is b==0 only"
    if x.dtype != jnp.float32:
        # Narrow storage: solve in f32 (the projection kernel handles bf16
        # natively in-kernel; this standalone entry upcasts at the edge).
        out = jacobi_3d_resident(
            b, x.astype(jnp.float32), x0.astype(jnp.float32), a, c, iters,
            obst=obst, interpret=interpret,
        )
        return out.astype(x.dtype)
    inv_c = float(np.float32(1.0) / np.float32(c))
    common = dict(
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n, n, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    if obst is None:
        kernel = functools.partial(
            _jacobi_kernel, n=n, b=b, a=float(np.float32(a)), inv_c=inv_c,
            iters=iters,
        )
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            scratch_shapes=[
                pltpu.VMEM((n, n, n), jnp.float32),
                pltpu.VMEM((n, n, n), jnp.float32),
                pltpu.VMEM((n, n, n), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
            **common,
        )(x, x0)
    kernel = functools.partial(
        _jacobi_obst_kernel, n=n, b=b, a=float(np.float32(a)), inv_c=inv_c,
        iters=iters,
    )
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        scratch_shapes=[
            pltpu.VMEM((n, n, n), jnp.float32),
            pltpu.VMEM((n, n, n), jnp.float32),
            pltpu.VMEM((n, n, n), jnp.float32),
            pltpu.VMEM((n, n, n), jnp.int8),
            pltpu.VMEM((n, n, n), jnp.float32),   # coef (masked 1/c)
            pltpu.VMEM((n, n, n), jnp.float32),   # frozen (masked init)
            pltpu.SemaphoreType.DMA((4,)),
        ],
        **common,
    )(x, x0, obst.astype(jnp.int8))


def _project_kernel(vel_hbm, velout_hbm, p_hbm, vbuf, pb0, pb1, divb, pstag,
                    sems, *, n: int, iters: int, obst_hbm=None, omask=None,
                    coef=None):
    """``vbuf``/``pstag`` carry the storage dtype (float32 or bfloat16 —
    halving HBM traffic for bf16 fields); the solve buffers (pb0/pb1/divb)
    are always float32: the fixed-point iteration accumulates on-chip in
    full precision and only the HBM crossings are narrow."""
    in_dma = pltpu.make_async_copy(vel_hbm, vbuf, sems.at[0])
    in_dma.start()
    if obst_hbm is not None:
        ob_dma = pltpu.make_async_copy(obst_hbm, omask, sems.at[5])
        ob_dma.start()
        ob_dma.wait()
    in_dma.wait()

    f32 = jnp.float32
    nf = jnp.asarray(float(n), f32)
    half = jnp.asarray(0.5, f32)

    # Divergence, exact grouping of ops.project.project_3d's div_int
    # (interior cells agree bitwise; wall cells are garbage but the Jacobi
    # rhs is only read at interior cells, and p starts at zero).
    vx = vbuf[0].astype(f32)
    vy = vbuf[1].astype(f32)
    vz = vbuf[2].astype(f32)
    divb[:] = (
        -half
        * (
            (_roll(vx, -1, 2) - _roll(vx, 1, 2))
            + (_roll(vy, -1, 1) - _roll(vy, 1, 1))
            + (_roll(vz, -1, 0) - _roll(vz, 1, 0))
        )
        / nf
    ).astype(divb.dtype)

    pb0[:] = jnp.zeros((n, n, n), pb0.dtype)
    inv6 = float(np.float32(1.0) / np.float32(6.0))
    if omask is not None:
        # p starts at zeros, so obstacle copy-through ≡ holding zero —
        # fold it into the solve coefficient once (no frozen volume
        # needed) and every sweep runs the no-obstacle body.  Arithmetic
        # mask: Mosaic cannot relayout full-volume i1 vectors.
        coef[:] = (1.0 - omask[:].astype(f32)) * jnp.asarray(inv6, f32)
    final = _solve_loop(divb, pb0, pb1, n=n, b=0, a=1.0, inv_c=inv6,
                        iters=iters, coef_ref=coef)

    # p is face-consistent (maintained every sweep) — ship it now so the
    # transfer overlaps the gradient computation.
    pv = final[:]
    pstag[:] = pv.astype(pstag.dtype)
    p_dma = pltpu.make_async_copy(pstag, p_hbm, sems.at[1])
    p_dma.start()

    if omask is not None:
        # One-time setup for the in-kernel obstacle mirror — the exact
        # arithmetic of ops.boundary._mirror_obstacles_axis, staged
        # through scratch that is DEAD after the solve (the rhs buffer
        # and the losing ping-pong buffer) so the mirror adds no VMEM
        # and, unlike an iota-mask formulation, no register-allocator
        # spill volumes (a 3×int32-iota + i1 variant spilled 65 MB and
        # OOM'd VMEM at 128³).
        mfb = pb1 if final is pb0 else pb0   # obstacle mask (solve dtype:
        mfb[:] = omask[:].astype(mfb.dtype)  # 0/1 are exact in bfloat16)
        # Write mask = mask ∧ interior: zero the six wall faces via
        # O(n²) slice writes (a cell is non-interior iff on some face).
        divb[:] = mfb[:].astype(divb.dtype)
        zf = jnp.zeros((1, n, n), divb.dtype)
        yf = jnp.zeros((n, 1, n), divb.dtype)
        xf = jnp.zeros((n, n, 1), divb.dtype)
        divb[0:1] = zf
        divb[n - 1:n] = zf
        divb[:, 0:1] = yf
        divb[:, n - 1:n] = yf
        divb[:, :, 0:1] = xf
        divb[:, :, n - 1:n] = xf

        def mirror(v, axis):
            fp = 1.0 - _rollf(mfb[:], 1, axis)    # fluid at idx−1
            fn = 1.0 - _rollf(mfb[:], -1, axis)   # fluid at idx+1
            # Selects, not fp·(−v) products: an excluded non-finite
            # neighbor must contribute 0, not 0·inf = NaN (the oracle's
            # where(count>0, …, 0) semantics in ops.boundary).
            total = (jnp.where(fp > 0.0, -_roll(v, 1, axis), 0.0)
                     + jnp.where(fn > 0.0, -_roll(v, -1, axis), 0.0))
            mirrored = total / jnp.maximum(fp + fn, 1.0)
            return jnp.where(divb[:].astype(f32) != 0.0, mirrored, v)

    # Gradient subtraction v −= 0.5·N·∂p with in-place face rewrite, per
    # component; start each component's out-DMA as soon as it's final.
    out_dmas = []
    for comp, axis in ((0, 2), (1, 1), (2, 0)):
        g = half * (_rollf(pv, -1, axis) - _rollf(pv, 1, axis)) * nf
        vold = vbuf[comp].astype(f32)
        upd = vold - g
        if omask is not None:
            # gradient is zeroed in obstacle cells (ops.project.project_3d)
            upd = jnp.where(omask[:] != 0, vold, upd)
        vbuf[comp] = upd.astype(vbuf.dtype)
        sz, sy, sx = _signs(comp + 1)
        _write_faces(vbuf, n, sz, sy, sx, c=comp)
        if omask is not None:
            # set_bnd obstacle mirror, fused (was a host-side full-volume
            # pass per projection: read vel+mask, write vel ≈ 59 MB HBM
            # at 128³); runs once, after the faces, exactly the oracle's
            # faces-then-mirror order.
            vbuf[comp] = mirror(
                vbuf[comp].astype(f32), axis
            ).astype(vbuf.dtype)
        dma = pltpu.make_async_copy(
            vbuf.at[comp], velout_hbm.at[comp], sems.at[2 + comp]
        )
        dma.start()
        out_dmas.append(dma)

    p_dma.wait()
    for dma in out_dmas:
        dma.wait()


def _project_obst_kernel(vel_hbm, obst_hbm, velout_hbm, p_hbm,
                         vbuf, pb0, pb1, divb, pstag, omask, coef, sems,
                         *, n: int, iters: int):
    _project_kernel(vel_hbm, velout_hbm, p_hbm, vbuf, pb0, pb1, divb, pstag,
                    sems, n=n, iters=iters, obst_hbm=obst_hbm, omask=omask,
                    coef=coef)


def _advect_project_kernel(vel_hbm, velout_hbm, p_hbm,
                           velp, fwin, pb0, pb1, divb, pstag, sems,
                           *, n: int, slab: int, k_win: int, n_sub: int,
                           dt0: float, iters: int, n_slabs: int):
    """Fused velocity self-advection + projection — the whole velocity
    half of the step in ONE kernel.

    Grid programs run sequentially with persistent scratch, so programs
    0..n_slabs−1 advect z-slabs (HBM windows in, results into the
    *persistent full-volume* ``velp``) and program n_slabs applies the
    advection output masking, computes the divergence, runs all ``iters``
    Jacobi sweeps, and subtracts the gradient — the advected velocity
    never round-trips HBM between advection and projection (saves a full
    write+read of the field at the kernel boundary).

    **Measured result (round 2): bit-exact vs the two-kernel composition
    but 4× SLOWER on-chip (78 vs 323 steps/s at 128³)** — Mosaic compiles
    the union of both ``pl.when`` phase bodies into one program, and the
    combined register pressure/scheduling degrades both phases (cf. the
    rejected 27-term static unroll, same failure mode).  Kept as a tested
    reference for when the compiler handles multi-phase programs better;
    NOT dispatched by the product step.
    """
    from .advect import _substep_window_vals

    i = pl.program_id(0)
    halo = k_win * n_sub
    p = slab + 2 * halo
    f32 = jnp.float32

    @pl.when(i < n_slabs)
    def _advect_phase():
        z0 = i * slab
        start = jnp.clip(z0 - halo, 0, n - p)
        off = z0 - start
        dma = pltpu.make_async_copy(
            vel_hbm.at[:, pl.ds(start, p)], fwin, sems.at[0]
        )
        dma.start()
        dma.wait()
        vel_vals = tuple(fwin[c].astype(f32) for c in range(3))
        out_vals = _substep_window_vals(
            vel_vals, vel_vals, start=start, n=n, p=p, k_win=k_win,
            n_sub=n_sub, dt0=dt0, bs=(1, 2, 3),
        )
        for c in range(3):
            velp[c, pl.ds(z0, slab)] = jax.lax.dynamic_slice(
                out_vals[c], (off, 0, 0), (slab, n, n)
            )

    @pl.when(i == n_slabs)
    def _project_phase():
        # Advection output contract (_mask_and_bnd_3d, obstacle-free):
        # fresh-zero borders + set_bnd faces, z→y→x, per component.
        zy = jnp.zeros((n, 1, n), f32)
        zx = jnp.zeros((n, n, 1), f32)
        for c in range(3):
            velp[c, :, 0:1, :] = zy
            velp[c, :, n - 1:n, :] = zy
            velp[c, :, :, 0:1] = zx
            velp[c, :, :, n - 1:n] = zx
            sz, sy, sx = _signs(c + 1)
            _write_faces(velp, n, sz, sy, sx, c=c)

        nf = jnp.asarray(float(n), f32)
        half = jnp.asarray(0.5, f32)
        vx, vy, vz = velp[0], velp[1], velp[2]
        divb[:] = (
            -half
            * (
                (_roll(vx, -1, 2) - _roll(vx, 1, 2))
                + (_roll(vy, -1, 1) - _roll(vy, 1, 1))
                + (_roll(vz, -1, 0) - _roll(vz, 1, 0))
            )
            / nf
        )

        pb0[:] = jnp.zeros((n, n, n), f32)
        inv6 = float(np.float32(1.0) / np.float32(6.0))
        final = _solve_loop(divb, pb0, pb1, n=n, b=0, a=1.0, inv_c=inv6,
                            iters=iters)

        pv = final[:]
        pstag[:] = pv.astype(pstag.dtype)
        p_dma = pltpu.make_async_copy(pstag, p_hbm, sems.at[1])
        p_dma.start()

        out_dmas = []
        for comp, axis in ((0, 2), (1, 1), (2, 0)):
            g = half * (_roll(pv, -1, axis) - _roll(pv, 1, axis)) * nf
            velp[comp] = velp[comp] - g
            sz, sy, sx = _signs(comp + 1)
            _write_faces(velp, n, sz, sy, sx, c=comp)
            dma = pltpu.make_async_copy(
                velp.at[comp], velout_hbm.at[comp], sems.at[2 + comp]
            )
            dma.start()
            out_dmas.append(dma)

        p_dma.wait()
        for dma in out_dmas:
            dma.wait()


def advect_project_3d_resident(vel, iters: int, dt: float, *,
                               window: int = 1, n_sub: int = 1,
                               interpret: bool = False):
    """Fused self-advection + projection (obstacle-free, float32).
    Returns (vel, p) — equal to
    ``advect_multi_3d_pallas((1,2,3), vel, vel, dt, None, window, n_sub)``
    followed by ``project_3d_resident(·, iters)``."""
    n = vel.shape[-1]
    assert vel.shape == (3, n, n, n)
    halo = window * n_sub
    slab = next(s for s in (16, 8)
                if n % s == 0 and s + 2 * halo <= n)
    p = slab + 2 * halo
    dt0 = float(np.float32(dt) * np.float32(n - 2))
    kernel = functools.partial(
        _advect_project_kernel, n=n, slab=slab, k_win=window, n_sub=n_sub,
        dt0=dt0, iters=iters, n_slabs=n // slab,
    )
    return pl.pallas_call(
        kernel,
        grid=(n // slab + 1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, n, n, n), vel.dtype),
            jax.ShapeDtypeStruct((n, n, n), vel.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((3, n, n, n), jnp.float32),       # velp (persistent)
            pltpu.VMEM((3, p, n, n), jnp.float32),       # fwin
            pltpu.VMEM((n, n, n), jnp.float32),          # pb0
            pltpu.VMEM((n, n, n), jnp.float32),          # pb1
            pltpu.VMEM((n, n, n), jnp.float32),          # divb
            pltpu.VMEM((n, n, n), vel.dtype),            # pstag
            pltpu.SemaphoreType.DMA((5,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(vel)


def project_3d_resident(vel, iters: int, obst=None, interpret: bool = False,
                        solve_dtype=None):
    """Whole-projection-in-VMEM: divergence + ``iters`` Jacobi sweeps +
    gradient subtraction in ONE kernel.  Returns (vel, p).

    HBM traffic: one read of vel (+ the bool mask), one write of (vel, p)
    — independent of ``iters``.  Interior numerics match
    ``ops.project.project_3d`` (the returned div/p wall values are
    solver-internal; p's faces ARE set_bnd-consistent here).

    ``obst``: optional bool mask.  Fully handled in-kernel: the solve's
    copy-through (folded into the sweep coefficient volume), the gradient
    zeroing, and the ``set_bnd`` obstacle *mirror* on the returned
    velocity components (applied after the face writes — the oracle's
    faces-then-mirror order).

    ``solve_dtype``: dtype of the ping-pong iterate and rhs VMEM volumes
    (default float32).  ``jnp.bfloat16`` halves the sweep's VMEM operand
    traffic — the measured bound of the 60-sweep loop — while every
    sweep still *computes* in f32 (operands upcast after each rolled
    read).  Accuracy: the iterate/rhs rounding (~1e-3 relative) is the
    same order as what 60-iteration Jacobi truncation already leaves
    (measured: divergence removal 74.4% vs 74.5% of the f32 solve on a
    random field — tools note in docs/KERNELS.md); opt in via
    ``SimConfig.solve_dtype="bfloat16"``.
    """
    n = vel.shape[-1]
    assert vel.shape == (3, n, n, n)
    sdt = jnp.float32 if solve_dtype is None else jnp.dtype(solve_dtype)
    common = dict(
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, n, n, n), vel.dtype),
            jax.ShapeDtypeStruct((n, n, n), vel.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    scratch = [
        pltpu.VMEM((3, n, n, n), vel.dtype),      # vbuf (storage dtype)
        pltpu.VMEM((n, n, n), sdt),               # pb0
        pltpu.VMEM((n, n, n), sdt),               # pb1
        pltpu.VMEM((n, n, n), sdt),               # divb (solve rhs)
        pltpu.VMEM((n, n, n), vel.dtype),         # pstag (out staging)
    ]
    if obst is None:
        kernel = functools.partial(_project_kernel, n=n, iters=iters)
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            scratch_shapes=scratch + [pltpu.SemaphoreType.DMA((5,))],
            **common,
        )(vel)
    kernel = functools.partial(_project_obst_kernel, n=n, iters=iters)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        scratch_shapes=scratch + [
            pltpu.VMEM((n, n, n), jnp.int8),
            pltpu.VMEM((n, n, n), jnp.float32),   # coef (masked 1/6)
            pltpu.SemaphoreType.DMA((6,)),
        ],
        **common,
    )(vel, obst.astype(jnp.int8))
