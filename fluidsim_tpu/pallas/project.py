"""Fused pressure projection (Pallas TPU kernels).

``ops.project.project_3d`` surrounds the Jacobi solve with several
full-array XLA passes: divergence (+set_bnd), pressure init, gradient
subtraction, and three velocity ``set_bnd``s.  On the obstacle-free path
those reduce to two tiny slab kernels bracketing the existing
temporally-blocked Jacobi:

* ``_div_kernel`` — central-difference divergence of the velocity window
  (z-halo 1).  Wall-face values of ``div`` are irrelevant: the Jacobi
  recurrence only reads the rhs at interior cells, so no ``set_bnd`` is
  materialized (the XLA path's ``set_bnd(0, div)`` is a no-op for the
  solve; ``p`` starts at zero either way).
* ``_grad_kernel`` — ``v −= 0.5·N·∂p`` with the velocity wall faces
  rewritten in-kernel (the exact ``set_bnd_3d`` z→y→x face pass per
  component).

Numerics match ``ops.project.project_3d(..., use_pallas=True)`` with
``obst=None`` except at the wall faces of ``div``/``p``'s *outputs*
(unused by the solve; ``p`` is face-normalized before return so the
visualized pressure matches too).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .jacobi import jacobi_3d_pallas, pallas_supported

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def _div_kernel(vel_hbm, out_hbm, vbuf, obuf, sems, *, n: int, slab: int):
    i = pl.program_id(0)
    p = slab + 2
    z0 = i * slab
    start = jnp.clip(z0 - 1, 0, n - p)
    off = z0 - start

    dma = pltpu.make_async_copy(vel_hbm.at[:, pl.ds(start, p)], vbuf,
                                sems.at[0])
    dma.start()
    dma.wait()

    nf = jnp.asarray(n, jnp.float32)
    vx, vy, vz = vbuf[0], vbuf[1], vbuf[2]

    def roll(v, shift, axis):
        return pltpu.roll(v, shift % v.shape[axis], axis)

    # -0.5·((vx(x+1)−vx(x−1)) + (vy(y+1)−vy(y−1)) + (vz(z+1)−vz(z−1)))/N —
    # exact grouping of ops/project.project_3d's div_int so the float32
    # results agree bit-wise on interior cells; wall/window-edge cells are
    # garbage but never read by the Jacobi rhs.
    div = (
        -0.5
        * (
            (roll(vx, -1, 2) - roll(vx, 1, 2))
            + (roll(vy, -1, 1) - roll(vy, 1, 1))
            + (roll(vz, -1, 0) - roll(vz, 1, 0))
        )
        / nf
    )
    # Zero the wall faces so the returned div matches set_bnd(0, ·)'s
    # interior… faces are rewritten from interior by set_bnd; parity of
    # the *returned* div array is not required (it is solver-internal).
    obuf[:, :, :] = div

    out = pltpu.make_async_copy(obuf.at[pl.ds(off, slab)],
                                out_hbm.at[pl.ds(z0, slab)], sems.at[1])
    out.start()
    out.wait()


def _grad_kernel(vel_hbm, p_hbm, out_hbm, vbuf, pbuf, obuf, sems,
                 *, n: int, slab: int):
    i = pl.program_id(0)
    pw = slab + 2
    z0 = i * slab
    start = jnp.clip(z0 - 1, 0, n - pw)
    off = z0 - start

    vdma = pltpu.make_async_copy(vel_hbm.at[:, pl.ds(start, pw)], vbuf,
                                 sems.at[0])
    pdma = pltpu.make_async_copy(p_hbm.at[pl.ds(start, pw)], pbuf,
                                 sems.at[1])
    vdma.start()
    pdma.start()
    vdma.wait()
    pdma.wait()

    nf = jnp.asarray(n, jnp.float32)
    zg = start + jax.lax.broadcasted_iota(jnp.int32, (pw, n, n), 0)
    yg = jax.lax.broadcasted_iota(jnp.int32, (pw, n, n), 1)
    xg = jax.lax.broadcasted_iota(jnp.int32, (pw, n, n), 2)
    interior = (
        (zg >= 1) & (zg <= n - 2)
        & (yg >= 1) & (yg <= n - 2)
        & (xg >= 1) & (xg <= n - 2)
    )

    def roll(v, shift, axis):
        return pltpu.roll(v, shift % v.shape[axis], axis)

    pv = pbuf[:]
    grads = (
        0.5 * (roll(pv, -1, 2) - roll(pv, 1, 2)) * nf,   # ∂x → vx
        0.5 * (roll(pv, -1, 1) - roll(pv, 1, 1)) * nf,   # ∂y → vy
        0.5 * (roll(pv, -1, 0) - roll(pv, 1, 0)) * nf,   # ∂z → vz
    )

    def faces(b, v):
        sz = -1.0 if b == 3 else 1.0
        sy = -1.0 if b == 2 else 1.0
        sx = -1.0 if b == 1 else 1.0
        v = jnp.where(zg == 0, sz * roll(v, -1, 0),
                      jnp.where(zg == n - 1, sz * roll(v, 1, 0), v))
        v = jnp.where(yg == 0, sy * roll(v, -1, 1),
                      jnp.where(yg == n - 1, sy * roll(v, 1, 1), v))
        v = jnp.where(xg == 0, sx * roll(v, -1, 2),
                      jnp.where(xg == n - 1, sx * roll(v, 1, 2), v))
        return v

    for c in range(3):
        upd = jnp.where(interior, vbuf[c] - grads[c], vbuf[c])
        obuf[c, :, :, :] = faces(c + 1, upd)

    out = pltpu.make_async_copy(obuf.at[:, pl.ds(off, slab)],
                                out_hbm.at[:, pl.ds(z0, slab)], sems.at[2])
    out.start()
    out.wait()


def _pick_slab(n: int, windows: int):
    """Single-sweep kernels (z-halo 1): declared windows + ~4
    window-equivalents of live temporaries against an 80 MB budget.
    slab=4 keeps these viable at 512³ (1 MB planes), where the div/grad
    windows are the only full-width buffers in the projection."""
    plane = n * n * 4
    budget = 80 * 1024 * 1024
    for slab in (64, 32, 16, 8, 4):
        if n % slab:
            continue
        p = slab + 2
        if (windows + 4) * p * plane <= budget and p <= n:
            return slab
    return None


def project_advect_density_3d_pallas(vel, density, iters: int, dt: float, *,
                                     window: int = 1, n_sub: int = 1,
                                     solve_dtype=None, obst=None,
                                     interpret: bool = False,
                                     sweep_block: int = 1,
                                     damp: float = 1.0,
                                     dens_damp: float = 1.0,
                                     src=None):
    """Fused resident projection + density advection (optional static
    obstacle mask — the projection folds it into the solve coefficient +
    in-kernel mirror, the density phase slices the resident mask).

    Returns ``(vel', p, density')`` when the fused kernel applies, else
    ``None`` — the caller then runs the unfused projection + advect
    composition (which this kernel matches bitwise; see
    ``pallas.resident.project_advect_density_3d_resident``).
    """
    from .resident import (
        project_advect_density_3d_resident,
        project_advect_fits,
    )

    n = vel.shape[-1]
    sdt = jnp.dtype(jnp.float32 if solve_dtype is None else solve_dtype)
    fb = jnp.dtype(vel.dtype).itemsize
    if window < 1 or n_sub < 1 or n % 8 or n < 16:
        return None
    if project_advect_fits(n, window, n_sub, solve_bytes=sdt.itemsize,
                           field_bytes=fb, has_obst=obst is not None,
                           compiled=not interpret) is None:
        return None
    if not (interpret or pallas_supported()):
        return None
    return project_advect_density_3d_resident(
        vel, density, iters, dt, window=window, n_sub=n_sub,
        solve_dtype=solve_dtype, obst=obst, interpret=interpret,
        sweep_block=sweep_block, damp=damp, dens_damp=dens_damp,
        src=src,
    )


def full_step_3d_pallas(vel, density, iters: int, dt: float, *,
                        window: int = 1, n_sub: int = 1,
                        solve_dtype=None, interpret: bool = False,
                        sweep_block: int = 1, damp: float = 1.0,
                        dens_damp: float = 1.0):
    """Fused self-advection + resident projection + density advection —
    the whole hot step in ONE kernel (obstacle-free).

    Returns ``(vel', p, density')`` when the fused kernel applies, else
    ``None`` — the caller then runs the unfused (or two-phase fused)
    composition, which this kernel matches bitwise; see
    ``pallas.resident.full_step_3d_resident``.
    """
    from .resident import full_step_3d_resident, full_step_fits

    n = vel.shape[-1]
    sdt = jnp.dtype(jnp.float32 if solve_dtype is None else solve_dtype)
    fb = jnp.dtype(vel.dtype).itemsize
    if window < 1 or n_sub < 1 or n % 8 or n < 16:
        return None
    if full_step_fits(n, window, n_sub, solve_bytes=sdt.itemsize,
                      field_bytes=fb) is None:
        return None
    if not (interpret or pallas_supported()):
        return None
    return full_step_3d_resident(
        vel, density, iters, dt, window=window, n_sub=n_sub,
        solve_dtype=solve_dtype, interpret=interpret,
        sweep_block=sweep_block, damp=damp, dens_damp=dens_damp,
    )


def project_3d_pallas(vel, iters: int, block_iters: int = 10,
                      interpret: bool = False, obst=None,
                      solve_dtype=None, sweep_block: int = 1):
    """Projection with Pallas div/Jacobi/grad. Returns (vel, p).  Falls
    back to ``ops.project.project_3d`` when the kernels don't apply.

    ``obst`` (bool mask) is supported on the resident path: copy-through,
    gradient masking, and the ``set_bnd`` obstacle mirror all run
    in-kernel (the XLA oracle's faces-then-mirror order).

    ``solve_dtype``: narrow in-VMEM dtype for the resident solve's
    iterate/rhs volumes (see ``project_3d_resident``); ignored on the
    slab/XLA fallbacks, which stay f32.
    """
    from ..ops.project import project_3d

    n = vel.shape[-1]

    # Whole-projection-in-VMEM kernel: one HBM round trip regardless of
    # iteration count (pallas/resident.py) — strictly dominates the slab
    # pipeline whenever 6 volumes fit on-chip.
    from .resident import (
        project_3d_resident,
        resident_fits,
        resident_obstacle_fits,
    )

    # Obstacle variant: compiled Mosaic needs the calibrated spill-aware
    # model (round 5 — the f32 obstacle sweep spills ~9 volume-
    # equivalents on today's toolchain and OOMs at 128³; bf16 solve
    # buffers fit).  Interpret mode has no Mosaic/spill and keeps the
    # volume-count model so CPU tests exercise the kernel branch.
    if obst is None:
        ok = resident_fits(n, 6)
    elif interpret:
        ok = resident_fits(n, 7)
    else:
        ok = resident_obstacle_fits(
            n, 2 if solve_dtype == "bfloat16" else 4)
    if ok and (interpret or pallas_supported()):
        # The set_bnd obstacle mirror is fused into the kernel (after the
        # in-kernel face writes, the oracle's faces-then-mirror order).
        return project_3d_resident(vel, iters, obst=obst,
                                   interpret=interpret,
                                   solve_dtype=solve_dtype,
                                   sweep_block=sweep_block)

    if obst is not None:
        # Slab kernels are obstacle-free, and the ops-level resident
        # branch would hit the same spill class the gate above just
        # rejected — go straight to the XLA solve (correct, slower).
        return project_3d(vel, obst, iters, use_pallas=False)

    if vel.dtype != jnp.float32:
        # The slab kernels declare f32 scratch against storage-dtype HBM
        # operands (a trace-time dtype error otherwise); upcast at the
        # edge — narrow storage only pays off on the resident path.
        out_vel, p = project_3d_pallas(
            vel.astype(jnp.float32), iters, block_iters, interpret
        )
        return out_vel.astype(vel.dtype), p.astype(vel.dtype)

    slab_div = _pick_slab(n, windows=3 + 1)      # vbuf(3) + obuf(1)
    slab_grad = _pick_slab(n, windows=3 + 1 + 3)  # vbuf+pbuf+obuf
    supported = interpret or (pallas_supported() and n % 128 == 0)
    if not supported or slab_div is None or slab_grad is None:
        return project_3d(vel, None, iters, use_pallas=not interpret)

    div = pl.pallas_call(
        functools.partial(_div_kernel, n=n, slab=slab_div),
        grid=(n // slab_div,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n, n, n), vel.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, slab_div + 2, n, n), jnp.float32),
            pltpu.VMEM((slab_div + 2, n, n), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(vel)

    p = jacobi_3d_pallas(0, jnp.zeros_like(div), div, 1.0, 6.0, iters,
                         block_iters, interpret=interpret)

    out_vel = pl.pallas_call(
        functools.partial(_grad_kernel, n=n, slab=slab_grad),
        grid=(n // slab_grad,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((3, n, n, n), vel.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, slab_grad + 2, n, n), jnp.float32),
            pltpu.VMEM((slab_grad + 2, n, n), jnp.float32),
            pltpu.VMEM((3, slab_grad + 2, n, n), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(vel, p)

    return out_vel, p
