"""Windowed-trilinear semi-Lagrangian advection (Pallas TPU kernel).

Implements the same math as ``ops.advect.advect_multi_3d`` with
``window=K`` — the trilinear backtrace sample expressed as a
``(2K+1)³``-term sum of statically shifted fields weighted by per-cell hat
functions (exact while |displacement| < K; displacement is clamped to K).

The XLA formulation materializes every ``jnp.roll`` through HBM
(~(2K+1)³ full-array round trips); here each grid program DMAs a z-slab
(+K halo) of the advected fields and the velocity into VMEM and runs the
whole accumulation on-chip — ONE HBM pass regardless of K.

The kernel writes the raw interpolated values; the caller applies the
fresh-zero-buffer masking + ``set_bnd_3d`` (ops/advect._mask_and_bnd_3d),
matching the reference's advect semantics (FluidSim.cs:1125-1186).
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


def _advect_kernel(fields_hbm, vel_hbm, out_hbm, fbuf, vbuf, obuf, sems,
                   *, n: int, n_fields: int, slab: int, k_win: int,
                   dt0: float):
    i = pl.program_id(0)
    p = slab + 2 * k_win
    z0 = i * slab
    start = jnp.clip(z0 - k_win, 0, n - p)
    off = z0 - start

    in_dma = pltpu.make_async_copy(
        fields_hbm.at[:, pl.ds(start, p)], fbuf, sems.at[0]
    )
    vel_dma = pltpu.make_async_copy(
        vel_hbm.at[:, pl.ds(start, p)], vbuf, sems.at[1]
    )
    in_dma.start()
    vel_dma.start()
    in_dma.wait()
    vel_dma.wait()

    dt0f = jnp.asarray(dt0, jnp.float32)
    kf = jnp.asarray(k_win, jnp.float32)

    zi = (start + jax.lax.broadcasted_iota(jnp.int32, (p, n, n), 0)).astype(
        jnp.float32
    )
    yi = jax.lax.broadcasted_iota(jnp.int32, (p, n, n), 1).astype(jnp.float32)
    xi = jax.lax.broadcasted_iota(jnp.int32, (p, n, n), 2).astype(jnp.float32)

    def frac(coord, v):
        t = coord - dt0f * v
        t = jnp.maximum(t, 0.5)
        t = jnp.minimum(t, jnp.asarray(n - 1.5, jnp.float32))
        t = jnp.clip(t, coord - kf, coord + kf)
        return t - coord

    fx = frac(xi, vbuf[0])
    fy = frac(yi, vbuf[1])
    fz = frac(zi, vbuf[2])

    # Nested fori_loops with *dynamic* pltpu.roll shifts keep the program
    # size O(1) in K (a statically unrolled (2K+1)³ accumulation makes
    # Mosaic compile times explode).  z/y rolls hoist out of the inner
    # loops so each term costs one lane-roll + weight + fma per field.
    w_sz = 2 * k_win + 1
    fields_v = tuple(fbuf[c] for c in range(n_fields))

    def hat(f, d):
        return jnp.maximum(0.0, 1.0 - jnp.abs(f - d.astype(jnp.float32)))

    def outer(iz, accs):
        dz = iz - k_win
        wz = hat(fz, dz)
        shifted_z = tuple(pltpu.roll(f, (-dz) % p, 0) for f in fields_v)

        def mid(iy, accs):
            dy = iy - k_win
            wzy = wz * hat(fy, dy)
            shifted_zy = tuple(pltpu.roll(f, (-dy) % n, 1) for f in shifted_z)

            # Inner x loop unrolled statically: lane rolls with static
            # shifts vectorize better than dynamic rotates, and 2K+1
            # static terms keep program size tame.
            for dx in range(-k_win, k_win + 1):
                w = wzy * hat(fx, jnp.int32(dx))
                accs = tuple(
                    acc + w * pltpu.roll(f, (-dx) % n, 2)
                    for acc, f in zip(accs, shifted_zy)
                )
            return accs

        return jax.lax.fori_loop(0, w_sz, mid, accs)

    accs = jax.lax.fori_loop(
        0, w_sz, outer,
        tuple(jnp.zeros((p, n, n), jnp.float32) for _ in range(n_fields)),
    )
    for c in range(n_fields):
        obuf[c, :, :, :] = accs[c]

    out_dma = pltpu.make_async_copy(
        obuf.at[:, pl.ds(off, slab)], out_hbm.at[:, pl.ds(z0, slab)],
        sems.at[2],
    )
    out_dma.start()
    out_dma.wait()


def _pick_slab(n: int, n_fields: int, k_win: int):
    plane = n * n * 4
    # Declared scratch must leave VMEM headroom for the kernel's live
    # temporaries (fx/fy/fz, rolled copies, the accumulator) — roughly
    # 6 windows' worth — so cap declared buffers at ~7 MB.
    budget = 7 * 1024 * 1024
    for slab in (32, 16, 8):
        if n % slab:
            continue
        p = slab + 2 * k_win
        need = (2 * n_fields + 3) * p * plane  # fbuf + obuf(p) + vel
        if need <= budget and p <= n:
            return slab
    return None


def advect_multi_3d_pallas(bs, fields, vel, dt: float, obst=None,
                           window: int = 2, interpret: bool = False):
    """Pallas drop-in for ``ops.advect.advect_multi_3d`` (windowed mode).

    Falls back to the XLA path when unsupported (non-TPU backend, grids
    whose lane dim isn't 128-aligned, or VMEM-infeasible shapes).
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU
    tests; skips the backend check, keeps the shape checks).
    """
    from ..ops.advect import _mask_and_bnd_3d, advect_multi_3d

    n = fields.shape[-1]
    n_fields = fields.shape[0]
    slab = _pick_slab(n, n_fields, window)
    supported = interpret or (pallas_supported() and n % 128 == 0)
    if not supported or slab is None:
        return advect_multi_3d(bs, fields, vel, dt, obst, window)

    p = slab + 2 * window
    dt0 = float(np.float32(dt) * np.float32(n - 2))

    kernel = functools.partial(
        _advect_kernel, n=n, n_fields=n_fields, slab=slab, k_win=window,
        dt0=dt0,
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
            pltpu.VMEM((n_fields, p, n, n), jnp.float32),
            pltpu.VMEM((3, p, n, n), jnp.float32),
            pltpu.VMEM((n_fields, p, n, n), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(fields, vel)

    return jnp.stack(
        [
            _mask_and_bnd_3d(b, vals[c], fields[c], obst)
            for c, b in enumerate(bs)
        ]
    )
