"""Semi-Lagrangian advection.

Reference: ``AdvectJob`` (FluidSim.cs:1125-1186) + ``AdvectWithJobs``
(FluidSim.cs:1523-1576).  Backtrace ``x = i − dt0·u`` with
``dt0 = dt·(N−2)``, clamp to ``[0.5, N−1.5]``, bilinear interpolation.
The output buffer is freshly zero-allocated per call (FluidSim.cs:1529), so
wall cells and obstacle cells come out 0 before ``set_bnd`` runs — including
density at obstacles (the "leave unchanged" comment at FluidSim.cs:1154 is
dead code against a zero buffer).

On TPU the bilinear/trilinear sample is a vectorized gather; the whole op
fuses into the step program.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .boundary import set_bnd_2d, set_bnd_3d


def _backtrace_1d(coord, vel, dt0, n):
    """Clamped backtrace along one axis: returns (i0, frac) with
    i0 = floor(clamp(coord - dt0*vel, 0.5, n-1.5))."""
    x = coord - dt0 * vel
    x = jnp.where(x < 0.5, 0.5, x)
    x = jnp.where(x > n - 1.5, jnp.asarray(n - 1.5, x.dtype), x)
    i0 = jnp.floor(x).astype(jnp.int32)
    return i0, x - i0.astype(x.dtype)


def advect_2d(b: int, d0, vel_x, vel_y, dt: float, obst):
    """Exact reference advection. Arrays are ``[y, x]``; ``b`` static."""
    n = d0.shape[0]
    dt0 = np.float32(dt) * np.float32(n - 2)

    jj, ii = jnp.meshgrid(
        jnp.arange(n, dtype=d0.dtype), jnp.arange(n, dtype=d0.dtype),
        indexing="ij",
    )
    i0, s1 = _backtrace_1d(ii, vel_x, dt0, n)
    j0, t1 = _backtrace_1d(jj, vel_y, dt0, n)
    s0 = 1.0 - s1
    t0 = 1.0 - t1
    i1 = i0 + 1
    j1 = j0 + 1

    # Bilinear sample, reference term order (FluidSim.cs:1183-1184).
    val = s0 * (t0 * d0[j0, i0] + t1 * d0[j1, i0]) + s1 * (
        t0 * d0[j0, i1] + t1 * d0[j1, i1]
    )

    # Fresh zero buffer semantics: only interior non-obstacle cells written.
    out = jnp.zeros_like(d0)
    core = (slice(1, -1), slice(1, -1))
    out = out.at[core].set(jnp.where(obst[core], 0.0, val[core]))
    return set_bnd_2d(b, out, obst)


def advect_3d(b: int, d0, vel, dt: float, obst):
    """Trilinear semi-Lagrangian advection on a ``[z, y, x]`` grid.

    ``vel`` is ``(3, N, N, N)`` with components (vx, vy, vz).  Same clamped
    backtrace and zero-buffer semantics as 2D, promoted to three axes.
    """
    n = d0.shape[-1]
    dt0 = np.float32(dt) * np.float32(n - 2)

    kk, jj, ii = jnp.meshgrid(
        jnp.arange(n, dtype=d0.dtype),
        jnp.arange(n, dtype=d0.dtype),
        jnp.arange(n, dtype=d0.dtype),
        indexing="ij",
    )
    i0, s1 = _backtrace_1d(ii, vel[0], dt0, n)
    j0, t1 = _backtrace_1d(jj, vel[1], dt0, n)
    k0, u1 = _backtrace_1d(kk, vel[2], dt0, n)
    s0, t0, u0 = 1.0 - s1, 1.0 - t1, 1.0 - u1
    i1, j1, k1 = i0 + 1, j0 + 1, k0 + 1

    def sample(k, j, i):
        return d0[k, j, i]

    val = u0 * (
        s0 * (t0 * sample(k0, j0, i0) + t1 * sample(k0, j1, i0))
        + s1 * (t0 * sample(k0, j0, i1) + t1 * sample(k0, j1, i1))
    ) + u1 * (
        s0 * (t0 * sample(k1, j0, i0) + t1 * sample(k1, j1, i0))
        + s1 * (t0 * sample(k1, j0, i1) + t1 * sample(k1, j1, i1))
    )

    out = jnp.zeros_like(d0)
    core = (slice(1, -1),) * 3
    out = out.at[core].set(jnp.where(obst[core], 0.0, val[core]))
    return set_bnd_3d(b, out, obst)
