"""Body forces and obstacle interaction.

* ``enforce_obstacle_boundaries_2d`` — exact reference semantics
  (FluidSim.cs:617-673): zero velocity inside interior obstacle cells, then
  Reynolds-adaptive drag on each fluid cell adjacent to an obstacle cell.
  The reference applies drag sequentially per (obstacle cell, neighbor
  direction) pair in scan order; events on distinct cells commute (each
  event reads/writes only its target), and for a single target cell the
  events land in the fixed order left-obstacle, below, above, right — so
  four masked vector passes in that order reproduce the float32 result
  exactly.
* ``apply_turbulent_noise`` — the reference perturbs velocity with Unity's
  ``Mathf.PerlinNoise`` (FluidSim.cs:675-701).  Unity's noise table is not
  public, so bit parity is impossible; this uses a classic permutation-table
  Perlin with the same structure: ``v += (noise−0.5) · 0.1 · |v|`` at
  frequency 0.05.
* ``buoyancy_force`` / ``vorticity_confinement_3d`` — 3D-only physics from
  BASELINE configs 2–3 (no reference counterpart).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .boundary import interior_mask


def _shift_no_wrap(mask, delta, axis):
    """result[t] = mask[t + delta] along ``axis``; out-of-range = False."""
    pad = [(0, 0)] * mask.ndim
    if delta > 0:
        pad[axis] = (0, delta)
        sl = [slice(None)] * mask.ndim
        sl[axis] = slice(delta, None)
    else:
        pad[axis] = (-delta, 0)
        sl = [slice(None)] * mask.ndim
        sl[axis] = slice(None, delta)
    return jnp.pad(mask, pad)[tuple(sl)]


def enforce_obstacle_boundaries_2d(vel_x, vel_y, obst, cell_size: float,
                                   viscosity: float):
    """FluidSim.cs:617-673, vectorized with exact event ordering."""
    interior = interior_mask(obst.shape)
    obst_int = obst & interior

    vel_x = jnp.where(obst_int, 0.0, vel_x)
    vel_y = jnp.where(obst_int, 0.0, vel_y)

    L = jnp.asarray(np.float32(cell_size), vel_x.dtype)
    visc = jnp.asarray(
        max(np.float32(viscosity), np.float32(1e-5)), vel_x.dtype
    )
    lo = jnp.asarray(np.float32(0.8), vel_x.dtype)
    span = jnp.asarray(np.float32(0.98) - np.float32(0.8), vel_x.dtype)

    # Per-target-cell event order: obstacle to the left (x−1), below (y−1),
    # above (y+1), right (x+1) — derived from the reference's
    # (x-outer, y-inner, direction) scan order.
    for delta, axis in ((-1, 1), (-1, 0), (1, 0), (1, 1)):
        obst_nbr = _shift_no_wrap(obst_int, delta, axis)
        mask = interior & (~obst) & obst_nbr
        u = jnp.sqrt(vel_x * vel_x + vel_y * vel_y)
        re = (u * L) / visc
        factor = lo + span * (1.0 - jnp.exp(-re * 0.01))
        factor = jnp.where(mask, factor, 1.0)
        vel_x = vel_x * factor
        vel_y = vel_y * factor
    return vel_x, vel_y


# ----------------------------------------------------------------------
# Perlin turbulence (FluidSim.cs:675-701)
# ----------------------------------------------------------------------

_PERM = np.random.RandomState(1337).permutation(256)
_PERM = np.concatenate([_PERM, _PERM]).astype(np.int32)
_GRADS = np.array(
    [[1, 1], [-1, 1], [1, -1], [-1, -1], [1, 0], [-1, 0], [0, 1], [0, -1]],
    dtype=np.float32,
)


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def perlin_2d(x, y):
    """Classic Perlin gradient noise, output ≈ [0, 1] like Mathf.PerlinNoise."""
    perm = jnp.asarray(_PERM)
    grads = jnp.asarray(_GRADS)

    xi = jnp.floor(x).astype(jnp.int32)
    yi = jnp.floor(y).astype(jnp.int32)
    xf = x - xi.astype(x.dtype)
    yf = y - yi.astype(y.dtype)
    xi = xi & 255
    yi = yi & 255

    def grad_dot(ix, iy, dx, dy):
        h = perm[perm[ix] + iy] & 7
        g = grads[h]
        return g[..., 0] * dx + g[..., 1] * dy

    n00 = grad_dot(xi, yi, xf, yf)
    n10 = grad_dot(xi + 1, yi, xf - 1.0, yf)
    n01 = grad_dot(xi, yi + 1, xf, yf - 1.0)
    n11 = grad_dot(xi + 1, yi + 1, xf - 1.0, yf - 1.0)

    u = _fade(xf)
    v = _fade(yf)
    nx0 = n00 + u * (n10 - n00)
    nx1 = n01 + u * (n11 - n01)
    n = nx0 + v * (nx1 - nx0)
    return 0.5 * (n + 1.0)


def apply_turbulent_noise_2d(vel_x, vel_y, noise_scale: float = 0.1,
                             frequency: float = 0.05):
    """FluidSim.cs:675-701: v += (perlin − 0.5) · noise_scale · |v| on the
    interior, with transposed coordinates for the y component."""
    n = vel_x.shape[0]
    jj, ii = jnp.meshgrid(
        jnp.arange(n, dtype=vel_x.dtype),
        jnp.arange(n, dtype=vel_x.dtype),
        indexing="ij",
    )
    u = jnp.sqrt(vel_x * vel_x + vel_y * vel_y)
    noise_x = perlin_2d(ii * frequency, jj * frequency) - 0.5
    noise_y = perlin_2d(jj * frequency, ii * frequency) - 0.5
    interior = interior_mask(vel_x.shape)
    strength = noise_scale * u
    vel_x = jnp.where(interior, vel_x + noise_x * strength, vel_x)
    vel_y = jnp.where(interior, vel_y + noise_y * strength, vel_y)
    return vel_x, vel_y


# ----------------------------------------------------------------------
# 3D-only forces (BASELINE configs 2-3)
# ----------------------------------------------------------------------

def buoyancy_force(vel, density, dt: float, buoyancy: float,
                   ambient: float = 0.0, gravity: float = 0.0):
    """Upward force ∝ (density − ambient) on the y component (axis 1 of a
    [z, y, x] grid); optional downward gravity ∝ density."""
    accel = buoyancy * (density - ambient) - gravity * density
    return vel.at[1].add(dt * accel)


def vorticity_confinement_3d(vel, dt: float, eps: float):
    """Fedkiw-style vorticity confinement: v += dt·ε·(N̂ × ω) with
    ω = ∇×v and N = ∇|ω| (central differences, zero-padded borders)."""

    def ddx(f, axis):
        up = _shift_arr(f, 1, axis)
        dn = _shift_arr(f, -1, axis)
        return 0.5 * (up - dn)

    in_dtype = vel.dtype
    if in_dtype != jnp.float32:
        vel = vel.astype(jnp.float32)  # |ω| and N̂ need f32 accumulation
    vx, vy, vz = vel[0], vel[1], vel[2]
    # ω = ∇×v on the [z, y, x] grid: x derivative = axis 2, y = 1, z = 0.
    wx = ddx(vz, 1) - ddx(vy, 0)
    wy = ddx(vx, 0) - ddx(vz, 2)
    wz = ddx(vy, 2) - ddx(vx, 1)
    wmag = jnp.sqrt(wx * wx + wy * wy + wz * wz)

    nx = ddx(wmag, 2)
    ny = ddx(wmag, 1)
    nz = ddx(wmag, 0)
    nlen = jnp.sqrt(nx * nx + ny * ny + nz * nz) + 1e-5
    nx, ny, nz = nx / nlen, ny / nlen, nz / nlen

    fx = ny * wz - nz * wy
    fy = nz * wx - nx * wz
    fz = nx * wy - ny * wx

    scale = dt * eps
    return jnp.stack(
        [vx + scale * fx, vy + scale * fy, vz + scale * fz]
    ).astype(in_dtype)


def _shift_arr(f, delta, axis):
    """result[t] = f[t + delta]; zero beyond the border."""
    pad = [(0, 0)] * f.ndim
    sl = [slice(None)] * f.ndim
    if delta > 0:
        pad[axis] = (0, delta)
        sl[axis] = slice(delta, None)
    else:
        pad[axis] = (-delta, 0)
        sl[axis] = slice(None, delta)
    return jnp.pad(f, pad)[tuple(sl)]


def enforce_obstacle_boundaries_3d(vel, obst, cell_size: float,
                                   viscosity: float):
    """3D generalization of FluidSim.cs:617-673: zero velocity inside
    interior obstacle cells, Reynolds-adaptive drag on the 6 face-adjacent
    fluid neighbors (one masked pass per direction)."""
    interior = interior_mask(obst.shape)
    obst_int = obst & interior
    vel = jnp.where(obst_int[None], 0.0, vel)

    L = jnp.asarray(np.float32(cell_size), vel.dtype)
    visc = jnp.asarray(max(np.float32(viscosity), np.float32(1e-5)), vel.dtype)
    lo = jnp.asarray(np.float32(0.8), vel.dtype)
    span = jnp.asarray(np.float32(0.98) - np.float32(0.8), vel.dtype)

    for axis in (2, 1, 0):
        for delta in (-1, 1):
            obst_nbr = _shift_no_wrap(obst_int, delta, axis)
            mask = interior & (~obst) & obst_nbr
            u = jnp.sqrt(jnp.sum(vel * vel, axis=0))
            re = (u * L) / visc
            factor = lo + span * (1.0 - jnp.exp(-re * 0.01))
            factor = jnp.where(mask, factor, 1.0)
            vel = vel * factor[None]
    return vel


def perlin_3d(x, y, z):
    """Classic 3D Perlin gradient noise, output ≈ [0, 1]."""
    perm = jnp.asarray(_PERM)
    g3 = jnp.asarray(_GRADS3)

    xi = jnp.floor(x).astype(jnp.int32)
    yi = jnp.floor(y).astype(jnp.int32)
    zi = jnp.floor(z).astype(jnp.int32)
    xf = x - xi.astype(x.dtype)
    yf = y - yi.astype(y.dtype)
    zf = z - zi.astype(z.dtype)
    xi &= 255
    yi &= 255
    zi &= 255

    def grad_dot(ix, iy, iz, dx, dy, dz):
        h = perm[perm[perm[ix] + iy] + iz] % 12
        g = g3[h]
        return g[..., 0] * dx + g[..., 1] * dy + g[..., 2] * dz

    u, v, w = _fade(xf), _fade(yf), _fade(zf)

    def lerp(a, b, t):
        return a + t * (b - a)

    n000 = grad_dot(xi, yi, zi, xf, yf, zf)
    n100 = grad_dot(xi + 1, yi, zi, xf - 1, yf, zf)
    n010 = grad_dot(xi, yi + 1, zi, xf, yf - 1, zf)
    n110 = grad_dot(xi + 1, yi + 1, zi, xf - 1, yf - 1, zf)
    n001 = grad_dot(xi, yi, zi + 1, xf, yf, zf - 1)
    n101 = grad_dot(xi + 1, yi, zi + 1, xf - 1, yf, zf - 1)
    n011 = grad_dot(xi, yi + 1, zi + 1, xf, yf - 1, zf - 1)
    n111 = grad_dot(xi + 1, yi + 1, zi + 1, xf - 1, yf - 1, zf - 1)

    nx00 = lerp(n000, n100, u)
    nx10 = lerp(n010, n110, u)
    nx01 = lerp(n001, n101, u)
    nx11 = lerp(n011, n111, u)
    nxy0 = lerp(nx00, nx10, v)
    nxy1 = lerp(nx01, nx11, v)
    return 0.5 * (lerp(nxy0, nxy1, w) + 1.0)


_GRADS3 = np.array(
    [[1, 1, 0], [-1, 1, 0], [1, -1, 0], [-1, -1, 0],
     [1, 0, 1], [-1, 0, 1], [1, 0, -1], [-1, 0, -1],
     [0, 1, 1], [0, -1, 1], [0, 1, -1], [0, -1, -1]],
    dtype=np.float32,
)


def apply_turbulent_noise_3d(vel, noise_scale: float = 0.1,
                             frequency: float = 0.05):
    """3D generalization of FluidSim.cs:675-701: perturb each velocity
    component with Perlin noise scaled by the local speed."""
    n = vel.shape[-1]
    kk, jj, ii = jnp.meshgrid(
        jnp.arange(n, dtype=vel.dtype),
        jnp.arange(n, dtype=vel.dtype),
        jnp.arange(n, dtype=vel.dtype),
        indexing="ij",
    )
    speed = jnp.sqrt(jnp.sum(vel * vel, axis=0))
    strength = noise_scale * speed
    f = frequency
    nx = perlin_3d(ii * f, jj * f, kk * f) - 0.5
    ny = perlin_3d(jj * f, kk * f, ii * f) - 0.5
    nz = perlin_3d(kk * f, ii * f, jj * f) - 0.5
    interior = interior_mask(speed.shape)
    delta = jnp.stack([nx, ny, nz]) * strength[None]
    return jnp.where(interior[None], vel + delta, vel)
