"""Explicit halo exchange over ICI (``shard_map`` + ``ppermute``).

The slab-decomposed Jacobi sweep needs each shard's top/bottom neighbor
plane every iteration.  This module implements the exchange explicitly —
one ``ppermute`` up, one down, per iteration — which is the structure the
multi-chip Pallas kernels (RDMA edge-plane sends) drop into, and a
reference for what XLA's auto-partitioner must match.

All functions here run **inside** ``shard_map`` over a 1-D mesh axis; the
global z extent is ``n_dev · local_z``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def halo_exchange_z(x_local, axis_name: str = "z"):
    """Return (below, above): the neighbor edge planes of this shard.

    ``below[j,y,x]`` is the last z-plane of the shard below (or zeros at the
    global bottom); ``above`` the first plane of the shard above (zeros at
    the global top).  Single-plane ``ppermute`` in each direction — 2·N²·4
    bytes per step over ICI.
    """
    n_dev = jax.lax.axis_size(axis_name)
    top_plane = x_local[-1:]      # sent upward (to rank+1)
    bot_plane = x_local[:1]       # sent downward (to rank-1)
    up = [(i, i + 1) for i in range(n_dev - 1)]
    down = [(i + 1, i) for i in range(n_dev - 1)]
    below = jax.lax.ppermute(top_plane, axis_name, up)      # from rank-1
    above = jax.lax.ppermute(bot_plane, axis_name, down)    # from rank+1
    return below, above


def _local_sweep(b, x_local, x0_local, below, above, a, c, rank, n_dev):
    """One Jacobi update on a z-slab given neighbor halo planes.

    Wall faces (global z=0/N−1, all y/x walls) are rewritten from interior
    values exactly like the single-device ``set_bnd_3d`` face pass, with
    the mirror-negate sign for the velocity component normal to each wall
    (``b``: 0 scalar, 1 = vx, 2 = vy, 3 = vz).
    """
    sz = -1.0 if b == 3 else 1.0
    sy = -1.0 if b == 2 else 1.0
    sx = -1.0 if b == 1 else 1.0
    lz = x_local.shape[0]
    xp = jnp.concatenate([below, x_local, above], axis=0)  # (lz+2, N, N)

    nbr = (
        ((xp[1:-1, 1:-1, 2:] + xp[1:-1, 1:-1, :-2])
         + (xp[1:-1, 2:, 1:-1] + xp[1:-1, :-2, 1:-1]))
        + (xp[2:, 1:-1, 1:-1] + xp[:-2, 1:-1, 1:-1])
    )
    upd = (x0_local[:, 1:-1, 1:-1] + a * nbr) / c
    out = jax.lax.pad(upd, jnp.asarray(0.0, x_local.dtype),
                      [(0, 0, 0), (1, 1, 0), (1, 1, 0)])

    # Wall faces in the exact set_bnd_3d order (z → y → x).
    # Global z faces exist only on the first/last shard.
    is_bottom = rank == 0
    is_top = rank == n_dev - 1
    zidx = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
    zlow = sz * jnp.concatenate([out[1:2], out[2:], out[-1:]], axis=0)
    zhigh = sz * jnp.concatenate([out[:1], out[:-2], out[-2:-1]], axis=0)
    out = jnp.where(jnp.logical_and(is_bottom, zidx == 0), zlow, out)
    out = jnp.where(jnp.logical_and(is_top, zidx == lz - 1), zhigh, out)

    n = out.shape[1]
    yidx = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
    ylow = sy * jnp.concatenate([out[:, 1:2], out[:, 2:], out[:, -1:]],
                                axis=1)
    yhigh = sy * jnp.concatenate([out[:, :1], out[:, :-2], out[:, -2:-1]],
                                 axis=1)
    out = jnp.where(yidx == 0, ylow,
                    jnp.where(yidx == n - 1, yhigh, out))
    xidx = jax.lax.broadcasted_iota(jnp.int32, out.shape, 2)
    xlow = sx * jnp.concatenate([out[:, :, 1:2], out[:, :, 2:],
                                 out[:, :, -1:]], axis=2)
    xhigh = sx * jnp.concatenate([out[:, :, :1], out[:, :, :-2],
                                  out[:, :, -2:-1]], axis=2)
    out = jnp.where(xidx == 0, xlow,
                    jnp.where(xidx == n - 1, xhigh, out))
    return out


def jacobi_3d_sharded(x, x0, a: float, c: float, iters: int,
                      mesh: Mesh, axis_name: str = "z", b: int = 0):
    """Slab-sharded fixed-rhs Jacobi with explicit per-iteration halo
    exchange.  ``x``/``x0`` are global ``[z, y, x]`` arrays (sharded or
    not); result matches the no-obstacle single-device ``jacobi_3d``.

    ``b`` selects the wall rule exactly as in ``set_bnd_3d`` (0 scalar,
    1/2/3 = velocity component normal to the x/y/z walls).
    """
    spec = P(axis_name, None, None)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec, spec), out_specs=spec,
    )
    def run(x_local, x0_local):
        rank = jax.lax.axis_index(axis_name)
        n_dev = jax.lax.axis_size(axis_name)

        def body(_, xl):
            below, above = halo_exchange_z(xl, axis_name)
            return _local_sweep(b, xl, x0_local, below, above, a, c,
                                rank, n_dev)

        return jax.lax.fori_loop(0, iters, body, x_local)

    return run(x, x0)
