"""Fluid state pytree.

The reference keeps seven flat ``float[N*N]`` C# arrays plus a ``bool[N*N]``
obstacle mask (FluidSim.cs:112-147, 225-232).  Here the live state is a single
pytree of device-resident ``jnp`` arrays; the ``velocityX0/Y0`` scratch
buffers of the reference do not exist (the functional step materialises
intermediates inside one XLA program instead).

2D arrays are indexed ``[y, x]`` (row-major, matching the reference's flat
``IX(x, y) = x + y*size``); 3D arrays are ``[z, y, x]``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .config import SimConfig


@jax.tree_util.register_pytree_node_class
class FluidState:
    """density / velocity / pressure fields + static obstacle mask.

    ``velocity`` is a single ``(ndim, *grid)`` array, component order
    (vx, vy[, vz]) — component c flows along grid axis ``ndim-1-c``.
    ``obstacles`` is a bool array carried in the pytree (it participates in
    sharding) but is not differentiated.
    """

    __slots__ = ("density", "velocity", "pressure", "obstacles", "step", "time")

    def __init__(self, density, velocity, pressure, obstacles, step, time):
        self.density = density
        self.velocity = velocity
        self.pressure = pressure
        self.obstacles = obstacles
        self.step = step
        self.time = time

    # -- pytree protocol ------------------------------------------------
    def tree_flatten(self):
        children = (
            self.density,
            self.velocity,
            self.pressure,
            self.obstacles,
            self.step,
            self.time,
        )
        return children, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- convenience ----------------------------------------------------
    @property
    def grid_shape(self) -> Tuple[int, ...]:
        return self.density.shape

    @property
    def ndim(self) -> int:
        return self.density.ndim

    @property
    def vx(self):
        return self.velocity[0]

    @property
    def vy(self):
        return self.velocity[1]

    @property
    def vz(self):
        return self.velocity[2]

    def replace(self, **kw) -> "FluidState":
        fields = {k: getattr(self, k) for k in self.__slots__}
        fields.update(kw)
        return FluidState(**fields)

    def __repr__(self):
        return (
            f"FluidState(grid={self.grid_shape}, ndim={self.ndim}, "
            f"dtype={self.density.dtype})"
        )


def zeros_state(cfg: SimConfig, obstacles=None) -> FluidState:
    """Allocate an all-zero state for ``cfg`` (FluidSim.cs:225-232 analog)."""
    shape = cfg.grid_shape
    dtype = jnp.dtype(cfg.dtype)
    if obstacles is None:
        obstacles = jnp.zeros(shape, dtype=bool)
    else:
        obstacles = jnp.asarray(obstacles, dtype=bool)
        if obstacles.shape != shape:
            raise ValueError(
                f"obstacle mask shape {obstacles.shape} != grid {shape}"
            )
    return FluidState(
        density=jnp.zeros(shape, dtype),
        velocity=jnp.zeros((cfg.ndim,) + shape, dtype),
        pressure=jnp.zeros(shape, dtype),
        obstacles=obstacles,
        step=jnp.zeros((), jnp.int32),
        time=jnp.zeros((), jnp.float32),
    )
