"""Spatial domain decomposition over a TPU mesh.

The reference is single-process/single-node; its only "communication" is
managed↔native buffer copies (SURVEY.md §2, L1).  The TPU-native scaling
axis (BASELINE config 5: 512³ on v5e-8) is a **slab decomposition**: the
voxel grid is sharded along z (axis 0 of ``[z, y, x]`` fields) across a 1-D
``jax.sharding.Mesh``, and every stencil's neighbor access compiles to an
ICI halo exchange.

Two paths:

* this module — ``pjit``-style: jit the *unchanged* solver with sharded
  inputs/outputs and let XLA insert the collectives for the shifted slices.
  Zero solver changes; the compiler pipelines the edge-plane exchanges.
* ``halo.py`` — explicit ``shard_map`` + ``ppermute`` edge-slab exchange,
  the path the multi-chip Pallas kernels plug into.

z is the **leading** axis precisely so the sharded dimension is not one of
the TPU tile dimensions (sublane/lane are y, x) — slab boundaries then cut
between tiles, never through them.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SimConfig
from ..state import FluidState


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "z") -> Mesh:
    """1-D device mesh for slab decomposition."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def state_sharding(mesh: Mesh, axis_name: str = "z"):
    """Shardings for each FluidState leaf: fields split along the z axis
    (axis 0 of a [z, y, x] field; axis 1 of the (3, z, y, x) velocity)."""
    field = NamedSharding(mesh, P(axis_name, None, None))
    vel = NamedSharding(mesh, P(None, axis_name, None, None))
    scalar = NamedSharding(mesh, P())
    return FluidState(
        density=field,
        velocity=vel,
        pressure=field,
        obstacles=field,
        step=scalar,
        time=scalar,
    )


def shard_state(state: FluidState, mesh: Mesh, axis_name: str = "z") -> FluidState:
    """Place an (unsharded) state onto the mesh with slab sharding."""
    sh = state_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(jax.device_put, state, sh)


def sharded_step_fn(cfg: SimConfig, mesh: Mesh, axis_name: str = "z",
                    n_substeps: int = 1, with_source: bool = True):
    """Compile the full 3D step for a slab-sharded state.

    The solver body is *identical* to the single-device one — XLA lowers
    the stencil shifts on sharded arrays to ICI collective-permutes of the
    single-plane halos.  ``n_substeps > 1`` rolls steps into one program
    via ``lax.scan`` so halo exchanges pipeline with compute.
    """
    from ..models.stable3d import simulate_step_3d
    from ..scene.sources import apply_custom_source

    if cfg.ndim != 3:
        raise ValueError("sharded_step_fn is for the 3D engine")
    sh = state_sharding(mesh, axis_name)
    dt = np.float32(cfg.effective_params()[0])

    def one(state, _):
        if with_source and cfg.enable_custom_source:
            t = state.time + dt
            density, velocity = apply_custom_source(
                state.density, state.velocity, cfg, t
            )
            state = state.replace(density=density, velocity=velocity)
        return simulate_step_3d(state, cfg), None

    def body(state):
        if n_substeps == 1:
            return one(state, None)[0]
        return jax.lax.scan(one, state, None, length=n_substeps)[0]

    return jax.jit(body, in_shardings=(sh,), out_shardings=sh)
