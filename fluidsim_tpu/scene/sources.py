"""Continuous emitters and point injectors.

Reference: ``UpdateCustomSource`` (FluidSim.cs:485-533) and
``AddDensity``/``AddVelocity`` (FluidSim.cs:723-738).

The reference loops over the emitter's bounding box and calls the point
injectors per cell; every cell it touches satisfies ``dist ≤ radius``, so a
full-grid masked add is float32-identical and fuses into the jitted step.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import SimConfig


def _cell_centers(shape, dtype):
    """Per-axis coordinate grids in (x, y[, z]) order for [y,x]/[z,y,x] arrays."""
    n = shape[-1]
    ranges = [jnp.arange(s, dtype=dtype) for s in shape]
    grids = jnp.meshgrid(*ranges, indexing="ij")  # [y,x] or [z,y,x] order
    return tuple(reversed(grids))  # (x, y[, z])


def pulse_scale(t, rate: float):
    """|sin(t · rate · π)| (FluidSim.cs:492-494)."""
    return jnp.abs(jnp.sin(t * np.float32(rate) * np.float32(np.pi)))


def apply_custom_source(density, vel, cfg: SimConfig, t):
    """One frame of the continuous emitter; no-op config ⇒ identity.

    ``t`` is the elapsed time used for pulsing (the reference uses
    wall-clock ``elapsedTime``, FluidSim.cs:394; the engine feeds sim time).
    Returns (density, vel).
    """
    if not cfg.enable_custom_source:
        return density, vel

    n = cfg.current_size
    dtype = density.dtype
    nf = np.float32(n)
    res_mult = np.float32(cfg.resolution_multiplier)

    source = tuple(np.float32(p) * nf for p in cfg.source_position)
    radius = np.float32(cfg.source_radius) * res_mult

    scale = pulse_scale(t, cfg.source_pulse_rate) if cfg.source_pulsing else np.float32(1.0)
    strength = np.float32(cfg.source_strength) * scale * res_mult

    coords = _cell_centers(density.shape, dtype)
    dist_sq = sum((c - s) ** 2 for c, s in zip(coords, source))
    dist = jnp.sqrt(dist_sq)
    mask = dist <= radius
    falloff = jnp.where(mask, 1.0 - dist / radius, 0.0)

    density = density + strength * falloff

    if cfg.source_emits_velocity:
        vmag = np.float32(cfg.source_velocity) * res_mult
        if cfg.ndim == 2:
            # Direction angle → components (FluidSim.cs:524-526).
            ang = np.float32(np.deg2rad(np.float32(cfg.source_direction)))
            dir_vec = (np.float32(np.cos(ang)), np.float32(np.sin(ang)))
        else:
            d = np.asarray(cfg.source_velocity_dir, dtype=np.float32)
            norm = np.linalg.norm(d)
            dir_vec = tuple((d / max(norm, 1e-8)).astype(np.float32))
        for c, comp in enumerate(dir_vec):
            vel = vel.at[c].add(comp * vmag * falloff)

    return density, vel


def add_density(density, x: float, y: float, amount, z: float = None):
    """Point injector (FluidSim.cs:723-729): truncate + clamp coordinates."""
    n = density.shape[-1]
    idx = _clamp_idx((x, y) if z is None else (x, y, z), n)
    return density.at[idx].add(amount)


def add_velocity(vel, x: float, y: float, amounts, z: float = None):
    """Point injector (FluidSim.cs:731-738)."""
    n = vel.shape[-1]
    idx = _clamp_idx((x, y) if z is None else (x, y, z), n)
    for c, amt in enumerate(amounts):
        vel = vel.at[(c,) + idx].add(amt)
    return vel


def _clamp_idx(coords_xy, n):
    """(x, y[, z]) floats → clamped int array index ([y, x] / [z, y, x])."""
    ints = [int(np.clip(int(c), 0, n - 1)) for c in coords_xy]
    return tuple(reversed(ints))
