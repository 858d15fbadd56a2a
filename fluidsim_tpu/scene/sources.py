"""Continuous emitters and point injectors.

Reference: ``UpdateCustomSource`` (FluidSim.cs:485-533) and
``AddDensity``/``AddVelocity`` (FluidSim.cs:723-738).

The reference loops over the emitter's bounding box and calls the point
injectors per cell; every cell it touches satisfies ``dist ≤ radius``, so a
full-grid masked add is float32-identical and fuses into the jitted step.

Beyond the reference's single emitter, ``cfg.extra_sources`` adds any
number of additional ``SourceSpec`` emitters (BASELINE config 4).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import SimConfig, SourceSpec


def _cell_centers(shape, dtype):
    """Per-axis coordinate grids in (x, y[, z]) order for [y,x]/[z,y,x] arrays."""
    ranges = [jnp.arange(s, dtype=dtype) for s in shape]
    grids = jnp.meshgrid(*ranges, indexing="ij")  # [y,x] or [z,y,x] order
    return tuple(reversed(grids))  # (x, y[, z])


def pulse_scale(t, rate: float):
    """|sin(t · rate · π)| (FluidSim.cs:492-494)."""
    return jnp.abs(jnp.sin(t * np.float32(rate) * np.float32(np.pi)))


def _apply_one(density, vel, cfg: SimConfig, t, *, position, strength,
               radius, emits_velocity, velocity, direction, velocity_dir,
               pulsing, pulse_rate):
    """One emitter: pulsing, radial linear falloff, optional directional
    velocity (FluidSim.cs:485-533), resolution-scaled."""
    n = cfg.current_size
    dtype = density.dtype
    nf = np.float32(n)
    res_mult = np.float32(cfg.resolution_multiplier)

    source = tuple(np.float32(p) * nf for p in position)
    radius_cells = np.float32(radius) * res_mult

    scale = pulse_scale(t, pulse_rate) if pulsing else np.float32(1.0)
    eff_strength = np.float32(strength) * scale * res_mult

    coords = _cell_centers(density.shape, dtype)
    dist = jnp.sqrt(sum((c - s) ** 2 for c, s in zip(coords, source)))
    mask = dist <= radius_cells
    falloff = jnp.where(mask, 1.0 - dist / radius_cells, 0.0)

    density = density + eff_strength * falloff

    if emits_velocity:
        vmag = np.float32(velocity) * res_mult
        if cfg.ndim == 2:
            # Direction angle → components (FluidSim.cs:524-526).
            ang = np.float32(np.deg2rad(np.float32(direction)))
            dir_vec = (np.float32(np.cos(ang)), np.float32(np.sin(ang)))
        else:
            d = np.asarray(velocity_dir, dtype=np.float32)
            norm = np.linalg.norm(d)
            dir_vec = tuple((d / max(norm, 1e-8)).astype(np.float32))
        for c, comp in enumerate(dir_vec):
            vel = vel.at[c].add(comp * vmag * falloff)

    return density, vel


def apply_custom_source(density, vel, cfg: SimConfig, t):
    """One frame of all continuous emitters; no-op config ⇒ identity.

    ``t`` is the elapsed time used for pulsing (the reference uses
    wall-clock ``elapsedTime``, FluidSim.cs:394; the engine feeds sim time).
    Returns (density, vel).
    """
    if cfg.enable_custom_source:
        density, vel = _apply_one(
            density, vel, cfg, t,
            position=cfg.source_position,
            strength=cfg.source_strength,
            radius=cfg.source_radius,
            emits_velocity=cfg.source_emits_velocity,
            velocity=cfg.source_velocity,
            direction=cfg.source_direction,
            velocity_dir=cfg.source_velocity_dir,
            pulsing=cfg.source_pulsing,
            pulse_rate=cfg.source_pulse_rate,
        )
    for spec in cfg.extra_sources:
        density, vel = _apply_one(
            density, vel, cfg, t,
            position=spec.position[: cfg.ndim],
            strength=spec.strength,
            radius=spec.radius,
            emits_velocity=spec.emits_velocity,
            velocity=spec.velocity,
            direction=spec.direction,
            velocity_dir=spec.velocity_dir,
            pulsing=spec.pulsing,
            pulse_rate=spec.pulse_rate,
        )
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
