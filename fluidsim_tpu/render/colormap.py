"""Scalar-field visualization — the reference's ``UpdateVisualizationJob``
(FluidSim.cs:1851-2002) as one on-device colormap kernel.

Five color modes (``ColorMode`` enum, FluidSim.cs:32):

* SINGLE_COLOR — fluid tint · density·intensity (FluidSim.cs:1936-1945)
* GRADIENT    — piecewise-linear gradient keys over clamped
  density·intensity (FluidSim.cs:1930-1934, 1981-2001)
* DENSITY_BASED — 3-threshold lerp chain black→low→medium→high
  (FluidSim.cs:1908-1928)
* PRESSURE_BASED — low/neutral/high thresholds with orange overflow
  (FluidSim.cs:1947-1964)
* STREAMLINES — the scalar base layer that the streamline overlay is
  composited onto (FluidSim.cs:862-865)

Obstacles paint ``obstacle_color`` (FluidSim.cs:1894-1899); the emitter
marker is a 3-px disk of ``source_position_color`` (FluidSim.cs:1969-1978).
Output is an ``(N, N, 4)`` RGBA float array, row j = grid y (flip before
writing images if your viewer's origin is top-left).

The reference copies density/pressure/obstacles into fresh NativeArrays and
back every frame (FluidSim.cs:759-787) and uploads via
``Texture2D.SetPixels`` (FluidSim.cs:852); here the frame is computed
entirely on device and only the final RGBA leaves (if at all).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import ColorMode, SimConfig


def _col(c, dtype=jnp.float32):
    return jnp.asarray(c, dtype)


def _lerp(a, b, t):
    """Color.Lerp: a + (b−a)·clamp01(t), vectorized over pixels."""
    t = jnp.clip(t, 0.0, 1.0)[..., None]
    return a + (b - a) * t


def evaluate_gradient(t, colors, times):
    """Manual gradient-key interpolation (FluidSim.cs:1981-2001).

    ``t``: (...,) values in [0,1]; ``colors``: (K, 4); ``times``: (K,).
    """
    colors = jnp.asarray(colors, jnp.float32)
    times = jnp.asarray(times, jnp.float32)
    k = colors.shape[0]
    if k == 0:
        return jnp.ones(t.shape + (4,), jnp.float32)
    if k == 1:
        return jnp.broadcast_to(colors[0], t.shape + (4,))
    # The reference walks `while time > times[index+1]: index++` from 0
    # (FluidSim.cs:1993-1997) — equivalently, count keys i≥1 with
    # times[i] < t.
    idx = jnp.clip(jnp.sum(t[..., None] > times[1:], axis=-1), 0, k - 2)
    t0 = times[idx]
    t1 = times[idx + 1]
    frac = (t - t0) / jnp.maximum(t1 - t0, 1e-12)
    below = t <= times[0]
    above = t >= times[-1]
    mid = _lerp(colors[idx], colors[idx + 1], frac)
    out = jnp.where(below[..., None], colors[0], mid)
    out = jnp.where(above[..., None], colors[-1], out)
    return out


def render_frame_2d(density, pressure, obstacles, cfg: SimConfig,
                    elapsed_time=0.0):
    """Full per-pixel frame (FluidSim.cs:1888-1978). Returns (N, N, 4)."""
    d = density
    dtype = d.dtype
    intensity = jnp.asarray(cfg.colour_intensity, dtype)
    nd = d * intensity

    fluid_color = _col(cfg.fluid_color)
    if cfg.use_lerp:
        # PingPong(t·0.1, 1) color cycling (FluidSim.cs:790-794).
        t = jnp.asarray(elapsed_time, jnp.float32) * 0.1
        cycle = jnp.abs(jnp.mod(t, 2.0) - 1.0)
        cycle = 1.0 - cycle  # PingPong(t,1) = 1-|t mod 2 - 1|
        fluid_color = (
            _col(cfg.start_color)
            + (_col(cfg.end_color) - _col(cfg.start_color)) * cycle
        )

    mode = cfg.color_mode
    if mode == ColorMode.DENSITY_BASED:
        mt = cfg.medium_density_threshold
        ht = cfg.high_density_threshold
        low = _col(cfg.low_density_color)
        med = _col(cfg.medium_density_color)
        high = _col(cfg.high_density_color)
        black = jnp.zeros(4, jnp.float32).at[3].set(1.0)
        c_lo = _lerp(black, low, d / mt)
        c_mid = _lerp(low, med, (d - mt) / (ht - mt))
        c_hi = _lerp(med, high, jnp.minimum(1.0, (d - ht) / ht))
        pixel = jnp.where(
            (d < mt)[..., None], c_lo,
            jnp.where((d < ht)[..., None], c_mid, c_hi),
        )
    elif mode == ColorMode.GRADIENT:
        pixel = evaluate_gradient(
            jnp.clip(nd, 0.0, 1.0), cfg.gradient_colors, cfg.gradient_times
        )
    elif mode == ColorMode.PRESSURE_BASED:
        p = pressure
        lt = cfg.low_pressure_threshold
        ht = cfg.high_pressure_threshold
        lowc = _col(cfg.low_pressure_color)
        neu = _col(cfg.neutral_pressure_color)
        highc = _col(cfg.high_pressure_color)
        orange = jnp.asarray([1.0, 0.5, 0.0, 1.0], jnp.float32)
        c_low = _lerp(lowc, neu, 1.0 + p / lt)
        c_mid = _lerp(neu, highc, (p - lt) / (ht - lt))
        c_hi = _lerp(highc, orange, jnp.minimum(1.0, (p - ht) / ht))
        pixel = jnp.where(
            (p < lt)[..., None], c_low,
            jnp.where((p <= ht)[..., None], c_mid, c_hi),
        )
    else:  # SINGLE_COLOR / STREAMLINES base layer
        pixel = jnp.stack(
            [
                fluid_color[0] * nd,
                fluid_color[1] * nd,
                fluid_color[2] * nd,
                jnp.full_like(nd, fluid_color[3]),
            ],
            axis=-1,
        )

    # Obstacles painted last-but-one (FluidSim.cs:1894-1899).
    pixel = jnp.where(obstacles[..., None], _col(cfg.obstacle_color), pixel)

    # Source marker: 3-px disk (FluidSim.cs:1969-1978).
    if cfg.visualize_source_position and cfg.enable_custom_source:
        n = density.shape[0]
        jj, ii = jnp.meshgrid(
            jnp.arange(n, dtype=dtype), jnp.arange(n, dtype=dtype),
            indexing="ij",
        )
        sx = cfg.source_position[0] * n
        sy = cfg.source_position[1] * n
        dist_sq = (ii - sx) ** 2 + (jj - sy) ** 2
        marker = dist_sq < 9.0  # visualMarkerRadius = 3 (FluidSim.cs:807)
        pixel = jnp.where(marker[..., None], _col(cfg.source_position_color),
                          pixel)
    return pixel
