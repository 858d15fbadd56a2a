"""NumPy oracle: an independent float32 transliteration of the reference
solver's math (Assets/Scripts/FluidSim.cs), used as ground truth for the
JAX engine's reference-parity 2D mode.

Written deliberately in the reference's own style — explicit loops for the
order-sensitive parts (BoundaryJob, EnforceObstacleBoundaries), vectorized
float32 NumPy only where each cell's expression is independent and the
operation order per cell is identical to the C# source.  Arrays are
``[y, x]`` float32, matching ``IX(x, y) = x + y*size``.

Every function cites the C# lines it mirrors.
"""

from __future__ import annotations

import numpy as np

F = np.float32
HALF = F(0.5)


def set_bnd(b: int, x: np.ndarray, obst: np.ndarray) -> None:
    """BoundaryJob.Execute (FluidSim.cs:1243-1288). In-place."""
    n = x.shape[0]
    # Wall edges (FluidSim.cs:1246-1252).
    for i in range(1, n - 1):
        x[i, 0] = -x[i, 1] if b == 1 else x[i, 1]
        x[i, n - 1] = -x[i, n - 2] if b == 1 else x[i, n - 2]
        x[0, i] = -x[1, i] if b == 2 else x[1, i]
        x[n - 1, i] = -x[n - 2, i] if b == 2 else x[n - 2, i]
    # Corners (FluidSim.cs:1255-1258).
    x[0, 0] = HALF * (x[0, 1] + x[1, 0])
    x[n - 1, 0] = HALF * (x[n - 1, 1] + x[n - 2, 0])
    x[0, n - 1] = HALF * (x[0, n - 2] + x[1, n - 1])
    x[n - 1, n - 1] = HALF * (x[n - 1, n - 2] + x[n - 2, n - 1])
    # Interior obstacle mirroring (FluidSim.cs:1261-1287).
    if b in (1, 2):
        for i in range(1, n - 1):      # x
            for j in range(1, n - 1):  # y
                if not obst[j, i]:
                    continue
                acc = F(0.0)
                count = 0
                if b == 1:
                    if not obst[j, i - 1]:
                        acc += -x[j, i - 1]
                        count += 1
                    if not obst[j, i + 1]:
                        acc += -x[j, i + 1]
                        count += 1
                else:
                    if not obst[j - 1, i]:
                        acc += -x[j - 1, i]
                        count += 1
                    if not obst[j + 1, i]:
                        acc += -x[j + 1, i]
                        count += 1
                x[j, i] = acc / F(count) if count > 0 else F(0.0)


def _nbr_sum(x: np.ndarray) -> np.ndarray:
    """Right + left + up(y+1) + down(y-1) in C# order (FluidSim.cs:1062-1067)."""
    return ((x[1:-1, 2:] + x[1:-1, :-2]) + x[2:, 1:-1]) + x[:-2, 1:-1]


def diffuse_with_jobs(b: int, x0: np.ndarray, a: F, c: F,
                      obst: np.ndarray, iters: int = 20) -> np.ndarray:
    """DiffuseWithJobs (FluidSim.cs:1292-1357): 20 self-smoothing sweeps.

    Skipped cells (walls + obstacles) fall back to the buffer's initial
    ``x0`` content (both double buffers start as x0 copies, :1299-1300).
    """
    obst_int = obst[1:-1, 1:-1]
    prev = x0.copy()
    for _ in range(iters):
        new = x0.copy()
        upd = (prev[1:-1, 1:-1] + a * _nbr_sum(prev)) / c
        new[1:-1, 1:-1] = np.where(obst_int, x0[1:-1, 1:-1], upd)
        set_bnd(b, new, obst)
        prev = new
    return prev


def lin_solve_with_jobs(b: int, x: np.ndarray, x0: np.ndarray, a: F, c: F,
                        obst: np.ndarray, iters: int = 20) -> np.ndarray:
    """LinearSolveWithJobs / PressureSolveWithJobs
    (FluidSim.cs:1359-1415, 1578-1637): fixed-rhs Jacobi; skipped cells copy
    the previous iterate (FluidSim.cs:1206-1218)."""
    obst_int = obst[1:-1, 1:-1]
    prev = x.copy()
    for _ in range(iters):
        new = prev.copy()
        upd = (x0[1:-1, 1:-1] + a * _nbr_sum(prev)) / c
        new[1:-1, 1:-1] = np.where(obst_int, prev[1:-1, 1:-1], upd)
        set_bnd(b, new, obst)
        prev = new
    return prev


def diffuse(b: int, x0: np.ndarray, diff: F, dt: F, obst: np.ndarray,
            iters: int = 20, double: bool = True) -> np.ndarray:
    """Diffuse (FluidSim.cs:740-745): both solver phases back to back."""
    n = x0.shape[0]
    a = F(dt) * F(diff) * F(n - 2) * F(n - 2)
    c = F(1.0) + F(6.0) * a
    x = diffuse_with_jobs(b, x0, a, c, obst, iters)
    if double:
        x = lin_solve_with_jobs(b, x, x0, a, c, obst, iters)
    return x


def advect(b: int, d0: np.ndarray, vel_x: np.ndarray, vel_y: np.ndarray,
           dt: F, obst: np.ndarray) -> np.ndarray:
    """AdvectJob + AdvectWithJobs (FluidSim.cs:1125-1186, 1523-1576).

    Output starts as a fresh zero buffer (:1529); walls and obstacle cells
    stay 0 until set_bnd.
    """
    n = d0.shape[0]
    dt0 = F(dt) * F(n - 2)
    jj, ii = np.meshgrid(
        np.arange(n, dtype=np.float32), np.arange(n, dtype=np.float32),
        indexing="ij",
    )
    x = ii - dt0 * vel_x
    y = jj - dt0 * vel_y
    x = np.where(x < F(0.5), F(0.5), x)
    x = np.where(x > F(n) - F(1.5), F(n) - F(1.5), x)
    y = np.where(y < F(0.5), F(0.5), y)
    y = np.where(y > F(n) - F(1.5), F(n) - F(1.5), y)
    i0 = x.astype(np.int32)  # truncation == floor for x >= 0.5
    j0 = y.astype(np.int32)
    i1 = i0 + 1
    j1 = j0 + 1
    s1 = x - i0.astype(np.float32)
    s0 = F(1.0) - s1
    t1 = y - j0.astype(np.float32)
    t0 = F(1.0) - t1

    val = s0 * (t0 * d0[j0, i0] + t1 * d0[j1, i0]) + s1 * (
        t0 * d0[j0, i1] + t1 * d0[j1, i1]
    )
    out = np.zeros_like(d0)
    core = (slice(1, -1), slice(1, -1))
    out[core] = np.where(obst[core], F(0.0), val[core])
    set_bnd(b, out, obst)
    return out


def project(vel_x: np.ndarray, vel_y: np.ndarray, obst: np.ndarray,
            iters: int = 20):
    """ProjectWithJobs (FluidSim.cs:1417-1521). Returns (vx, vy, p)."""
    n = vel_x.shape[0]
    nf = F(n)
    core = (slice(1, -1), slice(1, -1))

    div = np.zeros_like(vel_x)
    div[core] = (
        F(-0.5)
        * (
            (vel_x[1:-1, 2:] - vel_x[1:-1, :-2])
            + vel_y[2:, 1:-1]
            - vel_y[:-2, 1:-1]
        )
        / nf
    )
    set_bnd(0, div, obst)
    p = np.zeros_like(vel_x)
    set_bnd(0, p, obst)

    p = lin_solve_with_jobs(0, p, div, F(1.0), F(6.0), obst, iters)

    vel_x = vel_x.copy()
    vel_y = vel_y.copy()
    obst_int = obst[core]
    gx = HALF * (p[1:-1, 2:] - p[1:-1, :-2]) * nf
    gy = HALF * (p[2:, 1:-1] - p[:-2, 1:-1]) * nf
    vel_x[core] = np.where(obst_int, vel_x[core], vel_x[core] - gx)
    vel_y[core] = np.where(obst_int, vel_y[core], vel_y[core] - gy)
    set_bnd(1, vel_x, obst)
    set_bnd(2, vel_y, obst)
    return vel_x, vel_y, p


def enforce_obstacle_boundaries(vel_x, vel_y, obst, cell_size: F,
                                viscosity: F) -> None:
    """EnforceObstacleBoundaries + ApplyDragNearObstacle
    (FluidSim.cs:617-673), with the true sequential event order. In-place."""
    n = vel_x.shape[0]
    L = F(cell_size)
    visc = max(F(viscosity), F(1e-5))
    span = F(0.98) - F(0.8)
    for i in range(1, n - 1):      # x (outer, FluidSim.cs:620)
        for j in range(1, n - 1):  # y (inner)
            if not obst[j, i]:
                continue
            vel_x[j, i] = F(0.0)
            vel_y[j, i] = F(0.0)
            for di, dj in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                ni, nj = i + di, j + dj
                if ni < 1 or ni >= n - 1 or nj < 1 or nj >= n - 1:
                    continue
                if obst[nj, ni]:
                    continue
                u = np.sqrt(vel_x[nj, ni] * vel_x[nj, ni]
                            + vel_y[nj, ni] * vel_y[nj, ni])
                re = (u * L) / visc
                drag = F(0.8) + span * (F(1.0) - np.exp(-re * F(0.01)))
                vel_x[nj, ni] *= drag
                vel_y[nj, ni] *= drag


def custom_source(density, vel_x, vel_y, cfg, t: F) -> None:
    """UpdateCustomSource (FluidSim.cs:485-533), loop transliteration.
    In-place; ``cfg`` is a fluidsim_tpu SimConfig."""
    n = cfg.current_size
    sx = F(cfg.source_position[0]) * F(n)
    sy = F(cfg.source_position[1]) * F(n)
    pulse = (
        np.abs(np.sin(F(t) * F(cfg.source_pulse_rate) * F(np.pi)))
        if cfg.source_pulsing
        else F(1.0)
    )
    eff = F(cfg.source_strength) * pulse * F(cfg.resolution_multiplier)
    r = F(cfg.source_radius) * F(cfg.resolution_multiplier)

    for i in range(max(0, int(np.floor(sx - r))),
                   min(n - 1, int(np.ceil(sx + r))) + 1):
        for j in range(max(0, int(np.floor(sy - r))),
                       min(n - 1, int(np.ceil(sy + r))) + 1):
            dist = np.sqrt(F(i - sx) * F(i - sx) + F(j - sy) * F(j - sy))
            if dist <= r:
                falloff = F(1.0) - dist / r
                ci = int(np.clip(i, 0, n - 1))
                cj = int(np.clip(j, 0, n - 1))
                density[cj, ci] += eff * falloff
                if cfg.source_emits_velocity:
                    ang = F(np.deg2rad(F(cfg.source_direction)))
                    vmag = F(cfg.source_velocity) * F(cfg.resolution_multiplier)
                    vel_x[cj, ci] += F(np.cos(ang)) * vmag * falloff
                    vel_y[cj, ci] += F(np.sin(ang)) * vmag * falloff


def simulate_step(density, vel_x, vel_y, obst, cfg):
    """One Simulate() (FluidSim.cs:551-576, 703-721).

    Returns (density, vel_x, vel_y, pressure).
    """
    dt, diff, visc = (F(v) for v in cfg.effective_params())
    iters = cfg.jacobi_iters

    # VelocityStep (FluidSim.cs:703-714)
    vx0 = diffuse(1, vel_x, visc, dt, obst, iters, cfg.double_diffuse)
    vy0 = diffuse(2, vel_y, visc, dt, obst, iters, cfg.double_diffuse)
    vx0, vy0, _ = project(vx0, vy0, obst, iters)
    vel_x = advect(1, vx0, vx0, vy0, dt, obst)
    vel_y = advect(2, vy0, vx0, vy0, dt, obst)
    vel_x, vel_y, pressure = project(vel_x, vel_y, obst, iters)

    # DensityStep (FluidSim.cs:716-721)
    tmp = diffuse(0, density, diff, dt, obst, iters, cfg.double_diffuse)
    density = advect(0, tmp, vel_x, vel_y, dt, obst)

    # Obstacle enforcement (FluidSim.cs:566-570)
    if cfg.enable_obstacle:
        vel_x = vel_x.copy()
        vel_y = vel_y.copy()
        enforce_obstacle_boundaries(
            vel_x, vel_y, obst, F(cfg.cell_size), F(cfg.viscosity)
        )
    return density, vel_x, vel_y, pressure
