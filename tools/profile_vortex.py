"""Component timing for the vortex128 (obstacle) step on the real chip.

Each component is timed as a ``lax.scan`` of REPS iterations carrying its
own output (device-bound steady-state cost; one sync per measurement —
see docs/KERNELS.md "Measuring through the tunnel").  Obstacle and
no-obstacle variants run side by side to price the obstacle machinery.

Usage:  python tools/profile_vortex.py  (cwd = repo root)
"""
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

import fluidsim_tpu as fs
from fluidsim_tpu.ops.forces import (
    buoyancy_force,
    enforce_obstacle_boundaries_3d,
    vorticity_confinement_3d,
)
from fluidsim_tpu.pallas.advect import advect_multi_3d_pallas
from fluidsim_tpu.pallas.project import project_3d_pallas

REPS = 100


def sync(x):
    return float(jnp.asarray(x).ravel()[:1][0])


def timed_scan(name, fn, init):
    """Time ``fn`` self-composed REPS times under one jit/scan."""

    @jax.jit
    def rollout(x0):
        def body(x, _):
            return fn(x), 0
        out, _ = jax.lax.scan(body, x0, None, length=REPS)
        return out

    out = rollout(init)          # compile + warm
    sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = rollout(init)
    sync(jax.tree_util.tree_leaves(out)[0])
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:44s} {ms:7.3f} ms", flush=True)
    return ms


def main():
    cfg = fs.get_preset("vortex128")
    eng = fs.Engine(cfg)
    state = eng.state
    obst = state.obstacles
    n = cfg.size
    key = jax.random.PRNGKey(0)
    vel = 0.05 * jax.random.normal(key, (3, n, n, n), jnp.float32)
    dt = cfg.time_step

    print(f"vortex128 components, n={n}, iters={cfg.jacobi_iters}, "
          f"substeps={cfg.advect_substeps} (scan x{REPS})", flush=True)

    timed_scan("project pallas 20it OBST",
               lambda v: project_3d_pallas(v, cfg.jacobi_iters, obst=obst)[0],
               vel)
    timed_scan("project pallas 20it no-obst",
               lambda v: project_3d_pallas(v, cfg.jacobi_iters)[0], vel)
    timed_scan("advect vel substep3 OBST",
               lambda v: advect_multi_3d_pallas(
                   (1, 2, 3), v, v, dt, obst, window=1, n_sub=3), vel)
    timed_scan("advect vel substep3 no-obst",
               lambda v: advect_multi_3d_pallas(
                   (1, 2, 3), v, v, dt, None, window=1, n_sub=3), vel)
    d0 = jnp.abs(vel[0])
    timed_scan("advect density substep3 OBST",
               lambda d: advect_multi_3d_pallas(
                   (0,), d[None], vel, dt, obst, window=1, n_sub=3)[0], d0)
    timed_scan("advect density substep3 no-obst",
               lambda d: advect_multi_3d_pallas(
                   (0,), d[None], vel, dt, None, window=1, n_sub=3)[0], d0)
    timed_scan("enforce+drag (6-dir)",
               lambda v: enforce_obstacle_boundaries_3d(
                   v, obst, cfg.cell_size, cfg.viscosity), vel)
    timed_scan("buoyancy",
               lambda v: buoyancy_force(v, d0, dt, cfg.buoyancy,
                                        cfg.ambient_density, cfg.gravity),
               vel)
    timed_scan("vorticity confinement",
               lambda v: vorticity_confinement_3d(
                   v, dt, cfg.vorticity_confinement), vel)

    # full step (solver only — the engine wrapper adds the emitter)
    from fluidsim_tpu.models.stable3d import simulate_step_3d

    timed_scan("FULL step (simulate_step_3d)",
               lambda s: simulate_step_3d(s, cfg), state)


if __name__ == "__main__":
    main()
