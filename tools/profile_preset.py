"""Component timing for any preset's step on the real chip.

Each component is timed as a ``lax.scan`` of REPS iterations carrying its
own output (device-bound steady-state cost; one sync per measurement —
see docs/KERNELS.md "Measuring through the tunnel").  Components are
included per the preset's flags (obstacles, buoyancy, confinement, …).

Usage:  python tools/profile_preset.py --preset multi256 [--reps 50]
        python tools/profile_preset.py --preset vortex128 --ab-obstacle
(``--ab-obstacle`` also times the no-obstacle variant of the projection
and advects, pricing the obstacle machinery.)
"""
import argparse
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

import fluidsim_tpu as fs
from fluidsim_tpu.ops.forces import (
    buoyancy_force,
    enforce_obstacle_boundaries_3d,
    vorticity_confinement_3d,
)
from fluidsim_tpu.pallas.advect import advect_multi_3d_pallas
from fluidsim_tpu.pallas.project import project_3d_pallas


def sync(x):
    return float(jnp.asarray(x).ravel()[:1][0])


def timed_scan(name, fn, init, reps):
    """Time ``fn`` self-composed ``reps`` times under one jit/scan."""

    @jax.jit
    def rollout(x0):
        def body(x, _):
            return fn(x), 0
        out, _ = jax.lax.scan(body, x0, None, length=reps)
        return out

    out = rollout(init)          # compile + warm
    sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = rollout(init)
    sync(jax.tree_util.tree_leaves(out)[0])
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:44s} {ms:7.3f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="multi256")
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--ab-obstacle", action="store_true",
                    help="also time no-obstacle variants of the "
                    "projection/advects (obstacle-cost A/B)")
    args = ap.parse_args()

    cfg = fs.get_preset(args.preset)
    eng = fs.Engine(cfg)
    state = eng.state
    obst = state.obstacles if cfg.enable_obstacle else None
    n = cfg.current_size
    key = jax.random.PRNGKey(0)
    vel = 0.05 * jax.random.normal(key, (3, n, n, n), jnp.float32)
    d0 = jnp.abs(vel[0])
    dt = cfg.effective_params()[0]
    reps = args.reps

    print(f"{args.preset} components, n={n}, iters={cfg.jacobi_iters}, "
          f"substeps={cfg.advect_substeps} (scan x{reps})", flush=True)

    ab = ((obst, ""),)
    if args.ab_obstacle and obst is not None:
        ab = ((obst, " OBST"), (None, " no-obst"))
    for ob, tag in ab:
        timed_scan(f"project pallas {cfg.jacobi_iters}it{tag}",
                   lambda v, ob=ob: project_3d_pallas(
                       v, cfg.jacobi_iters, obst=ob)[0],
                   vel, reps)
    nsub = cfg.advect_substeps if cfg.advection_scheme == "substep" else 1
    win = cfg.advect_window
    for ob, tag in ab:
        timed_scan(f"advect vel sub{nsub} K{win}{tag}",
                   lambda v, ob=ob: advect_multi_3d_pallas(
                       (1, 2, 3), v, v, dt, ob, window=win, n_sub=nsub), vel,
                   reps)
        timed_scan(f"advect density sub{nsub} K{win}{tag}",
                   lambda d, ob=ob: advect_multi_3d_pallas(
                       (0,), d[None], vel, dt, ob, window=win, n_sub=nsub)[0],
                   d0, reps)
    if cfg.enable_obstacle:
        timed_scan("enforce+drag (6-dir)",
                   lambda v: enforce_obstacle_boundaries_3d(
                       v, state.obstacles, cfg.cell_size, cfg.viscosity),
                   vel, reps)
    if cfg.buoyancy != 0.0 or cfg.gravity != 0.0:
        timed_scan("buoyancy",
                   lambda v: buoyancy_force(v, d0, dt, cfg.buoyancy,
                                            cfg.ambient_density, cfg.gravity),
                   vel, reps)
    if cfg.vorticity_confinement != 0.0:
        timed_scan("vorticity confinement",
                   lambda v: vorticity_confinement_3d(
                       v, dt, cfg.vorticity_confinement), vel, reps)
    if cfg.enable_custom_source:
        from fluidsim_tpu.scene.sources import apply_custom_source

        def src(s):
            d, v = apply_custom_source(s.density, s.velocity, cfg,
                                       s.time + jnp.float32(dt))
            return s.replace(density=d, velocity=v,
                             time=s.time + jnp.float32(dt))

        timed_scan("emitter(s)", src, state, reps)

    # full step (solver only — the engine wrapper adds the emitter)
    from fluidsim_tpu.models.stable3d import simulate_step_3d

    timed_scan("FULL step (simulate_step_3d)",
               lambda s: simulate_step_3d(s, cfg), state, reps)


if __name__ == "__main__":
    main()
