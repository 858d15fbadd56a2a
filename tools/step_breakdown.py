"""Per-component timing of the bench128 step on the real chip.

Times each stage of ``simulate_step_3d`` (buoyancy, velocity advect,
projection, density advect, emitter) as its own jitted program, plus the
fused full step, to show where the step's wall time goes.  Stage sums
exceed the fused step (per-program dispatch + no cross-stage fusion) —
the point is the *relative* weight, to aim optimization work.
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
from fluidsim_tpu.models.stable3d import simulate_step_3d
from fluidsim_tpu.ops.forces import buoyancy_force
from fluidsim_tpu.pallas.advect import advect_multi_3d_pallas
from fluidsim_tpu.pallas.project import project_3d_pallas
from fluidsim_tpu.scene.sources import apply_custom_source


def sync(x):
    return float(jnp.asarray(x).ravel()[:1][0])


def timeit(name, fn, *args, reps=30):
    out = fn(*args)
    jax.tree_util.tree_map(sync, jax.tree_util.tree_leaves(out)[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:28s} {ms:7.3f} ms")
    return ms


def main():
    cfg = fs.get_preset("bench128")
    dt = np.float32(cfg.effective_params()[0])
    rng = np.random.default_rng(0)
    n = cfg.current_size
    vel = jnp.asarray(rng.standard_normal((3, n, n, n)) * 0.1, jnp.float32)
    den = jnp.asarray(abs(rng.standard_normal((n, n, n))), jnp.float32)
    state = fs.zeros_state(cfg)
    state = state.replace(velocity=vel, density=den)

    timeit("buoyancy (XLA)", jax.jit(
        lambda v, d: buoyancy_force(v, d, dt, cfg.buoyancy,
                                    cfg.ambient_density, cfg.gravity)),
        vel, den)
    timeit("emitter source (XLA)", jax.jit(
        lambda d, v: apply_custom_source(d, v, cfg, jnp.float32(1.0))),
        den, vel)
    timeit("velocity advect (kernel)", jax.jit(
        lambda f, v: advect_multi_3d_pallas(
            (1, 2, 3), f, v, float(dt), None, window=cfg.advect_window,
            n_sub=cfg.advect_substeps)),
        vel, vel)
    timeit("density advect (kernel)", jax.jit(
        lambda f, v: advect_multi_3d_pallas(
            (0,), f, v, float(dt), None, window=cfg.advect_window,
            n_sub=cfg.advect_substeps)),
        den[None], vel)
    timeit(f"projection ({cfg.jacobi_iters} it, kernel)", jax.jit(
        lambda v: project_3d_pallas(v, cfg.jacobi_iters, obst=None)), vel)

    def full(state):
        t = state.time + dt
        d, v = apply_custom_source(state.density, state.velocity, cfg, t)
        return simulate_step_3d(state.replace(density=d, velocity=v), cfg)

    timeit("FULL fused step", jax.jit(full), state)


if __name__ == "__main__":
    main()
