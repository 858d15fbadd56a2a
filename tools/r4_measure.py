"""Round-4 on-chip contender measurements (single-backtrace era).

Measures scan-rollout steps/s for bench128 arrangements around the
round-3 winner (advect_substeps=1, i.e. the reference's own single
semi-Lagrangian backtrace — FluidSim.cs:1523-1576).  Usage:

    python tools/r4_measure.py [substeps] [trials] [names...]

Names default to the full list below.  Prints one line per variant.
"""
from __future__ import annotations

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

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

import fluidsim_tpu as fs
from fluidsim_tpu.models.stable3d import simulate_step_3d
from fluidsim_tpu.scene.sources import apply_custom_source

SUBSTEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def build(cfg):
    state = fs.zeros_state(cfg)
    dt = np.float32(cfg.effective_params()[0])

    def one(state, _):
        t = state.time + dt
        density, velocity = apply_custom_source(
            state.density, state.velocity, cfg, t
        )
        state = state.replace(density=density, velocity=velocity)
        return simulate_step_3d(state, cfg), None

    @jax.jit
    def rollout(state):
        return jax.lax.scan(one, state, None, length=SUBSTEPS)[0]

    return rollout, state


def measure(vcfg, trials=TRIALS, rolls=2):
    rollout, vstate = build(vcfg)
    t0 = time.perf_counter()
    vstate = rollout(vstate)
    float(vstate.density.mean())
    compile_s = time.perf_counter() - t0
    vbest = 0.0
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(rolls):
            vstate = rollout(vstate)
        float(vstate.density.mean())
        vbest = max(vbest, rolls * SUBSTEPS / (time.perf_counter() - t0))
    nan = bool(jnp.isnan(vstate.density).any())
    return vbest, compile_s, nan


def main():
    base = fs.get_preset("bench128")
    variants = {
        "sub1": base.replace(advect_substeps=1),
        "sub2_default": base,
        "sub1+full_step": base.replace(advect_substeps=1,
                                       fuse_project_advect=True,
                                       fuse_self_advect=True),
        "sub1+bf16": base.replace(advect_substeps=1,
                                  solve_dtype="bfloat16"),
        "sub1+bf16_4rolls": base.replace(advect_substeps=1,
                                         solve_dtype="bfloat16"),
        "sub1_unfused": base.replace(advect_substeps=1,
                                     fuse_project_advect=False),
        "sub1_4rolls": base.replace(advect_substeps=1),  # timed w/ rolls=4
        # Timing-only probes: how much the XLA body-force/emitter pass
        # costs next to the kernels (physics differs; never shipped).
        "sub1_nobuoy": base.replace(advect_substeps=1, buoyancy=0.0),
        "sub1_noforce": base.replace(advect_substeps=1, buoyancy=0.0,
                                     enable_custom_source=False),
        # The retuned CFL<=1 bench scene (tools/validate_bench_scene.py):
        # damping folded into the kernels, single backtrace exact.
        "sub1_cflscene": base.replace(
            advect_substeps=1, time_step=0.002, buoyancy=0.2,
            source_strength=20.0, density_dissipation=5.0,
            velocity_damping=3.0),
    }
    names = sys.argv[3:] or list(variants)
    for name in names:
        vcfg = variants[name]
        rolls = 4 if name.endswith("4rolls") else 2
        try:
            v, comp, nan = measure(vcfg, rolls=rolls)
        except Exception as exc:
            print(f"{name:24s} FAILED {type(exc).__name__}: {exc}",
                  flush=True)
            continue
        print(f"{name:24s} {v:8.2f} steps/s  nan={nan} "
              f"compile+warm={comp:.0f}s", flush=True)


if __name__ == "__main__":
    main()
