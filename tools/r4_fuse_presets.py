"""A/B the fused projection+density-advect arrangement on the non-bench
presets (vortex128, multi256) on-chip.

``fuse_project_advect`` was measured a winner on bench128 (r2: 601.06 vs
588.10 steps/s) and shipped in that preset's defaults; the obstacle +
vorticity presets never got an on-chip A/B (the fused kernel supports a
static obstacle mask — pallas/resident.py coefficient-volume planes).
This script measures both arrangements so the winner can be promoted to
the preset defaults (round-2 VERDICT item 3: measured winners ship).

Usage:  python tools/r4_fuse_presets.py [substeps] [trials] [presets...]
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
from fluidsim_tpu.scene.obstacles import build_obstacle_mask
from fluidsim_tpu.scene.sources import apply_custom_source

SUBSTEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 250
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
PRESETS = sys.argv[3:] or ["vortex128", "multi256"]


def build(cfg):
    obst = None
    if cfg.enable_obstacle:
        obst = jnp.asarray(build_obstacle_mask(cfg))
    state = fs.zeros_state(cfg, obstacles=obst)
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


def measure(cfg):
    rollout, state = build(cfg)
    t0 = time.perf_counter()
    state = rollout(state)
    float(state.density.mean())
    compile_s = time.perf_counter() - t0
    best = 0.0
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        state = rollout(state)
        state = rollout(state)
        float(state.density.mean())
        best = max(best, 2 * SUBSTEPS / (time.perf_counter() - t0))
    nan = bool(jnp.isnan(state.density).any())
    return best, compile_s, nan


def main():
    for preset in PRESETS:
        base = fs.get_preset(preset)
        for name, cfg in [
            ("fuse_off", base.replace(fuse_project_advect=False)),
            ("fuse_on", base.replace(fuse_project_advect=True)),
        ]:
            try:
                v, comp, nan = measure(cfg)
            except Exception as exc:
                print(f"{preset:10s} {name:9s} FAILED "
                      f"{type(exc).__name__}: {exc}", flush=True)
                continue
            if nan:
                # Mirror bench.py's not-promoted-on-NaN rule: a diverging
                # arrangement's steps/s is INVALID, never a candidate
                # winner (round-4 ADVICE).
                print(f"{preset:10s} {name:9s} INVALID (NaN density; "
                      f"raw {v:.2f} steps/s not a candidate) "
                      f"compile+warm={comp:.0f}s", flush=True)
                continue
            print(f"{preset:10s} {name:9s} {v:8.2f} steps/s  nan={nan} "
                  f"compile+warm={comp:.0f}s", flush=True)


if __name__ == "__main__":
    main()
