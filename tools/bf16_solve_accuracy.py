"""Accuracy audit of ``solve_dtype="bfloat16"`` on the bench128 scene.

Round-4 VERDICT item 2: bf16 solve buffers beat the shipped f32 default
two rounds running (r3 771.06≈tie; r4 1016.74 vs 1008.63 official,
1010.71 vs 991.66 on the judge's rerun) but were never promoted because
the accuracy argument was prose.  This measures the numbers the decision
needs, on-chip, over a 3000-step bench128 rollout:

* **post-projection divergence residual** (max |div v| on interior
  cells, the projection's own spacing-2 stencil — ops/project.py:93-101)
  for both solve dtypes: does iterate rounding degrade how solenoidal
  the 60-iter solve leaves the field?
* **density-field delta** between the two paths (max / mean abs,
  relative to the f32 path's max density) at checkpoints along the
  rollout: how far do the trajectories separate?
* **mass drift**: total density of each path (the emitter+dissipation
  steady state makes this bounded; a systematic bf16 bias would show as
  a diverging ratio).

Usage: python tools/bf16_solve_accuracy.py [total_steps] [chunk] [preset]
Writes a JSON summary line at the end (captured into docs/KERNELS.md).
``preset`` (default bench128) also audits e.g. vortex128 — obstacle
masks are built from the config; note the f32 path on an obstacle
config runs the XLA solve (the f32 obstacle resident kernel OOMs on
today's toolchain — resident_obstacle_fits), so that audit compares
bf16-kernel vs f32-XLA, bounding the kernel+dtype delta together.
"""
from __future__ import annotations

import json
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
from fluidsim_tpu.models.stable3d import emitter_folds, simulate_step_3d
from fluidsim_tpu.scene.sources import apply_custom_source, emitter_fold_operand

TOTAL = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 250
PRESET = sys.argv[3] if len(sys.argv) > 3 else "bench128"


def build_rollout(cfg):
    dt = np.float32(cfg.effective_params()[0])
    fold_src = emitter_folds(cfg)

    def one(state, _):
        t = state.time + dt
        if fold_src:
            return simulate_step_3d(
                state, cfg, src=emitter_fold_operand(cfg, t)), None
        density, velocity = apply_custom_source(
            state.density, state.velocity, cfg, t)
        state = state.replace(density=density, velocity=velocity)
        return simulate_step_3d(state, cfg), None

    @jax.jit
    def rollout(state):
        return jax.lax.scan(one, state, None, length=CHUNK)[0]

    return rollout


@jax.jit
def stats(state):
    """(max |div v| interior, total mass, max density) on device."""
    vel = state.velocity.astype(jnp.float32)
    n = vel.shape[-1]
    vx, vy, vz = vel[0], vel[1], vel[2]
    div = (
        (vx[1:-1, 1:-1, 2:] - vx[1:-1, 1:-1, :-2])
        + (vy[1:-1, 2:, 1:-1] - vy[1:-1, :-2, 1:-1])
        + (vz[2:, 1:-1, 1:-1] - vz[:-2, 1:-1, 1:-1])
    ) * (-0.5 / n)
    den = state.density.astype(jnp.float32)
    vmax = jnp.sqrt(jnp.max(jnp.sum(vel * vel, axis=0)))
    return (jnp.max(jnp.abs(div)), jnp.sum(den), jnp.max(den), vmax)


@jax.jit
def delta(s32, s16):
    d32 = s32.density.astype(jnp.float32)
    d16 = s16.density.astype(jnp.float32)
    ad = jnp.abs(d32 - d16)
    return jnp.max(ad), jnp.mean(ad), jnp.max(d32)


def main():
    base = fs.get_preset(PRESET)
    cfgs = {
        "f32": base.replace(solve_dtype="float32"),
        "bf16": base.replace(solve_dtype="bfloat16"),
    }
    obst = None
    if base.enable_obstacle:
        from fluidsim_tpu.scene.obstacles import build_obstacle_mask

        obst = jnp.asarray(build_obstacle_mask(base))
    rollouts = {k: build_rollout(c) for k, c in cfgs.items()}
    states = {k: fs.zeros_state(c, obstacles=obst) for k, c in cfgs.items()}

    rows = []
    t0 = time.time()
    for step in range(CHUNK, TOTAL + 1, CHUNK):
        for k in cfgs:
            states[k] = rollouts[k](states[k])
        row = {"step": step}
        for k in cfgs:
            dmax, mass, denmax, vmax = (float(x) for x in stats(states[k]))
            row[f"{k}_divmax"] = dmax
            row[f"{k}_mass"] = mass
            row[f"{k}_denmax"] = denmax
            row[f"{k}_vmax"] = vmax
        dmax, dmean, ref = (float(x) for x in delta(states["f32"],
                                                    states["bf16"]))
        row["delta_max"] = dmax
        row["delta_mean"] = dmean
        row["delta_max_rel"] = dmax / max(ref, 1e-30)
        row["mass_rel_err"] = abs(row["bf16_mass"] - row["f32_mass"]) / max(
            abs(row["f32_mass"]), 1e-30)
        rows.append(row)
        print(f"step {step:5d}: div f32 {row['f32_divmax']:.3e} "
              f"bf16 {row['bf16_divmax']:.3e}  "
              f"delta max {dmax:.3e} ({row['delta_max_rel']:.2%} of denmax) "
              f"mean {dmean:.3e}  mass_rel {row['mass_rel_err']:.2e} "
              f"(t={time.time()-t0:.0f}s)", flush=True)

    summary = {
        "steps": TOTAL,
        "div_residual_f32_final": rows[-1]["f32_divmax"],
        "div_residual_bf16_final": rows[-1]["bf16_divmax"],
        "div_ratio_worst": max(r["bf16_divmax"] / max(r["f32_divmax"], 1e-30)
                               for r in rows),
        "density_delta_max_rel_final": rows[-1]["delta_max_rel"],
        "density_delta_max_rel_worst": max(r["delta_max_rel"] for r in rows),
        "mass_rel_err_final": rows[-1]["mass_rel_err"],
        "mass_rel_err_worst": max(r["mass_rel_err"] for r in rows),
    }
    print("SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
