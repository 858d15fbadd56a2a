"""Per-component timing of the SHIPPED bench128 step on the real chip.

Round-5 rewrite (VERDICT r4 item 3: the old table timed the r2
arrangement — standalone unfused kernels — whose projection row alone
exceeded the shipped step).  This times the components the shipped
bench128 arrangement actually runs:

  1. self-advect kernel (K=1 x n_sub, buoyancy fold)   pallas/advect.py
  2. fused projection + density advect kernel          pallas/resident.py
     (60-iter Jacobi, bf16 solve buffers, damp folds)
  3. emitter source add (XLA)                          scene/sources.py
  4. the FULL fused step (what bench.py measures)

Each row is measured as an on-device ``lax.fori_loop`` rep chain
(static trip count, zero per-rep dispatch) at two trip counts; the
differential cancels the tunnel sync (~25 ms) and dispatch, giving
device-busy ms per call.  The full step is measured the same way, so
``sum(rows) - full`` is the overlap XLA finds between the emitter add
and kernel DMA inside the scan body.
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
from fluidsim_tpu.pallas.advect import advect_multi_3d_pallas
from fluidsim_tpu.pallas.project import project_advect_density_3d_pallas
from fluidsim_tpu.scene.sources import apply_custom_source

# The tunnel's sync round trip carries tens-of-ms ONE-SIDED jitter
# (measured: five identical 8-rep chains ranged 59-111 ms), so the
# differential span must be hundreds of ms and min-of-N is the right
# estimator (delays only ever add).
R_LO, R_HI = 200, 1200


def chain_ms(make_body, carry, label):
    """Device-busy ms per body call: fori_loop differential at two
    static trip counts, min of 5 timings each."""
    def make(reps):
        body = make_body()
        return jax.jit(lambda c: jax.lax.fori_loop(0, reps, body, c))

    f_lo, f_hi = make(R_LO), make(R_HI)

    def sync(c):
        leaf = jax.tree_util.tree_leaves(c)[0]
        return float(jnp.asarray(leaf).ravel()[0])

    sync(f_lo(carry)), sync(f_hi(carry))  # compile + warm

    def timed(f):
        t0 = time.perf_counter()
        sync(f(carry))
        return time.perf_counter() - t0

    t_lo = min(timed(f_lo) for _ in range(5))
    t_hi = min(timed(f_hi) for _ in range(5))
    ms = (t_hi - t_lo) / (R_HI - R_LO) * 1e3
    print(f"{label:44s} {ms:7.3f} ms/call")
    return ms


def main():
    cfg = fs.get_preset("bench128")
    dt = np.float32(cfg.effective_params()[0])
    solve_dtype = (None if cfg.solve_dtype == "float32" else cfg.solve_dtype)
    damp = float(1.0 / (1.0 + dt * np.float32(cfg.velocity_damping)))
    ddamp = float(1.0 / (1.0 + dt * np.float32(cfg.density_dissipation)))
    rng = np.random.default_rng(0)
    n = cfg.current_size
    vel = jnp.asarray(rng.standard_normal((3, n, n, n)) * 0.01, jnp.float32)
    den = jnp.asarray(abs(rng.standard_normal((n, n, n))), jnp.float32)
    state = fs.zeros_state(cfg).replace(velocity=vel, density=den)
    buoy = (den, cfg.buoyancy, cfg.ambient_density, cfg.gravity)

    print(f"shipped bench128 arrangement: n={n}, jacobi={cfg.jacobi_iters}, "
          f"n_sub={cfg.advect_substeps}, solve_dtype={cfg.solve_dtype}, "
          f"fuse_project_advect={cfg.fuse_project_advect}, "
          f"fuse_buoyancy={cfg.fuse_buoyancy}")

    rows = {}
    rows["self-advect kernel (buoy fold)"] = chain_ms(
        lambda: (lambda _, v: advect_multi_3d_pallas(
            (1, 2, 3), v, v, float(dt), None, window=cfg.advect_window,
            n_sub=cfg.advect_substeps, buoy=buoy)),
        vel, "self-advect kernel (K=1, buoy fold)")

    def proj_body(_, carry):
        v, d = carry
        out = project_advect_density_3d_pallas(
            v, d, cfg.jacobi_iters, float(dt), window=cfg.advect_window,
            n_sub=cfg.advect_substeps, solve_dtype=solve_dtype, obst=None,
            sweep_block=cfg.jacobi_sweep_block, damp=damp, dens_damp=ddamp)
        assert out is not None
        return out[0], out[2]

    rows["fused projection+density advect kernel"] = chain_ms(
        lambda: proj_body, (vel, den),
        f"fused projection+dens advect ({cfg.jacobi_iters} it, "
        f"{cfg.solve_dtype})")

    rows["emitter source add (XLA)"] = chain_ms(
        lambda: (lambda _, d: apply_custom_source(
            d, vel, cfg, jnp.float32(1.0))[0]),
        den, "emitter source add (XLA)")

    def full_body(_, s):
        t = s.time + dt
        d, v = apply_custom_source(s.density, s.velocity, cfg, t)
        return simulate_step_3d(s.replace(density=d, velocity=v), cfg)

    full = chain_ms(lambda: full_body, state,
                    "FULL fused step (emitter + step)")

    ssum = sum(rows.values())
    print(f"{'sum of component rows':44s} {ssum:7.3f} ms")
    print(f"{'overlap recovered by XLA in the fused step':44s} "
          f"{ssum - full:7.3f} ms")


if __name__ == "__main__":
    main()
