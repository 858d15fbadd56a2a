"""Kernel-config microbenchmark: time contender (slab, T/nbuf, tile_y)
window configurations for the big-grid Pallas kernels directly, without
compiling a whole simulation step.

The slab pickers (``pallas.jacobi._pick_block``,
``pallas.advect._pick_slab``) choose window geometry from a calibrated
cost model (redundancy ratio + DMA-per-pass term; see their docstrings).
When re-tuning that model, measure the candidates here — each config is
forced by monkeypatching the picker, so one run times exactly one
geometry.  Budget ~4–5 min of Mosaic compile per fresh config at ≥256³.

Usage (on the TPU host, from the repo root):
    python tools/microbench_kernels.py j256    # jacobi contenders, 256³
    python tools/microbench_kernels.py j512
    python tools/microbench_kernels.py a256    # advect contenders
    python tools/microbench_kernels.py a512

Calibration data (v5e tunnel chip, 2026-08, 20-iter solves / K=1×2
advect — the numbers behind the shipped cost models):
    jacobi 256³: (64,T10,t64) 13.56  (16,T5,full) 13.82
                 (16,T2,full) 17.10  (8,T10,full) 17.24 ms
    jacobi 512³: (32,T5,t64) 71.64  (16,T2,t128) 78.65  (16,T5,t128) 86.31 ms
    advect 256³ F=3: (16,nbuf1,t128) 12.29  (8,nbuf1,full) 13.91 ms
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

import fluidsim_tpu.pallas.jacobi as J
import fluidsim_tpu.pallas.advect as A


def sync(x):
    # On-device scalar fetch: the axon tunnel does not honor
    # block_until_ready, so timing syncs via a 4-byte mean() fetch.
    return float(x.mean())


def time_fn(fn, *args, reps=5):
    out = fn(*args)
    sync(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


def bench_jacobi(n, picks, iters=20):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    for (slab, T, tile) in picks:
        J._pick_block = lambda nn, tt, _p=(slab, T, tile): (_p, 0.0)
        fn = jax.jit(lambda a, b, T=T: J.jacobi_3d_pallas(
            0, a, b, 1.0, 6.0, iters, block_iters=T))
        try:
            ms = time_fn(fn, x, x0)
            print(f"jacobi n={n} slab={slab} T={T} tile={tile}: {ms:.2f} ms")
        except Exception as e:
            print(f"jacobi n={n} slab={slab} T={T} tile={tile}: "
                  f"FAIL {type(e).__name__}")
        sys.stdout.flush()


def bench_advect(n, picks, F=3, n_sub=2):
    rng = np.random.default_rng(0)
    fields = jnp.asarray(rng.standard_normal((F, n, n, n)), jnp.float32)
    vel = jnp.asarray(rng.standard_normal((3, n, n, n)) * 0.1, jnp.float32)
    bs = tuple(range(1, F + 1)) if F == 3 else (0,)
    for (slab, nbuf, tile) in picks:
        A._pick_slab = lambda *a, _p=(slab, nbuf, tile), **k: _p
        fn = jax.jit(lambda f, v: A.advect_multi_3d_pallas(
            bs, f, v, 0.01, None, window=1, n_sub=n_sub))
        try:
            ms = time_fn(fn, fields, vel)
            print(f"advect n={n} F={F} slab={slab} nbuf={nbuf} "
                  f"tile={tile}: {ms:.2f} ms")
        except Exception as e:
            print(f"advect n={n} F={F} slab={slab} nbuf={nbuf} tile={tile}: "
                  f"FAIL {type(e).__name__}")
        sys.stdout.flush()


def bench_advect_self(n, picks, n_sub=2, obst=False):
    """Velocity self-advection (fields IS vel — the aliased single-DMA
    path).  ``obst=True`` adds a centered box mask and n_sub>1 so the
    in-kernel obstacle contract is active (the vortex128 shape)."""
    rng = np.random.default_rng(0)
    vel = jnp.asarray(rng.standard_normal((3, n, n, n)) * 0.1, jnp.float32)
    ob = None
    if obst:
        m = np.zeros((n, n, n), bool)
        q = n // 4
        m[q:-q, q:-q, q:-q] = True
        ob = jnp.asarray(m)
    for (slab, nbuf, tile) in picks:
        A._pick_slab = lambda *a, _p=(slab, nbuf, tile), **k: _p
        fn = jax.jit(lambda v: A.advect_multi_3d_pallas(
            (1, 2, 3), v, v, 0.01, ob, window=1, n_sub=n_sub))
        try:
            ms = time_fn(fn, vel)
            print(f"self-advect n={n} obst={obst} slab={slab} nbuf={nbuf} "
                  f"tile={tile}: {ms:.2f} ms")
        except Exception as e:
            print(f"self-advect n={n} obst={obst} slab={slab} nbuf={nbuf} "
                  f"tile={tile}: FAIL {type(e).__name__}")
        sys.stdout.flush()


SUITES = {
    "j256": lambda: bench_jacobi(
        256, [(64, 10, 64), (16, 5, None), (16, 2, None), (8, 10, None)]),
    "j512": lambda: bench_jacobi(
        512, [(16, 5, 128), (32, 5, 64), (16, 2, 128)]),
    "a256": lambda: bench_advect(
        256, [(16, 1, 128), (8, 1, None), (4, 2, None), (32, 1, 64)]),
    "a512": lambda: bench_advect(512, [(8, 2, 64), (4, 2, 128)]),
    # Self-advect (aliased) contenders: the picker's choice vs the
    # pre-aliasing winner shape, per headline preset.
    "sa128": lambda: bench_advect_self(128, [(32, 2, None), (64, 1, None)]),
    "sa128o": lambda: bench_advect_self(
        128, [(32, 1, None), (16, 2, None), (32, 2, None)], n_sub=3,
        obst=True),
    "sa256": lambda: bench_advect_self(256, [(16, 1, 128), (32, 1, 64)]),
    "sa512": lambda: bench_advect_self(
        512, [(16, 1, 64), (8, 2, 64), (16, 2, 64)]),
}

if __name__ == "__main__":
    SUITES[sys.argv[1]]()
