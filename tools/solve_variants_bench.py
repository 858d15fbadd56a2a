"""On-chip microbench of 60-iteration solve-loop variants at 128^3.

Decides the next projection optimization from data, not modeling: the
round-2 composite sweep (jacobi_sweep_block=2) measured 2x SLOWER than
sequential sweeps at the step level (BENCH_r02: 296 vs 588 steps/s), but
WHERE the loss lives — Mosaic materializing the N(N(p)) intermediate, the
O(n^2) intermediate-face plane corrections, or the x1 precompute — was
never isolated.  Each variant below runs the same 60-iteration ping-pong
loop as ONE kernel in a lax.scan rollout (REPS solves per dispatch), so
dispatch cost vanishes and the per-solve time is device-busy.

Variants (* = wrong numerics, perf probe only):

  copy          dst = src                      (pure VMEM rw floor)
  scale         dst = 0.99*src                 (rw + 1 vpu op)
  sweep         the product Jacobi sweep (6 rolls + rhs + faces)
  sweep_nofaces * sweep without the 6 slice-written faces
  block2        the product composite (toroidal chain + plane fixes)
  block2_toro   * composite without the plane corrections
  direct19      * double sweep as one 19-tap stencil (24 shared rolls),
                  toroidal, no corrections — does Mosaic stream it?

PYTHONPATH=/root/repo python tools/solve_variants_bench.py [n] [iters]
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluidsim_tpu.pallas.resident import (
    _nbr_sum,
    _roll,
    _solve_loop,
    _write_faces,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 60
REPS = 30
TRIALS = 4


def _loop_kernel(x_hbm, out_hbm, pb0, pb1, x0s, sems, *, body, n, iters):
    """Shared scaffold: DMA in, run ``iters`` ping-pong body passes, DMA
    out.  ``body(src, dst, x0s)`` runs once per pass."""
    in_dma = pltpu.make_async_copy(x_hbm, pb0, sems.at[0])
    in_dma.start()
    in_dma.wait()
    x0s[:] = pb0[:] * jnp.float32(0.01)

    def two(_, carry):
        body(pb0, pb1, x0s)
        body(pb1, pb0, x0s)
        return carry

    jax.lax.fori_loop(0, iters // 2, two, 0)
    final = pb0
    if iters % 2:
        body(pb0, pb1, x0s)
        final = pb1
    out_dma = pltpu.make_async_copy(final, out_hbm, sems.at[1])
    out_dma.start()
    out_dma.wait()


def make_variant(body, n=N, iters=ITERS, extra_scratch=()):
    kernel = functools.partial(_loop_kernel, body=body, n=n, iters=iters)
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n, n, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n, n, n), jnp.float32),
            pltpu.VMEM((n, n, n), jnp.float32),
            pltpu.VMEM((n, n, n), jnp.float32),
        ] + list(extra_scratch) + [pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )
    return call


IC = float(np.float32(1.0) / np.float32(6.0))


def body_copy(src, dst, x0s):
    dst[:] = src[:]


def body_scale(src, dst, x0s):
    dst[:] = src[:] * jnp.float32(0.99)


def body_sweep(src, dst, x0s):
    dst[:] = (x0s[:] + _nbr_sum(src[:])) * jnp.float32(IC)
    _write_faces(dst, N, 1.0, 1.0, 1.0)


def body_sweep_nofaces(src, dst, x0s):
    dst[:] = (x0s[:] + _nbr_sum(src[:])) * jnp.float32(IC)


def _iota(axis):
    return jax.lax.broadcasted_iota(jnp.int32, (N, N, N), axis)


def body_sweep_selects(src, dst, x0s):
    # No face writes: the neighbor operands substitute the face rule
    # in-place (interior cells only ever read single-extreme face cells,
    # whose value equals the adjacent interior plane — see _write_faces).
    # Bitwise the face-maintained sweep on interior cells; faces hold
    # junk during the loop and would be written once after it.
    p = src[:]
    pairs = []
    for ax in (0, 1, 2):
        i = _iota(ax)
        hi = jnp.where(i == N - 2, p, _roll(p, -1, ax))   # +1 neighbor
        lo = jnp.where(i == 1, p, _roll(p, 1, ax))        # -1 neighbor
        pairs.append(hi + lo)
    nbr = (pairs[2] + pairs[1]) + pairs[0]
    dst[:] = (x0s[:] + nbr) * jnp.float32(IC)


def body_sweep_facez(src, dst, x0s):
    # Face writes on the (cheap, contiguous) z axis only — isolates how
    # much of the 6-face cost lives on the y/x (sublane/lane) axes.
    dst[:] = (x0s[:] + _nbr_sum(src[:])) * jnp.float32(IC)
    dst[0:1] = dst[1:2]
    dst[N - 1:N] = dst[N - 2:N - 1]


def body_sweep_facezy(src, dst, x0s):
    dst[:] = (x0s[:] + _nbr_sum(src[:])) * jnp.float32(IC)
    dst[0:1] = dst[1:2]
    dst[N - 1:N] = dst[N - 2:N - 1]
    dst[:, 0:1] = dst[:, 1:2]
    dst[:, N - 1:N] = dst[:, N - 2:N - 1]


def body_sweep_selx(src, dst, x0s):
    # Hybrid: slice-written z/y faces + select-substituted x (lane) axis.
    p = src[:]
    i = _iota(2)
    hix = jnp.where(i == N - 2, p, _roll(p, -1, 2))
    lox = jnp.where(i == 1, p, _roll(p, 1, 2))
    nbr = ((hix + lox)
           + (_roll(p, -1, 1) + _roll(p, 1, 1))
           ) + (_roll(p, -1, 0) + _roll(p, 1, 0))
    dst[:] = (x0s[:] + nbr) * jnp.float32(IC)
    dst[0:1] = dst[1:2]
    dst[N - 1:N] = dst[N - 2:N - 1]
    dst[:, 0:1] = dst[:, 1:2]
    dst[:, N - 1:N] = dst[:, N - 2:N - 1]


def body_block2_toro(src, dst, x0s):
    # x0s doubles as the x1 volume here (perf probe): one iterate read,
    # one x1 read, one write per TWO sweeps — the composite's intended
    # traffic — but no intermediate-face plane corrections.
    dst[:] = x0s[:] + jnp.float32(IC * IC) * _nbr_sum(_nbr_sum(src[:]))
    _write_faces(dst, N, 1.0, 1.0, 1.0)


def body_direct19(src, dst, x0s):
    # N(N(p)) expanded into 19 taps with shared partial rolls — if Mosaic
    # streams this expression, the traffic is the same as block2_toro but
    # with no full-volume intermediate.
    p = src[:]
    r = {}
    for ax in (0, 1, 2):
        r[(ax, 1)] = _roll(p, -1, ax)    # +1 neighbor
        r[(ax, -1)] = _roll(p, 1, ax)
    acc = jnp.float32(6.0) * p
    for ax in (0, 1, 2):
        acc = acc + _roll(r[(ax, 1)], -1, ax) + _roll(r[(ax, -1)], 1, ax)
    diag = None
    for (a1, a2) in ((0, 1), (0, 2), (1, 2)):
        for s1 in (1, -1):
            for s2 in (1, -1):
                t = _roll(r[(a1, s1)], -s2, a2)
                diag = t if diag is None else diag + t
    acc = acc + jnp.float32(2.0) * diag
    dst[:] = x0s[:] + jnp.float32(IC * IC) * acc
    _write_faces(dst, N, 1.0, 1.0, 1.0)


def run(name, call):
    x = jnp.asarray(
        np.random.RandomState(0).rand(N, N, N).astype(np.float32)
    )

    @jax.jit
    def rollout(v):
        def one(carry, _):
            return call(carry), None
        return jax.lax.scan(one, v, None, length=REPS)[0]

    try:
        y = rollout(x)
        float(y.mean())  # compile+sync
    except Exception as exc:
        print(f"{name:14s} FAILED: {type(exc).__name__}: {exc}",
              flush=True)
        return
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        y = rollout(y)
        float(y.mean())
        best = min(best, (time.perf_counter() - t0) / REPS)
    per_pass_us = best * 1e6 / ITERS
    print(f"{name:14s} {best * 1e3:8.3f} ms/solve   "
          f"{per_pass_us:7.2f} us/iter", flush=True)


VARIANTS = {
    "copy": body_copy,
    "scale": body_scale,
    "sweep": body_sweep,
    "sweep_nofaces": body_sweep_nofaces,
    "sweep_selects": body_sweep_selects,
    "sweep_facez": body_sweep_facez,
    "sweep_facezy": body_sweep_facezy,
    "sweep_selx": body_sweep_selx,
    "block2_toro": body_block2_toro,
    "direct19": body_direct19,
}


def main():
    import os
    only = os.environ.get("VARIANTS", "")
    names = ([s for s in only.split(",") if s] if only else
             ["copy", "scale", "sweep", "sweep_nofaces", "block2_toro",
              "direct19"])
    print(f"n={N} iters={ITERS} reps={REPS} variants={names}", flush=True)
    for name in names:
        run(name, make_variant(VARIANTS[name]))
    if only:
        return

    # The PRODUCT composite (with plane corrections), via the real entry.
    from fluidsim_tpu.pallas.resident import jacobi_3d_resident

    for name, blk in (("product_sweep", 1), ("product_block2", 2),
                      ("product_block4", 4)):
        x = jnp.asarray(
            np.random.RandomState(0).rand(N, N, N).astype(np.float32)
        )
        x0 = x * jnp.float32(0.01)

        @jax.jit
        def rollout(v, x0=x0, blk=blk):
            def one(carry, _):
                return jacobi_3d_resident(0, carry, x0, 1.0, 6.0, ITERS,
                                          sweep_block=blk), None
            return jax.lax.scan(one, v, None, length=REPS)[0]

        try:
            y = rollout(x)
            float(y.mean())
        except Exception as exc:
            print(f"{name:14s} FAILED: {type(exc).__name__}", flush=True)
            continue
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            y = rollout(y)
            float(y.mean())
            best = min(best, (time.perf_counter() - t0) / REPS)
        print(f"{name:14s} {best * 1e3:8.3f} ms/solve   "
              f"{best * 1e6 / ITERS:7.2f} us/iter", flush=True)


if __name__ == "__main__":
    main()
