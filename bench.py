"""Headline benchmark: steps/sec at 128³ with 60-iter Jacobi projection.

BASELINE.json metric; north-star target ≥1000 steps/s on one TPU v5e chip
(the reference publishes no numbers — BASELINE.md).  ``vs_baseline`` is the
ratio against that 1000 steps/s target.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N, ...}

Deadline-proof by construction (round-2 lesson: the driver's timeout killed
the run before the final print and the round lost its official number):

* every completed measurement lands in a global ``RESULT`` dict;
* the JSON line is emitted exactly once by whichever fires first — normal
  completion, SIGTERM/SIGINT (the driver's ``timeout`` sends SIGTERM), or a
  watchdog *thread* that emits best-so-far at ``FLUIDSIM_BENCH_BUDGET_S``
  (default 1200 s) even if the main thread is wedged inside a native call
  (the axon tunnel's observed failure mode);
* each phase checks the remaining budget before starting, so the required
  fields (headline value, ``p50_step_raymarch_ms``) are produced first and
  optional contenders only run with time to spare.

Method: the bench128 preset (buoyancy + emitter + single semi-Lagrangian
backtrace + 60-iter Jacobi projection), stepped in ``lax.scan`` rollouts
of ``SUBSTEPS`` so host dispatch amortizes; timing excludes compilation
and synchronizes via an on-device scalar fetch.  Since round 4 the scene
is CFL-bounded by construction (max backtrace displacement measured
0.736 cells over 3000 steps — tools/validate_bench_scene.py), so the
preset's single K=1 backtrace is the reference's own advection scheme
(FluidSim.cs:1523-1576), exact and never window-clamped; the r3 scene
needed a 2-substep envelope that still clamped.  The headline is the
best of the same-numerics kernel arrangements (preset default / emitter
fold on / buoyancy fold off / full-step one-kernel / unfused);
different-class contenders
(bf16 solve buffers, plus the r3-era scene+2-substep arrangement for
cross-round comparability) are measured afterwards into ``contenders``
and never set the headline.  Roofline probes (HBM copy bandwidth,
host→device sync round trip) are embedded in the JSON so the ceiling
claim in docs/KERNELS.md is auditable from the artifact alone.

Env overrides: ``FLUIDSIM_BENCH_SUBSTEPS``, ``FLUIDSIM_BENCH_TRIALS``,
``FLUIDSIM_BENCH_PRESET``, ``FLUIDSIM_BENCH_BUDGET_S``,
``FLUIDSIM_BENCH_ALL=1`` (adds the measured-loser sweep_block variants).
"""

from __future__ import annotations

import atexit
import json
import os
import signal
import sys
import threading
import time

import numpy as np

# 3000-step rollouts: the only per-trial host cost is ONE on-device
# scalar fetch (~26 ms through this tunnel — sync_roundtrip_ms probe),
# i.e. 12.9 µs/step of measurement artifact at 1000-step rollouts and
# 4.3 µs/step at 3000 (a real v5e host sync is ~100 µs total).  The
# bench scene is steady-state bounded (tools/validate_bench_scene.py),
# so longer rollouts change amortization, not physics.
SUBSTEPS = int(os.environ.get("FLUIDSIM_BENCH_SUBSTEPS", 3000))
TRIALS = int(os.environ.get("FLUIDSIM_BENCH_TRIALS", 3))
PRESET = os.environ.get("FLUIDSIM_BENCH_PRESET", "bench128")
BUDGET_S = float(os.environ.get("FLUIDSIM_BENCH_BUDGET_S", 1200))
BENCH_ALL = os.environ.get("FLUIDSIM_BENCH_ALL", "") == "1"
TARGET_STEPS_PER_SEC = 1000.0  # BASELINE.json north star

T0 = time.monotonic()


def _elapsed() -> float:
    return time.monotonic() - T0


def _remaining() -> float:
    return BUDGET_S - _elapsed()


# ----------------------------------------------------------------------
# Single-shot result emission (normal exit / SIGTERM / watchdog).
# ----------------------------------------------------------------------

RESULT: dict = {
    "metric": ("steps/sec at 128^3 (60-iter Jacobi)" if PRESET == "bench128"
               else f"steps/sec ({PRESET})"),
    "unit": "steps/sec",
}
_EMIT_LOCK = threading.Lock()
_EMITTED = False


def _emit() -> int:
    """Print the one JSON line (best-so-far) exactly once.  Returns the
    exit code the caller should use (0 iff a headline value landed)."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return 0 if "value" in RESULT else 1
        _EMITTED = True
    if "value" in RESULT:
        out = dict(RESULT)
        out["vs_baseline"] = round(out["value"] / TARGET_STEPS_PER_SEC, 4)
        print(json.dumps(out), flush=True)
        return 0
    print(json.dumps({"error": RESULT.get(
        "error", "no measurement completed before emission")}), flush=True)
    return 1


def _emit_and_die(signum, frame):  # signal handler (SIGTERM/SIGINT)
    code = _emit()
    os._exit(code)


def _watchdog():
    # A thread (not SIGALRM): signal handlers only run on the main
    # thread's bytecode boundaries, so a main thread wedged in a native
    # jax call (tunnel hang) would never service them; a daemon thread
    # runs as soon as the GIL is free, which jax's blocking calls allow.
    deadline = BUDGET_S - 5.0
    while _elapsed() < deadline:
        time.sleep(min(5.0, deadline - _elapsed()))
    print(f"# watchdog: budget {BUDGET_S:.0f}s reached, emitting "
          "best-so-far", file=sys.stderr, flush=True)
    os._exit(_emit())


def _probe_backend() -> bool:
    """Run a trivial device computation in a THROWAWAY subprocess.

    The axon tunnel's observed failure mode is a SIGTERM-immune native
    hang at first backend init, so a dead tunnel would stall this process
    forever at the first jax call.  Probing in a subprocess — which
    ``subprocess.run`` SIGKILLs on timeout — lets the bench fail fast.
    The tunnel also *flaps* (outages observed from minutes to hours, with
    recovery mid-run), so the probe retries until only ~3 minutes of
    budget remain: with the persistent compile cache warm, the headline
    measurement itself needs ~110 s (BENCH_r03: default landed at
    t=113 s), so a late recovery still converts into an official number
    where the round-4 first attempt — which gave up at 40% of budget —
    recorded only an error JSON.
    """
    import subprocess

    code = "import jax, jax.numpy as jnp; print(float(jnp.ones((4,4)).sum()))"
    # A COLD `import jax` on this box takes ~50 s (measured; warm ~4 s),
    # so the per-attempt timeout floor must exceed it.  The deadline
    # reserves ~240 s after probe success for the headline itself
    # (cache-warm it lands in ~110-115 s — BENCH_r03) so a
    # latest-possible tunnel recovery still converts into an official
    # number instead of racing the watchdog (round-4 ADVICE: the old
    # BUDGET_S-180 deadline let a 150 s attempt succeed at
    # BUDGET_S-111 s, inside the headline's own window).
    probe_deadline = max(BUDGET_S - 240.0, min(130.0, 0.5 * BUDGET_S))
    attempt = 0
    while True:
        attempt += 1
        # Cap the attempt so a SUCCESS cannot land past the deadline;
        # the >= 90 s floor is guaranteed by the retry gate below
        # (except the guaranteed first attempt on tiny budgets).
        attempt_timeout = max(90.0, min(150.0, probe_deadline - _elapsed()))
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                timeout=attempt_timeout,
                capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if _elapsed() + 90.0 + 20.0 >= probe_deadline:
            return False
        print(f"# backend probe {attempt} failed; retrying in 20s",
              file=sys.stderr, flush=True)
        time.sleep(20.0)


def _scale_to_budget() -> None:
    """Budget-adaptive rollout sizing (round-4 VERDICT item 7).

    The 3000-step × 3-trial default assumes the 1200 s design budget;
    under a small ``FLUIDSIM_BENCH_BUDGET_S`` the fixed sizes left no
    room and the run emitted an error artifact (observed at 420 s).
    Called once, right after the backend probe succeeds: scales the
    rollout length and trial count down so any budget that survives the
    probe still yields a headline value.  Explicit env overrides win.
    Accuracy: the only substeps-dependent term is the per-trial sync
    amortization (~26 ms/rollout ≈ 4.3 µs/step at 3000, 13 µs/step at
    1000 — well under 3% of a ~1 ms step), so scaled runs read slightly
    LOW, never high.
    """
    global SUBSTEPS, TRIALS
    rem = _remaining()
    if rem >= 700.0:
        return
    if "FLUIDSIM_BENCH_SUBSTEPS" not in os.environ:
        SUBSTEPS = 1000 if rem >= 300.0 else 500
    if "FLUIDSIM_BENCH_TRIALS" not in os.environ:
        TRIALS = 2 if rem >= 300.0 else 1
    print(f"# budget {rem:.0f}s remaining: scaled to SUBSTEPS={SUBSTEPS} "
          f"TRIALS={TRIALS}", file=sys.stderr, flush=True)


def _roofline_probes(jax, jnp) -> dict:
    """Cheap on-device envelope probes, embedded in the JSON so the
    docs/KERNELS.md roofline defense is auditable from the artifact:
    * ``hbm_copy_gbps`` — read+write streaming bandwidth of a jitted
      elementwise scale over a 256 MB f32 array (the class of traffic
      that bounds the unfused step), with spread;
    * ``vmem_sweep_us`` — per-sweep cost of the resident Jacobi
      projection kernel (differential between 60- and 20-iteration
      solves on synthetic data), the envelope behind the "60-sweep
      solve is at the VMEM/VPU bound" claim in docs/KERNELS.md;
    * ``sync_roundtrip_ms`` — host→device dispatch + scalar fetch round
      trip (the per-rollout overhead the scan amortizes away).
    """
    probes = {}
    try:
        # Sync via a derived-scalar fetch: block_until_ready was observed
        # to return before the chain completed on this environment's
        # backends; fetching a value computed from the final array cannot.
        # That fetch costs one tunnel round trip (~27 ms here), so probes
        # time rep-count DIFFERENTIALS that cancel the constant sync.
        #
        # Round-4 hardening: the old two-point min-of-3 differential with
        # host-side rep loops once measured 1240 GB/s on an ~819 GB/s
        # part — host dispatch jitter inside the span and min() bias can
        # both corrupt a two-point slope.  Now the rep loop runs ON
        # DEVICE (lax.fori_loop with static trip count — zero per-rep
        # dispatch), the slope comes from a least-squares fit over four
        # trip counts, and the artifact records the median + spread of 5
        # independent rounds plus a suspect flag above the v5e datasheet
        # envelope.
        nelem = 64 * 1024 * 1024  # 256 MB f32; each rep reads + writes it
        x = jnp.arange(nelem, dtype=jnp.float32) * np.float32(1e-7)

        def make_chain(reps):
            def body(_, z):
                return z * np.float32(1.000001)
            return jax.jit(lambda v: jax.lax.fori_loop(0, reps, body, v))

        trip_counts = [8, 40, 72, 104]
        chains = {r: make_chain(r) for r in trip_counts}
        for r, f in chains.items():
            float(f(x).ravel()[0])  # compile + sync

        def timed(reps):
            t0 = time.perf_counter()
            float(chains[reps](x).ravel()[0])
            return time.perf_counter() - t0

        rounds = []
        for _ in range(5):
            ts = np.array([timed(r) for r in trip_counts])
            rs = np.array(trip_counts, dtype=np.float64)
            slope = np.polyfit(rs, ts, 1)[0]  # seconds per rep
            rounds.append(2 * 4 * nelem / slope / 1e9)
        rounds = sorted(rounds)
        probes["hbm_copy_gbps"] = round(float(np.median(rounds)), 1)
        probes["hbm_copy_gbps_spread"] = [round(float(rounds[0]), 1),
                                          round(float(rounds[-1]), 1)]
        if probes["hbm_copy_gbps"] > 850.0:  # v5e datasheet ~819 GB/s
            probes["hbm_probe_suspect"] = True

        # VMEM sweep envelope: (60-iter − 20-iter) resident projection
        # on synthetic 128³ velocity / 40 extra sweeps.  Chained on its
        # own output so one sync covers R solves; the differential
        # cancels the non-sweep phases (div/grad/DMA) and the sync.
        try:
            from fluidsim_tpu.pallas.project import project_3d_pallas

            n = 128
            vel = (jnp.arange(3 * n * n * n, dtype=jnp.float32)
                   .reshape(3, n, n, n) % 7) * np.float32(0.01)

            def make_solve(iters, reps):
                def body(_, v):
                    return project_3d_pallas(v, iters, obst=None)[0]
                return jax.jit(
                    lambda v: jax.lax.fori_loop(0, reps, body, v))

            # reps sized so the 40-extra-sweep differential (~256 × 40 ×
            # ~10 µs ≈ 100 ms) dominates the tunnel sync's ONE-SIDED
            # jitter (identical calls measured 59-111 ms apart); an
            # 8-rep first cut read 2.6 µs/sweep — 10× below the measured
            # in-kernel copy floor — because its ~3 ms differential was
            # noise.  min-of-N is the right estimator: delays only add.
            reps = 256
            solves = {it: make_solve(it, reps) for it in (20, 60)}
            for f in solves.values():
                float(f(vel).ravel()[0])  # compile + sync

            def timed_solve(it):
                t0 = time.perf_counter()
                float(solves[it](vel).ravel()[0])
                return time.perf_counter() - t0

            t20 = min(timed_solve(20) for _ in range(4))
            t60 = min(timed_solve(60) for _ in range(4))
            sweep_s = (t60 - t20) / (40 * reps)
            probes["vmem_sweep_us"] = round(sweep_s * 1e6, 2)
            # one iterate read + rhs read + iterate write per sweep
            probes["vmem_sweep_gbps"] = round(
                3 * 4 * n ** 3 / sweep_s / 1e9, 1)
        except Exception as exc:
            probes["vmem_probe_error"] = f"{type(exc).__name__}: {exc}"

        s = jnp.zeros(())
        g = jax.jit(lambda v: v + 1.0)
        float(g(s))
        t0 = time.perf_counter()
        k = 10
        for _ in range(k):
            s = g(s)
            float(s)  # force a device fetch each iteration
        probes["sync_roundtrip_ms"] = round(
            (time.perf_counter() - t0) * 1e3 / k, 2)
    except Exception as exc:  # probes must never block the headline
        probes["probe_error"] = f"{type(exc).__name__}: {exc}"
    return probes


def main() -> None:
    signal.signal(signal.SIGTERM, _emit_and_die)
    signal.signal(signal.SIGINT, _emit_and_die)
    threading.Thread(target=_watchdog, daemon=True).start()
    atexit.register(_emit)

    if not _probe_backend():
        RESULT["error"] = ("device backend unreachable (subprocess probe "
                           "timed out/failed); benchmark skipped")
        sys.exit(_emit())
    _scale_to_budget()

    # Persistent compilation cache: the Pallas kernels take minutes to
    # compile cold; repeated bench runs (and the driver's) hit the cache.
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"),
    )
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import fluidsim_tpu as fs
    from fluidsim_tpu.models.stable3d import emitter_folds, simulate_step_3d
    from fluidsim_tpu.scene.sources import (
        apply_custom_source,
        emitter_fold_operand,
    )

    probes_done = False

    def maybe_probes():
        # Roofline probes (~40 s) run AFTER the first headline
        # measurement: they are audit fields, and a late tunnel
        # recovery must spend its remaining budget on the required
        # metric first (round-4 lesson).
        nonlocal probes_done
        # 180 s floor: the VMEM-envelope probe may cold-compile a
        # 20-iter resident-solve variant (cached thereafter).
        if probes_done or _remaining() < 180.0:
            return
        probes_done = True
        RESULT["probes"] = _roofline_probes(jax, jnp)
        print(f"# probes: {RESULT['probes']} (t={_elapsed():.0f}s)",
              file=sys.stderr, flush=True)

    def build(cfg):
        state = fs.zeros_state(cfg)
        dt = np.float32(cfg.effective_params()[0])
        fold_src = emitter_folds(cfg)

        def one(state, _):
            t = state.time + dt
            if fold_src:
                # Folded emitter: the kernels apply the source on their
                # density window loads (models/stable3d.py ``src``).
                return simulate_step_3d(
                    state, cfg, src=emitter_fold_operand(cfg, t)
                ), None
            density, velocity = apply_custom_source(
                state.density, state.velocity, cfg, t
            )
            state = state.replace(density=density, velocity=velocity)
            return simulate_step_3d(state, cfg), None

        @jax.jit
        def rollout(state):
            return jax.lax.scan(one, state, None, length=SUBSTEPS)[0]

        return rollout, state

    def measure(vcfg, trials=TRIALS):
        """Compile + warm-up rollout, then best-of-``trials`` steps/s.
        Returns (steps/s, final_state)."""
        rollout, vstate = build(vcfg)
        vstate = rollout(vstate)           # compile + seed fields
        float(vstate.density.mean())       # sync
        vbest = 0.0
        for _ in range(trials):
            t0 = time.perf_counter()
            vstate = rollout(vstate)
            vstate = rollout(vstate)
            float(vstate.density.mean())   # device-complete sync
            vbest = max(vbest, 2 * SUBSTEPS / (time.perf_counter() - t0))
        return vbest, vstate

    base = fs.get_preset(PRESET)

    # -- phase 1: headline variants (same numerics class) ---------------
    # Ordered expected-winner-first so an early kill still records the
    # best-known arrangement.  The preset default IS the measured winner
    # (r3 contender 982.83 steps/s: single backtrace + fuse_project_
    # advect, now with the buoyancy fold on top); the others are
    # regression tripwires.
    variants = [
        ("default", base),
        # The emitter fold measured a LOSS in this harness (BENCH_r04:
        # 949.64 on vs 1000.76 off) and was demoted to opt-in; kept as
        # a tripwire in case a toolchain update flips it back.
        ("src_fold", base.replace(fuse_emitter=True)),
        ("no_buoy_fold", base.replace(fuse_buoyancy=False)),
        ("fuse_full_step", base.replace(fuse_project_advect=True,
                                        fuse_self_advect=True)),
        ("unfused", base.replace(fuse_project_advect=False,
                                 fuse_self_advect=False)),
    ]
    if BENCH_ALL:
        # Measured losers on this chip (r02: sweep_block2 at 296 vs 588
        # base — Mosaic materializes the intermediate neighbor sums).
        # Kept behind the flag for re-evaluation after toolchain updates.
        variants += [
            ("sweep_block2", base.replace(jacobi_sweep_block=2)),
            ("sweep_block4", base.replace(jacobi_sweep_block=4)),
            ("fuse_full_step+sweep_block4",
             base.replace(fuse_project_advect=True, fuse_self_advect=True,
                          jacobi_sweep_block=4)),
        ]

    best, best_cfg, best_state = 0.0, None, None
    RESULT["variants"] = {}
    p50_done = False

    def maybe_p50(cfg, state):
        """Second BASELINE metric: p50 step+raymarch frame time — one
        fused step+volumetric-render program per frame (what a live
        viewer pays, dispatch included).  Measured as scanned chunks of
        frames with one sync; per-frame host dispatches through the axon
        tunnel would add ~36 ms round-trip artifact otherwise."""
        nonlocal p50_done
        if p50_done or _remaining() < 0.35 * BUDGET_S:
            return
        p50_done = True
        from fluidsim_tpu.render.raymarch import render_frame_3d

        dt = np.float32(cfg.effective_params()[0])
        fold_src = emitter_folds(cfg)

        def one_frame(state, _):
            t = state.time + dt
            if fold_src:
                st = simulate_step_3d(
                    state, cfg, src=emitter_fold_operand(cfg, t)
                )
            else:
                density, velocity = apply_custom_source(
                    state.density, state.velocity, cfg, t
                )
                st = simulate_step_3d(
                    state.replace(density=density, velocity=velocity), cfg
                )
            return st, render_frame_3d(st, cfg).mean()

        CHUNK = 200

        @jax.jit
        def frame_chunk(state):
            return jax.lax.scan(one_frame, state, None, length=CHUNK)

        state, means = frame_chunk(state)
        float(means[0])  # compile + sync
        times = []
        for _ in range(7):
            t0 = time.perf_counter()
            state, means = frame_chunk(state)
            float(means[0])
            times.append((time.perf_counter() - t0) * 1e3 / CHUNK)
        RESULT["p50_step_raymarch_ms"] = round(
            float(np.percentile(times, 50)), 2)
        print(f"# p50 step+raymarch: {RESULT['p50_step_raymarch_ms']} ms "
              f"(t={_elapsed():.0f}s)", file=sys.stderr, flush=True)

    for name, vcfg in variants:
        if best > 0.0 and _remaining() < 0.3 * BUDGET_S:
            print(f"# skipping variant {name}: {_remaining():.0f}s left",
                  file=sys.stderr, flush=True)
            continue
        try:
            vbest, vstate = measure(vcfg)
        except Exception as exc:  # Pallas/Mosaic compile hiccup
            if name == "default" and best == 0.0:
                # The headline must still report: XLA fallback.
                print(f"# pallas path failed ({type(exc).__name__}); "
                      "falling back to kernel_backend='xla'",
                      file=sys.stderr, flush=True)
                vcfg = vcfg.replace(kernel_backend="xla")
                vbest, vstate = measure(vcfg)
            else:
                print(f"# variant {name} failed ({type(exc).__name__}); "
                      "skipped", file=sys.stderr, flush=True)
                continue
        print(f"# {name}: {vbest:.2f} steps/s (t={_elapsed():.0f}s)",
              file=sys.stderr, flush=True)
        RESULT["variants"][name] = round(vbest, 2)
        if vbest > best:
            if bool(jnp.isnan(vstate.density).any()):
                print(f"# variant {name} produced NaNs; not promoted",
                      file=sys.stderr, flush=True)
                continue
            best, best_cfg, best_state = vbest, vcfg, vstate
            RESULT["value"] = round(best, 2)
            RESULT["variant"] = name
            RESULT["step_ms"] = round(1e3 / best, 3)
        if name == "default" and best > 0.0:
            # p50 lands right after the first successful measurement —
            # it is a required artifact field, not an optional extra.
            maybe_p50(best_cfg, best_state)
            maybe_probes()

    if best == 0.0:
        RESULT["error"] = "every variant failed to measure"
        sys.exit(_emit())
    maybe_p50(best_cfg, best_state)
    maybe_probes()

    # -- phase 2: accuracy-class contenders (never set the headline) ----
    # f32_solve is the parity tripwire for the shipped bf16 solve
    # buffers (promoted round 5 after the tools/bf16_solve_accuracy.py
    # audit: divergence residual within 1.3% of f32's over 3000 steps;
    # config.py preset_bench_128 docstring).  legacy_r3_scene is the
    # EXACT round-3 headline config (fast unbounded scene + 2-substep
    # 2-cell envelope; 771.75 steps/s in BENCH_r03.json) kept for
    # cross-round comparability of the per-step cost.
    contenders = [
        ("f32_solve", base.replace(solve_dtype="float32")),
        ("legacy_r3_scene", base.replace(
            time_step=0.03, buoyancy=1.0, source_strength=150.0,
            density_dissipation=0.0, velocity_damping=0.0,
            advect_substeps=2)),
    ]
    RESULT.setdefault("contenders", {})
    for name, vcfg in contenders:
        if _remaining() < 0.25 * BUDGET_S:
            print(f"# skipping contender {name}: {_remaining():.0f}s left",
                  file=sys.stderr, flush=True)
            break
        try:
            vbest, vstate = measure(vcfg, trials=2)
        except Exception as exc:
            print(f"# contender {name} failed ({type(exc).__name__})",
                  file=sys.stderr, flush=True)
            continue
        nan = bool(jnp.isnan(vstate.density).any())
        print(f"# contender {name}: {vbest:.2f} steps/s nan={nan} "
              f"(t={_elapsed():.0f}s)", file=sys.stderr, flush=True)
        RESULT["contenders"][name] = round(vbest, 2) if not nan else "NaN"

    sys.exit(_emit())


if __name__ == "__main__":
    main()
