#!/usr/bin/env bash
# Pending on-chip measurements after the 2026-08-18 tunnel outage.
# Run from the repo root on the TPU host (takes ~30-60 min cold:
# Mosaic compiles are ~4-5 min per fresh config at >=256^3).
#
#   bash tools/onchip_remeasure.sh 2>&1 | tee /tmp/onchip_remeasure.log
#
# What it measures and why (all work landed tunnel-down, CPU-verified):
#   1. headline bench (self-advect aliasing + engine dispatch pipelining)
#   2. sa* microbench suites: aliased self-advect contender windows
#   3. vortex128 / multi256 preset p50 (aliasing affects their advects)
#   4. scene_a 2D check (unchanged paths; regression guard)
set -u
cd "$(dirname "$0")/.."

probe() {
  timeout 90 python -c "import jax, jax.numpy as jnp; print('probe ok', float(jnp.ones((4,4)).sum()))" || {
    echo "TUNNEL DOWN - aborting"; exit 1; }
}

probe

echo "=== 1. headline bench.py ==="
timeout 3000 python bench.py

echo "=== 2. microbench: aliased self-advect suites ==="
for s in sa128 sa128o sa256; do
  echo "--- suite $s ---"
  timeout 3000 python tools/microbench_kernels.py "$s"
done
# sa512 is ~15 min of compiles; run if time permits:
# timeout 3000 python tools/microbench_kernels.py sa512

echo "=== 3. preset benches (kernels) ==="
for p in vortex128 multi256; do
  echo "--- $p ---"
  timeout 3000 python -m fluidsim_tpu.cli bench --preset "$p" --steps 1000 --substeps 250
done

echo "=== 4. scene_a 2D regression ==="
timeout 3000 python -m fluidsim_tpu.cli bench --preset scene_a --steps 1000 --substeps 250

echo "=== 5. single-backtrace advection contender (tools/cfl_probe.py) ==="
# n_sub=1 = the reference's own single semi-Lagrangian backtrace; exact
# (no CFL clamping) iff bench128's max displacement stays <= 1 cell —
# verify with the cfl_probe output before promoting it to the preset.
timeout 3000 python -m fluidsim_tpu.cli bench --preset bench128 \
    --advect-substeps 1 --steps 1000 --substeps 250

echo "=== 5b. fused projection+density-advect contender ==="
# cfg.fuse_project_advect: the density backtraces through the projected
# velocity while it is still VMEM-resident — saves the density advect's
# full HBM velocity read and a dispatch.  Bitwise-equal to the unfused
# composition (tests/test_pallas_interpret.py).  Risk: single-program
# phase fusion could degrade Mosaic scheduling (cf. the rejected
# grid-phase advect+project union) — if slower, record it and leave the
# config default off.
timeout 3000 python -m fluidsim_tpu.cli bench --preset bench128 \
    --fuse-project-advect --steps 1000 --substeps 250
timeout 3000 python -m fluidsim_tpu.cli bench --preset bench128 \
    --fuse-project-advect --advect-substeps 1 --steps 1000 --substeps 250

echo "=== 5c. full-step one-kernel contender (self-advect + project + density) ==="
# cfg.fuse_self_advect: the whole hot step in ONE grid-less kernel —
# the self-advected velocity lands directly in the projection's
# resident VMEM volume (saves ~50 MB/step of HBM on top of 5b, plus
# two dispatches).  Bitwise-equal (tests/test_pallas_interpret.py).
# Risk: combined register pressure across the three phases (the
# rejected grid-phase fusion's failure mode) — if slower, record and
# leave the default off.
timeout 3000 python -m fluidsim_tpu.cli bench --preset bench128 \
    --fuse-self-advect --steps 1000 --substeps 250
timeout 3000 python -m fluidsim_tpu.cli bench --preset bench128 \
    --fuse-self-advect --advect-substeps 1 --steps 1000 --substeps 250

echo "=== 5d. obstacle-config fused contender (vortex128) ==="
# The two-phase fusion with a static obstacle mask: the projection folds
# the mask into coefficient planes (as the unfused resident kernel
# already does) and the density phase slices the VMEM-resident mask per
# window.  Bitwise-equal (tests/test_pallas_interpret.py).  Saves the
# density advect's velocity read (25 MB/step) + one dispatch on the
# vortex128 preset.
timeout 3000 python -m fluidsim_tpu.cli bench --preset vortex128 \
    --fuse-project-advect --steps 1000 --substeps 250

echo "=== 5e. composite sweep-block contenders ==="
# T Jacobi iterations per VMEM pass in the resident solve (X hoisted,
# the N-chain streamed, wall planes recomputed bitwise-sequentially).
# Same iteration count, ~1e-7-relative reassociation drift
# (tests/test_pallas_interpret.py).  Cuts the sweep loop's VMEM operand
# traffic ~T× IF Mosaic streams the intermediate neighbor sums without
# materializing them — exactly what this measurement decides; even
# fully materialized, T=4 still reads/writes 9 volumes per 4 sweeps
# vs 12 sequential.
for T in 2 4 8; do
timeout 3000 python -m fluidsim_tpu.cli bench --preset bench128 \
    --jacobi-sweep-block "$T" --steps 1000 --substeps 250
done
timeout 3000 python -m fluidsim_tpu.cli bench --preset bench128 \
    --jacobi-sweep-block 4 --fuse-self-advect --advect-substeps 1 \
    --steps 1000 --substeps 250
# Obstacle variant: the copy-through coefficient volume distributes
# through the composite (one extra coef read per pass; 5 vs 8 volume
# traffics per two sweeps).
timeout 3000 python -m fluidsim_tpu.cli bench --preset vortex128 \
    --jacobi-sweep-block 2 --steps 1000 --substeps 250
# Quarter-traffic contender: bf16 iterate reads + composite double sweep
# (x1 stays f32; bf16 accuracy class, tests/test_pallas_interpret.py).
timeout 3000 python -m fluidsim_tpu.cli bench --preset bench128 \
    --jacobi-sweep-block 2 --solve-dtype bfloat16 --steps 1000 \
    --substeps 250

echo "=== 6. bf16 solve-buffer contenders (VMEM-traffic-halved sweeps) ==="
# The 60-sweep loop is VMEM-operand-bandwidth bound (17.2 us/sweep =
# one f32 volume read+write at the measured ~900 GB/s); bfloat16
# iterate/rhs storage should roughly halve it.  Risk: Mosaic lane
# rotates on bf16 — if the compile fails, record that here.
timeout 3000 python -m fluidsim_tpu.cli bench --preset bench128 \
    --solve-dtype bfloat16 --steps 1000 --substeps 250
timeout 3000 python -m fluidsim_tpu.cli bench --preset bench128 \
    --solve-dtype bfloat16 --advect-substeps 1 --steps 1000 --substeps 250

echo "=== 7. combined contender (fuse + bf16 solve + single backtrace) ==="
timeout 3000 python -m fluidsim_tpu.cli bench --preset bench128 \
    --fuse-project-advect --solve-dtype bfloat16 --advect-substeps 1 \
    --steps 1000 --substeps 250
timeout 3000 python -m fluidsim_tpu.cli bench --preset bench128 \
    --fuse-self-advect --solve-dtype bfloat16 --advect-substeps 1 \
    --steps 1000 --substeps 250
# Kitchen sink: one-kernel step + composite sweep block + bf16 solve
# buffers + single backtrace — every independent traffic lever at once.
timeout 3000 python -m fluidsim_tpu.cli bench --preset bench128 \
    --fuse-self-advect --jacobi-sweep-block 4 --solve-dtype bfloat16 \
    --advect-substeps 1 --steps 1000 --substeps 250
# And with bf16 FIELD storage (halves the step's HBM traffic, which the
# fused kernels expose once the VMEM sweeps shrink).  NOTE: bf16 storage
# makes pstag bf16, which gates the double sweep off (x1 needs an f32
# volume) — this measures fusion + narrow storage only.
timeout 3000 python -m fluidsim_tpu.cli bench --preset bench128 \
    --fuse-self-advect --dtype bfloat16 \
    --advect-substeps 1 --steps 1000 --substeps 250

echo "ALL DONE"
