"""Regression tests for the kernel window pickers' calibrated cost model.

The expected picks are the on-chip measured winners recorded in
``tools/microbench_kernels.py`` and docs/KERNELS.md ("Calibrated window
picker"); if a cost-model edit flips one of these, it must come with a
new measurement.
"""

from fluidsim_tpu.pallas.advect import _pick_slab
from fluidsim_tpu.pallas.jacobi import _pick_block, pick_blocking


def test_advect_picks_headline_configs():
    # 128³ always full-width: y-tiled DMA degrades to 512-byte bursts
    # below n=256 (measured 15% slower on vortex128).
    assert _pick_slab(128, 3, 2, False) == (32, 2, None)
    assert _pick_slab(128, 3, 6, True) == (16, 2, None)   # vortex128
    # 256³ K=1×2: tiled (16,1,128) measured 12.29 ms vs full-width
    # (8,1,None) 13.91 ms.
    assert _pick_slab(256, 3, 2, False) == (16, 1, 128)   # multi256
    # 512³: (8,2,64) at 1.875× redundancy, not first-fit's (4,2,128)
    # at 2.25×.
    assert _pick_slab(512, 3, 2, False) == (8, 2, 64)     # sharded512


def test_advect_pick_none_when_infeasible():
    # Obstacle halo 8 at 512³: even the smallest tiled window busts the
    # VMEM budget — must fall back to XLA, not return a bogus config.
    assert _pick_slab(512, 3, 8, True) is None


def test_fused_pickers_reject_halo_larger_than_slab():
    """Interior slabs are written at the STATIC offset `halo`
    (resident._when_offset), which requires halo <= slab; the choosers
    must reject such configs so the engine falls back to the unfused
    path instead of the kernel raising at trace time (ADVICE r2)."""
    from fluidsim_tpu.pallas.resident import (
        full_step_fits,
        project_advect_fits,
    )

    # window=3, n_sub=3 → halo=9: feasible only via slab 8 by the old
    # geometric checks (8 % 40 at n=40... use n=40: slab 8 divides,
    # 8+18=26 <= 40) — must now return None.
    assert project_advect_fits(40, 3, 3) is None
    assert full_step_fits(40, 3, 3) is None
    # Sanity: the headline configs still pick.
    assert project_advect_fits(128, 1, 2) is not None
    assert full_step_fits(128, 1, 2) is not None


def test_jacobi_pick_block_returns_ratio():
    pick, ratio = _pick_block(128, 10)
    assert pick == (64, 10, None)
    assert ratio == (64 + 20) / 64  # full-width window redundancy


def test_ext_pickers_cover_v5e8_shard_shapes():
    """The extended-slab pickers (per-shard kernels) must stay in sync
    with the shared cost model — pin the v5e-8 local-shard picks
    (lz=64, n=512, the BASELINE config-5 shape)."""
    from fluidsim_tpu.pallas.halo_kernel import (
        _pick_ext_advect,
        _pick_ext_block,
    )

    assert _pick_ext_block(72, 512, 4) == (36, 64)    # jacobi, T=4
    assert _pick_ext_block(74, 512, 5) == (37, 64)    # jacobi, T=5
    assert _pick_ext_advect(68, 512, 3, 2) == (4, 128)  # advect K=1×2
    # Infeasible shapes must return None (→ XLA fallback / clear error).
    assert _pick_ext_advect(8 + 2 * 16, 512, 3, 16) is None


def test_jacobi_cross_t_selection():
    # 256³: (64, T=10, tile 64) measured 13.56 ms — beats every smaller-T
    # candidate despite higher redundancy (fewer HBM passes).
    assert pick_blocking(256, 10) == ((64, 10, 64), 10)
    # 512³: T=10 is feasible (16, 10, 64) but loses to T=5's (32, 5, 64)
    # (71.6 ms vs 86.3/78.7 for the alternatives) — the regression that
    # motivated the cross-T cost model.
    assert pick_blocking(512, 10) == ((32, 5, 64), 5)
    # 128³ fits full-width at T=10 (moot in product — the resident
    # whole-volume kernel takes over below ~160³).
    assert pick_blocking(128, 10) == ((64, 10, None), 10)


def test_obstacle_resident_spill_calibration():
    """Round-5 toolchain calibration: the OBSTACLE resident projection's
    register allocator spills ~9 volume-equivalents (solve dtype) on
    compiled Mosaic — measured 135.75 MB OOM at f32/128³ vs a compiling
    bf16 arrangement; the FUSED obstacle kernel OOMs in both dtypes
    (155.14 / 130.92 MB).  These pins must only move with a new on-chip
    measurement (vortex128 preset docstring records the evidence)."""
    from fluidsim_tpu.pallas.resident import (
        project_advect_fits,
        resident_obstacle_fits,
    )

    assert not resident_obstacle_fits(128, 4)   # f32: measured OOM
    assert resident_obstacle_fits(128, 2)       # bf16: measured fit
    assert resident_obstacle_fits(64, 4)        # small grids keep f32

    # Fused obstacle kernel at 128³: rejected for both dtypes when
    # compiled; interpret keeps the branch testable on CPU.
    assert project_advect_fits(128, 1, 3, solve_bytes=4,
                               has_obst=True, compiled=True) is None
    assert project_advect_fits(128, 1, 3, solve_bytes=2,
                               has_obst=True, compiled=True) is None
    assert project_advect_fits(32, 1, 2, solve_bytes=4,
                               has_obst=True, compiled=False) is not None
    # Obstacle-free fused path is unaffected by the spill term.
    assert project_advect_fits(128, 1, 1, solve_bytes=2,
                               has_obst=False, compiled=True) is not None
