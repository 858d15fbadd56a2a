"""Pallas kernel semantics tests (interpreter mode — CPU).

Validates the VMEM-blocked kernels against the XLA oracle ops; the real
compiled path runs in bench.py on the TPU chip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fluidsim_tpu.ops.advect import advect_multi_3d
from fluidsim_tpu.ops.boundary import set_bnd_3d
from fluidsim_tpu.ops.linsolve import jacobi_3d
from fluidsim_tpu.pallas.advect import advect_multi_3d_pallas
from fluidsim_tpu.pallas.jacobi import jacobi_3d_pallas

pytestmark = pytest.mark.slow  # interpreter-mode Pallas suite


N = 16  # small: interpreter is slow; blocking picks slab=8, halo=T
N2 = 32  # y-tiled windows: the 8-aligned y halo needs py ≤ n


def consistent(b, key, shape=(N, N, N), scale=1.0):
    x = jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) * scale
    return set_bnd_3d(b, x, None)


def consistent2(b, key, scale=1.0):
    return consistent(b, key, shape=(N2, N2, N2), scale=scale)


@pytest.mark.parametrize("b", [0, 1, 2, 3])
@pytest.mark.parametrize("iters,block", [(2, 2), (5, 2), (8, 4)])
def test_jacobi_pallas_matches_xla(b, iters, block):
    x = consistent(b, 0)
    x0 = consistent(b, 1)
    ref = jacobi_3d(b, x, x0, 1.0, 6.0, None, iters)
    got = jacobi_3d_pallas(b, x, x0, 1.0, 6.0, iters, block_iters=block,
                           interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6
    )


@pytest.mark.parametrize("b", [0, 3])
@pytest.mark.parametrize("tile", [None, 8])
def test_jacobi_slab_kernel_matches_xla(monkeypatch, b, tile):
    """The temporally-blocked slab kernel directly (the ≥160³ path — the
    resident shortcut is bypassed), full-width and y-tiled windows."""
    import fluidsim_tpu.pallas.resident as res

    monkeypatch.setattr(res, "resident_fits", lambda *a, **k: False)
    x = consistent2(b, 7)
    x0 = consistent2(b, 8)
    ref = jacobi_3d(b, x, x0, 1.0, 6.0, None, iters=6)
    got = jacobi_3d_pallas(b, x, x0, 1.0, 6.0, 6, block_iters=2,
                           interpret=True, force_tile_y=tile)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6
    )


def test_jacobi_pallas_diffusion_coeffs():
    a = np.float32(0.13)
    c = np.float32(1 + 6 * 0.13)
    x = consistent(0, 3)
    x0 = consistent(0, 4)
    ref = jacobi_3d(0, x, x0, float(a), float(c), None, 6)
    got = jacobi_3d_pallas(0, x, x0, float(a), float(c), 6, block_iters=2,
                           interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6
    )


def test_advect_pallas_matches_xla():
    fields = jnp.stack([consistent(b, 10 + b, scale=2.0) for b in (1, 2, 3)])
    vel = jnp.stack([consistent(b, 20 + b, scale=0.4) for b in (1, 2, 3)])
    dt = 0.02
    ref = advect_multi_3d((1, 2, 3), fields, vel, dt, None, window=2)
    got = advect_multi_3d_pallas((1, 2, 3), fields, vel, dt, None, window=2,
                                 interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6
    )


def test_advect_pallas_single_field_with_obstacles():
    d = consistent(0, 30, scale=3.0)[None]
    vel = jnp.stack([consistent(b, 40 + b, scale=0.3) for b in (1, 2, 3)])
    obst = np.zeros((N, N, N), bool)
    obst[6:9, 6:9, 6:9] = True
    obst = jnp.asarray(obst)
    ref = advect_multi_3d((0,), d, vel, 0.02, obst, window=2)
    got = advect_multi_3d_pallas((0,), d, vel, 0.02, obst, window=2,
                                 interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6
    )


def test_advect_pallas_insub_matches_xla_substep():
    """In-kernel substepping (n_sub=2) equals the XLA substep composition."""
    from fluidsim_tpu.ops.advect import advect_substep_3d

    fields = jnp.stack([consistent(b, 50 + b, scale=2.0) for b in (1, 2, 3)])
    vel = jnp.stack([consistent(b, 60 + b, scale=0.4) for b in (1, 2, 3)])
    dt = 0.03
    ref = advect_substep_3d((1, 2, 3), fields, vel, dt, None, window=1,
                            n_sub=2)
    got = advect_multi_3d_pallas((1, 2, 3), fields, vel, dt, None, window=1,
                                 n_sub=2, interpret=True)
    # The kernel computes dt0 = f32(dt·(n−2))/n_sub, the XLA composition
    # f32(dt/n_sub)·(n−2) — a 1-ulp backtrace difference that can flip a
    # hat-weight boundary on isolated cells.
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=1e-5
    )


def _box_obst():
    obst = np.zeros((N, N, N), bool)
    obst[6:10, 5:9, 7:11] = True
    return jnp.asarray(obst)


@pytest.mark.parametrize("n_sub", [1, 2])
def test_advect_pallas_y_tiled_matches_full_width(n_sub):
    """y-tiled windows (the ≥512³ configuration, forced here at N=16)
    equal the full-width kernel and the XLA oracle."""
    from fluidsim_tpu.ops.advect import advect_substep_3d

    fields = jnp.stack([consistent2(b, 110 + b, scale=2.0)
                        for b in (1, 2, 3)])
    vel = jnp.stack([consistent2(b, 120 + b, scale=0.3) for b in (1, 2, 3)])
    dt = 0.02
    if n_sub == 1:
        ref = advect_multi_3d((1, 2, 3), fields, vel, dt, None, window=1)
    else:
        ref = advect_substep_3d((1, 2, 3), fields, vel, dt, None, window=1,
                                n_sub=n_sub)
    got = advect_multi_3d_pallas((1, 2, 3), fields, vel, dt, None, window=1,
                                 n_sub=n_sub, interpret=True,
                                 force_tile_y=8)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=1e-5
    )


def test_advect_pallas_y_tiled_obstacles():
    """y-tiled + obstacles + in-kernel substeps (the mirror path on
    tiled windows)."""
    from fluidsim_tpu.ops.advect import advect_substep_3d

    fields = jnp.stack([consistent2(b, 130 + b, scale=2.0)
                        for b in (1, 2, 3)])
    vel = jnp.stack([consistent2(b, 140 + b, scale=0.3) for b in (1, 2, 3)])
    obst = np.zeros((N2, N2, N2), bool)
    obst[10:16, 9:15, 12:20] = True
    obst = jnp.asarray(obst)
    ref = advect_substep_3d((1, 2, 3), fields, vel, 0.03, obst, window=1,
                            n_sub=2)
    got = advect_multi_3d_pallas((1, 2, 3), fields, vel, 0.03, obst,
                                 window=1, n_sub=2, interpret=True,
                                 force_tile_y=8)
    # atol: the dt0-grouping ulp difference (see
    # test_advect_pallas_insub_matches_xla_substep) can flip a hat-weight
    # boundary on isolated cells; through the obstacle mirror's count
    # branch that measures up to ~2e-5 on ~1 cell in 1e5.
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=5e-5
    )


def test_advect_pallas_velocity_obstacle_mirror():
    """Velocity advection with obstacles: the in-kernel output contract
    (zero + faces + obstacle mirror per component) equals the XLA
    composition — including the set_bnd obstacle mirror."""
    fields = jnp.stack([consistent(b, 70 + b, scale=2.0) for b in (1, 2, 3)])
    vel = jnp.stack([consistent(b, 80 + b, scale=0.3) for b in (1, 2, 3)])
    obst = _box_obst()
    ref = advect_multi_3d((1, 2, 3), fields, vel, 0.02, obst, window=2)
    got = advect_multi_3d_pallas((1, 2, 3), fields, vel, 0.02, obst,
                                 window=2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6
    )


def test_advect_pallas_insub_obstacles_matches_xla_substep():
    """In-kernel substepping WITH obstacles (round-2: the mask window
    rides along; zero+faces+mirror run per substep on-chip) equals the
    XLA substep composition."""
    from fluidsim_tpu.ops.advect import advect_substep_3d

    fields = jnp.stack([consistent(b, 90 + b, scale=2.0) for b in (1, 2, 3)])
    vel = jnp.stack([consistent(b, 95 + b, scale=0.3) for b in (1, 2, 3)])
    obst = _box_obst()
    dt = 0.03
    ref = advect_substep_3d((1, 2, 3), fields, vel, dt, obst, window=1,
                            n_sub=2)
    got = advect_multi_3d_pallas((1, 2, 3), fields, vel, dt, obst, window=1,
                                 n_sub=2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=1e-5
    )


def test_advect_pallas_insub_obstacles_density():
    from fluidsim_tpu.ops.advect import advect_substep_3d

    d = consistent(0, 99, scale=3.0)[None]
    vel = jnp.stack([consistent(b, 96 + b, scale=0.3) for b in (1, 2, 3)])
    obst = _box_obst()
    ref = advect_substep_3d((0,), d, vel, 0.03, obst, window=1, n_sub=2)
    got = advect_multi_3d_pallas((0,), d, vel, 0.03, obst, window=1,
                                 n_sub=2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=1e-5
    )


def test_jacobi_resident_obstacle_matches_xla():
    """Obstacle copy-through folded into the resident kernel (VERDICT r1
    item 5) equals the XLA oracle's masked sweep."""
    from fluidsim_tpu.pallas.resident import jacobi_3d_resident

    obst = _box_obst()
    x = consistent(0, 80)
    x0 = consistent(0, 81)
    ref = jacobi_3d(0, x, x0, 1.0, 6.0, obst, 8)
    got = jacobi_3d_resident(0, x, x0, 1.0, 6.0, 8, obst=obst,
                             interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6
    )


def test_project_resident_obstacle_matches_xla():
    """Resident projection with a static obstacle mask (in-kernel
    copy-through, gradient masking, and set_bnd obstacle mirror) equals
    the full XLA projection."""
    from fluidsim_tpu.ops.project import project_3d
    from fluidsim_tpu.pallas.project import project_3d_pallas

    obst = _box_obst()
    vel = jnp.stack([consistent(b, 90 + b, scale=1.0) for b in (1, 2, 3)])
    ref_vel, ref_p = project_3d(vel, obst, iters=8)
    got_vel, got_p = project_3d_pallas(vel, iters=8, interpret=True,
                                       obst=obst)
    np.testing.assert_allclose(
        np.asarray(got_vel), np.asarray(ref_vel), rtol=3e-5, atol=3e-6
    )
    core = (slice(1, -1),) * 3
    np.testing.assert_allclose(
        np.asarray(got_p)[core], np.asarray(ref_p)[core],
        rtol=3e-5, atol=3e-6,
    )


def _obst2d(n=64):
    o = np.zeros((n, n), bool)
    o[24:34, 28:40] = True
    return jnp.asarray(o)


@pytest.mark.parametrize("b", [0, 1, 2])
@pytest.mark.parametrize("smooth", [False, True])
def test_lin_solve_2d_resident_matches_xla(b, smooth):
    """The whole-solve-in-VMEM 2D kernel is BIT-EXACT vs the XLA
    reference-parity solvers (true division, corner averaging, obstacle
    mirror) — required because 2D is the parity path."""
    from fluidsim_tpu.ops.boundary import set_bnd_2d
    from fluidsim_tpu.ops.linsolve import diffuse_smooth_2d, lin_solve_2d
    from fluidsim_tpu.pallas.resident2d import lin_solve_2d_resident

    n = 64
    obst = _obst2d(n)
    key = jax.random.PRNGKey(5 * b + (1 if smooth else 0))
    x = set_bnd_2d(b, jax.random.normal(key, (n, n), jnp.float32), obst)
    x0 = set_bnd_2d(
        b, jax.random.normal(jax.random.PRNGKey(99 + b), (n, n),
                             jnp.float32), obst
    )
    a, c = 0.21, float(1 + 6 * 0.21)
    if smooth:
        ref = diffuse_smooth_2d(b, x0, a, c, obst, 20)
        got = lin_solve_2d_resident(b, x0, x0, a, c, obst, 20,
                                    smooth=True, interpret=True)
    else:
        ref = lin_solve_2d(b, x, x0, a, c, obst, 20)
        got = lin_solve_2d_resident(b, x, x0, a, c, obst, 20,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_advect_project_matches_composition():
    """The experimental one-kernel advect+project (persistent-VMEM
    handoff) is bit-exact vs the two-kernel composition.  It is NOT
    dispatched by the product step (4× slower compiled — combined-phase
    register pressure; see its docstring), but stays validated here."""
    from fluidsim_tpu.pallas.resident import (
        advect_project_3d_resident,
        project_3d_resident,
    )

    dt = 0.03
    vel = jnp.stack([consistent(b, 110 + b, scale=0.5) for b in (1, 2, 3)])
    for n_sub, win in ((1, 1), (2, 1)):
        adv = advect_multi_3d_pallas((1, 2, 3), vel, vel, dt, None,
                                     window=win, n_sub=n_sub,
                                     interpret=True)
        ref_v, ref_p = project_3d_resident(adv, 8, interpret=True)
        got_v, got_p = advect_project_3d_resident(
            vel, 8, dt, window=win, n_sub=n_sub, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
        np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))


def test_project_pallas_matches_xla():
    """Fused div/Jacobi/grad projection equals the XLA projection on
    interior cells and velocity faces (div/p faces are solver-internal)."""
    from fluidsim_tpu.ops.project import project_3d
    from fluidsim_tpu.pallas.project import project_3d_pallas

    vel = jnp.stack([consistent(b, 70 + b, scale=1.0) for b in (1, 2, 3)])
    ref_vel, ref_p = project_3d(vel, None, iters=8)
    got_vel, got_p = project_3d_pallas(vel, iters=8, block_iters=4,
                                       interpret=True)
    np.testing.assert_allclose(
        np.asarray(got_vel), np.asarray(ref_vel), rtol=3e-5, atol=3e-6
    )
    core = (slice(1, -1),) * 3
    np.testing.assert_allclose(
        np.asarray(got_p)[core], np.asarray(ref_p)[core],
        rtol=3e-5, atol=3e-6,
    )


def test_advect_pallas_self_advect_aliasing():
    """Velocity self-advection (fields IS vel, object identity) takes the
    aliased single-DMA path and equals both the XLA composition and the
    non-aliased kernel (fresh array copy → two-operand path)."""
    from fluidsim_tpu.ops.advect import advect_substep_3d

    vel = jnp.stack([consistent(b, 60 + b, scale=0.3) for b in (1, 2, 3)])
    dt = 0.03
    for n_sub in (1, 2):
        ref = advect_substep_3d((1, 2, 3), vel, vel, dt, None, window=1,
                                n_sub=n_sub)
        got = advect_multi_3d_pallas((1, 2, 3), vel, vel, dt, None,
                                     window=1, n_sub=n_sub, interpret=True)
        unaliased = advect_multi_3d_pallas(
            (1, 2, 3), jnp.array(vel), vel, dt, None, window=1,
            n_sub=n_sub, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(unaliased))


def test_advect_pallas_self_advect_aliasing_obstacles():
    """Self-advection aliasing with the in-kernel obstacle contract
    (substeps: zero + faces + mirror per substep)."""
    from fluidsim_tpu.ops.advect import advect_substep_3d

    vel = jnp.stack([consistent(b, 64 + b, scale=0.3) for b in (1, 2, 3)])
    obst = _box_obst()
    dt = 0.03
    ref = advect_substep_3d((1, 2, 3), vel, vel, dt, obst, window=1, n_sub=3)
    got = advect_multi_3d_pallas((1, 2, 3), vel, vel, dt, obst, window=1,
                                 n_sub=3, interpret=True)
    unaliased = advect_multi_3d_pallas(
        (1, 2, 3), jnp.array(vel), vel, dt, obst, window=1, n_sub=3,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=5e-5
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(unaliased))


def test_advect_pallas_buoy_fold_matches_composition():
    """``buoy=(density, b, ambient, g)`` folds buoyancy_force into the
    self-advect kernel's window loads — the fold replays the exact same
    f32 expression on the window, so the only deviation from the
    XLA-composed ``advect(buoyancy_force(vel), …)`` is XLA's FMA
    contraction clustering: ≤1 ulp on the force FMA (verified: the
    eager and jitted evaluations of buoyancy_force itself already
    differ by that much), which advection propagates but does not
    amplify beyond a few ulps."""
    from fluidsim_tpu.ops.forces import buoyancy_force

    vel = jnp.stack([consistent(b, 70 + b, scale=0.3) for b in (1, 2, 3)])
    dens = jnp.abs(consistent(0, 77, scale=1.0))
    dt = 0.03
    for n_sub, (b_f, amb, grav) in ((1, (0.9, 0.1, 0.0)),
                                    (2, (0.4, 0.0, 0.2))):
        ref_v = buoyancy_force(vel, dens, dt, b_f, amb, grav)
        ref = advect_multi_3d_pallas((1, 2, 3), ref_v, ref_v, dt, None,
                                     window=1, n_sub=n_sub, interpret=True)
        got = advect_multi_3d_pallas((1, 2, 3), vel, vel, dt, None,
                                     window=1, n_sub=n_sub, interpret=True,
                                     buoy=(dens, b_f, amb, grav))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def test_step_buoy_fold_wiring(monkeypatch):
    """simulate_step_3d with cfg.fuse_buoyancy=True (the default) on the
    Pallas substep path produces the same state as the step with the
    standalone XLA buoyancy pass (fuse_buoyancy=False) up to FMA
    contraction on the force (≤1 ulp, then propagated through one
    advect + projection — still f32-roundoff class)."""
    import functools

    import fluidsim_tpu as fs
    import fluidsim_tpu.models.stable3d as s3
    import fluidsim_tpu.pallas.advect as pa
    import fluidsim_tpu.pallas.project as pp
    from fluidsim_tpu.models.stable3d import simulate_step_3d

    monkeypatch.setattr(s3, "_pallas_usable", lambda cfg: True)
    monkeypatch.setattr(
        pp, "project_3d_pallas",
        functools.partial(pp.project_3d_pallas, interpret=True),
    )
    monkeypatch.setattr(
        pp, "project_advect_density_3d_pallas",
        functools.partial(pp.project_advect_density_3d_pallas,
                          interpret=True),
    )
    monkeypatch.setattr(
        pa, "advect_multi_3d_pallas",
        functools.partial(pa.advect_multi_3d_pallas, interpret=True),
    )

    cfg = fs.get_preset("smoke32").replace(
        advection_scheme="substep", advect_substeps=1, advect_window=1,
        jacobi_iters=4, diffusion=0.0, enable_obstacle=False,
        buoyancy=0.8, fuse_project_advect=True,
        density_dissipation=5.0, velocity_damping=3.0,
    )
    state = fs.zeros_state(cfg)
    d = jnp.abs(consistent2(0, 180, scale=1.0))
    v = jnp.stack([consistent2(b, 181 + b, scale=0.3) for b in (1, 2, 3)])
    state = state.replace(density=d, velocity=v)

    out_fold = simulate_step_3d(state, cfg)
    out_xla = simulate_step_3d(state, cfg.replace(fuse_buoyancy=False))
    np.testing.assert_allclose(
        np.asarray(out_fold.density), np.asarray(out_xla.density),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_fold.velocity), np.asarray(out_xla.velocity),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_fold.pressure), np.asarray(out_xla.pressure),
        rtol=1e-5, atol=1e-6,
    )


def test_src_field_add_matches_apply_one():
    """``src_field_add`` on a full grid replays ``_apply_one``'s density
    add (same f32 coordinate/falloff dataflow) from the packed
    ``emitter_fold_operand`` descriptor."""
    import fluidsim_tpu as fs
    from fluidsim_tpu.scene.sources import (
        apply_custom_source,
        emitter_fold_operand,
        src_field_add,
    )

    cfg = fs.get_preset("smoke32").replace(
        enable_custom_source=True, source_strength=9.0, source_radius=4.0,
        source_position=(0.4, 0.2, 0.6), source_emits_velocity=False,
    )
    dens = jnp.abs(consistent2(0, 190, scale=1.0))
    vel = jnp.stack([consistent2(b, 191 + b, scale=0.3) for b in (1, 2, 3)])
    t = jnp.float32(0.7)
    ref_d, ref_v = apply_custom_source(dens, vel, cfg, t)
    got = src_field_add(dens, emitter_fold_operand(cfg, t), 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_d),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ref_v), np.asarray(vel))

    # Windowed evaluation with a traced z origin matches the full-grid
    # slice (global-coordinate pointwise math).
    op = emitter_fold_operand(cfg, t)
    win = src_field_add(dens[8:24], op, z0=jnp.int32(8))
    np.testing.assert_array_equal(np.asarray(win),
                                  np.asarray(got[8:24]))


def test_step_emitter_fold_wiring(monkeypatch):
    """simulate_step_3d with the ``src`` folded-emitter operand (and the
    emitter skipped by the caller) matches apply_custom_source followed
    by the plain step — covering both in-kernel apply sites (the buoy
    density window in the self-advect kernel, the fused projection's
    density phase) up to FMA-contraction rounding."""
    import functools

    import fluidsim_tpu as fs
    import fluidsim_tpu.models.stable3d as s3
    import fluidsim_tpu.pallas.advect as pa
    import fluidsim_tpu.pallas.project as pp
    from fluidsim_tpu.models.stable3d import emitter_folds, simulate_step_3d
    from fluidsim_tpu.scene.sources import (
        apply_custom_source,
        emitter_fold_operand,
    )

    monkeypatch.setattr(s3, "_pallas_usable", lambda cfg: True)
    monkeypatch.setattr(
        pp, "project_3d_pallas",
        functools.partial(pp.project_3d_pallas, interpret=True),
    )
    monkeypatch.setattr(
        pp, "project_advect_density_3d_pallas",
        functools.partial(pp.project_advect_density_3d_pallas,
                          interpret=True),
    )
    monkeypatch.setattr(
        pa, "advect_multi_3d_pallas",
        functools.partial(pa.advect_multi_3d_pallas, interpret=True),
    )

    for buoyancy in (0.8, 0.0):
        cfg = fs.get_preset("smoke32").replace(
            advection_scheme="substep", advect_substeps=1, advect_window=1,
            jacobi_iters=4, diffusion=0.0, enable_obstacle=False,
            buoyancy=buoyancy, fuse_project_advect=True,
            # The fold is opt-in since BENCH_r04 measured it a loss in
            # the bench harness; numerics stay covered here.
            fuse_emitter=True,
            density_dissipation=5.0, velocity_damping=3.0,
            enable_custom_source=True, source_strength=7.0,
            source_radius=5.0, source_position=(0.5, 0.3, 0.5),
            source_emits_velocity=False,
        )
        assert emitter_folds(cfg)
        state = fs.zeros_state(cfg)
        d = jnp.abs(consistent2(0, 200, scale=1.0))
        v = jnp.stack([consistent2(b, 201 + b, scale=0.3)
                       for b in (1, 2, 3)])
        state = state.replace(density=d, velocity=v)
        t = state.time + jnp.float32(cfg.effective_params()[0])

        out_fold = simulate_step_3d(
            state, cfg, src=emitter_fold_operand(cfg, t)
        )
        rd, rv = apply_custom_source(state.density, state.velocity, cfg, t)
        out_ref = simulate_step_3d(state.replace(density=rd, velocity=rv),
                                   cfg)
        np.testing.assert_allclose(
            np.asarray(out_fold.density), np.asarray(out_ref.density),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(out_fold.velocity), np.asarray(out_ref.velocity),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(out_fold.pressure), np.asarray(out_ref.pressure),
            rtol=1e-5, atol=1e-6,
        )


def _div_int(vel):
    n = vel.shape[-1]
    d = (jnp.roll(vel[2], -1, 2) - jnp.roll(vel[2], 1, 2)
         + jnp.roll(vel[1], -1, 1) - jnp.roll(vel[1], 1, 1)
         + jnp.roll(vel[0], -1, 0) - jnp.roll(vel[0], 1, 0))
    return d[1:-1, 1:-1, 1:-1]


@pytest.mark.parametrize("with_obst", [False, True])
def test_project_resident_bf16_solve(with_obst):
    """solve_dtype='bfloat16' (narrow in-VMEM iterate/rhs, f32 sweep
    arithmetic): removes divergence as effectively as the f32 solve and
    stays close to it — the iterate rounding is the same order as the
    fixed-iteration Jacobi truncation.  This pins the bound behind the
    round-5 promotion into preset_bench_128: on-chip over 3000 bench128
    steps the divergence-residual ratio measured ≤1.013 at every
    checkpoint and mass drift ≤1.2e-3 (tools/bf16_solve_accuracy.py;
    docs/KERNELS.md); the 1.1 ratio asserted here is the generous
    kernel-level envelope of that measurement."""
    from fluidsim_tpu.pallas.project import project_3d_pallas

    obst = _box_obst() if with_obst else None
    vel = jnp.stack([consistent(b, 70 + b, scale=1.0) for b in (1, 2, 3)])
    f_vel, f_p = project_3d_pallas(vel, iters=20, interpret=True, obst=obst)
    b_vel, b_p = project_3d_pallas(vel, iters=20, interpret=True, obst=obst,
                                   solve_dtype="bfloat16")
    assert b_vel.dtype == vel.dtype and b_p.dtype == vel.dtype
    assert not bool(jnp.isnan(b_vel).any())
    # Divergence removal quality within 10% of the f32 solve.
    r0 = float(jnp.abs(_div_int(vel)).max())
    rf = float(jnp.abs(_div_int(f_vel)).max())
    rb = float(jnp.abs(_div_int(b_vel)).max())
    assert rb <= max(rf * 1.1, 0.02 * r0)
    # Velocity agrees to bf16-rounding order.
    scale = float(jnp.abs(f_vel).max())
    np.testing.assert_allclose(np.asarray(b_vel), np.asarray(f_vel),
                               atol=2e-2 * scale)
    if with_obst:
        # set_bnd obstacle mirror (fused in-kernel, applied per component
        # along its own axis): an obstacle cell with obstacle neighbors
        # on both sides of that axis mirrors to exactly zero.
        o = np.asarray(obst)
        got = np.asarray(b_vel)
        for comp, ax in ((0, 2), (1, 1), (2, 0)):
            interior = o & np.roll(o, 1, ax) & np.roll(o, -1, ax)
            interior[0], interior[-1] = False, False
            interior[:, 0], interior[:, -1] = False, False
            interior[:, :, 0], interior[:, :, -1] = False, False
            assert np.all(got[comp][interior] == 0.0)
    # Faces stay set_bnd-consistent (the in-kernel slice writes ran in
    # the narrow dtype too): re-applying the face rule is a no-op.
    from fluidsim_tpu.ops.boundary import set_bnd_3d as _sb

    for c in range(3):
        redone = _sb(c + 1, b_vel[c], obst)
        np.testing.assert_array_equal(np.asarray(redone),
                                      np.asarray(b_vel[c]))


def test_fused_project_density_advect_matches_composition():
    """The PRODUCT fused projection+density-advect kernel
    (cfg.fuse_project_advect → pallas/resident.py
    project_advect_density_3d_resident) is bitwise the unfused
    composition: resident projection, then the standalone advect kernel
    backtracing the density through the projected velocity."""
    from fluidsim_tpu.pallas.resident import (
        project_3d_resident,
        project_advect_density_3d_resident,
    )

    dt = 0.03
    vel = jnp.stack([consistent2(b, 130 + b, scale=0.5) for b in (1, 2, 3)])
    dens = jnp.abs(consistent2(0, 133, scale=2.0))
    for n_sub, win in ((1, 1), (2, 1), (2, 2)):
        ref_v, ref_p = project_3d_resident(vel, 8, interpret=True)
        ref_d = advect_multi_3d_pallas((0,), dens[None], ref_v, dt, None,
                                       window=win, n_sub=n_sub,
                                       interpret=True)[0]
        got_v, got_p, got_d = project_advect_density_3d_resident(
            vel, dens, 8, dt, window=win, n_sub=n_sub, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
        np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
        np.testing.assert_array_equal(np.asarray(got_d), np.asarray(ref_d))


@pytest.mark.parametrize("solve_dtype", [None, "bfloat16"])
def test_fused_project_density_advect_bf16(solve_dtype):
    """bfloat16 field storage (and optionally bf16 solve buffers) through
    the fused kernel: bitwise the unfused bf16 composition, dtypes
    preserved, values finite."""
    from fluidsim_tpu.pallas.resident import (
        project_3d_resident,
        project_advect_density_3d_resident,
    )

    dt = 0.03
    vel = jnp.stack(
        [consistent2(b, 140 + b, scale=0.5) for b in (1, 2, 3)]
    ).astype(jnp.bfloat16)
    dens = jnp.abs(consistent2(0, 144, scale=2.0)).astype(jnp.bfloat16)
    ref_v, ref_p = project_3d_resident(vel, 8, interpret=True,
                                       solve_dtype=solve_dtype)
    ref_d = advect_multi_3d_pallas((0,), dens[None], ref_v, dt, None,
                                   window=1, n_sub=2, interpret=True)[0]
    got_v, got_p, got_d = project_advect_density_3d_resident(
        vel, dens, 8, dt, window=1, n_sub=2, solve_dtype=solve_dtype,
        interpret=True,
    )
    assert got_v.dtype == jnp.bfloat16 and got_d.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got_v, np.float32), np.asarray(ref_v, np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(got_p, np.float32), np.asarray(ref_p, np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(got_d, np.float32), np.asarray(ref_d, np.float32)
    )
    assert np.isfinite(np.asarray(got_d, np.float32)).all()


@pytest.mark.parametrize("diffusion,damping,dissipation", [
    (0.0, 0.0, 0.0), (0.0002, 0.0, 0.0),
    (0.0, 3.0, 0.0),   # velocity damping folded into the fused kernel
    (0.0, 3.0, 5.0),   # + density dissipation folded into the out windows
])
def test_step_fuse_project_advect_wiring(monkeypatch, diffusion, damping,
                                         dissipation):
    """simulate_step_3d with cfg.fuse_project_advect=True produces the
    SAME state as the unfused step on the Pallas path (interpret mode),
    including the reordered density diffusion (diffuse commutes with the
    projection: disjoint state), the in-kernel velocity damping
    (bitwise the XLA project→damp→advect order), and the in-kernel
    density dissipation (storage-dtype multiply on the out windows —
    bitwise the XLA advect→dissipate order)."""
    import functools

    import fluidsim_tpu as fs
    import fluidsim_tpu.models.stable3d as s3
    import fluidsim_tpu.pallas.advect as pa
    import fluidsim_tpu.pallas.project as pp
    from fluidsim_tpu.models.stable3d import simulate_step_3d

    monkeypatch.setattr(s3, "_pallas_usable", lambda cfg: True)
    monkeypatch.setattr(
        pp, "project_3d_pallas",
        functools.partial(pp.project_3d_pallas, interpret=True),
    )
    monkeypatch.setattr(
        pp, "project_advect_density_3d_pallas",
        functools.partial(pp.project_advect_density_3d_pallas,
                          interpret=True),
    )
    monkeypatch.setattr(
        pa, "advect_multi_3d_pallas",
        functools.partial(pa.advect_multi_3d_pallas, interpret=True),
    )

    cfg = fs.get_preset("smoke32").replace(
        advection_scheme="substep", advect_substeps=2, advect_window=1,
        jacobi_iters=4, diffusion=diffusion, enable_obstacle=False,
        velocity_damping=damping, density_dissipation=dissipation,
    )
    state = fs.zeros_state(cfg)
    d = jnp.abs(consistent2(0, 150, scale=1.0))
    v = jnp.stack([consistent2(b, 151 + b, scale=0.3) for b in (1, 2, 3)])
    state = state.replace(density=d, velocity=v)

    out_unfused = simulate_step_3d(state, cfg)
    out_fused = simulate_step_3d(
        state, cfg.replace(fuse_project_advect=True)
    )
    np.testing.assert_array_equal(
        np.asarray(out_fused.density), np.asarray(out_unfused.density)
    )
    np.testing.assert_array_equal(
        np.asarray(out_fused.velocity), np.asarray(out_unfused.velocity)
    )
    np.testing.assert_array_equal(
        np.asarray(out_fused.pressure), np.asarray(out_unfused.pressure)
    )


def test_full_step_kernel_matches_composition():
    """The full-step fused kernel (cfg.fuse_self_advect →
    pallas/resident.full_step_3d_resident: self-advect → project →
    density advect in ONE program) is bitwise the three-kernel
    composition: standalone self-advection, resident projection, then
    the standalone advect kernel backtracing the density through the
    projected velocity."""
    from fluidsim_tpu.pallas.resident import (
        full_step_3d_resident,
        project_3d_resident,
    )

    dt = 0.03
    vel = jnp.stack([consistent2(b, 160 + b, scale=0.5) for b in (1, 2, 3)])
    dens = jnp.abs(consistent2(0, 164, scale=2.0))
    for n_sub, win in ((1, 1), (2, 1), (2, 2)):
        adv = advect_multi_3d_pallas((1, 2, 3), vel, vel, dt, None,
                                     window=win, n_sub=n_sub,
                                     interpret=True)
        ref_v, ref_p = project_3d_resident(adv, 8, interpret=True)
        ref_d = advect_multi_3d_pallas((0,), dens[None], ref_v, dt, None,
                                       window=win, n_sub=n_sub,
                                       interpret=True)[0]
        got_v, got_p, got_d = full_step_3d_resident(
            vel, dens, 8, dt, window=win, n_sub=n_sub, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
        np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
        np.testing.assert_array_equal(np.asarray(got_d), np.asarray(ref_d))


def test_full_step_kernel_bf16():
    """bfloat16 field storage through the full-step fused kernel:
    bitwise the unfused bf16 composition, dtypes preserved, finite."""
    from fluidsim_tpu.pallas.resident import (
        full_step_3d_resident,
        project_3d_resident,
    )

    dt = 0.03
    vel = jnp.stack(
        [consistent2(b, 170 + b, scale=0.5) for b in (1, 2, 3)]
    ).astype(jnp.bfloat16)
    dens = jnp.abs(consistent2(0, 174, scale=2.0)).astype(jnp.bfloat16)
    adv = advect_multi_3d_pallas((1, 2, 3), vel, vel, dt, None,
                                 window=1, n_sub=2, interpret=True)
    ref_v, ref_p = project_3d_resident(adv, 8, interpret=True)
    ref_d = advect_multi_3d_pallas((0,), dens[None], ref_v, dt, None,
                                   window=1, n_sub=2, interpret=True)[0]
    got_v, got_p, got_d = full_step_3d_resident(
        vel, dens, 8, dt, window=1, n_sub=2, interpret=True
    )
    assert got_v.dtype == jnp.bfloat16 and got_d.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got_v, np.float32), np.asarray(ref_v, np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(got_p, np.float32), np.asarray(ref_p, np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(got_d, np.float32), np.asarray(ref_d, np.float32)
    )
    assert np.isfinite(np.asarray(got_d, np.float32)).all()


@pytest.mark.parametrize("damping", [0.0, 3.0])
def test_step_fuse_self_advect_wiring(monkeypatch, damping):
    """simulate_step_3d with cfg.fuse_self_advect=True produces the SAME
    state as the unfused step on the Pallas path (interpret mode),
    including folded velocity damping."""
    import functools

    import fluidsim_tpu as fs
    import fluidsim_tpu.models.stable3d as s3
    import fluidsim_tpu.pallas.advect as pa
    import fluidsim_tpu.pallas.project as pp
    from fluidsim_tpu.models.stable3d import simulate_step_3d

    monkeypatch.setattr(s3, "_pallas_usable", lambda cfg: True)
    monkeypatch.setattr(
        pp, "project_3d_pallas",
        functools.partial(pp.project_3d_pallas, interpret=True),
    )
    monkeypatch.setattr(
        pp, "full_step_3d_pallas",
        functools.partial(pp.full_step_3d_pallas, interpret=True),
    )
    monkeypatch.setattr(
        pa, "advect_multi_3d_pallas",
        functools.partial(pa.advect_multi_3d_pallas, interpret=True),
    )

    cfg = fs.get_preset("smoke32").replace(
        advection_scheme="substep", advect_substeps=2, advect_window=1,
        jacobi_iters=4, diffusion=0.0002, enable_obstacle=False,
        velocity_damping=damping,
    )
    state = fs.zeros_state(cfg)
    d = jnp.abs(consistent2(0, 180, scale=1.0))
    v = jnp.stack([consistent2(b, 181 + b, scale=0.3) for b in (1, 2, 3)])
    state = state.replace(density=d, velocity=v)

    out_unfused = simulate_step_3d(state, cfg)
    out_fused = simulate_step_3d(
        state, cfg.replace(fuse_project_advect=True, fuse_self_advect=True)
    )
    np.testing.assert_array_equal(
        np.asarray(out_fused.density), np.asarray(out_unfused.density)
    )
    np.testing.assert_array_equal(
        np.asarray(out_fused.velocity), np.asarray(out_unfused.velocity)
    )
    np.testing.assert_array_equal(
        np.asarray(out_fused.pressure), np.asarray(out_unfused.pressure)
    )


@pytest.mark.parametrize("iters,block", [
    (2, 2), (3, 2), (8, 2), (20, 2),
    (3, 3), (7, 3),            # shell path + leftover single sweeps
    (4, 4), (8, 4), (20, 4),   # the bench sweep-block candidate
])
def test_jacobi_sweep_block_matches_sequential(iters, block):
    """Composite sweep blocking (jacobi_3d_resident sweep_block=T):
    T Jacobi iterations per VMEM pass with the intermediate set_bnd
    face rule reproduced exactly (T=2: delta plane corrections; T≥3:
    shell-exact plane recomputation).  Same iteration count as the
    sequential sweeps; the only difference is f32 reassociation in the
    deep interior, so the result must agree to a few ulps — bounded at
    1e-6 relative (measured ~1.5e-7).  The wall-adjacent planes of a
    single T≥3 block are BITWISE sequential (the shell recurrence runs
    the exact per-cell arithmetic)."""
    from fluidsim_tpu.pallas.resident import jacobi_3d_resident

    x = consistent2(0, 300, scale=1.0)
    x0 = consistent2(1, 301, scale=1.0)
    ref = np.asarray(jacobi_3d_resident(0, x, x0, 1.0, 6.0, iters,
                                        interpret=True))
    got = np.asarray(jacobi_3d_resident(0, x, x0, 1.0, 6.0, iters,
                                        interpret=True, sweep_block=block))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() <= 1e-6 * scale
    if block >= 3 and iters == block:
        # One block exactly: replaced planes 1..T−1 are bitwise.
        for j in list(range(1, block)) + [N2 - 1 - j
                                          for j in range(1, block)]:
            np.testing.assert_array_equal(got[j], ref[j], err_msg=f"z={j}")
            np.testing.assert_array_equal(got[:, j], ref[:, j])
            np.testing.assert_array_equal(got[:, :, j], ref[:, :, j])


@pytest.mark.parametrize("block,obst_on", [
    (2, False), (4, False), (2, True), (4, True),
])
def test_project_sweep_block_matches_sequential(block, obst_on):
    """project_3d_resident(sweep_block=T) at 60 iterations (the
    bench128/vortex128 solves) stays within 1e-6 relative of the
    sequential-sweep projection on both the velocity and the pressure;
    with obstacles the copy-through stays exact (p ≡ 0 in solids)."""
    from fluidsim_tpu.pallas.resident import project_3d_resident

    vel = jnp.stack([consistent2(b, 310 + b, scale=0.5) for b in (1, 2, 3)])
    obst = None
    if obst_on:
        o = np.zeros((N2, N2, N2), bool)
        o[10:16, 9:15, 12:20] = True
        obst = jnp.asarray(o)
    rv, rp = project_3d_resident(vel, 60, obst=obst, interpret=True)
    gv, gp = project_3d_resident(vel, 60, obst=obst, interpret=True,
                                 sweep_block=block)
    rv, rp, gv, gp = (np.asarray(v) for v in (rv, rp, gv, gp))
    assert np.abs(gv - rv).max() <= 1e-6 * np.abs(rv).max()
    assert np.abs(gp - rp).max() <= 1e-6 * np.abs(rp).max()
    if obst_on:
        assert (gp[np.asarray(obst)] == 0).all()


def test_project_double_sweep_bf16_solve():
    """Composite double sweep with bfloat16 solve buffers (the
    quarter-traffic contender): stays in the bf16 accuracy class vs
    both the sequential bf16 solve and the f32 reference (x1 is f32 and
    the iterate rounds once per two sweeps, so it cannot be worse than
    sequential bf16's class)."""
    from fluidsim_tpu.pallas.resident import project_3d_resident

    vel = jnp.stack([consistent2(b, 330 + b, scale=0.5) for b in (1, 2, 3)])
    rv, rp = project_3d_resident(vel, 60, interpret=True,
                                 solve_dtype="bfloat16")
    gv, gp = project_3d_resident(vel, 60, interpret=True,
                                 solve_dtype="bfloat16", sweep_block=2)
    fv, fp = project_3d_resident(vel, 60, interpret=True)
    rv, gv, fv = (np.asarray(v) for v in (rv, gv, fv))
    scale = np.abs(fv).max()
    assert np.abs(gv - rv).max() <= 3e-2 * scale   # same bf16 class
    assert np.abs(gv - fv).max() <= 3e-2 * scale   # sane vs f32 truth


def test_step_jacobi_sweep_block_wiring(monkeypatch):
    """simulate_step_3d with cfg.jacobi_sweep_block=T (bench128's
    shape) dispatches the composite solve and the full step stays within
    1e-5 relative of the single-sweep step; with obstacles the composite
    runs through the coefficient-volume path (copy-through distributes
    through it) to the same tolerance."""
    import functools

    import fluidsim_tpu as fs
    import fluidsim_tpu.models.stable3d as s3
    import fluidsim_tpu.pallas.advect as pa
    import fluidsim_tpu.pallas.project as pp
    from fluidsim_tpu.models.stable3d import simulate_step_3d
    from fluidsim_tpu.scene.obstacles import build_obstacle_mask

    monkeypatch.setattr(s3, "_pallas_usable", lambda cfg: True)
    monkeypatch.setattr(
        pp, "project_3d_pallas",
        functools.partial(pp.project_3d_pallas, interpret=True),
    )
    monkeypatch.setattr(
        pa, "advect_multi_3d_pallas",
        functools.partial(pa.advect_multi_3d_pallas, interpret=True),
    )

    # solve_dtype pinned to f32: this test asserts the composite
    # blocking's f32-REASSOCIATION bound; bench128 ships bf16 solve
    # buffers (round 5), whose rounding would swamp the 1e-5 tolerance
    # (bf16-composed coverage: test_fused_project_density_advect_bf16).
    cfg = fs.get_preset("bench128").replace(
        size=N2, jacobi_iters=8, source_radius=2.0,
        solve_dtype="float32",
    )
    state = fs.zeros_state(cfg)
    d = jnp.abs(consistent2(0, 320, scale=1.0))
    v = jnp.stack([consistent2(b, 321 + b, scale=0.3) for b in (1, 2, 3)])
    state = state.replace(density=d, velocity=v)

    out_ref = simulate_step_3d(state, cfg)
    out_dbl = simulate_step_3d(
        state, cfg.replace(jacobi_sweep_block=4)
    )
    for name in ("density", "velocity", "pressure"):
        r = np.asarray(getattr(out_ref, name))
        g = np.asarray(getattr(out_dbl, name))
        assert np.abs(g - r).max() <= 1e-5 * max(np.abs(r).max(), 1e-6), name

    # Obstacles: the composite runs through the coefficient-volume path
    # (the per-cell copy-through multiplier distributes through the
    # double sweep) — same few-ulp tolerance, and obstacle interiors
    # keep exactly zero velocity.
    cfg_o = fs.get_preset("vortex128").replace(
        size=N2, jacobi_iters=4, source_radius=2.0,
    )
    obst = jnp.asarray(build_obstacle_mask(cfg_o))
    state_o = fs.zeros_state(cfg_o, obstacles=obst).replace(
        density=d, velocity=v
    )
    out_o_ref = simulate_step_3d(state_o, cfg_o)
    out_o_dbl = simulate_step_3d(
        state_o, cfg_o.replace(jacobi_sweep_block=2)
    )
    for name in ("density", "velocity", "pressure"):
        r = np.asarray(getattr(out_o_ref, name))
        g = np.asarray(getattr(out_o_dbl, name))
        assert np.abs(g - r).max() <= 1e-5 * max(np.abs(r).max(), 1e-6), name
    inner = np.asarray(obst).copy()
    inner[0] = inner[-1] = False
    inner[:, 0] = inner[:, -1] = False
    inner[:, :, 0] = inner[:, :, -1] = False
    assert np.abs(np.asarray(out_o_dbl.velocity)[:, inner]).max() == 0.0


@pytest.mark.parametrize("n_sub,window,solve_dtype", [
    (1, 1, None),
    (2, 1, None),
    (2, 2, None),             # multi-cell CFL window with the mask
    (2, 1, "bfloat16"),       # bf16 solve buffers + obstacle coef planes
])
def test_fused_project_density_advect_obstacles(n_sub, window, solve_dtype):
    """Obstacle variant of the fused projection+density-advect kernel
    (cfg.fuse_project_advect with a static mask — the vortex128 shape):
    bitwise the unfused composition (obstacle-aware resident projection,
    then the standalone advect kernel with the mask).  Covers the
    in-kernel per-substep contract (n_sub > 1), the single-substep
    kernel+host-mask path (n_sub = 1) — for b=0 both reduce to
    fresh-zero walls/solids + faces, which the fused density phase
    applies per substep in-values — plus a multi-cell window and the
    bfloat16 solve-buffer mode."""
    from fluidsim_tpu.pallas.resident import (
        project_3d_resident,
        project_advect_density_3d_resident,
    )

    dt = 0.03
    vel = jnp.stack([consistent2(b, 190 + b, scale=0.5) for b in (1, 2, 3)])
    dens = jnp.abs(consistent2(0, 194, scale=2.0))
    obst = np.zeros((N2, N2, N2), bool)
    obst[10:16, 9:15, 12:20] = True
    obst = jnp.asarray(obst)
    ref_v, ref_p = project_3d_resident(vel, 8, obst=obst, interpret=True,
                                       solve_dtype=solve_dtype)
    ref_d = advect_multi_3d_pallas((0,), dens[None], ref_v, dt, obst,
                                   window=window, n_sub=n_sub,
                                   interpret=True)[0]
    got_v, got_p, got_d = project_advect_density_3d_resident(
        vel, dens, 8, dt, window=window, n_sub=n_sub, obst=obst,
        solve_dtype=solve_dtype, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(ref_d))


@pytest.mark.parametrize("damping", [0.0, 3.0])
def test_step_fuse_project_advect_obstacle_wiring(monkeypatch, damping):
    """simulate_step_3d with cfg.fuse_project_advect=True on an OBSTACLE
    config (vortex128's shape: buoyancy + vorticity confinement + static
    mask + substep advection) produces the SAME state as the unfused
    step on the Pallas path (interpret mode) — with and without folded
    velocity damping (the damp multiply runs after the obstacle mirror,
    matching the XLA order)."""
    import functools

    import fluidsim_tpu as fs
    import fluidsim_tpu.models.stable3d as s3
    import fluidsim_tpu.pallas.advect as pa
    import fluidsim_tpu.pallas.project as pp
    from fluidsim_tpu.models.stable3d import simulate_step_3d
    from fluidsim_tpu.scene.obstacles import build_obstacle_mask

    monkeypatch.setattr(s3, "_pallas_usable", lambda cfg: True)
    monkeypatch.setattr(
        pp, "project_3d_pallas",
        functools.partial(pp.project_3d_pallas, interpret=True),
    )
    monkeypatch.setattr(
        pp, "project_advect_density_3d_pallas",
        functools.partial(pp.project_advect_density_3d_pallas,
                          interpret=True),
    )
    monkeypatch.setattr(
        pa, "advect_multi_3d_pallas",
        functools.partial(pa.advect_multi_3d_pallas, interpret=True),
    )

    cfg = fs.get_preset("vortex128").replace(
        size=N2, jacobi_iters=4, advect_substeps=2, source_radius=2.0,
        velocity_damping=damping,
    )
    obst = jnp.asarray(build_obstacle_mask(cfg))
    state = fs.zeros_state(cfg, obstacles=obst)
    d = jnp.abs(consistent2(0, 200, scale=1.0))
    v = jnp.stack([consistent2(b, 201 + b, scale=0.3) for b in (1, 2, 3)])
    state = state.replace(density=d, velocity=v)

    out_unfused = simulate_step_3d(state, cfg)
    out_fused = simulate_step_3d(
        state, cfg.replace(fuse_project_advect=True)
    )
    np.testing.assert_array_equal(
        np.asarray(out_fused.density), np.asarray(out_unfused.density)
    )
    np.testing.assert_array_equal(
        np.asarray(out_fused.velocity), np.asarray(out_unfused.velocity)
    )
    np.testing.assert_array_equal(
        np.asarray(out_fused.pressure), np.asarray(out_unfused.pressure)
    )
