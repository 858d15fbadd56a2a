"""Per-op float32 parity against the NumPy oracle (SURVEY.md §4:
"Unit tests per kernel against tiny-grid NumPy oracles")."""

import numpy as np
import pytest

import jax.numpy as jnp

from fluidsim_tpu.ops.advect import advect_2d
from fluidsim_tpu.ops.boundary import set_bnd_2d
from fluidsim_tpu.ops.forces import enforce_obstacle_boundaries_2d
from fluidsim_tpu.ops.linsolve import diffuse_smooth_2d, lin_solve_2d
from fluidsim_tpu.ops.project import project_2d

import oracle2d


N = 20
RNG = np.random.RandomState(42)


def rand_field(n=N, scale=1.0):
    return (RNG.randn(n, n) * scale).astype(np.float32)


def rand_obstacles(n=N):
    obst = np.zeros((n, n), dtype=bool)
    obst[7:11, 8:12] = True   # a block
    obst[14, 3] = True        # an isolated cell
    obst[3:5, 14:17] = True
    return obst


@pytest.mark.parametrize("b", [0, 1, 2])
def test_set_bnd(b):
    x = rand_field()
    obst = rand_obstacles()
    expected = x.copy()
    oracle2d.set_bnd(b, expected, obst)
    got = np.asarray(set_bnd_2d(b, jnp.asarray(x), jnp.asarray(obst)))
    np.testing.assert_allclose(got, expected, rtol=0, atol=1e-7)


@pytest.mark.parametrize("b", [0, 1, 2])
def test_diffuse_smooth(b):
    x0 = rand_field()
    obst = rand_obstacles()
    a, c = np.float32(0.13), np.float32(1.0 + 6 * 0.13)
    expected = oracle2d.diffuse_with_jobs(b, x0, a, c, obst, iters=20)
    got = np.asarray(
        diffuse_smooth_2d(b, jnp.asarray(x0), float(a), float(c),
                          jnp.asarray(obst), iters=20)
    )
    np.testing.assert_allclose(got, expected, rtol=2e-6, atol=1e-6)


@pytest.mark.parametrize("b", [0, 1, 2])
def test_lin_solve(b):
    x = rand_field()
    x0 = rand_field()
    obst = rand_obstacles()
    a, c = np.float32(1.0), np.float32(6.0)
    expected = oracle2d.lin_solve_with_jobs(b, x, x0, a, c, obst, iters=20)
    got = np.asarray(
        lin_solve_2d(b, jnp.asarray(x), jnp.asarray(x0), float(a), float(c),
                     jnp.asarray(obst), iters=20)
    )
    np.testing.assert_allclose(got, expected, rtol=2e-6, atol=1e-6)


@pytest.mark.parametrize("b", [0, 1, 2])
def test_advect(b):
    d0 = rand_field(scale=3.0)
    vx = rand_field(scale=0.8)
    vy = rand_field(scale=0.8)
    obst = rand_obstacles()
    dt = np.float32(0.1)
    expected = oracle2d.advect(b, d0, vx, vy, dt, obst)
    got = np.asarray(
        advect_2d(b, jnp.asarray(d0), jnp.asarray(vx), jnp.asarray(vy),
                  float(dt), jnp.asarray(obst))
    )
    np.testing.assert_allclose(got, expected, rtol=2e-6, atol=1e-6)


def test_advect_pair_bitwise():
    """advect_2d_pair must be BITWISE equal to two advect_2d calls."""
    from fluidsim_tpu.ops.advect import advect_2d_pair

    vx = rand_field(scale=0.8)
    vy = rand_field(scale=0.8)
    obst = rand_obstacles()
    dt = np.float32(0.1)
    ex = np.asarray(advect_2d(1, jnp.asarray(vx), jnp.asarray(vx),
                              jnp.asarray(vy), float(dt), jnp.asarray(obst)))
    ey = np.asarray(advect_2d(2, jnp.asarray(vy), jnp.asarray(vx),
                              jnp.asarray(vy), float(dt), jnp.asarray(obst)))
    gx, gy = advect_2d_pair(jnp.asarray(vx), jnp.asarray(vy), jnp.asarray(vx),
                            jnp.asarray(vy), float(dt), jnp.asarray(obst))
    np.testing.assert_array_equal(np.asarray(gx), ex)
    np.testing.assert_array_equal(np.asarray(gy), ey)


def test_project():
    vx = rand_field(scale=1.5)
    vy = rand_field(scale=1.5)
    obst = rand_obstacles()
    evx, evy, ep = oracle2d.project(vx, vy, obst, iters=20)
    gvx, gvy, gp = project_2d(jnp.asarray(vx), jnp.asarray(vy),
                              jnp.asarray(obst), iters=20)
    np.testing.assert_allclose(np.asarray(gp), ep, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gvx), evx, rtol=2e-5, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gvy), evy, rtol=2e-5, atol=5e-5)


def test_obstacle_drag_event_order():
    """The 4-pass vectorized drag must equal the sequential reference loop."""
    vx = rand_field(scale=2.0)
    vy = rand_field(scale=2.0)
    obst = rand_obstacles()
    evx, evy = vx.copy(), vy.copy()
    oracle2d.enforce_obstacle_boundaries(
        evx, evy, obst, np.float32(1.0 / N), np.float32(1e-4)
    )
    gvx, gvy = enforce_obstacle_boundaries_2d(
        jnp.asarray(vx), jnp.asarray(vy), jnp.asarray(obst),
        1.0 / N, 1e-4,
    )
    np.testing.assert_allclose(np.asarray(gvx), evx, rtol=2e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gvy), evy, rtol=2e-6, atol=1e-6)


def test_project_reduces_divergence():
    """Property: projection shrinks interior divergence (SURVEY.md §4).

    Note the bound is loose: the reference's pressure solve uses the 3D
    constant ``c = 6`` on a 2D grid (FluidSim.cs:1581-1582), so its
    projection is systematically under-relaxed — it removes only part of
    the divergence per call.  (The 3D solver, where c=6 is correct, has a
    much stronger guarantee — see test_solver3d.py.)
    """
    vx = rand_field(scale=1.0)
    vy = rand_field(scale=1.0)
    obst = np.zeros((N, N), dtype=bool)

    def div_norm(vx, vy):
        d = (vx[1:-1, 2:] - vx[1:-1, :-2]) + (vy[2:, 1:-1] - vy[:-2, 1:-1])
        return float(np.abs(d).mean())

    before = div_norm(vx, vy)
    gvx, gvy, _ = project_2d(jnp.asarray(vx), jnp.asarray(vy),
                             jnp.asarray(obst), iters=40)
    after = div_norm(np.asarray(gvx), np.asarray(gvy))
    assert after < before * 0.85
    # Two applications keep shrinking it.
    gvx2, gvy2, _ = project_2d(gvx, gvy, jnp.asarray(obst), iters=40)
    assert div_norm(np.asarray(gvx2), np.asarray(gvy2)) < after * 0.85
