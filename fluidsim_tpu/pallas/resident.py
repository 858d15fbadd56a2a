"""Fully VMEM-resident Jacobi solve and pressure projection (Pallas TPU).

At the headline grid (128³) one float32 field is only 8.4 MB while the chip
has ~128 MB of VMEM (empirically ≥109 MB of scratch compiles and runs), so
the entire 60-iteration pressure solve — and the divergence/gradient passes
bracketing it — fits on-chip in ONE kernel:

* HBM traffic per projection drops from ~300 MB (slab-blocked kernels:
  6 temporally-blocked passes × windows + div + grad round trips,
  pallas/jacobi.py + pallas/project.py) to **read vel + write vel + write
  p ≈ 59 MB** — a ~5× cut on the step's dominant term.
* Zero redundant compute: no halo margins, no per-pass re-normalization.
* Boundary handling: each sweep ends with six *slice writes* that
  materialize the ``set_bnd_3d`` faces in-place (z→y→x, later write wins —
  the exact sequential dataflow of ``ops.boundary.apply_faces_3d``), so the
  iterate is face-consistent at every step and no host-side ``set_bnd`` or
  per-cell select is needed.  This also cuts the sweep body from ~18 vector
  ops/cell (6 rolls + 6 face-correction selects + arith, pallas/jacobi.py)
  to ~13 (6 rolls + arith) plus O(n²) slice writes.

Numerics: identical to ``ops.linsolve.jacobi_3d`` / ``ops.project.project_3d``
(no-obstacle path) except the Jacobi update multiplies by a precomputed
``1/c`` instead of dividing by ``c`` (1-ulp class difference; the slab
kernels make the same trade).  Unlike ``jacobi_3d_pallas`` this path does
NOT require face-consistent inputs — the first sweep reads the input's
faces exactly as the XLA oracle does.

Reference lineage: the solve replaces ``LinearSolveIterationJob`` +
``BoundaryJob`` chains (FluidSim.cs:1188-1233, 1235-1289) and the
projection replaces ``ProjectWithJobs`` (FluidSim.cs:1417-1521), re-designed
as one on-chip program instead of per-sweep job dispatches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .jacobi import _signs, pallas_supported

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


# Empirical: ≥109 MB of VMEM scratch compiles and runs on the target chip;
# stay under 100 MB to leave headroom for spills/temporaries.
_VMEM_BUDGET = 100 * 1024 * 1024


def resident_fits(n: int, nvols: int) -> bool:
    """Whether ``nvols`` full (n,n,n) float32 volumes fit in VMEM scratch."""
    return n % 8 == 0 and n >= 16 and nvols * n * n * n * 4 <= _VMEM_BUDGET


def resident_obstacle_fits(n: int, solve_bytes: int = 4) -> bool:
    """VMEM feasibility of the OBSTACLE resident projection on compiled
    Mosaic, calibrated to measured round-5 compiles: the obstacle sweep
    loop's register allocator now spills ~9 VOLUME-equivalents in the
    solve dtype (69.75 MB at f32/128³ — total 135.75 MB, OOM over the
    128 MB limit; the bf16-solve arrangement compiles and runs).  This
    is a toolchain property, not a kernel change — the same kernel
    measured 0.839 ms in round 4.  Model: vel(3)+pstag+coef f32 volumes
    + int8 mask + iterate/rhs + ~9 spill volumes in the solve dtype.
    f32 at 128³ → 136 MB-equivalent (reject, matching the observed
    OOM); bf16 → 90 MB (accept, matching the observed fit).  Interpret
    mode never consults this (no Mosaic, no spill)."""
    vol = n * n * n
    need = vol * (5 * 4 + 1 + 2 * solve_bytes + 9 * solve_bytes)
    return n % 8 == 0 and n >= 16 and need <= _VMEM_BUDGET


def _roll(v, shift, axis):
    # pltpu.roll wants non-negative shifts; −1 ≡ m−1 on an axis of size m.
    return pltpu.roll(v, shift % v.shape[axis], axis)


def _scaled(s: float, v):
    return v if s == 1.0 else s * v


def _write_faces_zy(ref, n: int, sz: float, sy: float, c=None):
    """The z and y wall-face slice writes of ``_write_faces`` (measured
    FREE on-chip — they address whole sublane rows; see _write_faces)."""
    p = () if c is None else (c,)
    a = (slice(None),)
    ref[p + (slice(0, 1),)] = _scaled(sz, ref[p + (slice(1, 2),)])
    ref[p + (slice(n - 1, n),)] = _scaled(sz, ref[p + (slice(n - 2, n - 1),)])
    ref[p + a + (slice(0, 1),)] = _scaled(sy, ref[p + a + (slice(1, 2),)])
    ref[p + a + (slice(n - 1, n),)] = _scaled(
        sy, ref[p + a + (slice(n - 2, n - 1),)]
    )


def _write_faces_x(ref, n: int, sx: float, c=None):
    """The x (lane-axis) wall-face writes — the EXPENSIVE pair: a
    1-lane-wide store is a masked read-modify-write of every vreg row
    (~8 µs/sweep at 128³, 26% of the whole sweep; tools/
    solve_variants_bench.py).  The solve loop therefore defers these to
    once-after-the-loop and substitutes the x face rule into the
    neighbor operands instead (``_nbr_sum_selx``)."""
    p = () if c is None else (c,)
    a = (slice(None),)
    ref[p + a + a + (slice(0, 1),)] = _scaled(
        sx, ref[p + a + a + (slice(1, 2),)]
    )
    ref[p + a + a + (slice(n - 1, n),)] = _scaled(
        sx, ref[p + a + a + (slice(n - 2, n - 1),)]
    )


def _write_faces(ref, n: int, sz: float, sy: float, sx: float, c=None):
    """Materialize the ``apply_faces_3d`` wall faces in-place via slice
    writes, z→y→x so shared edges/corners take the later write — the same
    sequential dataflow as the XLA formulation (each pass reads the
    previous pass's result, healing edge cells from interior values).

    ``c``: optional static leading index when ``ref`` is (3, n, n, n).
    """
    _write_faces_zy(ref, n, sz, sy, c)
    _write_faces_x(ref, n, sx, c)


def _when_offset(i, *, n: int, slab: int, halo: int, n_slabs: int, emit):
    """Run ``emit(off)`` with the static in-window offset of slab ``i``.

    A z-window starts at ``start = clip(i·slab − halo, 0, n − p)`` with
    ``p = slab + 2·halo``, so the offset ``off = i·slab − start`` of the
    shipped slab inside the window takes only three STATIC values: 0 for
    the first slab, ``halo`` for interior slabs, ``2·halo`` for the last
    (requires ``halo ≤ slab`` so interior windows are never clipped —
    asserted).  Mosaic has no value-side ``dynamic_slice`` lowering, so
    the callers emit statically sliced writes under ``pl.when`` branches
    instead (interpret mode accepted the dynamic form; real lowering
    raised NotImplementedError).
    """
    p = slab + 2 * halo

    def off_py(i_py: int) -> int:
        start = min(max(i_py * slab - halo, 0), max(n - p, 0))
        return i_py * slab - start

    if n_slabs == 1:
        emit(off_py(0))
        return
    if halo > slab:
        # ValueError (not assert — must survive `python -O`): with
        # halo > slab the interior-slab offset is no longer the static
        # `halo`, and emitting it would silently corrupt the interior
        # writes.  The slab choosers (project_advect_fits /
        # full_step_fits / advect_project_3d_resident's picker) enforce
        # halo <= slab so product configs fall back to the unfused path
        # before reaching here.
        raise ValueError(
            f"_when_offset: halo {halo} > slab {slab} clips interior windows"
        )

    @pl.when(i == 0)
    def _():
        emit(off_py(0))

    if n_slabs > 2:
        @pl.when(jnp.logical_and(i > 0, i < n_slabs - 1))
        def _():
            emit(halo)

    @pl.when(i == n_slabs - 1)
    def _():
        emit(off_py(n_slabs - 1))


def _nbr_sum(v):
    """6-neighbor sum, exact add order of ``ops.linsolve._nbr_sum_3d``."""
    return (
        (_roll(v, -1, 2) + _roll(v, 1, 2))
        + (_roll(v, -1, 1) + _roll(v, 1, 1))
    ) + (_roll(v, -1, 0) + _roll(v, 1, 0))


def _rollf(v, shift, axis):
    """Roll a narrow-dtype operand, accumulating in f32.

    This chip's Mosaic rejects ``tpu.dynamic_rotate`` for any non-32-bit
    vector (all three axes, measured on-chip), so the upcast happens
    BEFORE the roll: the VMEM read is still at the stored width — the
    widening is a register op — and upcasting commutes with rotation
    bit-for-bit."""
    if v.dtype != jnp.float32:
        return _roll(v.astype(jnp.float32), shift, axis)
    return _roll(v, shift, axis).astype(jnp.float32)


def _nbr_sum_f32(v):
    """6-neighbor sum of a narrow-dtype iterate: each rolled operand is
    read at its stored width and upcast before the f32 adds (same add
    order as ``_nbr_sum``)."""
    return (
        (_rollf(v, -1, 2) + _rollf(v, 1, 2))
        + (_rollf(v, -1, 1) + _rollf(v, 1, 1))
    ) + (_rollf(v, -1, 0) + _rollf(v, 1, 0))


def _nbr_sum_selx(p, n: int, sx: float, upcast: bool):
    """6-neighbor sum with the x (lane-axis) face rule substituted into
    the operands instead of maintained on the iterate.

    Interior cells only ever read *single-extreme* face cells (a stencil
    neighbor differs in exactly one coordinate), and a single-extreme x
    face holds exactly ``sx·(adjacent interior)`` after every sweep's
    ``_write_faces``.  So a sweep that reads a face-maintained iterate is
    BITWISE equal to one that reads a junk-x-face iterate with the two x
    operands selected per-lane:

    * ``lo = roll(p, +1, x)`` reads ``p[..., 0]`` at lane 1 → substitute
      ``sx·p`` there;
    * ``hi = roll(p, −1, x)`` reads ``p[..., n−1]`` at lane n−2 →
      substitute ``sx·p`` there.

    The selects are ordinary full-width VPU ops: measured 25.2 vs
    33.4 µs/iter for the slice-written form at 128³ (the z/y slice
    writes are free; the x pair is the whole face cost).  Same add order
    as ``_nbr_sum`` / ``_nbr_sum_f32``; ``upcast`` mirrors the narrow-
    dtype read semantics (substitute in the stored dtype — negation is
    exact in bfloat16 — then upcast each operand).
    """
    ax = p.ndim - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, p.shape, ax)
    if upcast:
        # Narrow iterate: upcast before the lane rotate (Mosaic's
        # dynamic_rotate is 32-bit only; widening commutes with both the
        # rotate and the select bit-for-bit, and the VMEM read stays at
        # the stored width).
        f32 = jnp.float32
        pf = p.astype(f32)
        pxf = _scaled(sx, pf)
        hi_x = jnp.where(lane == n - 2, pxf, _roll(pf, -1, ax))
        lo_x = jnp.where(lane == 1, pxf, _roll(pf, 1, ax))
        return (
            (hi_x + lo_x)
            + (_rollf(p, -1, ax - 1) + _rollf(p, 1, ax - 1))
        ) + (_rollf(p, -1, ax - 2) + _rollf(p, 1, ax - 2))
    px = _scaled(sx, p)
    hi_x = jnp.where(lane == n - 2, px, _roll(p, -1, ax))
    lo_x = jnp.where(lane == 1, px, _roll(p, 1, ax))
    return (
        (hi_x + lo_x)
        + (_roll(p, -1, ax - 1) + _roll(p, 1, ax - 1))
    ) + (_roll(p, -1, ax - 2) + _roll(p, 1, ax - 2))


def _plane_faces(v, axis):
    """Apply the ``b=0`` wall-face copies along the two in-plane axes of
    a plane value (size 1 along ``axis``), in ascending axis order — the
    sequential z→y→x face order restricted to the axes that act within
    the plane (index 0 ← index 1, index m−1 ← index m−2)."""
    for ax in range(3):
        if ax == axis or v.shape[ax] == 1:
            continue
        m = v.shape[ax]
        first = jax.lax.slice_in_dim(v, 1, 2, axis=ax)
        mid = jax.lax.slice_in_dim(v, 1, m - 1, axis=ax)
        last = jax.lax.slice_in_dim(v, m - 2, m - 1, axis=ax)
        v = jnp.concatenate([first, mid, last], axis=ax)
    return v


def _shell_exact_planes(src_ref, x0_ref, coef_ref, *, n: int, block: int,
                        a: float, inv_c: float):
    """The first ``block−1`` interior planes of ``block`` sequential
    face-maintained Jacobi sweeps, per axis and side, computed EXACTLY
    (bitwise the volume sweeps) from O(n²) ref-slice reads.

    The face rule's influence spreads one plane per sweep, so the
    toroidal composite ``N^T`` differs from the sequential result only
    on planes within ``T−1`` of a wall; conversely, computing those
    planes sequentially needs a dependency cone that SHRINKS one plane
    per level (level k needs level k−1 planes up to ``2T−k``), so the
    whole correction is a per-axis 1-D recurrence over plane values:
    level 0 is ``src`` plane slices (faces already valid on the
    iterate), each level applies the exact sweep formula plus the
    in-plane wall-face rows, and the level-(k) wall plane aliases its
    first interior plane (the z-face copy; interior cells never read
    wall *edges*, so the alias is exact where it is ever read).

    Returns ``[(axis, global_plane_index, (1,n,n)-shaped value), ...]``
    for the output planes to overwrite.  Requires ``n ≥ 4·block`` so
    the two sides' dependency cones stay off the opposite walls.
    """
    az = jnp.asarray(a, jnp.float32)
    ic = jnp.asarray(inv_c, jnp.float32)
    out = []
    for axis in range(3):
        for lo in (True, False):
            def idx(j):
                return j if lo else n - 1 - j

            def ref_plane(ref, j):
                sl = [slice(None)] * 3
                sl[axis] = slice(idx(j), idx(j) + 1)
                return ref[tuple(sl)].astype(jnp.float32)

            # Level 0 = the iterate itself; its faces are already valid
            # (maintained every sweep), so plane 0 is the true value.
            prev = [ref_plane(src_ref, j) for j in range(2 * block)]
            for k in range(1, block + 1):
                depth = 2 * block - 1 - k
                cur = [None] * (depth + 1)
                for j in range(1, depth + 1):
                    c = prev[j]

                    def pair(ax):
                        # (global +1 neighbor) + (global −1 neighbor) —
                        # _nbr_sum's in-pair add order.  On the hi side
                        # the global +1 direction is shell j−1.
                        if ax == axis:
                            plus = prev[j + 1] if lo else prev[j - 1]
                            minus = prev[j - 1] if lo else prev[j + 1]
                            return plus + minus
                        return _roll(c, -1, ax) + _roll(c, 1, ax)

                    nbr = (pair(2) + pair(1)) + pair(0)
                    mul = (ic if coef_ref is None
                           else ref_plane(coef_ref, j))
                    raw = (ref_plane(x0_ref, j) + az * nbr) * mul
                    cur[j] = _plane_faces(raw, axis)
                cur[0] = cur[1]
                prev = cur
            out.extend(
                (axis, idx(j), prev[j]) for j in range(1, block)
            )
    return out


def _solve_loop(x0_ref, pb0, pb1, *, n: int, b: int, a: float, inv_c: float,
                iters: int, coef_ref=None, frozen_ref=None, x1_ref=None,
                block: int = 2):
    """Run ``iters`` face-maintained Jacobi sweeps ping-ponging pb0↔pb1.

    Obstacle handling (the reference's skip semantics, FluidSim.cs:1205 —
    obstacle cells copy the previous iterate) is folded into two
    *precomputed f32 volumes* instead of a per-sweep int8 compare+select:

    * ``coef_ref`` = ``where(obstacle, 0, 1/c)`` — the sweep multiplies the
      rhs by this volume instead of the scalar ``inv_c``, zeroing obstacle
      cells at no extra vector-op cost (and no int8→f32 relayout per
      sweep; the old select formulation measured 2.7× the no-obstacle
      sweep on-chip).
    * ``frozen_ref`` = ``where(obstacle, x_init, 0)`` — added back so
      obstacle cells hold their initial value, which is exactly what
      iterated copy-through converges to (each sweep copies the previous
      iterate; faces never overwrite interior cells).  Omit when the
      initial iterate is zero at obstacle cells (the pressure solve:
      ``p`` starts at zeros), where ``rhs·coef`` alone reproduces
      copy-through bit-for-bit up to the sign of zero.

    Only valid for ``b == 0`` (scalar solves, where ``set_bnd`` applies no
    obstacle mirror).  Returns the ref holding the final iterate (static).

    A slice-z sweep variant (update planes 1..n−2 with the z neighbors as
    leading-axis slices instead of ``pltpu.roll``s) was tried and measured
    *exactly neutral* on-chip (1.033 vs 1.038 ms per 60-iter projection at
    128³) — Mosaic already lowers untiled-axis rolls to addressing, and
    the sweep is bound by VMEM operand bandwidth / the iteration
    dependency chain, not by the roll copies.  Kept in the simpler rolled
    form.

    ``x1_ref`` (optional f32 volume, ``b == 0`` only) + ``block=T``:
    enables **composite sweep blocking** — ``T`` Jacobi iterations per
    VMEM pass.  ``T == 2`` uses the delta-correction form below;
    ``T ≥ 3`` uses the general hoisted chain
    ``p_T = X + a^T·(C·N)-chain(p)`` with the wall-adjacent planes
    overwritten by the bitwise-sequential shell recomputation
    (``_shell_exact_planes``; requires ``n ≥ 4·T``).  The ``T = 2``
    delta form: two Jacobi iterations per pass as
    ``p₂ = x1 + (a·ic)²·N(N(p))`` with ``x1 = ic·x0 + a·ic²·N(x0)``
    precomputed once (loop-invariant), plus O(n²) plane-slice
    corrections that reproduce the intermediate iterate's ``set_bnd``
    face rule exactly (for an interior cell, a wall neighbor of the
    intermediate reads the adjacent interior value; the toroidal
    ``N(N(·))`` read a wrapped plane there, so the difference
    ``tmp_raw[interior] − tmp_raw[wall]``, with
    ``tmp_raw = (x0 + a·N(p))·ic``, is added back on the six first
    interior planes).  Interior cells never read a wall *edge* (a
    neighbor differs in exactly one coordinate), so single-face copies
    fully describe what the second iteration reads.  Same per-cell
    vector-op count as two single sweeps (two 6-neighbor sums + one
    FMA vs two of each), but HALF the VMEM operand traffic the sweep
    loop is bound by: one iterate read + one ``x1`` read + one write
    per two iterations instead of two (read + rhs read + write)s.
    NOT bitwise vs sequential sweeps — one f32 reassociation (the
    ``a²·ic²`` regrouping; same class as the documented ``inv_c``
    trade); the iteration is the same contraction and drift stays in
    the few-ulp range (tests/test_pallas_interpret.py bounds it).
    """
    sz, sy, sx = _signs(b)
    az = jnp.asarray(a, jnp.float32)
    ic = jnp.asarray(inv_c, jnp.float32)
    f32_solve = pb0.dtype == jnp.float32

    def sweep(src, dst):
        prev = src[:]
        # Narrow (bfloat16) solve buffers: every operand is read at its
        # stored width — halving the sweep's VMEM operand traffic, which
        # is what bounds it — and the arithmetic runs in f32.
        # The x face rule rides in the operands (_nbr_sum_selx) so the
        # per-sweep lane-axis face stores — 26% of the sweep on-chip —
        # are deferred to once-after-the-loop (_write_faces_x at every
        # return below).  Bitwise the face-maintained form.
        # OBSTACLE solves keep the maintained-face sweep: with the coef
        # volume as a third full-volume operand, the selx form's extra
        # live values (lane iota + two selected operands) push Mosaic's
        # register allocator into a ~74 MB spill and the kernel exceeds
        # VMEM outright at 128³ (found via vortex128, r4) — the slice-
        # written x faces keep the loop body two-operand and compile.
        if coef_ref is None:
            nbr = _nbr_sum_selx(prev, n=n, sx=sx, upcast=not f32_solve)
        else:
            nbr = (_nbr_sum(prev) if f32_solve else _nbr_sum_f32(prev))
        rhs = x0_ref[:].astype(jnp.float32) + (nbr if a == 1.0 else az * nbr)
        # Border obstacle cells are irrelevant either way: faces are
        # rewritten below, matching the XLA oracle's interior-only
        # copy-through.
        upd = rhs * (ic if coef_ref is None else coef_ref[:])
        if frozen_ref is not None:
            upd = upd + frozen_ref[:]
        dst[:] = upd.astype(dst.dtype)
        _write_faces_zy(dst, n, sz, sy)
        if coef_ref is not None:
            # Maintained x faces (see above): the deferred form's
            # substitution contract requires them absent; writing them
            # per sweep restores the pre-deferral dataflow bit-for-bit
            # (finish()'s post-loop x write is then idempotent).
            _write_faces_x(dst, n, sx)

    def finish(ref):
        # Deferred x faces of the final iterate (idempotent where the
        # last writer was a full-face blockstep/double): x is written
        # last in _write_faces' z→y→x order, so one post-loop store pair
        # reproduces the sequential result bit-for-bit — including the
        # edges/corners it heals from the (maintained) z/y faces.
        _write_faces_x(ref, n, sx)
        return ref

    use_block = (
        x1_ref is not None and b == 0
        and frozen_ref is None and block >= 2 and iters >= block
        and (block == 2 or n >= 4 * block)
    )
    if use_block and block >= 3:
        # General depth-T composite: T sweeps per VMEM pass as
        # ``p_T = X + a^T·(C·N)-chain(p)`` with
        # ``X = Σ_{k<T} a^k·g_k, g_0 = C·x0, g_k = C·N(g_{k−1})``
        # hoisted (C = 1/c or the obstacle coef volume), and the planes
        # the face rule reaches (1..T−1 per wall) overwritten with the
        # bitwise-sequential shell recomputation (_shell_exact_planes).
        # One iterate read + one X read + one write per T iterations.
        a_f = np.float32(a)
        ic_f = np.float32(inv_c)
        f32 = jnp.float32
        nsum = _nbr_sum if f32_solve else _nbr_sum_f32
        cmul = ((lambda v: ic * v) if coef_ref is None
                else (lambda v: coef_ref[:] * v))

        x0v = x0_ref[:].astype(f32)
        g = cmul(x0v)
        acc = g
        pw = np.float32(1.0)
        for _ in range(block - 1):
            pw = np.float32(pw * a_f)
            g = cmul(_nbr_sum(g))
            acc = acc + jnp.asarray(pw, f32) * g
        x1_ref[:] = acc.astype(x1_ref.dtype)
        aT = jnp.asarray(np.float32(pw * a_f), f32)  # a^T

        def blockstep(src, dst):
            h = nsum(src[:])
            for _ in range(block - 1):
                h = _nbr_sum(cmul(h))
            out = x1_ref[:].astype(f32) + aT * cmul(h)
            dst[:] = out.astype(dst.dtype)
            for axis, gj, val in _shell_exact_planes(
                    src, x0_ref, coef_ref, n=n, block=block,
                    a=float(a_f), inv_c=float(ic_f)):
                sl = [slice(None)] * 3
                sl[axis] = slice(gj, gj + 1)
                dst[tuple(sl)] = val.astype(dst.dtype)
            _write_faces(dst, n, sz, sy, sx)

        nb = iters // block

        def two_blocks(_, carry):
            blockstep(pb0, pb1)
            blockstep(pb1, pb0)
            return carry

        jax.lax.fori_loop(0, nb // 2, two_blocks, 0)
        cur, other = (pb0, pb1)
        if nb % 2:
            blockstep(pb0, pb1)
            cur, other = pb1, pb0
        for _ in range(iters % block):
            sweep(cur, other)
            cur, other = other, cur
        return finish(cur)

    if use_block:
        a_f = np.float32(a)
        aic = np.float32(a_f * np.float32(inv_c))
        a2ic2 = jnp.asarray(np.float32(aic * aic), jnp.float32)
        aicz = jnp.asarray(aic, jnp.float32)
        a2 = jnp.asarray(np.float32(a_f * a_f), jnp.float32)

        # Narrow (bfloat16) solve buffers compose: iterate reads upcast
        # after each rolled read (quartering the pair's operand traffic
        # vs two f32 sweeps); x1 stays f32 (x1_ref is the f32/storage
        # pstag volume), arithmetic is f32 throughout.
        nsum = _nbr_sum if f32_solve else _nbr_sum_f32
        x0v = x0_ref[:].astype(jnp.float32)
        if coef_ref is None:
            x1_ref[:] = (ic * x0v + (aicz * ic) * _nbr_sum(x0v)).astype(
                x1_ref.dtype)
        else:
            # Per-cell coefficient (obstacle copy-through: coef =
            # where(obst, 0, 1/c)) distributes through the composite:
            # tmp = coef·(x0 + a·N(p)) ⇒
            # p₂ = coef·x0 + a·coef·N(coef·x0) + a²·coef·N(coef·N(p)).
            cv = coef_ref[:]
            x1_ref[:] = (cv * x0v + (az * cv) * _nbr_sum(cv * x0v)).astype(
                x1_ref.dtype)

        def tr_plane(src, axis, j):
            """``tmp_raw`` restricted to plane ``j`` of ``axis`` —
            ``(x0 + a·N(p))·coef`` evaluated from O(n²) *ref slice*
            reads (never slices of the full-volume ``u`` value, which
            would pin ``u`` in VMEM and forfeit the traffic saving).
            The along-``axis`` neighbors are the adjacent plane slices
            (toroidal, matching ``N``'s wrap); the in-plane neighbors
            are rotates of the plane itself."""
            def pl_(k):
                sl = [slice(None)] * 3
                sl[axis] = slice(k % n, k % n + 1)
                return tuple(sl)

            c = src[pl_(j)].astype(jnp.float32)

            def pair(ax):
                # (+1 neighbor) + (−1 neighbor), _nbr_sum's in-pair order.
                if ax == axis:
                    return (src[pl_(j + 1)].astype(jnp.float32)
                            + src[pl_(j - 1)].astype(jnp.float32))
                return _roll(c, -1, ax) + _roll(c, 1, ax)

            # _nbr_sum's axis order: (x-pair + y-pair) + z-pair.
            nbr = (pair(2) + pair(1)) + pair(0)
            mul = ic if coef_ref is None else coef_ref[pl_(j)]
            return (x0_ref[pl_(j)].astype(jnp.float32) + az * nbr) * mul

        def double(src, dst):
            u = nsum(src[:])
            if coef_ref is None:
                out = x1_ref[:].astype(jnp.float32) + a2ic2 * _nbr_sum(u)
            else:
                out = x1_ref[:].astype(jnp.float32) + (
                    a2 * coef_ref[:]
                ) * _nbr_sum(coef_ref[:] * u)
            dst[:] = out.astype(dst.dtype)

            # Intermediate face-rule corrections on the six first
            # interior planes (see docstring), from ref-slice reads so
            # the full-volume ``u`` stays streamable.
            for axis in range(3):
                for j, w in ((1, 0), (n - 2, n - 1)):
                    sl = [slice(None)] * 3
                    sl[axis] = slice(j, j + 1)
                    sl = tuple(sl)
                    corr = tr_plane(src, axis, j) - tr_plane(src, axis, w)
                    mul = (aicz if coef_ref is None
                           else az * coef_ref[sl])
                    dst[sl] = (dst[sl].astype(jnp.float32)
                               + mul * corr).astype(dst.dtype)
            _write_faces(dst, n, sz, sy, sx)

        d = iters // 2

        def two_doubles(_, carry):
            double(pb0, pb1)
            double(pb1, pb0)
            return carry

        jax.lax.fori_loop(0, d // 2, two_doubles, 0)
        cur, other = (pb1, pb0) if d % 2 else (pb0, pb1)
        if d % 2:
            double(pb0, pb1)
        if iters % 2:
            sweep(cur, other)
            return finish(other)
        return finish(cur)

    def two(_, carry):
        sweep(pb0, pb1)
        sweep(pb1, pb0)
        return carry

    jax.lax.fori_loop(0, iters // 2, two, 0)
    if iters % 2:
        sweep(pb0, pb1)
        return finish(pb1)
    return finish(pb0)


def _jacobi_kernel(x_hbm, x0_hbm, out_hbm, pb0, pb1, x0s, *rest,
                   n: int, b: int, a: float, inv_c: float, iters: int,
                   block: int = 1):
    *x1s, sems = rest
    in_dma = pltpu.make_async_copy(x_hbm, pb0, sems.at[0])
    x0_dma = pltpu.make_async_copy(x0_hbm, x0s, sems.at[1])
    in_dma.start()
    x0_dma.start()
    in_dma.wait()
    x0_dma.wait()

    final = _solve_loop(x0s, pb0, pb1, n=n, b=b, a=a, inv_c=inv_c,
                        iters=iters, x1_ref=x1s[0] if x1s else None,
                        block=block)

    out_dma = pltpu.make_async_copy(final, out_hbm, sems.at[2])
    out_dma.start()
    out_dma.wait()


def _jacobi_obst_kernel(x_hbm, x0_hbm, obst_hbm, out_hbm, pb0, pb1, x0s,
                        omask, coef, frozen, sems, *, n: int, b: int,
                        a: float, inv_c: float, iters: int):
    dmas = [
        pltpu.make_async_copy(x_hbm, pb0, sems.at[0]),
        pltpu.make_async_copy(x0_hbm, x0s, sems.at[1]),
        pltpu.make_async_copy(obst_hbm, omask, sems.at[2]),
    ]
    for d in dmas:
        d.start()
    for d in dmas:
        d.wait()

    # One-time mask expansion: all per-sweep obstacle work becomes a
    # volume multiply (+ add), see _solve_loop.  Arithmetic (not select):
    # Mosaic cannot relayout full-volume i1 vectors.
    mf = omask[:].astype(jnp.float32)  # 1.0 at obstacle cells
    coef[:] = (1.0 - mf) * jnp.asarray(inv_c, jnp.float32)
    frozen[:] = mf * pb0[:]

    final = _solve_loop(x0s, pb0, pb1, n=n, b=b, a=a, inv_c=inv_c,
                        iters=iters, coef_ref=coef, frozen_ref=frozen)

    out_dma = pltpu.make_async_copy(final, out_hbm, sems.at[3])
    out_dma.start()
    out_dma.wait()


def jacobi_3d_resident(b: int, x, x0, a: float, c: float, iters: int,
                       obst=None, interpret: bool = False,
                       sweep_block: int = 1):
    """Whole-volume-in-VMEM ``ops.linsolve.jacobi_3d``.

    One kernel, one HBM read of (x, x0[, obst]) and one write of the
    result, regardless of ``iters``.  Matches the XLA oracle on arbitrary
    inputs (first sweep reads the given faces, as the oracle does).
    ``obst`` (bool mask, scalar solves ``b == 0`` only — set_bnd applies
    no obstacle mirror there) makes obstacle cells copy the previous
    iterate, exactly the oracle's skip semantics.
    """
    n = x.shape[-1]
    assert x.shape == (n, n, n) and x0.shape == (n, n, n)
    assert obst is None or b == 0, "obstacle copy-through is b==0 only"
    if x.dtype != jnp.float32:
        # Narrow storage: solve in f32 (the projection kernel handles bf16
        # natively in-kernel; this standalone entry upcasts at the edge).
        out = jacobi_3d_resident(
            b, x.astype(jnp.float32), x0.astype(jnp.float32), a, c, iters,
            obst=obst, interpret=interpret,
        )
        return out.astype(x.dtype)
    inv_c = float(np.float32(1.0) / np.float32(c))
    common = dict(
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n, n, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    if obst is None:
        kernel = functools.partial(
            _jacobi_kernel, n=n, b=b, a=float(np.float32(a)), inv_c=inv_c,
            iters=iters, block=sweep_block,
        )
        # Composite sweep block (b==0 only — _solve_loop's face
        # corrections assume scalar signs): one extra f32 volume for the
        # loop-invariant x1.
        x1s = ([pltpu.VMEM((n, n, n), jnp.float32)]
               if sweep_block >= 2 and b == 0 and iters >= sweep_block
               else [])
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            scratch_shapes=[
                pltpu.VMEM((n, n, n), jnp.float32),
                pltpu.VMEM((n, n, n), jnp.float32),
                pltpu.VMEM((n, n, n), jnp.float32),
            ] + x1s + [
                pltpu.SemaphoreType.DMA((3,)),
            ],
            **common,
        )(x, x0)
    kernel = functools.partial(
        _jacobi_obst_kernel, n=n, b=b, a=float(np.float32(a)), inv_c=inv_c,
        iters=iters,
    )
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        scratch_shapes=[
            pltpu.VMEM((n, n, n), jnp.float32),
            pltpu.VMEM((n, n, n), jnp.float32),
            pltpu.VMEM((n, n, n), jnp.float32),
            pltpu.VMEM((n, n, n), jnp.int8),
            pltpu.VMEM((n, n, n), jnp.float32),   # coef (masked 1/c)
            pltpu.VMEM((n, n, n), jnp.float32),   # frozen (masked init)
            pltpu.SemaphoreType.DMA((4,)),
        ],
        **common,
    )(x, x0, obst.astype(jnp.int8))


def _project_body(vel_hbm, velout_hbm, p_hbm, vbuf, pb0, pb1, divb, pstag,
                  sems, *, n: int, iters: int, obst_hbm=None, omask=None,
                  coef=None, vel_resident: bool = False,
                  sweep_block: int = 1, damp: float = 1.0):
    """Projection dataflow shared by ``_project_kernel`` and the fused
    projection+density-advect kernel: DMA vel (+mask) in, divergence,
    ``iters`` sweeps, gradient subtraction with faces (+obstacle mirror),
    and START the p/velocity out-DMAs.  Returns ``(p_dma, out_dmas)``
    un-waited so a fused caller can overlap them with further compute.

    ``vel_resident=True`` skips the velocity in-DMA — the caller already
    produced the input velocity in ``vbuf`` (the full-step fused kernel's
    self-advection phase writes its result there directly).

    ``vbuf``/``pstag`` carry the storage dtype (float32 or bfloat16 —
    halving HBM traffic for bf16 fields); the solve buffers (pb0/pb1/divb)
    are always float32: the fixed-point iteration accumulates on-chip in
    full precision and only the HBM crossings are narrow.

    ``damp``: post-projection velocity damping factor (the step's
    ``1/(1 + dt·velocity_damping)`` implicit sink, stable3d.py).  Applied
    per component AFTER the face writes and obstacle mirror — exactly the
    XLA composition's order (project fully, then scale) — and in the
    STORAGE dtype, so the fused step is bitwise the unfused
    project→damp→advect sequence.  Folding it here is what lets the
    fused kernels serve damped configs: the density phase must backtrace
    through the damped velocity."""
    if not vel_resident:
        in_dma = pltpu.make_async_copy(vel_hbm, vbuf, sems.at[0])
        in_dma.start()
    if obst_hbm is not None:
        ob_dma = pltpu.make_async_copy(obst_hbm, omask, sems.at[5])
        ob_dma.start()
        ob_dma.wait()
    if not vel_resident:
        in_dma.wait()

    f32 = jnp.float32
    nf = jnp.asarray(float(n), f32)
    half = jnp.asarray(0.5, f32)

    # Divergence, exact grouping of ops.project.project_3d's div_int
    # (interior cells agree bitwise; wall cells are garbage but the Jacobi
    # rhs is only read at interior cells, and p starts at zero).
    vx = vbuf[0].astype(f32)
    vy = vbuf[1].astype(f32)
    vz = vbuf[2].astype(f32)
    divb[:] = (
        -half
        * (
            (_roll(vx, -1, 2) - _roll(vx, 1, 2))
            + (_roll(vy, -1, 1) - _roll(vy, 1, 1))
            + (_roll(vz, -1, 0) - _roll(vz, 1, 0))
        )
        / nf
    ).astype(divb.dtype)

    pb0[:] = jnp.zeros((n, n, n), pb0.dtype)
    inv6 = float(np.float32(1.0) / np.float32(6.0))
    if omask is not None:
        # p starts at zeros, so obstacle copy-through ≡ holding zero —
        # fold it into the solve coefficient once (no frozen volume
        # needed) and every sweep runs the no-obstacle body.  Arithmetic
        # mask: Mosaic cannot relayout full-volume i1 vectors.
        coef[:] = (1.0 - omask[:].astype(f32)) * jnp.asarray(inv6, f32)
    # Composite sweep block (see _solve_loop): pstag is dead until the
    # post-solve p shipment, so it hosts the loop-invariant x1 volume.
    # Requires f32 pstag (f32 field storage); solve buffers may be
    # bfloat16 (narrow iterate reads compose with the composite —
    # quarter traffic vs two f32 sweeps) and obstacle coef volumes are
    # fine (they distribute through the composite).
    x1_ref = (pstag if sweep_block >= 2
              and pstag.dtype == jnp.float32 else None)
    final = _solve_loop(divb, pb0, pb1, n=n, b=0, a=1.0, inv_c=inv6,
                        iters=iters, coef_ref=coef, x1_ref=x1_ref,
                        block=sweep_block)

    # p is face-consistent (maintained every sweep) — ship it now so the
    # transfer overlaps the gradient computation.
    pv = final[:]
    pstag[:] = pv.astype(pstag.dtype)
    p_dma = pltpu.make_async_copy(pstag, p_hbm, sems.at[1])
    p_dma.start()

    if omask is not None:
        # One-time setup for the in-kernel obstacle mirror — the exact
        # arithmetic of ops.boundary._mirror_obstacles_axis, staged
        # through scratch that is DEAD after the solve (the rhs buffer
        # and the losing ping-pong buffer) so the mirror adds no VMEM
        # and, unlike an iota-mask formulation, no register-allocator
        # spill volumes (a 3×int32-iota + i1 variant spilled 65 MB and
        # OOM'd VMEM at 128³).
        mfb = pb1 if final is pb0 else pb0   # obstacle mask (solve dtype:
        mfb[:] = omask[:].astype(mfb.dtype)  # 0/1 are exact in bfloat16)
        # Write mask = mask ∧ interior: zero the six wall faces via
        # O(n²) slice writes (a cell is non-interior iff on some face).
        divb[:] = mfb[:].astype(divb.dtype)
        zf = jnp.zeros((1, n, n), divb.dtype)
        yf = jnp.zeros((n, 1, n), divb.dtype)
        xf = jnp.zeros((n, n, 1), divb.dtype)
        divb[0:1] = zf
        divb[n - 1:n] = zf
        divb[:, 0:1] = yf
        divb[:, n - 1:n] = yf
        divb[:, :, 0:1] = xf
        divb[:, :, n - 1:n] = xf

        def mirror(v, axis):
            fp = 1.0 - _rollf(mfb[:], 1, axis)    # fluid at idx−1
            fn = 1.0 - _rollf(mfb[:], -1, axis)   # fluid at idx+1
            # Selects, not fp·(−v) products: an excluded non-finite
            # neighbor must contribute 0, not 0·inf = NaN (the oracle's
            # where(count>0, …, 0) semantics in ops.boundary).
            total = (jnp.where(fp > 0.0, -_roll(v, 1, axis), 0.0)
                     + jnp.where(fn > 0.0, -_roll(v, -1, axis), 0.0))
            mirrored = total / jnp.maximum(fp + fn, 1.0)
            return jnp.where(divb[:].astype(f32) != 0.0, mirrored, v)

    # Gradient subtraction v −= 0.5·N·∂p with in-place face rewrite, per
    # component; start each component's out-DMA as soon as it's final.
    out_dmas = []
    for comp, axis in ((0, 2), (1, 1), (2, 0)):
        g = half * (_rollf(pv, -1, axis) - _rollf(pv, 1, axis)) * nf
        vold = vbuf[comp].astype(f32)
        upd = vold - g
        if omask is not None:
            # gradient is zeroed in obstacle cells (ops.project.project_3d)
            upd = jnp.where(omask[:] != 0, vold, upd)
        vbuf[comp] = upd.astype(vbuf.dtype)
        sz, sy, sx = _signs(comp + 1)
        _write_faces(vbuf, n, sz, sy, sx, c=comp)
        if omask is not None:
            # set_bnd obstacle mirror, fused (was a host-side full-volume
            # pass per projection: read vel+mask, write vel ≈ 59 MB HBM
            # at 128³); runs once, after the faces, exactly the oracle's
            # faces-then-mirror order.
            vbuf[comp] = mirror(
                vbuf[comp].astype(f32), axis
            ).astype(vbuf.dtype)
        if damp != 1.0:
            # Velocity damping, storage-dtype multiply AFTER faces+mirror
            # — the XLA step's exact order and arithmetic (stable3d.py's
            # `vel * asarray(damp, vel.dtype)`).
            vbuf[comp] = vbuf[comp] * jnp.asarray(damp, vbuf.dtype)
        dma = pltpu.make_async_copy(
            vbuf.at[comp], velout_hbm.at[comp], sems.at[2 + comp]
        )
        dma.start()
        out_dmas.append(dma)

    return p_dma, out_dmas


def _project_kernel(vel_hbm, velout_hbm, p_hbm, vbuf, pb0, pb1, divb, pstag,
                    sems, *, n: int, iters: int, obst_hbm=None, omask=None,
                    coef=None, sweep_block: int = 1):
    p_dma, out_dmas = _project_body(
        vel_hbm, velout_hbm, p_hbm, vbuf, pb0, pb1, divb, pstag, sems,
        n=n, iters=iters, obst_hbm=obst_hbm, omask=omask, coef=coef,
        sweep_block=sweep_block,
    )
    p_dma.wait()
    for dma in out_dmas:
        dma.wait()


def _project_obst_kernel(vel_hbm, obst_hbm, velout_hbm, p_hbm,
                         vbuf, pb0, pb1, divb, pstag, omask, coef, sems,
                         *, n: int, iters: int, sweep_block: int = 1):
    _project_kernel(vel_hbm, velout_hbm, p_hbm, vbuf, pb0, pb1, divb, pstag,
                    sems, n=n, iters=iters, obst_hbm=obst_hbm, omask=omask,
                    coef=coef, sweep_block=sweep_block)


def _advect_project_kernel(vel_hbm, velout_hbm, p_hbm,
                           velp, fwin, pb0, pb1, divb, pstag, sems,
                           *, n: int, slab: int, k_win: int, n_sub: int,
                           dt0: float, iters: int, n_slabs: int):
    """Fused velocity self-advection + projection — the whole velocity
    half of the step in ONE kernel.

    Grid programs run sequentially with persistent scratch, so programs
    0..n_slabs−1 advect z-slabs (HBM windows in, results into the
    *persistent full-volume* ``velp``) and program n_slabs applies the
    advection output masking, computes the divergence, runs all ``iters``
    Jacobi sweeps, and subtracts the gradient — the advected velocity
    never round-trips HBM between advection and projection (saves a full
    write+read of the field at the kernel boundary).

    **Measured result (round 2): bit-exact vs the two-kernel composition
    but 4× SLOWER on-chip (78 vs 323 steps/s at 128³)** — Mosaic compiles
    the union of both ``pl.when`` phase bodies into one program, and the
    combined register pressure/scheduling degrades both phases (cf. the
    rejected 27-term static unroll, same failure mode).  Kept as a tested
    reference for when the compiler handles multi-phase programs better;
    NOT dispatched by the product step.
    """
    from .advect import _substep_window_vals

    i = pl.program_id(0)
    halo = k_win * n_sub
    p = slab + 2 * halo
    f32 = jnp.float32

    @pl.when(i < n_slabs)
    def _advect_phase():
        z0 = i * slab
        start = jnp.clip(z0 - halo, 0, n - p)
        dma = pltpu.make_async_copy(
            vel_hbm.at[:, pl.ds(start, p)], fwin, sems.at[0]
        )
        dma.start()
        dma.wait()
        vel_vals = tuple(fwin[c].astype(f32) for c in range(3))
        out_vals = _substep_window_vals(
            vel_vals, vel_vals, start=start, n=n, p=p, k_win=k_win,
            n_sub=n_sub, dt0=dt0, bs=(1, 2, 3),
        )

        def emit(off):
            for c in range(3):
                velp[c, pl.ds(z0, slab)] = out_vals[c][off:off + slab]

        _when_offset(i, n=n, slab=slab, halo=halo, n_slabs=n_slabs,
                     emit=emit)

    @pl.when(i == n_slabs)
    def _project_phase():
        # Advection output contract (_mask_and_bnd_3d, obstacle-free):
        # fresh-zero borders + set_bnd faces, z→y→x, per component.
        zy = jnp.zeros((n, 1, n), f32)
        zx = jnp.zeros((n, n, 1), f32)
        for c in range(3):
            velp[c, :, 0:1, :] = zy
            velp[c, :, n - 1:n, :] = zy
            velp[c, :, :, 0:1] = zx
            velp[c, :, :, n - 1:n] = zx
            sz, sy, sx = _signs(c + 1)
            _write_faces(velp, n, sz, sy, sx, c=c)

        nf = jnp.asarray(float(n), f32)
        half = jnp.asarray(0.5, f32)
        vx, vy, vz = velp[0], velp[1], velp[2]
        divb[:] = (
            -half
            * (
                (_roll(vx, -1, 2) - _roll(vx, 1, 2))
                + (_roll(vy, -1, 1) - _roll(vy, 1, 1))
                + (_roll(vz, -1, 0) - _roll(vz, 1, 0))
            )
            / nf
        )

        pb0[:] = jnp.zeros((n, n, n), f32)
        inv6 = float(np.float32(1.0) / np.float32(6.0))
        final = _solve_loop(divb, pb0, pb1, n=n, b=0, a=1.0, inv_c=inv6,
                            iters=iters)

        pv = final[:]
        pstag[:] = pv.astype(pstag.dtype)
        p_dma = pltpu.make_async_copy(pstag, p_hbm, sems.at[1])
        p_dma.start()

        out_dmas = []
        for comp, axis in ((0, 2), (1, 1), (2, 0)):
            g = half * (_roll(pv, -1, axis) - _roll(pv, 1, axis)) * nf
            velp[comp] = velp[comp] - g
            sz, sy, sx = _signs(comp + 1)
            _write_faces(velp, n, sz, sy, sx, c=comp)
            dma = pltpu.make_async_copy(
                velp.at[comp], velout_hbm.at[comp], sems.at[2 + comp]
            )
            dma.start()
            out_dmas.append(dma)

        p_dma.wait()
        for dma in out_dmas:
            dma.wait()


def advect_project_3d_resident(vel, iters: int, dt: float, *,
                               window: int = 1, n_sub: int = 1,
                               interpret: bool = False):
    """Fused self-advection + projection (obstacle-free, float32).
    Returns (vel, p) — equal to
    ``advect_multi_3d_pallas((1,2,3), vel, vel, dt, None, window, n_sub)``
    followed by ``project_3d_resident(·, iters)``."""
    n = vel.shape[-1]
    assert vel.shape == (3, n, n, n)
    halo = window * n_sub
    # halo <= s: interior slabs are written at the static offset `halo`
    # (_when_offset) — a clipped interior window would corrupt them.
    slab = next((s for s in (16, 8)
                 if n % s == 0 and s + 2 * halo <= n and halo <= s), None)
    if slab is None:
        raise ValueError(
            f"advect_project_3d_resident: no slab in (16, 8) fits "
            f"n={n}, halo={halo} (need n % slab == 0, slab + 2*halo <= n, "
            f"halo <= slab)"
        )
    p = slab + 2 * halo
    dt0 = float(np.float32(dt) * np.float32(n - 2))
    kernel = functools.partial(
        _advect_project_kernel, n=n, slab=slab, k_win=window, n_sub=n_sub,
        dt0=dt0, iters=iters, n_slabs=n // slab,
    )
    return pl.pallas_call(
        kernel,
        grid=(n // slab + 1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, n, n, n), vel.dtype),
            jax.ShapeDtypeStruct((n, n, n), vel.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((3, n, n, n), jnp.float32),       # velp (persistent)
            pltpu.VMEM((3, p, n, n), jnp.float32),       # fwin
            pltpu.VMEM((n, n, n), jnp.float32),          # pb0
            pltpu.VMEM((n, n, n), jnp.float32),          # pb1
            pltpu.VMEM((n, n, n), jnp.float32),          # divb
            pltpu.VMEM((n, n, n), vel.dtype),            # pstag
            pltpu.SemaphoreType.DMA((5,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(vel)


def project_3d_resident(vel, iters: int, obst=None, interpret: bool = False,
                        solve_dtype=None, sweep_block: int = 1):
    """Whole-projection-in-VMEM: divergence + ``iters`` Jacobi sweeps +
    gradient subtraction in ONE kernel.  Returns (vel, p).

    HBM traffic: one read of vel (+ the bool mask), one write of (vel, p)
    — independent of ``iters``.  Interior numerics match
    ``ops.project.project_3d`` (the returned div/p wall values are
    solver-internal; p's faces ARE set_bnd-consistent here).

    ``obst``: optional bool mask.  Fully handled in-kernel: the solve's
    copy-through (folded into the sweep coefficient volume), the gradient
    zeroing, and the ``set_bnd`` obstacle *mirror* on the returned
    velocity components (applied after the face writes — the oracle's
    faces-then-mirror order).

    ``solve_dtype``: dtype of the ping-pong iterate and rhs VMEM volumes
    (default float32).  ``jnp.bfloat16`` halves the sweep's VMEM operand
    traffic — the measured bound of the 60-sweep loop — while every
    sweep still *computes* in f32 (operands upcast after each rolled
    read).  Accuracy: the iterate/rhs rounding (~1e-3 relative) is the
    same order as what 60-iteration Jacobi truncation already leaves
    (measured: divergence removal 74.4% vs 74.5% of the f32 solve on a
    random field — tools note in docs/KERNELS.md); opt in via
    ``SimConfig.solve_dtype="bfloat16"``.

    ``sweep_block``: composite sweep blocking — ``T ≥ 2`` runs ``T``
    Jacobi iterations per VMEM pass (see ``_solve_loop``; f32 storage;
    obstacle masks and bf16 solve buffers compose; silently ignored
    otherwise).  Same iteration count and contraction, ulp-class f32
    reassociation drift; cuts the sweep loop's VMEM operand traffic
    ``~T×``.
    """
    n = vel.shape[-1]
    assert vel.shape == (3, n, n, n)
    sdt = jnp.float32 if solve_dtype is None else jnp.dtype(solve_dtype)
    common = dict(
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, n, n, n), vel.dtype),
            jax.ShapeDtypeStruct((n, n, n), vel.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    scratch = [
        pltpu.VMEM((3, n, n, n), vel.dtype),      # vbuf (storage dtype)
        pltpu.VMEM((n, n, n), sdt),               # pb0
        pltpu.VMEM((n, n, n), sdt),               # pb1
        pltpu.VMEM((n, n, n), sdt),               # divb (solve rhs)
        pltpu.VMEM((n, n, n), vel.dtype),         # pstag (out staging)
    ]
    if obst is None:
        kernel = functools.partial(_project_kernel, n=n, iters=iters,
                                   sweep_block=sweep_block)
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            scratch_shapes=scratch + [pltpu.SemaphoreType.DMA((5,))],
            **common,
        )(vel)
    kernel = functools.partial(_project_obst_kernel, n=n, iters=iters,
                               sweep_block=sweep_block)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        scratch_shapes=scratch + [
            pltpu.VMEM((n, n, n), jnp.int8),
            pltpu.VMEM((n, n, n), jnp.float32),   # coef (masked 1/6)
            pltpu.SemaphoreType.DMA((6,)),
        ],
        **common,
    )(vel, obst.astype(jnp.int8))


def _project_advect_kernel(vel_hbm, dens_hbm, velout_hbm, p_hbm, densout_hbm,
                           vbuf, pb0, pb1, divb, pstag, dwin, dowin, sems,
                           dsems, *, n: int, iters: int, k_win: int,
                           n_sub: int, dt0: float, slab: int,
                           obst_hbm=None, omask=None, coef=None,
                           sweep_block: int = 1, damp: float = 1.0,
                           dens_damp: float = 1.0, src_ref=None):
    """Resident projection + density advection in ONE single-program kernel.

    The projection ends with the projected velocity resident in ``vbuf`` —
    exactly the field the subsequent density advection backtraces through —
    so the advection phase reads its velocity windows as VMEM *slices*
    instead of re-streaming the 3-component field from HBM (saves one full
    velocity read per step) and the whole thing costs one dispatch.

    Unlike the rejected ``_advect_project_kernel`` (grid programs with
    ``pl.when`` phase unions, which Mosaic compiled 4× slower), this is a
    SINGLE grid-less program with sequential phases — the same structure as
    the resident projection itself, whose div/sweeps/gradient phases
    compile well.

    Overlap: density window 0 prefetches during the projection; the
    velocity/pressure out-DMAs (started by ``_project_body``) drain under
    the advection compute; density in/out windows double-buffer across
    z-slabs exactly like the standalone advect kernel's cross-program
    scheme.

    Numerics: bitwise the composition of ``_project_kernel`` and the
    standalone advect kernel — the advection core is the shared
    ``_substep_window_vals`` on the same f32 window values, and the
    final output contract (fresh-zero walls + ``set_bnd`` faces for
    ``b=0``) is the same slice-write formulation as the standalone
    kernel's ``fuse_mask`` path.

    ``obst_hbm``/``omask``/``coef``: optional static obstacle mask.  The
    projection handles it exactly as ``_project_obst_kernel`` (coefficient
    volume + in-kernel mirror), and the density phase slices the
    VMEM-resident ``omask`` per window — applying the b=0 contract
    (fresh-zero walls AND obstacle cells, then faces; ``set_bnd_3d``
    applies no obstacle op to scalars) per substep via
    ``_substep_window_vals``.  No extra HBM traffic beyond the one int8
    mask read the unfused projection already pays, and the b=0 contract
    reads no ±1 mirror neighbors, so the halo stays ``n_sub·k_win``.
    """
    prefetch, run = _density_phase(
        dens_hbm, densout_hbm, vbuf, dwin, dowin, dsems,
        n=n, k_win=k_win, n_sub=n_sub, dt0=dt0, slab=slab,
        omask_ref=omask, dens_damp=dens_damp, src_ref=src_ref,
    )
    # Prefetch density window 0 under the projection.
    prefetch()

    p_dma, out_dmas = _project_body(
        vel_hbm, velout_hbm, p_hbm, vbuf, pb0, pb1, divb, pstag, sems,
        n=n, iters=iters, obst_hbm=obst_hbm, omask=omask, coef=coef,
        sweep_block=sweep_block, damp=damp,
    )

    run()
    p_dma.wait()
    for dma in out_dmas:
        dma.wait()


def _project_advect_src_kernel(src_smem, *refs, **kw):
    """``_project_advect_kernel`` with the folded-emitter descriptor as
    a leading (5,) f32 SMEM operand (obstacle-free configs only —
    stable3d's ``emitter_folds`` gate)."""
    _project_advect_kernel(*refs, src_ref=src_smem, **kw)


def _project_advect_obst_kernel(vel_hbm, dens_hbm, obst_hbm, velout_hbm,
                                p_hbm, densout_hbm, vbuf, pb0, pb1, divb,
                                pstag, dwin, dowin, omask, coef, sems,
                                dsems, *, n: int, iters: int, k_win: int,
                                n_sub: int, dt0: float, slab: int,
                                sweep_block: int = 1, damp: float = 1.0,
                                dens_damp: float = 1.0):
    _project_advect_kernel(
        vel_hbm, dens_hbm, velout_hbm, p_hbm, densout_hbm,
        vbuf, pb0, pb1, divb, pstag, dwin, dowin, sems, dsems,
        n=n, iters=iters, k_win=k_win, n_sub=n_sub, dt0=dt0, slab=slab,
        obst_hbm=obst_hbm, omask=omask, coef=coef,
        sweep_block=sweep_block, damp=damp, dens_damp=dens_damp,
    )


def _density_phase(dens_hbm, densout_hbm, vbuf, dwin, dowin, dsems, *,
                   n: int, k_win: int, n_sub: int, dt0: float, slab: int,
                   omask_ref=None, dens_damp: float = 1.0, src_ref=None):
    """The density-advection phase shared by the fused kernels
    (``_project_advect_kernel``, ``_full_step_kernel``).

    Returns ``(prefetch, run)``: call ``prefetch()`` as early as possible
    (it starts density window 0's in-DMA, which only touches
    ``dens_hbm``/``dwin``), and ``run()`` once the projected velocity is
    resident in ``vbuf`` — it executes the double-buffered z-slab loop
    (each window's velocity read as VMEM *slices* of ``vbuf``) and drains
    the density out-DMAs.

    ``omask_ref``: optional VMEM-resident int8 obstacle mask (the
    projection's ``omask`` volume, already DMA'd in by ``_project_body``
    — ``run()`` must only be called after it).  Each window slices it
    like the velocity; ``_substep_window_vals`` then applies the full
    b=0 obstacle contract (fresh-zero walls + obstacle cells, then
    faces) per substep *in-values*, so the slice-write face pass is
    skipped.

    ``dens_damp``: Stam's implicit density dissipation ``1/(1 + dt·κ)``
    folded in as a storage-dtype scalar multiply on each out window
    after the face writes — the XLA composition's exact order and
    rounding (``density * jnp.asarray(dens_damp, dtype)``; the face
    rows are pure copies, so multiplying per-window before the out-DMA
    is value-identical to multiplying the assembled field).  Saves the
    standalone multiply's full density read+write per step (~25 µs at
    128³): the kernel output is opaque to XLA, so the scan body can
    fuse the trailing multiply with nothing.

    ``src_ref``: folded-emitter descriptor ((5,) f32 SMEM ref —
    ``scene.sources.emitter_fold_operand``).  Each density window gets
    the emitter's add at load (``src_field_add`` in global
    coordinates), replacing the step's standalone full-grid emitter
    pass; pointwise, so halo cells match their home windows."""
    from .advect import _substep_window_vals

    halo = k_win * n_sub
    pw = slab + 2 * halo
    n_slabs = n // slab
    f32 = jnp.float32

    def din_dma(slot, i):
        z0 = i * slab
        start = jnp.clip(z0 - halo, 0, n - pw)
        return pltpu.make_async_copy(
            dens_hbm.at[pl.ds(start, pw)], dwin.at[slot], dsems.at[0, slot]
        )

    def dout_dma(slot, i):
        return pltpu.make_async_copy(
            dowin.at[slot], densout_hbm.at[pl.ds(i * slab, slab)],
            dsems.at[1, slot],
        )

    def prefetch():
        din_dma(jnp.int32(0), jnp.int32(0)).start()

    def slab_body(i, carry):
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_slabs)
        def _():
            din_dma(nslot, i + 1).start()

        din_dma(slot, i).wait()

        @pl.when(i >= 2)
        def _():
            # reclaim this slot's out window before overwriting it
            dout_dma(slot, i - 2).wait()

        z0 = i * slab
        start = jnp.clip(z0 - halo, 0, n - pw)
        vel_vals = tuple(
            vbuf.at[c][pl.ds(start, pw)].astype(f32) for c in range(3)
        )
        if src_ref is not None:
            from ..scene.sources import src_field_add, src_window_hit

            # In-place add on the VMEM window (re-DMA'd every slab, so
            # mutation is safe), gated to windows the ball intersects —
            # outside them the add is exactly +0.0.
            @pl.when(src_window_hit(src_ref, start, pw))
            def _():
                dw = dwin.at[slot]
                dw[...] = src_field_add(
                    dw[...].astype(f32), src_ref, z0=start
                ).astype(dwin.dtype)
        dval = (dwin.at[slot][...].astype(f32),)
        om = (omask_ref[pl.ds(start, pw)].astype(f32)
              if omask_ref is not None else None)
        out = _substep_window_vals(
            dval, vel_vals, start=start, n=n, p=pw, k_win=k_win,
            n_sub=n_sub, dt0=dt0, bs=(0,), omask=om,
        )
        dowin_slot = dowin.at[slot]

        def emit(off):
            dowin_slot[:, :, :] = (
                out[0][off:off + slab].astype(dowin.dtype)
            )

        _when_offset(i, n=n, slab=slab, halo=halo, n_slabs=n_slabs,
                     emit=emit)

        if omask_ref is None:
            # Output contract for b=0 (fresh-zero walls + set_bnd faces;
            # the zero step needs no writes — every border cell is
            # rewritten by the face passes, same argument as the
            # standalone kernel's fuse_mask).  z faces exist only in the
            # first/last slab; all signs are +1 for a scalar field.
            # (With ``omask_ref`` the full b=0 contract already ran
            # in-values per substep inside ``_substep_window_vals``.)
            @pl.when(i == 0)
            def _():
                dowin_slot[0:1] = dowin_slot[1:2]

            @pl.when(i == n_slabs - 1)
            def _():
                dowin_slot[slab - 1:slab] = dowin_slot[slab - 2:slab - 1]

            dowin_slot[:, 0:1, :] = dowin_slot[:, 1:2, :]
            dowin_slot[:, n - 1:n, :] = dowin_slot[:, n - 2:n - 1, :]
            dowin_slot[:, :, 0:1] = dowin_slot[:, :, 1:2]
            dowin_slot[:, :, n - 1:n] = dowin_slot[:, :, n - 2:n - 1]

        if dens_damp != 1.0:
            dowin_slot[:, :, :] = dowin_slot[:, :, :] * jnp.asarray(
                dens_damp, dowin.dtype
            )

        dout_dma(slot, i).start()
        return carry

    def run():
        jax.lax.fori_loop(0, n_slabs, slab_body, 0)
        # Drain the last two density out-DMAs.
        if n_slabs >= 2:
            dout_dma(jnp.int32(n_slabs % 2), jnp.int32(n_slabs - 2)).wait()
        dout_dma(jnp.int32((n_slabs - 1) % 2), jnp.int32(n_slabs - 1)).wait()

    return prefetch, run


def project_advect_fits(n: int, window: int, n_sub: int,
                        solve_bytes: int = 4, field_bytes: int = 4,
                        has_obst: bool = False, compiled: bool = True):
    """Largest z-slab for the fused projection+density-advect kernel, or
    ``None`` when it cannot fit VMEM.  Total-footprint model: declared
    volumes (3 field + 3 solve + 1 pstag) + 2×(in+out) density windows +
    ~15 window-equivalents of live f32 advect temporaries (the two-tap
    form's fractions/partials; the projection phases' temporaries are
    smaller) against a 100 MB budget.  ``has_obst`` adds the declared
    int8 mask + f32 coef volumes and ~2 window-equivalents for the
    per-window f32 mask slice and its derived bools (the b=0 contract
    has no mirror, so the halo does NOT grow).

    ``compiled`` (round 5): on compiled Mosaic the OBSTACLE variant's
    register allocator additionally spills ~11 volume-equivalents
    (measured: 84.39 MB spill slots at f32/128³ → 155.14 MB total OOM;
    the bf16-solve arrangement still OOMs at 130.92 MB) — a toolchain
    property (the same kernel compiled in round 4).  Interpret callers
    pass ``compiled=False`` and keep the spill-free model so CPU tests
    exercise the fused obstacle branch."""
    halo = window * n_sub
    plane = n * n
    vol = n * plane
    for slab in (32, 16, 8):
        # halo <= slab: the kernel writes interior slabs at the STATIC
        # offset `halo` (_when_offset), which requires interior windows
        # never clip; larger halos must fall back to the unfused path.
        if n % slab or slab + 2 * halo > n or halo > slab:
            continue
        pw = slab + 2 * halo
        declared = (
            4 * vol * field_bytes          # vbuf(3) + pstag
            + 3 * vol * solve_bytes        # pb0/pb1/divb
            + 2 * (pw + slab) * plane * field_bytes   # dwin/dowin ×2 slots
        )
        temps = 15 * pw * plane * 4
        if has_obst:
            declared += vol * (1 + 4)      # omask (int8) + coef (f32)
            temps += 2 * pw * plane * 4
            if compiled:
                temps += 11 * vol * 4      # measured spill envelope
        if declared + temps <= 100 * 1024 * 1024:
            return slab
    return None


def project_advect_density_3d_resident(vel, density, iters: int, dt: float,
                                       *, window: int = 1, n_sub: int = 1,
                                       solve_dtype=None, obst=None,
                                       interpret: bool = False,
                                       sweep_block: int = 1,
                                       damp: float = 1.0,
                                       dens_damp: float = 1.0,
                                       src=None):
    """Fused whole-projection-in-VMEM + density advection.

    Returns ``(vel', p, density')`` — bitwise equal to
    ``project_3d_resident(vel, iters, obst=obst, solve_dtype=...)``
    followed by ``advect_multi_3d_pallas((0,), density[None], vel', dt,
    obst, window=window, n_sub=n_sub)``, in one kernel: the density
    advection backtraces through the projected velocity while it is still
    resident in VMEM, saving the advect's full HBM velocity read and a
    dispatch.  With ``obst`` the projection folds the mask into the solve
    coefficient + in-kernel mirror (as ``project_3d_resident``) and the
    density phase slices the already-resident mask per window — so the
    obstacle configs (e.g. vortex128) pay no extra HBM for the fusion
    either.
    """
    n = vel.shape[-1]
    assert vel.shape == (3, n, n, n) and density.shape == (n, n, n)
    sdt = jnp.dtype(jnp.float32 if solve_dtype is None else solve_dtype)
    fb = jnp.dtype(vel.dtype).itemsize
    slab = project_advect_fits(n, window, n_sub,
                               solve_bytes=sdt.itemsize, field_bytes=fb,
                               has_obst=obst is not None)
    assert slab is not None, "caller must gate on project_advect_fits"
    halo = window * n_sub
    pw = slab + 2 * halo
    dt0 = float(np.float32(dt) * np.float32(n - 2))
    common = dict(
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, n, n, n), vel.dtype),
            jax.ShapeDtypeStruct((n, n, n), vel.dtype),
            jax.ShapeDtypeStruct((n, n, n), density.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    scratch = [
        pltpu.VMEM((3, n, n, n), vel.dtype),      # vbuf
        pltpu.VMEM((n, n, n), sdt),               # pb0
        pltpu.VMEM((n, n, n), sdt),               # pb1
        pltpu.VMEM((n, n, n), sdt),               # divb
        pltpu.VMEM((n, n, n), vel.dtype),         # pstag
        pltpu.VMEM((2, pw, n, n), density.dtype),    # dwin (2 slots)
        pltpu.VMEM((2, slab, n, n), density.dtype),  # dowin (2 slots)
    ]
    if obst is None:
        kernel = functools.partial(
            _project_advect_src_kernel if src is not None
            else _project_advect_kernel,
            n=n, iters=iters, k_win=window,
            n_sub=n_sub, dt0=dt0, slab=slab, sweep_block=sweep_block,
            damp=damp, dens_damp=dens_damp,
        )
        return pl.pallas_call(
            kernel,
            in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)]
                      if src is not None else [])
            + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
            scratch_shapes=scratch + [
                pltpu.SemaphoreType.DMA((5,)),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            **common,
        )(*(((src,) if src is not None else ()) + (vel, density)))
    assert src is None, "src folding requires an obstacle-free config"
    kernel = functools.partial(
        _project_advect_obst_kernel, n=n, iters=iters, k_win=window,
        n_sub=n_sub, dt0=dt0, slab=slab, sweep_block=sweep_block,
        damp=damp, dens_damp=dens_damp,
    )
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        scratch_shapes=scratch + [
            pltpu.VMEM((n, n, n), jnp.int8),      # omask
            pltpu.VMEM((n, n, n), jnp.float32),   # coef (masked 1/6)
            pltpu.SemaphoreType.DMA((6,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        **common,
    )(vel, density, obst.astype(jnp.int8))


def _full_step_kernel(vel_hbm, dens_hbm, velout_hbm, p_hbm, densout_hbm,
                      vbuf, pb0, pb1, divb, pstag, awin, dwin, dowin,
                      sems, asems, dsems, *, n: int, iters: int, k_win: int,
                      n_sub: int, dt0: float, a_slab: int, d_slab: int,
                      sweep_block: int = 1, damp: float = 1.0,
                      dens_damp: float = 1.0):
    """The whole hot step in ONE grid-less kernel: velocity self-advection
    → resident projection → density advection, as three sequential phases.

    Phase A (self-advection) streams double-buffered velocity z-windows
    from HBM and writes the advected slabs **directly into ``vbuf``** —
    the projection's resident input volume — so the advected velocity
    never round-trips HBM between advection and projection (saves the
    advect's full-field write AND the projection's read, ~50 MB/step at
    128³ f32, plus a dispatch).  Phase B is the unchanged
    ``_project_body`` with ``vel_resident=True``; phase C is the shared
    ``_density_phase`` (velocity windows as VMEM slices of ``vbuf``).

    This is the grid-less sequential-phase re-design of the REJECTED
    ``_advect_project_kernel`` (grid programs with ``pl.when`` phase
    unions, which Mosaic compiled 4× slower) — the same single-program
    structure that the fused projection+density-advect kernel uses.

    Numerics: bitwise the three-kernel composition — phase A is the
    shared ``_substep_window_vals`` core with the standalone self-advect
    kernel's aliasing (fields ARE the velocity windows) and its
    ``fuse_mask`` output contract, applied here as global face writes on
    the resident volume (``_write_faces`` per component; identical values
    — y/x face writes are plane-local so the per-slab vs global ordering
    cannot differ, and the z faces read the same raw advected interior
    planes either way).
    """
    from .advect import _substep_window_vals

    halo = k_win * n_sub
    pa = a_slab + 2 * halo
    n_aslabs = n // a_slab
    f32 = jnp.float32

    prefetch, run_density = _density_phase(
        dens_hbm, densout_hbm, vbuf, dwin, dowin, dsems,
        n=n, k_win=k_win, n_sub=n_sub, dt0=dt0, slab=d_slab,
        dens_damp=dens_damp,
    )
    # Density window 0 only touches dens_hbm/dwin — start it under
    # phase A so it is long resident by the time phase C runs.
    prefetch()

    def ain_dma(slot, i):
        z0 = i * a_slab
        start = jnp.clip(z0 - halo, 0, n - pa)
        return pltpu.make_async_copy(
            vel_hbm.at[:, pl.ds(start, pa)], awin.at[slot], asems.at[slot]
        )

    ain_dma(jnp.int32(0), jnp.int32(0)).start()

    def a_body(i, carry):
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_aslabs)
        def _():
            ain_dma(nslot, i + 1).start()

        ain_dma(slot, i).wait()

        z0 = i * a_slab
        start = jnp.clip(z0 - halo, 0, n - pa)
        aw = awin.at[slot]
        # Self-advection aliasing: the advected fields ARE the advecting
        # velocity — one window stream, same as the standalone kernel's
        # self_adv path.
        vel_vals = tuple(aw[c].astype(f32) for c in range(3))
        out = _substep_window_vals(
            vel_vals, vel_vals, start=start, n=n, p=pa, k_win=k_win,
            n_sub=n_sub, dt0=dt0, bs=(1, 2, 3),
        )

        def emit(off):
            for c in range(3):
                vbuf[c, pl.ds(z0, a_slab)] = (
                    out[c][off:off + a_slab].astype(vbuf.dtype)
                )

        _when_offset(i, n=n, slab=a_slab, halo=halo, n_slabs=n_aslabs,
                     emit=emit)
        return carry

    jax.lax.fori_loop(0, n_aslabs, a_body, 0)

    # Advection output contract (the standalone kernel's fuse_mask,
    # obstacle-free): set_bnd faces z→y→x per component on the resident
    # volume.  The fresh-zero step needs no writes — every border cell is
    # rewritten by the face passes (same argument as fuse_mask).
    for c in range(3):
        sz, sy, sx = _signs(c + 1)
        _write_faces(vbuf, n, sz, sy, sx, c=c)

    p_dma, out_dmas = _project_body(
        vel_hbm, velout_hbm, p_hbm, vbuf, pb0, pb1, divb, pstag, sems,
        n=n, iters=iters, vel_resident=True, sweep_block=sweep_block,
        damp=damp,
    )

    run_density()
    p_dma.wait()
    for dma in out_dmas:
        dma.wait()


def full_step_fits(n: int, window: int, n_sub: int,
                   solve_bytes: int = 4, field_bytes: int = 4):
    """(a_slab, d_slab) for the full-step fused kernel, or ``None`` when
    it cannot fit VMEM.  Total-footprint model: declared volumes
    (3 field + 3 solve + 1 pstag) + 2×3 advect in-windows + 2×(in+out)
    density windows + the larger phase's live f32 temporaries (~28
    window-equivalents for the 3-field self-advect phase, ~15 for the
    density phase — the phases are sequential, so their temporaries are
    not simultaneously live) against a 100 MB budget.  Candidates are
    ordered largest-slab-first (less halo redundancy)."""
    halo = window * n_sub
    plane = n * n
    vol = n * plane
    base = 4 * vol * field_bytes + 3 * vol * solve_bytes
    # halo <= slab on both phases: the kernel writes interior slabs at
    # the STATIC offset `halo` (_when_offset); see project_advect_fits.
    for a_slab in (32, 16, 8):
        if n % a_slab or a_slab + 2 * halo > n or halo > a_slab:
            continue
        pa = a_slab + 2 * halo
        awin = 2 * 3 * pa * plane * field_bytes
        a_temps = 28 * pa * plane * 4
        for d_slab in (32, 16, 8):
            if n % d_slab or d_slab + 2 * halo > n or halo > d_slab:
                continue
            pw = d_slab + 2 * halo
            dwin = 2 * (pw + d_slab) * plane * field_bytes
            d_temps = 15 * pw * plane * 4
            total = base + awin + dwin + max(a_temps, d_temps)
            if total <= 100 * 1024 * 1024:
                return a_slab, d_slab
    return None


def full_step_3d_resident(vel, density, iters: int, dt: float,
                          *, window: int = 1, n_sub: int = 1,
                          solve_dtype=None, interpret: bool = False,
                          sweep_block: int = 1, damp: float = 1.0,
                          dens_damp: float = 1.0):
    """Fused self-advection + whole-projection-in-VMEM + density advection
    (obstacle-free) — one kernel per step for the hot loop.

    Returns ``(vel', p, density')`` — bitwise equal to
    ``advect_multi_3d_pallas((1,2,3), vel, vel, dt, None, window=window,
    n_sub=n_sub)`` followed by ``project_3d_resident(·, iters,
    solve_dtype=...)`` followed by ``advect_multi_3d_pallas((0,),
    density[None], vel', dt, None, window=window, n_sub=n_sub)``.
    """
    n = vel.shape[-1]
    assert vel.shape == (3, n, n, n) and density.shape == (n, n, n)
    sdt = jnp.dtype(jnp.float32 if solve_dtype is None else solve_dtype)
    fb = jnp.dtype(vel.dtype).itemsize
    picked = full_step_fits(n, window, n_sub,
                            solve_bytes=sdt.itemsize, field_bytes=fb)
    assert picked is not None, "caller must gate on full_step_fits"
    a_slab, d_slab = picked
    halo = window * n_sub
    pa = a_slab + 2 * halo
    pw = d_slab + 2 * halo
    dt0 = float(np.float32(dt) * np.float32(n - 2))
    kernel = functools.partial(
        _full_step_kernel, n=n, iters=iters, k_win=window,
        n_sub=n_sub, dt0=dt0, a_slab=a_slab, d_slab=d_slab,
        sweep_block=sweep_block, damp=damp, dens_damp=dens_damp,
    )
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, n, n, n), vel.dtype),
            jax.ShapeDtypeStruct((n, n, n), vel.dtype),
            jax.ShapeDtypeStruct((n, n, n), density.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((3, n, n, n), vel.dtype),         # vbuf
            pltpu.VMEM((n, n, n), sdt),                  # pb0
            pltpu.VMEM((n, n, n), sdt),                  # pb1
            pltpu.VMEM((n, n, n), sdt),                  # divb
            pltpu.VMEM((n, n, n), vel.dtype),            # pstag
            pltpu.VMEM((2, 3, pa, n, n), vel.dtype),     # awin (2 slots)
            pltpu.VMEM((2, pw, n, n), density.dtype),    # dwin (2 slots)
            pltpu.VMEM((2, d_slab, n, n), density.dtype),  # dowin (2 slots)
            pltpu.SemaphoreType.DMA((5,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(vel, density)
