"""Line-table Pallas kernels vs the XLA float march and the point-grid
kernels (interpret mode on CPU — the NCUDA-analogue backend, SURVEY.md §4).

Forward semantics: the reference hot loop /root/reference/src/
cuda_volume_raytracer.cu:335-349 in float; backward: the new reverse-replay
adjoint (no reference analogue)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from volumeraytracer_tpu.kernels.march_lines import (
    _bwd_impl_lines,
    march_lines,
)
from volumeraytracer_tpu.kernels.line_table import (
    build_line_table, fold_line_grads, line_brick_grid,
)
from volumeraytracer_tpu.ops import march as march_ops
from volumeraytracer_tpu.ops.fields import build_packed_field, cropped_translucency
from volumeraytracer_tpu.types import FIX_ONE, STEP_CONST

INV = 2.0
BEND = INV / float(FIX_ONE)
STEP = INV * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE))


def _scene(n=40):
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    ior = 1.0 + 0.4 * np.exp(-3.0 * (x * x + y * y + z * z)).astype(np.float32)
    translucency = np.full((n, n, n), 0xFFFFFFFF, np.uint32)
    translucency[9] = 0  # opaque plane
    return jnp.asarray(ior), jnp.asarray(translucency)


def _rays(n_rays, lo=3.0, hi=34.0, seed=0):
    rng = np.random.default_rng(seed)
    pos = np.stack(
        [
            np.full(n_rays, 1.5, np.float32),
            rng.uniform(lo, hi, n_rays).astype(np.float32),
            rng.uniform(lo, hi, n_rays).astype(np.float32),
        ],
        axis=-1,
    )
    dirs = np.stack(
        [
            np.full(n_rays, 16.0, np.float32),
            rng.uniform(-2.0, 2.0, n_rays).astype(np.float32),
            rng.uniform(-2.0, 2.0, n_rays).astype(np.float32),
        ],
        axis=-1,
    )
    return jnp.asarray(pos), jnp.asarray(dirs), rng


@pytest.mark.parametrize("budget", [64, 300])
def test_lines_march_matches_jnp(budget):
    ior, tr = _scene(40)
    packed = build_packed_field(ior, tr)
    pos, dirs, _ = _rays(70)

    ref = march_ops.march_float(
        packed, None, pos, dirs, budget,
        bend_scale=BEND, step_scale=STEP, chunk_steps=64,
    )
    res = march_lines(
        packed, pos, dirs, budget,
        bend_scale=BEND, step_scale=STEP, k_steps=8, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(res.end_iteration), np.asarray(ref.end_iteration)
    )
    np.testing.assert_allclose(
        np.asarray(res.end_position), np.asarray(ref.end_position),
        rtol=0, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(res.end_direction), np.asarray(ref.end_direction),
        rtol=1e-6, atol=1e-6,
    )
    if budget >= 300:
        assert (np.asarray(res.end_iteration) < budget).any()


def test_lines_march_absorption_matches_jnp():
    n = 32
    ior = np.full((n, n, n), 1.2, np.float32)
    tr = np.full((n, n, n), 0xFFFFFFFF - int(0xFFFFFFFF / 400), np.uint32)
    packed = build_packed_field(jnp.asarray(ior), jnp.asarray(tr))
    trc = cropped_translucency(jnp.asarray(tr))
    pos, dirs, _ = _rays(16, hi=26.0, seed=3)
    dirs = jnp.tile(jnp.asarray([[16.0, 0.5, -0.25]], jnp.float32), (16, 1))
    budget = 500
    minb = int(0.5 * 0xFFFFFFFF)

    ref = march_ops.march_float(
        packed, trc, pos, dirs, budget,
        bend_scale=BEND, step_scale=STEP, chunk_steps=64,
        minimum_brightness=minb,
    )
    res = march_lines(
        packed, pos, dirs, budget,
        bend_scale=BEND, step_scale=STEP, translucency=trc,
        minimum_brightness=minb, k_steps=16, interpret=True,
    )
    it_ref = np.asarray(ref.end_iteration)
    assert (it_ref < budget).all()
    np.testing.assert_allclose(
        np.asarray(res.end_iteration).astype(np.int64), it_ref, atol=1,
    )
    np.testing.assert_allclose(
        np.asarray(res.remaining_light).astype(np.float64),
        np.asarray(ref.remaining_light).astype(np.float64),
        rtol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(res.end_position), np.asarray(ref.end_position),
        rtol=0, atol=5e-2,
    )


def test_lines_bwd_matches_xla_grads():
    """Line-layout adjoint kernel vs jax.grad of the XLA differentiable
    march — independent adjoint implementations on the same trajectory."""
    n = 32
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    ior = jnp.asarray(
        1.0 + 0.4 * np.exp(-3.0 * (x * x + y * y + z * z)).astype(np.float32)
    )
    packed = build_packed_field(ior)
    pos, dirs, rng = _rays(24, hi=26.0)
    budget = 150
    wp = jnp.asarray(rng.normal(size=pos.shape).astype(np.float32))
    wd = jnp.asarray(rng.normal(size=dirs.shape).astype(np.float32))

    # forward on the line kernel for end state + executed counts
    table, nb = build_line_table(packed, None)
    res, raw = march_lines(
        packed, pos, dirs, budget, bend_scale=BEND, step_scale=STEP,
        k_steps=8, interpret=True, return_state=True, table=table, nb=nb,
    )
    nexec = jnp.maximum(jnp.int32(budget - 1) - raw["remaining"], 0)

    gtable, d_pos0, d_dir0, recon, _ = _bwd_impl_lines(
        table, nb, res.end_position, res.end_direction, nexec, wp, wd,
        bend=(BEND,) * 3, step=(STEP,) * 3, k_steps=8, max_windows=None,
        interpret=True, budget=budget,
    )
    d_packed = fold_line_grads(gtable, packed.shape, nb)

    # the reverse reconstruction must land back on the start positions
    np.testing.assert_allclose(
        np.asarray(recon), np.asarray(pos), rtol=0, atol=2e-3
    )

    def loss_xla(packed, pos, dirs):
        r = march_ops.march_float(
            packed, None, pos, dirs, budget, bend_scale=BEND, step_scale=STEP,
            chunk_steps=16, differentiable=True,
        )
        return jnp.sum(r.end_position * wp) + jnp.sum(r.end_direction * wd)

    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(packed, pos, dirs)
    for a, b in zip((d_packed, d_pos0, d_dir0), gx):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max()
        np.testing.assert_allclose(a, b, atol=1e-3 * scale, rtol=0)


def test_lines_diff_wrapper_and_fd():
    """march_pallas_diff(layout='lines') end-to-end custom_vjp + a
    finite-difference spot check."""
    from volumeraytracer_tpu.kernels.march_bwd import march_pallas_diff

    n = 24
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    ior = jnp.asarray(
        1.0 + 0.4 * np.exp(-3.0 * (x * x + y * y + z * z)).astype(np.float32)
    )
    packed = build_packed_field(ior)
    pos, dirs, rng = _rays(8, hi=18.0, seed=5)
    budget = 120

    def loss(packed, pos):
        r = march_pallas_diff(
            packed, pos, dirs, budget, bend_scale=BEND, step_scale=STEP,
            k_steps=8, interpret=True, layout="lines",
        )
        return jnp.sum(r.end_position)

    g_packed, g_pos = jax.grad(loss, argnums=(0, 1))(packed, pos)

    v = jnp.asarray(rng.normal(size=packed.shape).astype(np.float32))
    eps = 4.0
    lp = float(loss(packed + eps * v, pos))
    lm = float(loss(packed - eps * v, pos))
    fd = (lp - lm) / (2 * eps)
    an = float(jnp.sum(g_packed * v))
    np.testing.assert_allclose(an, fd, rtol=2e-2)


def test_lines_pause_resume_matches_single_march():
    """Mid-march compaction primitive: a march paused by max_windows, then
    resumed from its returned raw state (re-sorted by current brick inside
    the driver), must land exactly where the single uninterrupted march does
    — the "ray state is a checkpoint" property (SURVEY.md §5) that the
    two-phase scattered-ray mitigation (SURVEY §7) is built on."""
    ior, tr = _scene(40)
    packed = build_packed_field(ior)
    table, nb = build_line_table(packed, None)
    # scattered rays: random positions/directions all over the volume
    rng = np.random.default_rng(9)
    n_rays = 40
    pos = jnp.asarray(rng.uniform(3.0, 34.0, (n_rays, 3)).astype(np.float32))
    dirs = jnp.asarray(
        rng.normal(0.0, 8.0, (n_rays, 3)).astype(np.float32) + 1e-3
    )
    budget = 200

    # scattered rays serialize over bricks: the default max_windows
    # (2·budget+64) can truncate — give the reference and the resume leg an
    # ample cap so the comparison is between COMPLETE marches
    ample = 40_000
    ref = march_lines(
        packed, pos, dirs, budget, bend_scale=BEND, step_scale=STEP,
        k_steps=8, interpret=True, table=table, nb=nb, max_windows=ample,
    )

    # phase 1: hard pause after a few windows
    r1, s1 = march_lines(
        packed, pos, dirs, budget, bend_scale=BEND, step_scale=STEP,
        k_steps=8, interpret=True, table=table, nb=nb,
        max_windows=6, return_state=True,
    )
    assert int(jnp.sum(s1["alive"])) > 0  # some rays really paused mid-march
    # phase 2: resume from the raw state (march_lines re-sorts internally)
    r2 = march_lines(
        packed, r1.end_position, r1.end_direction, budget,
        bend_scale=BEND, step_scale=STEP, k_steps=8, interpret=True,
        table=table, nb=nb, init_state=s1, max_windows=ample,
    )
    np.testing.assert_allclose(
        np.asarray(r2.end_position), np.asarray(ref.end_position),
        rtol=0, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(r2.end_direction), np.asarray(ref.end_direction),
        rtol=0, atol=1e-6,
    )
    # cumulative executed steps must match: phase1 executed + phase2 executed
    ex1 = (budget - 1) - np.asarray(s1["remaining"]).astype(np.int64)
    _, s2 = march_lines(
        packed, r1.end_position, r1.end_direction, budget,
        bend_scale=BEND, step_scale=STEP, k_steps=8, interpret=True,
        table=table, nb=nb, init_state=s1, return_state=True,
        max_windows=ample,
    )
    ex2 = np.asarray(s1["remaining"]).astype(np.int64) - np.asarray(
        s2["remaining"]
    ).astype(np.int64)
    ref_ex = (budget - 1) - ((budget) - np.asarray(ref.end_iteration).astype(np.int64) - 1)
    np.testing.assert_array_equal(ex1 + ex2, np.asarray(ref.end_iteration).astype(np.int64) - 1)


def test_lines_compact_matches_single_march():
    """The jitted multi-phase compaction driver (march → re-bin by current
    brick → continue) must reproduce the uninterrupted march exactly on a
    scattered batch."""
    from volumeraytracer_tpu.kernels.march_lines import march_lines_compact

    ior, tr = _scene(40)
    packed = build_packed_field(ior)
    table, nb = build_line_table(packed, None)
    rng = np.random.default_rng(13)
    n_rays = 48
    pos = jnp.asarray(rng.uniform(3.0, 34.0, (n_rays, 3)).astype(np.float32))
    dirs = jnp.asarray(
        rng.normal(0.0, 8.0, (n_rays, 3)).astype(np.float32) + 1e-3
    )
    budget = 150

    ref = march_lines(
        packed, pos, dirs, budget, bend_scale=BEND, step_scale=STEP,
        k_steps=8, interpret=True, table=table, nb=nb, max_windows=40_000,
    )
    res = march_lines_compact(
        packed, pos, dirs, budget, bend_scale=BEND, step_scale=STEP,
        k_steps=8, phase_windows=5, max_phases=8000, interpret=True,
        table=table, nb=nb,
    )
    np.testing.assert_allclose(
        np.asarray(res.end_position), np.asarray(ref.end_position),
        rtol=0, atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(res.end_iteration), np.asarray(ref.end_iteration)
    )


@pytest.mark.parametrize("budget", [64, 300])
def test_lines_anchor2x_matches_jnp(budget):
    """2-cell-x anchor slab variant: same semantics as the 1-cell anchor
    (per-step sub-cell corner select inside the slab), checked against the
    XLA march including backward-marching (-x) rays.  The mixed-brick batch
    serializes in the min-brick scheduler, so an ample max_windows keeps the
    comparison between complete marches."""
    ior, tr = _scene(40)
    packed = build_packed_field(ior, tr)
    pos, dirs, rng = _rays(70)
    pos = np.asarray(pos).copy()
    dirs = np.asarray(dirs).copy()
    dirs[::5, 0] = -16.0
    pos[::5, 0] = 36.0
    pos, dirs = jnp.asarray(pos), jnp.asarray(dirs)

    ref = march_ops.march_float(
        packed, None, pos, dirs, budget,
        bend_scale=BEND, step_scale=STEP, chunk_steps=64,
    )
    res = march_lines(
        packed, pos, dirs, budget,
        bend_scale=BEND, step_scale=STEP, k_steps=8, interpret=True,
        anchor2x=True, max_windows=40_000,
    )
    np.testing.assert_array_equal(
        np.asarray(res.end_iteration), np.asarray(ref.end_iteration)
    )
    np.testing.assert_allclose(
        np.asarray(res.end_position), np.asarray(ref.end_position),
        rtol=0, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(res.end_direction), np.asarray(ref.end_direction),
        rtol=1e-6, atol=1e-6,
    )


def test_lines_record_path_matches_xla_path():
    """In-kernel path recording (≙ the reference's trace_path,
    cuda_volume_raytracer.cu:333,348-358): the per-ray step paths recovered
    from the window snapshot buffer must equal the XLA march's recorded
    path exactly (same trajectory, same back-fill contract)."""
    ior, tr = _scene(40)
    packed = build_packed_field(ior, tr)
    pos, dirs, _ = _rays(12, hi=30.0, seed=2)
    budget = 80

    ref = march_ops.march_float(
        packed, None, pos, dirs, budget,
        bend_scale=BEND, step_scale=STEP, chunk_steps=16, record_path=True,
    )
    res = march_lines(
        packed, pos, dirs, budget,
        bend_scale=BEND, step_scale=STEP, k_steps=8, interpret=True,
        record_path=True,
    )
    assert res.path is not None
    rp = np.asarray(ref.path)[:, : budget + 1]
    lp = np.asarray(res.path)
    assert lp.shape == (12, budget + 1, 3)
    np.testing.assert_allclose(lp, rp, rtol=0, atol=1e-4)
