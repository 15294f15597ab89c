"""Optimiser-loop tests: optax fit converges, orbax checkpoint/resume
restores mid-run state exactly, ray-state snapshots restart a march
("ray state is a checkpoint", SURVEY.md §5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from volumeraytracer_tpu.models import optimize
from volumeraytracer_tpu.models.optical_volume import OpticalVolume
from volumeraytracer_tpu.parallel.shard import endpoint_render


def _scene(n=24):
    ior = np.ones((n, 8, 8), np.float32)
    for i in range(2, n - 2):
        ior[i] = 1.0 + 0.5 * (i - 2) / (n - 4)
    return jnp.asarray(ior)


def _rays(n_rays=12, seed=0):
    rng = np.random.default_rng(seed)
    pos = np.stack(
        [np.full(n_rays, 1.5), rng.uniform(2.0, 5.0, n_rays), rng.uniform(2.0, 5.0, n_rays)],
        axis=-1,
    ).astype(np.float32)
    dirs = np.tile(np.array([[16.0, 0.0, 0.0]], np.float32), (n_rays, 1))
    return jnp.asarray(pos), jnp.asarray(dirs)


def test_fit_field_converges():
    true_ior = _scene()
    pos, dirs = _rays()
    budget, chunk = 48, 16
    target, _ = endpoint_render(true_ior, pos, dirs, budget, 2.0, chunk)

    init = jnp.ones_like(true_ior) * 1.2
    res = optimize.fit_field(
        init, pos, dirs, jnp.asarray(target),
        budget=budget, chunk_steps=chunk, steps=60, learning_rate=2e-2,
    )
    assert res.losses[-1] < res.losses[0] * 0.5
    assert np.all(res.ior > 1.0)  # softplus keeps the field physical


def test_fit_field_checkpoint_resume(tmp_path):
    true_ior = _scene()
    pos, dirs = _rays(8, seed=1)
    budget, chunk = 32, 16
    target, _ = endpoint_render(true_ior, pos, dirs, budget, 2.0, chunk)
    init = jnp.ones_like(true_ior) * 1.1
    kw = dict(budget=budget, chunk_steps=chunk, learning_rate=1e-3)

    # uninterrupted 10-step run
    full = optimize.fit_field(init, pos, dirs, jnp.asarray(target), steps=10, **kw)

    # interrupted: 5 steps checkpointed, then resumed to 10 from the same dir
    ckpt = tmp_path / "ckpt"
    optimize.fit_field(
        init, pos, dirs, jnp.asarray(target), steps=5,
        checkpoint_dir=ckpt, checkpoint_every=1, **kw,
    )
    resumed = optimize.fit_field(
        init, pos, dirs, jnp.asarray(target), steps=10,
        checkpoint_dir=ckpt, checkpoint_every=1, **kw,
    )
    assert resumed.step == 9
    np.testing.assert_allclose(resumed.ior, full.ior, rtol=1e-5, atol=1e-6)


def test_ray_state_checkpoint_roundtrip(tmp_path):
    """March 200 steps in one go vs 100 + snapshot + restore + 100."""
    ior = _scene(32)
    ov = OpticalVolume(ior, scale=1.0)
    pos = jnp.asarray([[3.0, 4.0, 4.0], [5.0, 3.0, 3.0]], jnp.float32)
    dirs = jnp.asarray([[10.0, 0.0, 0.0], [10.0, 1.0, 0.0]], jnp.float32)

    p_full, d_full, _ = ov.trace_rays(pos, dirs, 200)

    p1, d1, rem1 = ov.trace_rays(pos, dirs, 100)
    from volumeraytracer_tpu.types import TraceResult

    snap = TraceResult(
        end_position=p1, end_direction=d1,
        end_iteration=jnp.uint32(100) - rem1,
        remaining_light=jnp.full((2,), 0xFFFFFFFF, jnp.uint32),
    )
    f = tmp_path / "rays.npz"
    optimize.save_ray_state(f, snap, budget_left=np.full(2, 100, np.uint32))
    p2, d2, bl, _ = optimize.load_ray_state(f)
    p3, d3, _ = ov.trace_rays(jnp.asarray(p2), jnp.asarray(d2), bl)

    np.testing.assert_allclose(np.asarray(p3), np.asarray(p_full), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d3), np.asarray(d_full), rtol=1e-6, atol=1e-6)
