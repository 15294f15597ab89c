"""Brick-sharded field tests (BASELINE config 5) on the virtual 8-device CPU
mesh: forward parity vs the single-device march, slab round-trips, gradient
correctness of the halo exchange vs the replicated-field autodiff path, and
slab-copy consistency after a training step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from volumeraytracer_tpu.ops import march as march_ops
from volumeraytracer_tpu.ops.fields import build_packed_field
from volumeraytracer_tpu.parallel import make_mesh
from volumeraytracer_tpu.parallel import bricks
from volumeraytracer_tpu.parallel.shard import endpoint_render
from volumeraytracer_tpu.types import FIX_ONE, STEP_CONST


def _smooth_ior(shape=(34, 10, 10), seed=3):
    """Smooth random GRIN field in [1, 1.5]."""
    rng = np.random.default_rng(seed)
    f = rng.uniform(0.0, 1.0, shape).astype(np.float32)
    for axis in range(3):
        for _ in range(3):
            f = 0.5 * f + 0.25 * (np.roll(f, 1, axis) + np.roll(f, -1, axis))
    f = (f - f.min()) / max(float(np.ptp(f)), 1e-9)
    return jnp.asarray(1.0 + 0.5 * f, jnp.float32)


def _rays(n_rays, ylo=2.0, yhi=6.0, seed=0):
    rng = np.random.default_rng(seed)
    pos = np.stack(
        [
            np.full(n_rays, 1.5),
            rng.uniform(ylo, yhi, n_rays),
            rng.uniform(ylo, yhi, n_rays),
        ],
        axis=-1,
    ).astype(np.float32)
    dirs = np.tile(np.array([[16.0, 0.0, 0.0]], np.float32), (n_rays, 1))
    return jnp.asarray(pos), jnp.asarray(dirs)


def test_ior_slab_roundtrip():
    ior = _smooth_ior((34, 6, 6))
    slabs, xs = bricks.build_ior_slabs(ior, 4)
    assert xs == 8 and slabs.shape == (4, 8 + bricks.IOR_OVERLAP, 6, 6)
    back = bricks.assemble_ior(np.asarray(slabs), 34)
    np.testing.assert_array_equal(back, np.asarray(ior))


def test_bricked_forward_matches_single():
    assert jax.device_count() >= 8
    ior = _smooth_ior()
    packed = build_packed_field(ior)
    pos, dirs = _rays(40)

    inv = 2.0
    bend = inv / float(FIX_ONE)
    step = inv * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE))

    # packed frame: shift like endpoint_render does
    pos_p = pos - 1.0
    n0 = np.ones(pos.shape[0], np.float32)  # skip |v|=n init: raw dirs
    budget = 600

    ref = march_ops.march_float(
        packed, None, pos_p, dirs, budget,
        bend_scale=bend, step_scale=step, chunk_steps=64,
    )
    mesh = make_mesh(axis="bricks")
    res = bricks.trace_rays_bricked(
        mesh, packed, pos_p, dirs, budget,
        bend_scale=bend, step_scale=step, k_steps=16,
    )
    np.testing.assert_allclose(
        np.asarray(res.end_position), np.asarray(ref.end_position),
        rtol=1e-5, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(res.end_direction), np.asarray(ref.end_direction),
        rtol=1e-5, atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(res.end_iteration), np.asarray(ref.end_iteration)
    )


def test_brick_gradients_match_replicated():
    """Physical-cell gradients assembled from halo-exchanged slab gradients
    must equal the gradient of the same loss through the replicated-field
    path (config 4) — the correctness contract of config 5."""
    num = 4
    ior = _smooth_ior((34, 10, 10))
    x_packed = int(ior.shape[0]) - 2
    pos, dirs = _rays(24)
    budget, k_steps, invscale = 64, 8, 2.0

    # replicated-path loss and grad
    target, _ = endpoint_render(ior * 1.005, pos, dirs, budget, invscale, k_steps)
    target = jnp.asarray(target)

    def full_loss(f):
        end_pos, _ = endpoint_render(f, pos, dirs, budget, invscale, k_steps)
        return jnp.mean(jnp.sum((end_pos - target) ** 2, axis=-1))

    g_full = np.asarray(jax.grad(full_loss)(ior))

    # brick-path grad: run one train step with lr so we can recover g = (old-new)/lr
    mesh = make_mesh(jax.devices()[:num], axis="bricks")
    slabs, xs = bricks.build_ior_slabs(ior, num)
    slabs = bricks.shard_slabs(mesh, slabs)
    lr = 1.0
    step = bricks.make_brick_train_step(
        mesh, x_packed, budget=budget, invscale=invscale, k_steps=k_steps, lr=lr
    )
    new_slabs, loss = step(slabs, pos, dirs, target)
    g_slabs = (np.asarray(slabs) - np.asarray(new_slabs)) / lr

    # compare every slab cell against the corresponding global cell
    for d in range(num):
        for l in range(g_slabs.shape[1]):
            gidx = l + d * xs - 1
            if 0 <= gidx < ior.shape[0]:
                np.testing.assert_allclose(
                    g_slabs[d, l], g_full[gidx], rtol=2e-3, atol=1e-6,
                    err_msg=f"slab {d} col {l} (global {gidx})",
                )

    # loss value must match the replicated-path loss
    np.testing.assert_allclose(float(loss), float(full_loss(ior)), rtol=1e-5)


def test_brick_train_descends_and_slabs_stay_consistent():
    num = 4
    ior = _smooth_ior((34, 10, 10))
    x_packed = int(ior.shape[0]) - 2
    pos, dirs = _rays(16, seed=5)
    budget, k_steps = 48, 8

    target, _ = endpoint_render(ior * 1.01, pos, dirs, budget, 2.0, k_steps)
    mesh = make_mesh(jax.devices()[:num], axis="bricks")
    slabs, xs = bricks.build_ior_slabs(ior, num)
    slabs = bricks.shard_slabs(mesh, slabs)
    step = bricks.make_brick_train_step(
        mesh, x_packed, budget=budget, invscale=2.0, k_steps=k_steps, lr=1e-4
    )
    s1, loss0 = step(slabs, pos, dirs, jnp.asarray(target))
    s2, loss1 = step(s1, pos, dirs, jnp.asarray(target))
    assert np.isfinite(float(loss0)) and np.isfinite(float(loss1))
    assert float(loss1) < float(loss0)

    # overlap copies between adjacent slabs must remain bit-identical
    s2 = np.asarray(s2)
    ov = bricks.IOR_OVERLAP
    for d in range(num - 1):
        np.testing.assert_array_equal(
            s2[d, -ov:], s2[d + 1, :ov],
            err_msg=f"slabs {d}/{d+1} drifted apart at the brick face",
        )


@pytest.mark.parametrize("n_r,n_b", [(4, 2), (2, 4)])
def test_bricked2d_forward_matches_single(n_r, n_b):
    """2-D (rays × bricks) mesh: ray shards never talk, bricks combine with
    psum — endpoints/iterations must match the single-device march exactly
    (the compute-scaling layout of BASELINE config 5)."""
    assert jax.device_count() >= n_r * n_b
    ior = _smooth_ior()
    packed = build_packed_field(ior)
    pos, dirs = _rays(42)  # deliberately not divisible by the rays axis

    inv = 2.0
    bend = inv / float(FIX_ONE)
    step = inv * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE))
    pos_p = pos - 1.0
    budget = 600

    ref = march_ops.march_float(
        packed, None, pos_p, dirs, budget,
        bend_scale=bend, step_scale=step, chunk_steps=64,
    )
    mesh = bricks.make_mesh2d(n_r, n_b)
    res = bricks.trace_rays_bricked2d(
        mesh, packed, pos_p, dirs, budget,
        bend_scale=bend, step_scale=step, k_steps=16,
    )
    np.testing.assert_allclose(
        np.asarray(res.end_position), np.asarray(ref.end_position),
        rtol=1e-5, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(res.end_direction), np.asarray(ref.end_direction),
        rtol=1e-5, atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(res.end_iteration), np.asarray(ref.end_iteration)
    )


def test_brick2d_gradients_match_replicated():
    """2-D mesh training step: slab grads (psum over rays, halo exchange over
    bricks) must equal the replicated-field autodiff gradient."""
    n_r, n_b = 2, 2
    ior = _smooth_ior((34, 10, 10))
    x_packed = int(ior.shape[0]) - 2
    pos, dirs = _rays(24)
    budget, k_steps, invscale = 64, 8, 2.0

    target, _ = endpoint_render(ior * 1.005, pos, dirs, budget, invscale, k_steps)
    target = jnp.asarray(target)

    def full_loss(f):
        end_pos, _ = endpoint_render(f, pos, dirs, budget, invscale, k_steps)
        return jnp.mean(jnp.sum((end_pos - target) ** 2, axis=-1))

    g_full = np.asarray(jax.grad(full_loss)(ior))

    mesh = bricks.make_mesh2d(n_r, n_b)
    slabs, xs = bricks.build_ior_slabs(ior, n_b)
    slabs = jax.device_put(
        slabs, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("bricks"))
    )
    lr = 1.0
    step = bricks.make_brick_train_step2d(
        mesh, x_packed, n_rays_total=pos.shape[0],
        budget=budget, invscale=invscale, k_steps=k_steps, lr=lr,
    )
    new_slabs, loss = step(slabs, pos, dirs, target)
    g_slabs = (np.asarray(slabs) - np.asarray(new_slabs)) / lr

    for d in range(n_b):
        for l in range(g_slabs.shape[1]):
            gidx = l + d * xs - 1
            if 0 <= gidx < ior.shape[0]:
                np.testing.assert_allclose(
                    g_slabs[d, l], g_full[gidx], rtol=2e-3, atol=1e-6,
                    err_msg=f"slab {d} col {l} (global {gidx})",
                )
    np.testing.assert_allclose(float(loss), float(full_loss(ior)), rtol=1e-5)
