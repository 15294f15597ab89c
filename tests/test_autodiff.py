"""Differentiability tests — the new capability vs the reference (SURVEY.md
§0: "differentiability is a new requirement ... not a reference feature").

Gradients of trace outputs w.r.t. the IOR field are checked against central
finite differences on a small volume (build plan step 3, SURVEY.md §7).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from volumeraytracer_tpu.models.camera import render_transmittance
from volumeraytracer_tpu.ops.fields import build_packed_field
from volumeraytracer_tpu.ops import march as march_ops
from volumeraytracer_tpu.types import FIX_ONE, STEP_CONST


def _loss(ior_field, pos, dirs, budget):
    packed = build_packed_field(ior_field)
    inv = jnp.asarray([2.0, 2.0], jnp.float32)
    res = march_ops.march_float(
        packed,
        None,
        pos,
        dirs,
        budget,
        bend_scale=inv / FIX_ONE,
        step_scale=inv * (STEP_CONST / FIX_ONE / FIX_ONE),
        chunk_steps=16,
        differentiable=True,
    )
    # endpoint-based loss: sensitive to the bending along the whole march
    return jnp.sum(res.end_position[:, 1])


def test_grad_matches_finite_differences():
    # 2D lens-ish field: IOR bump in the middle bends rays measurably
    n = 24
    y, x = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    ior = 1.0 + 0.3 * np.exp(-(((x - 12.0) ** 2 + (y - 14.0) ** 2) / 30.0))
    ior = ior.astype(np.float32)

    pos = jnp.asarray([[2.0, 10.0], [2.0, 13.0]], jnp.float32)
    dirs = jnp.asarray([[16.0, 0.0], [16.0, 0.0]], jnp.float32)
    budget = 512

    loss = lambda f: _loss(f, pos, dirs, budget)
    g = np.asarray(jax.grad(loss)(jnp.asarray(ior)))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0

    # probe the largest-gradient voxels with central differences
    flat = np.argsort(np.abs(g).ravel())[::-1][:4]
    eps = 1e-3
    for fi in flat:
        i, j = np.unravel_index(fi, g.shape)
        f_hi = ior.copy()
        f_hi[i, j] += eps
        f_lo = ior.copy()
        f_lo[i, j] -= eps
        fd = (float(loss(jnp.asarray(f_hi))) - float(loss(jnp.asarray(f_lo)))) / (2 * eps)
        assert fd == pytest.approx(float(g[i, j]), rel=0.05, abs=1e-3), (i, j)


def test_transmittance_grad():
    """Gradient flows through the σ-field transmittance accumulator."""
    n = 16
    ior = np.ones((n, n, n), np.float32)
    sigma = np.zeros((n - 2, n - 2, n - 2), np.float32)
    sigma[5:9] = 0.1

    pos = jnp.asarray([[2.0, 8.0, 8.0]], jnp.float32)
    dirs = jnp.asarray([[16.0, 0.0, 0.0]], jnp.float32)

    def loss(s):
        out = render_transmittance(
            build_packed_field(jnp.asarray(ior)),
            jnp.asarray(ior),
            pos,
            dirs,
            budget=64,
            invscale=16.0,
            sigma=s,
            chunk_steps=16,
        )
        return jnp.sum(out["transmittance"])

    t = float(loss(jnp.asarray(sigma)))
    assert 0.0 < t < 1.0  # absorbed something
    g = np.asarray(jax.grad(loss)(jnp.asarray(sigma)))
    assert np.isfinite(g).all()
    # more absorption ⇒ less transmittance: gradients along the beam negative
    # (the ray runs at y = z = 7 in the cropped-grid frame)
    assert g[6, 7, 7] < 0


def test_soft_termination_opacity_gradient():
    """Soft-termination relaxation (SURVEY.md §7 "sub-voxel surface
    termination", ≙ the hard break of cuda_volume_raytracer.cu:342-343):
    with ``soft_opacity_tau`` the march carries a differentiable
    transmittance through which the TRANSLUCENCY field gets a nonzero,
    FD-verified gradient — the hard break alone is zero-gradient a.e."""
    n = 20
    ior = np.ones((n, n, n), np.float32)
    # semi-transparent wall just below the opacity-channel zero crossing
    # (tr = 0.5 ⇒ opacity ≈ 0): opacity ≈ −65.5 ⇒ σ(65.5/256) ≈ 0.56/step,
    # no hard break, smooth decay through the wall
    tr = np.ones((n, n, n), np.float32)
    tr[8:12] = 0.501

    pos = jnp.asarray([[2.0, 9.0, 9.0]], jnp.float32)
    dirs = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)

    def loss(t):
        packed = build_packed_field(jnp.asarray(ior), t)
        res = march_ops.march_float(
            packed, None, pos, dirs, 32,
            bend_scale=np.zeros(3, np.float32),
            step_scale=np.ones(3, np.float32),
            chunk_steps=8, differentiable=True, soft_opacity_tau=256.0,
        )
        return jnp.sum(res.transmittance)

    t0 = float(loss(jnp.asarray(tr)))
    assert 0.0 < t0 < 0.5  # decayed through the wall

    g = np.asarray(jax.grad(loss)(jnp.asarray(tr)))
    assert np.isfinite(g).all()
    # the wall voxels along the beam must carry positive gradient (more
    # translucent ⇒ more light survives) and FD must agree.  The beam runs at
    # packed y = z = 9 (raw grid is cropped by 1: raw = packed + 1)
    i, j, k = 9, 10, 10  # raw-grid voxel inside the wall on the beam
    assert g[i, j, k] > 0
    eps = 1e-4
    hi = tr.copy(); hi[i, j, k] += eps
    lo = tr.copy(); lo[i, j, k] -= eps
    fd = (float(loss(jnp.asarray(hi))) - float(loss(jnp.asarray(lo)))) / (2 * eps)
    assert fd == pytest.approx(float(g[i, j, k]), rel=2e-2)


def test_soft_termination_through_public_api():
    """VERDICT r4 item 6: ``soft_opacity_tau`` exposed through the public
    API (``endpoint_render`` / ``RaytraceScene.trace_rays``) with the
    automatic XLA route — the opacity/translucency gradient FD-checks
    through ``endpoint_render(..., return_transmittance=True)``."""
    from volumeraytracer_tpu.parallel.shard import endpoint_render

    n = 20
    ior = np.ones((n, n, n), np.float32)
    tr = np.ones((n, n, n), np.float32)
    tr[8:12] = 0.501  # semi-transparent wall (see the unit test above)

    pos = jnp.asarray([[3.0, 10.0, 10.0]], jnp.float32)
    dirs = jnp.asarray([[4.0, 0.0, 0.0]], jnp.float32)

    def loss(t):
        # speed 4, invscale 1 ⇒ ~0.064 voxel/step; 256 steps ≈ 16 voxels —
        # through the wall at x ≈ 8-12
        _, _, trans = endpoint_render(
            jnp.asarray(ior), pos, dirs, 256, 1.0, 16,
            soft_opacity_tau=256.0, translucency=t,
            return_transmittance=True,
        )
        return jnp.sum(trans)

    t0 = float(loss(jnp.asarray(tr)))
    assert 0.0 < t0 < 1.0
    g = np.asarray(jax.grad(loss)(jnp.asarray(tr)))
    assert np.isfinite(g).all()
    ij = np.unravel_index(np.argmax(np.abs(g)), g.shape)
    assert np.abs(g[ij]) > 0
    eps = 1e-4
    hi = tr.copy(); hi[ij] += eps
    lo = tr.copy(); lo[ij] -= eps
    fd = (float(loss(jnp.asarray(hi))) - float(loss(jnp.asarray(lo)))) / (2 * eps)
    assert fd == pytest.approx(float(g[ij]), rel=2e-2)


def test_scene_trace_rays_soft_opacity_tau():
    """RaytraceScene.trace_rays(mode='float', soft_opacity_tau=...) routes
    to the XLA march and returns a transmittance in (0, 1)."""
    from volumeraytracer_tpu import RaytraceScene

    n = 20
    ior = np.ones((n, n, n), np.float32)
    tr = np.full((n, n, n), 0xFFFFFFFF, np.uint32)
    tr[8:12] = int(0.501 * 0xFFFFFFFF)
    sc = RaytraceScene(ior, tr)
    res = sc.trace_rays(
        jnp.asarray([[3.0, 10.0, 10.0]], jnp.float32),
        jnp.asarray([[4.0, 0.0, 0.0]], jnp.float32),
        iterations=256, mode="float", soft_opacity_tau=256.0,
    )
    assert res.transmittance is not None
    t = float(res.transmittance[0])
    assert 0.0 < t < 1.0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sc.trace_rays(
            jnp.asarray([[0x30000, 0xA0000, 0xA0000]], jnp.uint32),
            jnp.asarray([[4.0, 0.0, 0.0]], jnp.float32),
            iterations=32, mode="fixed", soft_opacity_tau=256.0,
        )
