"""Image-plane rendering with emission + image-space fitting (BASELINE
configs 2-4: camera → (H, W) images, transmittance AND emission accumulated
along the march, pixel-space MSE gradients back to the fields)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from volumeraytracer_tpu import (
    PinholeCamera,
    fit_field_image,
    image_loss,
    render_image,
)
from volumeraytracer_tpu.models.camera import render_rays_image
from volumeraytracer_tpu.ops.fields import build_packed_field


def _scene(n=24):
    """Mild GRIN lens + an emissive/absorbing blob off-centre."""
    ax = np.linspace(-1.0, 1.0, n, dtype=np.float32)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    ior = jnp.asarray(1.0 + 0.2 * np.exp(-3 * (x**2 + y**2 + z**2)))
    m = n - 2  # packed (cropped) grid extent
    axp = np.linspace(-1.0, 1.0, m, dtype=np.float32)
    xp, yp, zp = np.meshgrid(axp, axp, axp, indexing="ij")
    blob = np.exp(-8 * (xp**2 + (yp - 0.3) ** 2 + zp**2)).astype(np.float32)
    sigma = jnp.asarray(0.3 * blob)
    emission = jnp.asarray(2.0 * blob)
    return ior, sigma, emission


def _camera(n=24, res=16):
    return PinholeCamera(
        origin=(1.5, n / 2, n / 2), forward=(1.0, 0.0, 0.0), up=(0.0, 0.0, 1.0),
        width=res, height=res, fov=0.45, speed=4.0,
    )


def test_render_image_shapes_and_physics():
    ior, sigma, emission = _scene()
    packed = build_packed_field(ior)
    cam = _camera()
    out = render_image(
        packed, ior, cam, budget=288, invscale=2.0,
        sigma=sigma, emission=emission, background=0.1,
    )
    img = np.asarray(out["image"])
    trans = np.asarray(out["transmittance"])
    assert img.shape == (16, 16) and trans.shape == (16, 16)
    assert np.isfinite(img).all() and np.isfinite(trans).all()
    assert (trans >= 0).all() and (trans <= 1.0).all()
    # rays through the absorbing blob lose transmittance; edge rays keep most
    assert trans.min() < 0.5 and trans.max() > 0.85
    # the emissive blob makes some pixels brighter than the background
    assert img.max() > 0.15
    # emission-off render: image = T * background exactly
    out0 = render_image(
        packed, ior, cam, budget=288, invscale=2.0, sigma=sigma,
        emission=None, background=None,
    )
    np.testing.assert_allclose(
        np.asarray(out0["image"]), np.asarray(out0["transmittance"]), rtol=0, atol=0
    )


def test_render_scalar_sigma_and_emission():
    """Scalars are accepted as uniform-medium shorthand and must equal the
    same render with explicitly constant fields."""
    ior, _, _ = _scene()
    packed = build_packed_field(ior)
    cam = _camera()
    kw = dict(budget=96, invscale=2.0, background=0.0)
    a = render_image(packed, ior, cam, sigma=0.02, emission=0.5, **kw)
    b = render_image(
        packed, ior, cam,
        sigma=jnp.full(packed.shape[:3], 0.02, jnp.float32),
        emission=jnp.full(packed.shape[:3], 0.5, jnp.float32),
        **kw,
    )
    np.testing.assert_allclose(
        np.asarray(a["image"]), np.asarray(b["image"]), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(a["transmittance"]), np.asarray(b["transmittance"]),
        rtol=1e-6, atol=1e-7,
    )


def test_render_multichannel_emission():
    ior, sigma, emission = _scene()
    packed = build_packed_field(ior)
    cam = _camera(res=8)
    em3 = jnp.stack([emission, 0.5 * emission, 0.0 * emission], axis=-1)
    out = render_image(
        packed, ior, cam, budget=192, invscale=2.0, sigma=sigma,
        emission=em3, background=0.0,
    )
    img = np.asarray(out["image"])
    assert img.shape == (8, 8, 3)
    np.testing.assert_allclose(img[..., 1], 0.5 * img[..., 0], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(img[..., 2], 0.0, atol=1e-7)


def test_image_gradients_finite_and_flow_to_all_fields():
    """Pixel gradients w.r.t. ior (bending), sigma and emission are finite
    and non-zero (config-3 contract: pixel gradients through the march)."""
    ior, sigma, emission = _scene(16)
    cam = _camera(16, res=6)
    target = jnp.zeros((6, 6), jnp.float32)

    def loss(io, sg, em):
        return image_loss(
            io, cam, target, budget=160, invscale=2.0,
            sigma=sg, emission=em, background=0.2,
        )

    g_ior, g_sigma, g_em = jax.grad(loss, argnums=(0, 1, 2))(ior, sigma, emission)
    for name, g in [("ior", g_ior), ("sigma", g_sigma), ("emission", g_em)]:
        g = np.asarray(g)
        assert np.isfinite(g).all(), name
        assert np.abs(g).max() > 0, name


def test_fit_field_image_descends():
    """Fit the index field so the rendered image matches a target produced by
    a perturbed field — image-space loss must decrease (config 2/3 shape)."""
    ior, sigma, emission = _scene(16)
    cam = _camera(16, res=8)
    packed_t = build_packed_field(ior * 1.1)
    target = render_image(
        packed_t, ior * 1.1, cam, budget=160, invscale=2.0,
        sigma=sigma, emission=emission, background=0.1,
    )["image"]
    fit = fit_field_image(
        ior, cam, target, budget=160, invscale=2.0, sigma=sigma,
        emission=emission, background=0.1, steps=8, learning_rate=1e-4,
    )
    assert np.isfinite(fit.losses).all()
    assert fit.losses[-1] < fit.losses[0]


def test_render_rays_image_tiles_shardable():
    """Pixel tiles shard over a rays mesh axis: per-tile render equals the
    monolithic one (the config-4 image layout)."""
    from jax.sharding import PartitionSpec as P
    from volumeraytracer_tpu.parallel import make_mesh

    ior, sigma, emission = _scene(16)
    packed = build_packed_field(ior)
    cam = _camera(16, res=8)
    pos, dirs = cam.rays()
    full = render_rays_image(
        packed, ior, pos, dirs, budget=160, invscale=2.0,
        sigma=sigma, emission=emission, background=0.0,
    )["image"]

    mesh = make_mesh(axis="rays")
    import functools

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P("rays"), P("rays")),
        out_specs=P("rays"),
        # the scan carry mixes invariant-constant and rays-varying leaves;
        # the render is per-ray (no collectives), so VMA checking is moot
        check_vma=False,
    )
    def tile_render(packed_r, ior_r, sigma_r, pos_s, dirs_s):
        return render_rays_image(
            packed_r, ior_r, pos_s, dirs_s, budget=160, invscale=2.0,
            sigma=sigma_r, emission=emission, background=0.0,
        )["image"]

    tiled = tile_render(packed, ior, sigma, pos, dirs)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full), rtol=2e-6, atol=1e-6)
