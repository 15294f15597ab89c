"""Cameras and differentiable image-plane rendering.

The reference has no image-plane accumulation ("rendering" = one ray per
pixel, read back endpoints/remaining light — SURVEY.md §0); this module adds
the BASELINE north-star capability: pinhole cameras seeding one ray per
pixel, a differentiable march, and per-pixel outputs (transmittance,
endpoint, direction) that gradients can flow through back to the voxel
fields.

All constructs are pytrees so cameras can be vmapped/sharded (BASELINE
configs 4-5: 8-16 cameras, tiles sharded over a mesh).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import march as march_ops
from ..ops.interp import interp_linear
from ..types import FIX_ONE, STEP_CONST


@dataclasses.dataclass(frozen=True)
class PinholeCamera:
    """A pinhole camera in voxel space (3D volumes).

    Rays start on the image plane one focal length from ``origin`` along
    ``forward`` and carry direction ``normalize(forward + u·right + v·up)``.
    """

    origin: Tuple[float, float, float]
    forward: Tuple[float, float, float]
    up: Tuple[float, float, float]
    width: int
    height: int
    fov: float = 0.8  # half-tangent of the horizontal field of view
    speed: float = 16.0  # |direction| at n=1 (reference test convention)

    def rays(self) -> Tuple[jax.Array, jax.Array]:
        """Generate (positions, directions) of shape (H*W, 3)."""
        fwd = np.asarray(self.forward, np.float64)
        fwd = fwd / np.linalg.norm(fwd)
        up = np.asarray(self.up, np.float64)
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)

        u = (np.arange(self.width) + 0.5) / self.width * 2.0 - 1.0
        v = (np.arange(self.height) + 0.5) / self.height * 2.0 - 1.0
        uu, vv = np.meshgrid(u, v, indexing="xy")
        aspect = self.height / self.width
        d = (
            fwd[None, None]
            + self.fov * uu[..., None] * right[None, None]
            + self.fov * aspect * vv[..., None] * up[None, None]
        )
        d = d / np.linalg.norm(d, axis=-1, keepdims=True) * self.speed
        o = np.broadcast_to(np.asarray(self.origin, np.float64), d.shape)
        return (
            jnp.asarray(o.reshape(-1, 3), jnp.float32),
            jnp.asarray(d.reshape(-1, 3), jnp.float32),
        )


def render_transmittance(
    packed: jax.Array,
    ior: jax.Array,
    positions: jax.Array,
    directions: jax.Array,
    *,
    budget: int,
    invscale=2.0,
    sigma: Optional[jax.Array] = None,
    chunk_steps: int = 256,
    differentiable: bool = True,
) -> dict:
    """Differentiable render: march rays through ``packed`` and return
    per-ray outputs.

    sigma: optional float absorption field (same grid as ``packed``); when
    given, a *differentiable* transmittance T = exp(-Σ σ(x_k)·Δs_k) is
    accumulated along the march (the float analogue of the reference's
    uint32 brightness subtraction, cuda_volume_raytracer.cu:337-341).

    Returns dict(end_position, end_direction, transmittance).
    """
    dim = positions.shape[-1]
    sigma = _as_field(sigma, dim)
    inv = jnp.broadcast_to(jnp.asarray(invscale, jnp.float32), (dim,))
    bend_scale = inv / float(FIX_ONE)
    step_scale = inv * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE))

    # |v| = n initialisation (image_util.cpp:692-710)
    pos = positions - 0.5
    n0 = interp_linear(ior, pos)
    dirs = directions * n0[..., None]
    pos = pos - 0.5

    if sigma is None:
        res = march_ops.march_float(
            packed,
            None,
            pos,
            dirs,
            budget,
            bend_scale=bend_scale,
            step_scale=step_scale,
            chunk_steps=chunk_steps,
            differentiable=differentiable,
            opaque_when_positive=True,
        )
        trans = None
    else:
        res, trans = _march_with_transmittance(
            packed, sigma, pos, dirs, budget, bend_scale, step_scale, chunk_steps
        )
    return {
        "end_position": res.end_position + 1.0,
        "end_direction": res.end_direction,
        "end_iteration": res.end_iteration,
        "transmittance": trans,
    }


def render_image(
    packed: jax.Array,
    ior: jax.Array,
    camera: "PinholeCamera",
    *,
    budget: int,
    invscale=2.0,
    sigma: Optional[jax.Array] = None,
    emission: Optional[jax.Array] = None,
    background=0.0,
    chunk_steps: int = 64,
) -> dict:
    """Differentiable camera → (H, W[, C]) image with **transmittance and
    emission accumulated to the image plane** (the BASELINE north-star
    rendering contract; the reference never accumulates — SURVEY.md §0).

    Per march segment (midpoint rule, piecewise-constant media):

        τ   += σ(mid)·Δs                       (optical depth)
        I   += T_prev · w · e(mid)             (emitted radiance)
        with w = 1 − exp(−σ·Δs)  when σ is given (emission–absorption),
             w = Δs              for a purely emissive medium,
        I   += T_end · background              (at exit)

    emission: (X, Y, Z) or (X, Y, Z, C) float field on the packed (cropped)
    grid; sigma: (X, Y, Z) absorption field on the same grid.  Gradients flow
    to ``ior`` (ray bending), ``sigma`` and ``emission``.

    Returns dict(image (H, W[, C]), transmittance (H, W), end_position,
    end_direction) — pixel order row-major (v, u) matching ``camera.rays``.
    """
    positions, directions = camera.rays()
    out = render_rays_image(
        packed, ior, positions, directions, budget=budget, invscale=invscale,
        sigma=sigma, emission=emission, background=background,
        chunk_steps=chunk_steps,
    )
    h, w = camera.height, camera.width
    img = out["image"]
    out["image"] = img.reshape((h, w) + img.shape[1:]) if img is not None else None
    if out["transmittance"] is not None:
        out["transmittance"] = out["transmittance"].reshape(h, w)
    return out


def _as_field(x, dim: int):
    """Accept a scalar σ/emission as shorthand for a uniform medium: expand
    it to a minimal constant grid (interp of a constant is the constant,
    clamp addressing covers every position)."""
    if x is None:
        return None
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 0:
        return jnp.broadcast_to(x, (2,) * dim)
    return x


def render_rays_image(
    packed, ior, positions, directions, *, budget, invscale=2.0,
    sigma=None, emission=None, background=0.0, chunk_steps=64,
) -> dict:
    """Per-ray form of :func:`render_image` (pixels as a flat ray batch —
    shardable over a mesh rays axis with ``shard_map``)."""
    dim = positions.shape[-1]
    sigma = _as_field(sigma, dim)
    emission = _as_field(emission, dim)
    inv = jnp.broadcast_to(jnp.asarray(invscale, jnp.float32), (dim,))
    bend_scale = inv / float(FIX_ONE)
    step_scale = inv * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE))

    pos = positions - 0.5
    n0 = interp_linear(ior, pos)
    dirs = directions * n0[..., None]
    pos = pos - 0.5

    res, trans, radiance = _march_accumulate(
        packed, sigma, emission, pos, dirs, budget, bend_scale, step_scale,
        chunk_steps,
    )
    image = None
    if radiance is not None:
        image = radiance
        if background is not None:
            bg = jnp.asarray(background, jnp.float32)
            t = trans if trans is not None else jnp.ones(pos.shape[:1], jnp.float32)
            image = image + t[..., None] * jnp.atleast_1d(bg)
        if image.shape[-1] == 1:
            image = image[..., 0]
    elif trans is not None:
        image = trans  # pure-absorption image
    return {
        "image": image,
        "transmittance": trans,
        "end_position": res.end_position + 1.0,
        "end_direction": res.end_direction,
        "end_iteration": res.end_iteration,
    }


def _march_accumulate(packed, sigma, emission, pos, dirs, budget, bend_scale,
                      step_scale, chunk_steps):
    """March with optical-depth and emitted-radiance accumulators in the
    carry (remat'd chunks, same scheduler shape as ops.march.march_float)."""
    import functools

    n = pos.shape[0]
    if emission is not None and emission.ndim == packed.ndim - 1:
        emission = emission[..., None]
    n_ch = 0 if emission is None else int(emission.shape[-1])

    state = march_ops.MarchState(
        pos=pos.astype(jnp.float32),
        direction=dirs.astype(jnp.float32),
        remaining=jnp.full((n,), budget - 1, jnp.uint32),
        brightness=jnp.full((n,), 0xFFFFFFFF, jnp.uint32),
        alive=jnp.ones((n,), bool),
    )
    step_fn = functools.partial(
        march_ops._float_step,
        packed=packed,
        translucency=None,
        bounds=np.asarray(packed.shape[:-1], np.int64),
        bend_scale=bend_scale,
        step_scale=step_scale,
        minimum_brightness=jnp.uint32(0),
        opaque_when_positive=True,
        nearest=False,
    )
    chunk = max(1, min(chunk_steps, budget))
    num_chunks = -(-budget // chunk)

    def one(carry, _):
        state, tau, rad = carry
        prev_pos = state.pos
        prev_alive = state.alive
        state = step_fn(state)
        stepped = state.alive | prev_alive
        # safe norm: sqrt has an infinite derivative at 0, and dead rays have
        # exactly-zero segments — mask both the input and the output so the
        # NaN cotangent path is cut
        d = state.pos - prev_pos
        ds2 = jnp.sum(d * d, axis=-1)
        nz = stepped & (ds2 > 0)
        ds = jnp.where(nz, jnp.sqrt(jnp.where(nz, ds2, 1.0)), 0.0)
        mid = 0.5 * (state.pos + prev_pos)
        if sigma is not None:
            s = interp_linear(sigma, mid)
            dtau = jnp.where(stepped, s * ds, 0.0)
        else:
            dtau = jnp.zeros_like(ds)
        if emission is not None:
            e = interp_linear(emission, mid)  # (N, C)
            t_prev = jnp.exp(-tau)
            # segment weight: emission–absorption if sigma given, else Δs
            w = -jnp.expm1(-dtau) if sigma is not None else ds
            w = jnp.where(stepped, w, 0.0)
            rad = rad + (t_prev * w)[..., None] * e
        tau = tau + dtau
        return (state, tau, rad), None

    @jax.checkpoint
    def chunk_fn(carry, _):
        return jax.lax.scan(one, carry, None, length=chunk)

    rad0 = jnp.zeros((n, n_ch), jnp.float32)
    (state, tau, rad), _ = jax.lax.scan(
        chunk_fn, (state, jnp.zeros((n,), jnp.float32), rad0), None,
        length=num_chunks,
    )
    res = march_ops._finish(state, budget, 1.0, None)
    trans = jnp.exp(-tau) if sigma is not None else None
    return res, trans, (rad if emission is not None else None)


def _march_with_transmittance(packed, sigma, pos, dirs, budget, bend_scale, step_scale, chunk_steps):
    """March with a float optical-depth accumulator in the carry."""
    import functools

    n = pos.shape[0]
    state = march_ops.MarchState(
        pos=pos.astype(jnp.float32),
        direction=dirs.astype(jnp.float32),
        remaining=jnp.full((n,), budget - 1, jnp.uint32),
        brightness=jnp.full((n,), 0xFFFFFFFF, jnp.uint32),
        alive=jnp.ones((n,), bool),
    )
    step_fn = functools.partial(
        march_ops._float_step,
        packed=packed,
        translucency=None,
        bounds=np.asarray(packed.shape[:-1], np.int64),
        bend_scale=bend_scale,
        step_scale=step_scale,
        minimum_brightness=jnp.uint32(0),
        opaque_when_positive=True,
        nearest=False,
    )
    chunk = max(1, min(chunk_steps, budget))
    num_chunks = -(-budget // chunk)

    def one(carry, _):
        state, tau = carry
        prev_pos = state.pos
        prev_alive = state.alive
        state = step_fn(state)
        # optical depth of the segment just marched (only for stepping rays);
        # safe norm: see _march_accumulate
        d = state.pos - prev_pos
        ds2 = jnp.sum(d * d, axis=-1)
        nz = (state.alive | prev_alive) & (ds2 > 0)
        ds = jnp.where(nz, jnp.sqrt(jnp.where(nz, ds2, 1.0)), 0.0)
        mid = 0.5 * (state.pos + prev_pos)
        s = interp_linear(sigma, mid)
        tau = tau + jnp.where(nz, s * ds, 0.0)
        return (state, tau), None

    @jax.checkpoint
    def chunk_fn(carry, _):
        return jax.lax.scan(one, carry, None, length=chunk)

    (state, tau), _ = jax.lax.scan(
        chunk_fn, (state, jnp.zeros((n,), jnp.float32)), None, length=num_chunks
    )
    res = march_ops._finish(state, budget, 1.0, None)
    return res, jnp.exp(-tau)
