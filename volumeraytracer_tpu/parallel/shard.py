"""Mesh/pjit layer: multi-chip ray tracing and field optimisation.

TPU-native replacement for the reference's heterogeneous scheduler
(``trace_rays_cu_impl``, /root/reference/src/cuda_volume_raytracer.cu:774-972,
which farms 0x8000-ray chunks over GPUs with OpenMP and replicates the field
to every device, .cu:680-685):

  * the ray batch is sharded over the ``'rays'`` mesh axis (data parallel —
    rays are embarrassingly parallel, SURVEY.md §2 parallelism table);
  * the packed field is **replicated** over the mesh (the direct analogue of
    the per-GPU field copies) — brick-sharding with halo exchange lives in
    ``parallel/bricks.py``;
  * gradients of the field coming out of per-shard backward marches are
    combined with ``psum`` over ICI (the reference has no backward pass at
    all — no NCCL to translate; XLA inserts the collectives).

Everything is built on ``jax.sharding.Mesh`` + ``shard_map`` so the same
code runs on 1 chip, a v4-8 host, or a multi-host slice (the driver
validates the multi-chip path on a virtual CPU mesh).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import march as march_ops
from ..ops.fields import build_packed_field
from ..ops.interp import interp_linear
from ..types import FIX_ONE, STEP_CONST, TraceResult


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> dict:
    """Multi-host entry point (≙ ``init()`` device discovery,
    cuda_volume_raytracer.cu:82-101, generalised to a multi-host slice).

    On a multi-host deployment call this once per process before any other
    jax API, exactly like ``jax.distributed.initialize`` (all arguments are
    forwarded; on Cloud TPU they are auto-detected from the metadata server
    and may be omitted).  Single-process callers (tests, one host) may call
    it with no arguments — it is then a no-op discovery.

    Returns a summary dict: process index/count and local/global device
    counts — the information the reference prints from ``init()``.
    """
    multi = (
        coordinator_address is not None
        or (num_processes is not None and num_processes > 1)
    )
    if multi:
        # NB: nothing may touch the XLA backend before initialize —
        # jax.process_count()/jax.devices() would pin a single-process
        # backend; make re-init idempotent instead of probing
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
                **kwargs,
            )
        except RuntimeError as e:
            if "already" not in str(e):
                raise
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = "rays") -> Mesh:
    """1-D device mesh over all (or the given) devices — the TPU analogue of
    ``init()`` device discovery (cuda_volume_raytracer.cu:82-101)."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def make_host_mesh(axes: Tuple[str, str] = ("rays", "bricks")) -> Mesh:
    """(hosts × local-chips) mesh for a multi-host slice: the first axis
    spans processes (DCN), the second the chips within each host (ICI) —
    so ray data-parallelism crosses hosts while the bricks axis' per-window
    psum stays on intra-host ICI links (SURVEY.md §5 comm table)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    nproc = jax.process_count()
    local = len(devs) // nproc
    return Mesh(np.asarray(devs).reshape(nproc, local), axes)


def pad_rays(n: int, num_shards: int) -> int:
    """Rays per shard after padding to an even split (padded rays get a zero
    iteration budget so they are dead on arrival)."""
    return -(-n // num_shards)


def trace_rays_sharded(
    mesh: Mesh,
    packed: jax.Array,
    start_position: jax.Array,
    start_direction: jax.Array,
    budget: int,
    *,
    bend_scale,
    step_scale,
    chunk_steps: int = 256,
    axis: str = "rays",
) -> TraceResult:
    """Forward float march with rays sharded over ``mesh[axis]`` and the
    field replicated.  Pads the batch to a multiple of the mesh size.

    Each shard runs the same predicated while_loop as the single-chip path;
    there is **no cross-shard sync during the march** (matching the
    reference's independent GPU chunks) — shards that finish early simply
    idle until the jitted program joins.
    """
    n, dim = start_position.shape
    num = mesh.shape[axis]
    per = pad_rays(n, num)
    pad = per * num - n
    pos = jnp.pad(start_position.astype(jnp.float32), ((0, pad), (0, 0)))
    dirs = jnp.pad(
        start_direction.astype(jnp.float32),
        ((0, pad), (0, 0)),
        constant_values=1.0,  # non-zero so 1/|v|² is finite for padded rays
    )

    bend = jnp.broadcast_to(jnp.asarray(bend_scale, jnp.float32), (dim,))
    step = jnp.broadcast_to(jnp.asarray(step_scale, jnp.float32), (dim,))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=TraceResult(
            end_position=P(axis),
            end_direction=P(axis),
            end_iteration=P(axis),
            remaining_light=P(axis),
            path=None,
        ),
    )
    def shard_fn(packed_rep, pos_s, dirs_s):
        return march_ops.march_float(
            packed_rep,
            None,
            pos_s,
            dirs_s,
            budget,
            bend_scale=bend,
            step_scale=step,
            chunk_steps=chunk_steps,
        )

    res = shard_fn(packed, pos, dirs)
    if pad:
        res = TraceResult(
            end_position=res.end_position[:n],
            end_direction=res.end_direction[:n],
            end_iteration=res.end_iteration[:n],
            remaining_light=res.remaining_light[:n],
            path=None,
        )
    return res


# ---------------------------------------------------------------------------
# end-to-end sharded training step (the flagship "model": a differentiable
# renderer optimising the IOR field to match target per-pixel observations)
# ---------------------------------------------------------------------------


#: brick-table layout used by the production Pallas kernel pair: "lines"
#: (kernels/march_lines.py) — hardware-verified in
#: benchmarks/tpu_verify_lines.json (parity vs XLA: pos 7.6e-6, grads
#: 3.3e-6, iterations exact; fused 256³ fwd+bwd 0.288 vs 0.244 Gsteps/s on
#: the point layout, plus ~49 ms/step saved on table build + gradient fold)
PALLAS_LAYOUT = "lines"


def endpoint_render(
    ior, positions, directions, budget: int, invscale: float, chunk_steps: int,
    kernel: str = "auto", layout: Optional[str] = None,
    soft_opacity_tau: Optional[float] = None,
    translucency=None,
    return_transmittance: bool = False,
):
    """Differentiable forward: preprocess the field, |v|=n-init the rays,
    march, return per-ray endpoints (the reference's output contract —
    endpoints + remaining light, SURVEY.md §0).

    kernel="pallas" routes the march through the brick-walking TPU kernel
    pair (kernels/march_pallas.py forward, kernels/march_bwd.py reverse-replay
    adjoint) — the production fwd+bwd path benched by bench.py; "xla" is the
    scan-remat fallback (and the 2D path).  The default "auto" picks the
    kernel pair on TPU for 3-D batches (≙ the reference scheduler's
    ray-count auto-dispatch, cuda_volume_raytracer.cu:804-810) and XLA
    everywhere else."""
    from ..ops.fields import cropped_translucency

    packed = build_packed_field(ior, translucency)
    trc = None if translucency is None else cropped_translucency(translucency)
    dim = positions.shape[-1]
    inv = jnp.full((dim,), invscale, jnp.float32)
    pos = positions - 0.5
    n0 = interp_linear(ior, pos)
    dirs = directions * n0[..., None]
    pos = pos - 0.5
    soft = soft_opacity_tau is not None and soft_opacity_tau > 0.0
    if kernel == "auto":
        on_tpu = jax.default_backend() in ("tpu", "axon")
        # soft termination carries a differentiable transmittance only on
        # the XLA march (the kernel pair is straight-through; documented
        # cost: XLA-march throughput for soft-termination training)
        kernel = "pallas" if (on_tpu and dim == 3 and not soft) else "xla"
    elif kernel == "pallas" and soft:
        import logging

        logging.getLogger(__name__).warning(
            "endpoint_render: soft_opacity_tau requires the XLA march; "
            "falling back from kernel='pallas'"
        )
        kernel = "xla"
    if kernel == "pallas":
        from ..kernels.march_bwd import march_pallas_diff

        res = march_pallas_diff(
            packed,
            pos,
            dirs,
            budget,
            translucency=trc,
            bend_scale=float(invscale) / float(FIX_ONE),
            step_scale=float(invscale) * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE)),
            # round-5 production: dual residency + 1-cell anchor, k=32 both
            # ways (probe_r5_dual.py same-run A/B); env overrides are
            # experiment knobs (bench A/Bs)
            k_steps=int(os.environ.get("VRT_KFWD", "32")),
            k_steps_bwd=int(os.environ.get("VRT_KBWD", "32")),
            interpret=jax.default_backend() not in ("tpu", "axon"),
            layout=layout or PALLAS_LAYOUT,
        )
    else:
        res = march_ops.march_float(
            packed,
            trc,
            pos,
            dirs,
            budget,
            bend_scale=inv / float(FIX_ONE),
            step_scale=inv * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE)),
            chunk_steps=chunk_steps,
            differentiable=True,
            soft_opacity_tau=soft_opacity_tau if soft else None,
        )
    if return_transmittance:
        return res.end_position + 1.0, res.end_direction, res.transmittance
    return res.end_position + 1.0, res.end_direction


def make_train_step(
    mesh: Mesh,
    budget: int = 256,
    invscale: float = 2.0,
    chunk_steps: int = 64,
    lr: float = 1e-3,
    axis: str = "rays",
    accum_steps: int = 1,
):
    """Build a jitted sharded training step:

        loss(ior) = mean ‖endpoint(ior, rays) − target‖²
        ior ← ior − lr · ∇loss          (SGD here; the optax path lives in
                                         models/optimize.py)

    Rays/targets sharded over ``axis``, field replicated, field gradient
    psum'd over the mesh — voxel-grad all-reduce over ICI (BASELINE config 4).

    ``accum_steps > 1`` enables gradient accumulation: each shard's ray batch
    is split into ``accum_steps`` micro-batches marched sequentially with the
    field gradient accumulated LOCALLY, and the cross-device ``psum`` fires
    once per optimizer step instead of once per micro-batch — the
    communication-amortisation knob the 2-host scaling model
    (benchmarks/scaling_model.md) relies on: the DCN all-reduce cost is paid
    1/accum_steps as often per marched ray.  The per-shard batch size must be
    divisible by ``accum_steps``.
    """

    def per_shard_grad(ior, pos_s, dirs_s, target_s, count):
        def micro_grad(p, d, t):
            def loss_fn(f):
                end_pos, _ = endpoint_render(f, p, d, budget, invscale, chunk_steps)
                return jnp.sum((end_pos - t) ** 2) / count

            return jax.value_and_grad(loss_fn)(ior)

        if accum_steps == 1:
            return micro_grad(pos_s, dirs_s, target_s)

        n = pos_s.shape[0]
        assert n % accum_steps == 0, (
            f"per-shard batch {n} not divisible by accum_steps {accum_steps}"
        )
        m = n // accum_steps
        micros = (
            pos_s.reshape(accum_steps, m, -1),
            dirs_s.reshape(accum_steps, m, -1),
            target_s.reshape(accum_steps, m, -1),
        )

        def body(carry, micro):
            loss_acc, g_acc = carry
            loss, g = micro_grad(*micro)
            return (loss_acc + loss, jax.tree.map(jnp.add, g_acc, g)), None

        # the accumulators are device-varying (each shard sums its own
        # micro-batches); pcast the replicated zeros into the varying type
        init = jax.lax.pcast(
            (jnp.float32(0.0), jnp.zeros_like(ior)), (axis,), to="varying"
        )
        (loss, g), _ = jax.lax.scan(body, init, micros)
        return loss, g

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
    )
    def sharded_grad(ior, pos_s, dirs_s, target_s):
        count = jnp.float32(pos_s.shape[0] * jax.lax.psum(1, axis))
        loss, g = per_shard_grad(ior, pos_s, dirs_s, target_s, count)
        # voxel-gradient all-reduce (≙ BASELINE "voxel-grad all-reduce
        # overlapped with backward march"; XLA schedules the psum against
        # the remat'd backward chunks).  With accumulation this is the ONE
        # collective per optimizer step.
        return jax.lax.psum(loss, axis), jax.lax.psum(g, axis)

    @jax.jit
    def train_step(ior, positions, directions, targets):
        loss, g = sharded_grad(ior, positions, directions, targets)
        return ior - lr * g, loss

    return train_step


def replicate(mesh: Mesh, x: jax.Array) -> jax.Array:
    """Place ``x`` replicated over the mesh (≙ the reference's field copy to
    every device, .cu:680-685)."""
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_batch(mesh: Mesh, x: jax.Array, axis: str = "rays") -> jax.Array:
    """Shard the leading (ray) axis over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))
