"""Round-5 forward-kernel anomaly probe (VERDICT r4 item 1).

The measured fact: the forward line kernel runs ~40% slower per window than
the 3x-heavier backward (perf_notes.md).  Hypothesis: the forward step body
is one long dependency chain of small (8,128) VPU ops executed inside a
Mosaic fori_loop — the hardware loop serializes the chain end-to-end per
iteration, while the backward body's many independent accumulators give the
VPU instruction-level parallelism to hide op latency.

Variants (interleaved min-of-5, the only protocol that survives the axon
relay's 1.3-1.7x run-to-run spread):
  base      — production fwd (2x anchor, chunked fori_loop + early exit)
  unroll    — python-unrolled 8-step chunks (software pipelining across steps)
  noearly   — no chunk-level early-exit while_loop (pure fori over chunks)
  unroll+ne — both
  bwd_k32   — the adjoint, for the per-window reference point

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_r5_anomaly.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.utils.profiling import enable_persistent_cache

enable_persistent_cache()
from volumeraytracer_tpu.kernels.march_lines import march_lines, _bwd_impl_lines
from volumeraytracer_tpu.kernels.line_table import build_line_table, line_brick_grid
from volumeraytracer_tpu.ops.fields import build_packed_field
from volumeraytracer_tpu.types import FIX_ONE, STEP_CONST

GRID, N_RAYS, BUDGET = 256, 128 * 1024, 512
inv = 2.0
BEND = inv / float(FIX_ONE)
STEP = inv * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE))

ax = np.linspace(-1, 1, GRID, dtype=np.float32)
x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
ior = jnp.asarray(1.0 + 0.4 * np.exp(-3.0 * (x * x + y * y + z * z)).astype(np.float32))
packed = build_packed_field(ior)
table, nb = build_line_table(packed, None)
side = int(np.sqrt(N_RAYS))
ys = np.linspace(3.0, GRID - 4.0, side, dtype=np.float32)
yy, zz = np.meshgrid(ys, ys, indexing="ij")
pos = jnp.asarray(np.stack(
    [np.full(side * side, 1.5, np.float32), yy.ravel(), zz.ravel()], -1))
dirs = jnp.asarray(np.tile(np.array([[16.0, 0, 0]], np.float32), (side * side, 1)))

K = 32
VARIANTS = [
    ("base_k32", ""),
    ("unroll_k32", "unroll"),
    ("noearly_k32", "noearly"),
    ("unroll_ne_k32", "unroll noearly"),
]


def run_fwd(ablate):
    out = march_lines(packed, pos, dirs, BUDGET, bend_scale=BEND,
                      step_scale=STEP, k_steps=K, table=table, nb=nb,
                      anchor2x=True, _ablate=ablate)
    return (float(jnp.sum(out.end_iteration.astype(jnp.float32))),
            float(jnp.sum(out.windows_used.astype(jnp.float32))))


# backward reference (per-window comparison point)
res = march_lines(packed, pos, dirs, BUDGET, bend_scale=BEND, step_scale=STEP,
                  k_steps=K, table=table, nb=nb, anchor2x=True)
end_pos = jax.block_until_ready(res.end_position)
end_dir = jax.block_until_ready(res.end_direction)
nexec = jnp.asarray(res.end_iteration, jnp.int32) - 1
dp = jnp.ones_like(end_pos)
dv = jnp.zeros_like(end_dir)


def run_bwd():
    outs = _bwd_impl_lines(
        table, nb, end_pos, end_dir, nexec, dp, dv,
        bend=(BEND,) * 3, step=(STEP,) * 3, k_steps=K, max_windows=None,
        interpret=False, budget=BUDGET)
    return (float(jnp.sum(outs[0])),
            float(jnp.sum(jnp.abs(outs[4].astype(jnp.float32)))))


print("compiling variants...", flush=True)
ref_steps = ref_ends = None
for name, ab in VARIANTS:
    t0 = time.perf_counter()
    s, w = run_fwd(ab)
    print(f"  {name}: compile+run {time.perf_counter()-t0:.1f}s "
          f"steps={s/1e6:.2f}M windows={w:.0f}", flush=True)
    if ref_steps is None:
        ref_steps = s
    else:
        assert abs(s - ref_steps) < 1, (name, s, ref_steps)  # exact parity
t0 = time.perf_counter()
sb, wb = run_bwd()
print(f"  bwd_k32: compile+run {time.perf_counter()-t0:.1f}s windows={wb:.0f}",
      flush=True)

times = {name: [] for name, _ in VARIANTS}
times["bwd_k32"] = []
wins = {}
for rep in range(5):
    for name, ab in VARIANTS:
        t0 = time.perf_counter()
        s, w = run_fwd(ab)
        times[name].append(time.perf_counter() - t0)
        wins[name] = w
    t0 = time.perf_counter()
    _, w = run_bwd()
    times["bwd_k32"].append(time.perf_counter() - t0)
    wins["bwd_k32"] = w

steps = ref_steps
for name in times:
    ts = sorted(times[name])
    w = wins[name]
    print(f"{name}: min {ts[0]:.4f}s median {ts[2]:.4f}s -> "
          f"{steps/ts[0]/1e9:.4f} Gsteps/s  per_window={ts[0]/w*1e6:.2f}us "
          f"(windows={w:.0f})", flush=True)
