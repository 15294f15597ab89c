"""Round-5 window-efficiency diagnosis.

Hypothesis: the 0.43 window-step efficiency of the coherent-bundle march
comes from sublanes whose 128 lanes straddle >1 brick — the min-brick
scheduler marches one brick per sublane per window, so lanes in the other
brick idle through the whole window.

Test: same 128K-ray budget-512 workload, but ray (y, z) chosen so every
SUBLANE's 128 rays start in the SAME brick column (brick-aligned).  If the
efficiency jumps toward ~1, the loss is brick-splitting, and two resident
bricks per sublane is the fix.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_r5_eff.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.utils.profiling import enable_persistent_cache

enable_persistent_cache()
from volumeraytracer_tpu.kernels.march_lines import march_lines
from volumeraytracer_tpu.kernels.line_table import build_line_table, LBY, LBZ
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

K = 32
RAYSETS = {}

# (a) the standard coherent bundle (linspace over y/z — brick-UNaligned)
side = int(np.sqrt(N_RAYS))
ys = np.linspace(3.0, GRID - 4.0, side, dtype=np.float32)
yy, zz = np.meshgrid(ys, ys, indexing="ij")
RAYSETS["bundle"] = np.stack(
    [np.full(side * side, 1.5, np.float32), yy.ravel(), zz.ravel()], -1)

# (b) brick-ALIGNED bundle: 512 brick columns × 256 rays each, every ray of
# a column inside the same (by, bz) brick; after the driver's sort each
# sublane holds one brick
rng = np.random.default_rng(0)
cols = [(by, bz) for by in range(2, 18) for bz in range(2, 18)][:512]
pos_list = []
for by, bz in cols:
    yc = by * LBY + rng.uniform(2.0, LBY - 2.0, 256)
    zc = bz * LBZ + rng.uniform(2.0, LBZ - 2.0, 256)
    pos_list.append(np.stack([np.full(256, 1.5), yc, zc], -1))
RAYSETS["aligned"] = np.concatenate(pos_list).astype(np.float32)

dirs = jnp.asarray(np.tile(np.array([[16.0, 0, 0]], np.float32), (N_RAYS, 1)))


def run(pos):
    out = march_lines(packed, jnp.asarray(pos), dirs, BUDGET, bend_scale=BEND,
                      step_scale=STEP, k_steps=K, table=table, nb=nb,
                      anchor2x=True, _ablate="unroll")
    return (float(jnp.sum(out.end_iteration.astype(jnp.float32))),
            float(jnp.sum(out.windows_used.astype(jnp.float32))))


for name, pos in RAYSETS.items():
    run(pos)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        s, w = run(pos)
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)
    slots = w * K * 1024
    print(f"{name}: min {ts[0]:.4f}s -> {s/ts[0]/1e9:.4f} Gsteps/s  "
          f"steps={s/1e6:.2f}M windows={w:.0f} eff={s/slots:.3f} "
          f"per_window={ts[0]/w*1e6:.2f}us", flush=True)
