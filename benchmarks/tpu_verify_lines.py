"""Real-TPU verify for the LINE-layout Pallas march kernels.

Mosaic-compiles the line kernels on the chip, checks endpoints and gradients
against the XLA march, measures 256³ throughput, and records everything to
``benchmarks/tpu_verify_lines.json`` — the gate for flipping the production
layout from "points" to "lines".

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tpu_verify_lines.py
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from volumeraytracer_tpu.kernels.march_lines import march_lines
from volumeraytracer_tpu.kernels.line_table import build_line_table
from volumeraytracer_tpu.ops import march as march_ops
from volumeraytracer_tpu.ops.fields import build_packed_field
from volumeraytracer_tpu.types import FIX_ONE, STEP_CONST

REPORT = {}


def sync(x):
    x = jax.block_until_ready(x)
    np.asarray(jax.tree.leaves(x)[0])
    return x


def grin_scene(n):
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    return jnp.asarray(1.0 + 0.4 * np.exp(-3.0 * (x * x + y * y + z * z)).astype(np.float32))


def camera_rays(n_rays, grid, seed=0, speed=16.0):
    side = int(np.sqrt(n_rays))
    ys = np.linspace(3.0, grid - 4.0, side, dtype=np.float32)
    zs = np.linspace(3.0, grid - 4.0, side, dtype=np.float32)
    yy, zz = np.meshgrid(ys, zs, indexing="ij")
    pos = np.stack([np.full(side * side, 1.5, np.float32), yy.ravel(), zz.ravel()], -1)
    dirs = np.tile(np.array([[speed, 0.0, 0.0]], np.float32), (side * side, 1))
    return jnp.asarray(pos), jnp.asarray(dirs)


def main():
    from volumeraytracer_tpu.utils.profiling import enable_persistent_cache
    enable_persistent_cache()
    assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()
    REPORT["device"] = str(jax.devices()[0])

    n = 48
    ior = grin_scene(n)
    packed = build_packed_field(ior)
    pos, dirs = camera_rays(1024, n)
    inv = 2.0
    bend = inv / float(FIX_ONE)
    step = inv * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE))
    budget = 512

    # ---- forward: correctness vs XLA on a small scene ----
    t0 = time.perf_counter()
    res = sync(march_lines(packed, pos, dirs, budget, bend_scale=bend, step_scale=step))
    t1 = time.perf_counter()
    REPORT["fwd_small_compile_s"] = round(t1 - t0, 1)

    ref = sync(march_ops.march_float(
        packed, None, pos, dirs, budget, bend_scale=bend, step_scale=step,
        chunk_steps=64,
    ))
    pe = np.abs(np.asarray(res.end_position) - np.asarray(ref.end_position)).max()
    de = np.abs(np.asarray(res.end_direction) - np.asarray(ref.end_direction)).max()
    ie = np.abs(np.asarray(res.end_iteration).astype(np.int64)
                - np.asarray(ref.end_iteration).astype(np.int64)).max()
    REPORT["fwd_small_pos_maxerr"] = float(pe)
    REPORT["fwd_small_dir_maxerr"] = float(de)
    REPORT["fwd_small_iter_maxerr"] = int(ie)
    ok = pe < 1e-3 and de < 1e-4 and ie == 0
    REPORT["fwd_small_ok"] = bool(ok)
    print(f"fwd small: compile {t1-t0:.1f}s pos_err {pe:.2e} dir_err {de:.2e} "
          f"iter_err {ie} -> {'OK' if ok else 'FAIL'}")
    _flush()

    # ---- forward: throughput at 256^3 ----
    grid = 256
    ior_b = grin_scene(grid)
    packed_b = build_packed_field(ior_b)
    table, nb = build_line_table(packed_b, None)
    n_rays = 128 * 1024
    pos_b, dirs_b = camera_rays(n_rays, grid)
    budget_b = 512

    def run_steps(k_steps):
        out = march_lines(
            packed_b, pos_b, dirs_b, budget_b, bend_scale=bend, step_scale=step,
            k_steps=k_steps, table=table, nb=nb,
        )
        steps = float(jnp.sum(out.end_iteration.astype(jnp.float64)))
        wsum = float(jnp.sum(out.windows_used.astype(jnp.float64)))
        REPORT[f"fwd_256_k{k_steps}_window_eff"] = round(
            steps / max(wsum * k_steps * 1024, 1.0), 4
        )
        return steps

    best = None
    for k_steps in (16, 32, 64):
        t0 = time.perf_counter()
        steps = int(run_steps(k_steps))
        t1 = time.perf_counter()
        t2 = time.perf_counter()
        steps = int(run_steps(k_steps))
        t3 = time.perf_counter()
        gsps = steps / (t3 - t2) / 1e9
        print(f"fwd 256^3 k={k_steps}: compile+run {t1-t0:.1f}s, run {t3-t2:.3f}s, "
              f"{gsps:.3f} G steps/s ({steps/1e6:.0f} M steps)")
        REPORT[f"fwd_256_k{k_steps}_run_s"] = round(t3 - t2, 4)
        REPORT[f"fwd_256_k{k_steps}_gsteps_per_s"] = round(gsps, 4)
        if best is None or gsps > best[1]:
            best = (k_steps, gsps)
    REPORT["fwd_256_best"] = {"k_steps": best[0], "gsteps_per_s": round(best[1], 4)}
    _flush()

    # ---- backward: hardware gradcheck vs the XLA adjoint ----
    from volumeraytracer_tpu.kernels.march_bwd import march_pallas_diff

    budget_g = 96

    def loss_lines(f):
        p = build_packed_field(f)
        res = march_pallas_diff(
            p, pos, dirs, budget_g, bend_scale=bend, step_scale=step,
            k_steps=16, layout="lines",
        )
        return jnp.sum(res.end_position[:, 1]) + jnp.sum(res.end_direction[:, 0])

    def loss_xla(f):
        p = build_packed_field(f)
        res = march_ops.march_float(
            p, None, pos, dirs, budget_g, bend_scale=bend, step_scale=step,
            chunk_steps=16, differentiable=True,
        )
        return jnp.sum(res.end_position[:, 1]) + jnp.sum(res.end_direction[:, 0])

    t0 = time.perf_counter()
    lp, gp = sync(jax.value_and_grad(loss_lines)(ior))
    t1 = time.perf_counter()
    REPORT["bwd_small_compile_s"] = round(t1 - t0, 1)
    lx, gx = sync(jax.value_and_grad(loss_xla)(ior))
    gp = np.asarray(gp)
    gx = np.asarray(gx)
    scale = np.abs(gx).max()
    gerr = np.abs(gp - gx).max() / scale
    lerr = abs(float(lp) - float(lx)) / max(1.0, abs(float(lx)))
    REPORT["bwd_small_grad_relerr"] = float(gerr)
    REPORT["bwd_small_loss_relerr"] = float(lerr)
    REPORT["bwd_small_grad_scale"] = float(scale)
    bwd_ok = gerr < 5e-2 and lerr < 1e-4
    REPORT["bwd_small_ok"] = bool(bwd_ok)
    print(f"bwd small: compile {t1-t0:.1f}s grad_relerr {gerr:.2e} "
          f"loss_relerr {lerr:.2e} -> {'OK' if bwd_ok else 'FAIL'}")
    _flush()

    # ---- fwd+bwd throughput at 256^3 (the BENCH protocol) ----
    def loss_b(f, p, d):
        pk = build_packed_field(f)
        res = march_pallas_diff(
            pk, p, d, budget_b, bend_scale=bend, step_scale=step, k_steps=32,
            layout="lines",
        )
        return jnp.sum(res.end_position[:, 1])

    @jax.jit
    def fwd_bwd(f, p, d):
        loss, g = jax.value_and_grad(loss_b)(f, p, d)
        return loss, jnp.sum(g * g)

    t0 = time.perf_counter()
    out = fwd_bwd(ior_b, pos_b, dirs_b)
    _ = float(out[0]); _ = float(out[1])
    t1 = time.perf_counter()
    REPORT["fwdbwd_256_compile_s"] = round(t1 - t0, 1)
    t2 = time.perf_counter()
    out = fwd_bwd(ior_b, pos_b, dirs_b)
    _ = float(out[0]); _ = float(out[1])
    t3 = time.perf_counter()
    steps = n_rays * budget_b
    gsps = steps / (t3 - t2) / 1e9
    REPORT["fwdbwd_256_run_s"] = round(t3 - t2, 4)
    REPORT["fwdbwd_256_gsteps_per_s"] = round(gsps, 4)
    print(f"fwd+bwd 256^3: compile {t1-t0:.1f}s run {t3-t2:.3f}s "
          f"{gsps:.3f} G steps/s")
    _flush()


def _flush():
    with open("benchmarks/tpu_verify_lines.json", "w") as f:
        json.dump(REPORT, f, indent=1)
    print(json.dumps(REPORT))


if __name__ == "__main__":
    main()
