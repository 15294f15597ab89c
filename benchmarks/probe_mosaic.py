"""Probe Mosaic/TPU capabilities that drive the march-kernel design.

Run on the real chip:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_mosaic.py

Probes:
  A. sublane dynamic gather (take_along_axis axis=0) inside a kernel
  B. one-hot broadcast-compare + MXU matmul gather refresh cost
  C. while_loop + DMA window structure compile time
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(name, fn, *args):
    t0 = time.perf_counter()
    try:
        out = jax.block_until_ready(fn(*args))
        # force host sync (axon can return early)
        np.asarray(jax.tree.leaves(out)[0])
    except Exception as e:  # noqa
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")
        return None
    t1 = time.perf_counter()
    out2 = jax.block_until_ready(fn(*args))
    np.asarray(jax.tree.leaves(out2)[0])
    t2 = time.perf_counter()
    print(f"{name}: compile+run {t1-t0:.2f}s, run {t2-t1:.4f}s")
    return out


# ---------------- probe A: sublane dynamic gather ----------------
def gather_kernel(src_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=0)


def probe_a():
    src = jnp.arange(1024 * 128, dtype=jnp.float32).reshape(1024, 128)
    idx = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32)[:, None] * 100, (8, 128))

    @jax.jit
    def f(src, idx):
        return pl.pallas_call(
            gather_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(src, idx)

    out = timed("A.take_along_axis(1024,128)[idx(8,128)]", f, src, idx)
    if out is not None:
        expect = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=0)
        print("   correct:", np.array_equal(np.asarray(out), expect))


# ---------------- probe B: one-hot matmul refresh ----------------
CELLS = 1024
CH = 40
RS, RL = 8, 128


def refresh_kernel(table_ref, ids_ref, out_ref, *, reps, prec):
    iota = jax.lax.broadcasted_iota(jnp.int32, (CELLS, RL), 0)

    def body(r, acc):
        parts = []
        for s in range(RS):
            onehot = (iota == ids_ref[s : s + 1, :]).astype(jnp.float32)
            parts.append(
                jax.lax.dot_general(
                    table_ref[:],
                    onehot,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
            )  # (CH, RL)
        # acc (CH, RS, RL)
        return acc + jnp.stack(parts, axis=1) + jnp.float32(r)

    acc = jax.lax.fori_loop(0, reps, body, jnp.zeros((CH, RS, RL), jnp.float32))
    out_ref[:] = acc


def probe_b(reps=100, prec=jax.lax.Precision.HIGHEST, tag="f32"):
    table = jnp.asarray(np.random.rand(CH, CELLS), jnp.float32)
    ids = jnp.asarray(np.random.randint(0, CELLS, (RS, RL)), jnp.int32)

    @jax.jit
    def f(table, ids):
        import functools
        return pl.pallas_call(
            functools.partial(refresh_kernel, reps=reps, prec=prec),
            out_shape=jax.ShapeDtypeStruct((CH, RS, RL), jnp.float32),
        )(table, ids)

    t0 = time.perf_counter()
    out = jax.block_until_ready(f(table, ids))
    np.asarray(out)
    t1 = time.perf_counter()
    out = jax.block_until_ready(f(table, ids))
    np.asarray(out)
    t2 = time.perf_counter()
    per = (t2 - t1) / reps
    print(
        f"B.refresh[{tag}] x{reps}: compile {t1-t0:.2f}s, {per*1e6:.1f} us/refresh "
        f"({1024/per/1e9:.2f} G ray-refreshes/s)"
    )


# ---------------- probe C: window structure ----------------
def window_kernel(table_hbm, ids_ref, out_ref, brick_ref, sem, *, windows, k_steps):
    iota = jax.lax.broadcasted_iota(jnp.int32, (CELLS, RL), 0)

    def wbody(w, carry):
        px, py = carry
        cp = pltpu.make_async_copy(
            table_hbm.at[pl.ds((w % 4) * CH, CH), :], brick_ref, sem
        )
        cp.start()
        cp.wait()
        parts = []
        for s in range(RS):
            onehot = (iota == ids_ref[s : s + 1, :]).astype(jnp.float32)
            parts.append(
                jax.lax.dot_general(
                    brick_ref[:], onehot,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        cache = jnp.stack(parts, axis=1)  # (CH, RS, RL)

        def sbody(k, c):
            px, py = c
            g = cache[0] * px + cache[1]
            py = py + g * 0.001
            px = px + py * 0.001
            return px, py

        return jax.lax.fori_loop(0, k_steps, sbody, (px, py))

    px = jnp.zeros((RS, RL), jnp.float32)
    py = jnp.ones((RS, RL), jnp.float32)
    px, py = jax.lax.fori_loop(0, windows, wbody, (px, py))
    out_ref[:] = px


def probe_c(windows=32, k_steps=16):
    import functools

    table = jnp.asarray(np.random.rand(CH * 4, CELLS), jnp.float32)
    ids = jnp.asarray(np.random.randint(0, CELLS, (RS, RL)), jnp.int32)

    @jax.jit
    def f(table, ids):
        return pl.pallas_call(
            functools.partial(window_kernel, windows=windows, k_steps=k_steps),
            out_shape=jax.ShapeDtypeStruct((RS, RL), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((CH, CELLS), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(table, ids)

    t0 = time.perf_counter()
    out = jax.block_until_ready(f(table, ids))
    np.asarray(out)
    t1 = time.perf_counter()
    out = jax.block_until_ready(f(table, ids))
    np.asarray(out)
    t2 = time.perf_counter()
    steps = windows * k_steps * 1024
    print(
        f"C.window(DMA+refresh+{k_steps}ステップ)x{windows}: compile {t1-t0:.2f}s, "
        f"run {t2-t1:.4f}s = {steps/(t2-t1)/1e9:.3f} G ray-steps/s"
    )


if __name__ == "__main__":
    print("devices:", jax.devices())
    probe_a()
    probe_b(reps=100, prec=jax.lax.Precision.HIGHEST, tag="f32-highest")
    probe_b(reps=100, prec=jax.lax.Precision.DEFAULT, tag="default")
    probe_c()
