"""Slope-fit timing: time(reps) = overhead + slope*reps, tiny outputs only.

Measures the true per-iteration cost of kernel bodies, excluding the axon
relay's per-call and transfer overhead.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RS, RL = 8, 128
CELLS = 1024
CH = 40


def timecall(f, *args):
    out = jax.block_until_ready(f(*args))
    np.asarray(jax.tree.leaves(out)[0])  # sync through tunnel
    t0 = time.perf_counter()
    for _ in range(3):
        out = jax.block_until_ready(f(*args))
        np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / 3


def slope(make_f, r1, r2, name):
    f1, f2 = make_f(r1), make_f(r2)
    t1, t2 = timecall(f1), timecall(f2)
    per = (t2 - t1) / (r2 - r1)
    print(f"{name}: {per*1e6:.3f} us/rep  (call@{r1}={t1*1e3:.2f}ms, call@{r2}={t2*1e3:.2f}ms)")
    return per


def main():
    x = jnp.ones((RS, RL), jnp.float32)
    table = jnp.asarray(np.random.rand(CH, CELLS), jnp.float32)
    ids = jnp.asarray(np.random.randint(0, CELLS - 1, (RS, RL)), jnp.int32)

    # 1. trivial loop body
    def make_trivial(reps):
        def kern(x_ref, out_ref):
            out_ref[:] = jax.lax.fori_loop(0, reps, lambda r, a: a + 1.0, x_ref[:])
        @jax.jit
        def f(x):
            return pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((RS, RL), jnp.float32))(x)
        return lambda: f(x)
    slope(make_trivial, 10000, 2010000, "pallas fori add1 (8,128)")

    # 2. step math (realistic march step on one tile)
    def make_step(reps):
        def kern(x_ref, out_ref):
            def body(r, c):
                px, py, pz, dx, dy, dz = c
                fx, fy, fz = px - 1.0, py - 2.0, pz - 3.0
                gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz
                w = (gx*gy*gz, gx*gy*fz, gx*fy*gz, gx*fy*fz,
                     fx*gy*gz, fx*gy*fz, fx*fy*gz, fx*fy*fz)
                acc = [jnp.zeros((RS, RL), jnp.float32) for _ in range(4)]
                for o in range(8):
                    for ch in range(4):
                        acc[ch] = acc[ch] + w[o] * (px + float(o + ch))
                ndx, ndy, ndz = dx + acc[0]*0.1, dy + acc[1]*0.1, dz + acc[2]*0.1
                il = 1.0 / (ndx*ndx + ndy*ndy + ndz*ndz)
                ok = acc[3] > 0
                px = jnp.where(ok, px + ndx*il, px)
                py = jnp.where(ok, py + ndy*il, py)
                pz = jnp.where(ok, pz + ndz*il, pz)
                return px, py, pz, ndx, ndy, ndz
            c = jax.lax.fori_loop(0, reps, body, (x_ref[:],)*6)
            out_ref[:] = c[0]
        @jax.jit
        def f(x):
            return pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((RS, RL), jnp.float32))(x)
        return lambda: f(x)
    slope(make_step, 10000, 510000, "step-math 1 tile (1024 rays)")

    # 3. one-hot + matmul refresh (per-sublane onehot, one dot per sublane)
    def make_refresh(reps):
        def kern(table_ref, ids_ref, out_ref):
            iota = jax.lax.broadcasted_iota(jnp.int32, (CELLS, RL), 0)
            def body(r, acc):
                tot = acc
                for s in range(RS):
                    oh = (iota == (ids_ref[s:s+1, :] + r)).astype(jnp.float32)
                    g = jax.lax.dot_general(
                        table_ref[:], oh,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    tot = tot + g
                return tot
            out_ref[:] = jax.lax.fori_loop(0, reps, body, jnp.zeros((CH, RL), jnp.float32))
        @jax.jit
        def f(table, ids):
            return pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((CH, RL), jnp.float32))(table, ids)
        return lambda: f(table, ids)
    slope(make_refresh, 2000, 102000, "refresh 8xonehot+dot f32 (1024 rays)")

    # 4. single matmul in loop
    def make_mm(reps):
        def kern(table_ref, oh_ref, out_ref):
            def body(r, acc):
                return acc + jax.lax.dot_general(
                    table_ref[:], oh_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * (1.0 + r)
            out_ref[:] = jax.lax.fori_loop(0, reps, body, jnp.zeros((CH, RL), jnp.float32))
        oh = jnp.asarray((np.random.rand(CELLS, RL) < 0.001), jnp.float32)
        @jax.jit
        def f(table, oh):
            return pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((CH, RL), jnp.float32))(table, oh)
        return lambda: f(table, oh)
    slope(make_mm, 10000, 510000, "matmul (40,1024)x(1024,128) f32")

    # 5. XLA matmul slope (tiny output via sum)
    a = jnp.asarray(np.random.rand(2048, 2048), jnp.float32)
    def make_xmm(reps):
        @jax.jit
        def f(a):
            def body(r, acc):
                return jnp.dot(acc, a, preferred_element_type=jnp.float32) * 1e-4
            out = jax.lax.fori_loop(0, reps, body, a)
            return jnp.sum(out)
        return lambda: f(a)
    per = slope(make_xmm, 100, 2100, "XLA matmul 2048^3 f32")
    print(f"   -> {2*2048**3/per/1e12:.1f} TFLOP/s f32")

    ab = a.astype(jnp.bfloat16)
    def make_xmmb(reps):
        @jax.jit
        def f(ab):
            def body(r, acc):
                return jnp.dot(acc, ab, preferred_element_type=jnp.bfloat16) * 1e-4
            out = jax.lax.fori_loop(0, reps, body, ab)
            return jnp.sum(out.astype(jnp.float32))
        return lambda: f(ab)
    per = slope(make_xmmb, 100, 2100, "XLA matmul 2048^3 bf16")
    print(f"   -> {2*2048**3/per/1e12:.1f} TFLOP/s bf16")

    # 6. HBM bandwidth (XLA elementwise)
    big = jnp.ones((8192, 8192), jnp.float32)  # 256MB
    def make_ew(reps):
        @jax.jit
        def f(b):
            def body(r, acc):
                return acc * 1.000001 + 0.5
            return jnp.sum(jax.lax.fori_loop(0, reps, body, b))
        return lambda: f(big)
    per = slope(make_ew, 20, 520, "XLA elementwise 256MB")
    print(f"   -> {2*big.size*4/per/1e9:.0f} GB/s HBM")


if __name__ == "__main__":
    main()
