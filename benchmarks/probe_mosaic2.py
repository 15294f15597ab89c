"""Finer-grained probes: what makes the one-hot refresh slow?"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CELLS = 1024
CH = 40
RS, RL = 8, 128


def bench(name, kernel, out_shape, *args, reps=1):
    @jax.jit
    def f(*a):
        return pl.pallas_call(kernel, out_shape=out_shape)(*a)

    t0 = time.perf_counter()
    out = jax.block_until_ready(f(*args)); np.asarray(jax.tree.leaves(out)[0])
    t1 = time.perf_counter()
    out = jax.block_until_ready(f(*args)); np.asarray(jax.tree.leaves(out)[0])
    t2 = time.perf_counter()
    print(f"{name}: compile {t1-t0:.2f}s, {(t2-t1)/reps*1e6:.2f} us/rep")


def matmul_only(table_ref, oh_ref, out_ref, *, reps):
    def body(r, acc):
        return acc + jax.lax.dot_general(
            table_ref[:], oh_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (1.0 + r)
    out_ref[:] = jax.lax.fori_loop(0, reps, body, jnp.zeros((CH, RL), jnp.float32))


def onehot_only(ids_ref, out_ref, *, reps):
    iota = jax.lax.broadcasted_iota(jnp.int32, (CELLS, RL), 0)
    def body(r, acc):
        oh = (iota == (ids_ref[0:1, :] + r)).astype(jnp.float32)
        return acc + oh
    out_ref[:] = jax.lax.fori_loop(0, reps, body, jnp.zeros((CELLS, RL), jnp.float32))


def onehot_matmul(table_ref, ids_ref, out_ref, *, reps):
    iota = jax.lax.broadcasted_iota(jnp.int32, (CELLS, RL), 0)
    def body(r, acc):
        oh = (iota == (ids_ref[0:1, :] + r)).astype(jnp.float32)
        return acc + jax.lax.dot_general(
            table_ref[:], oh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = jax.lax.fori_loop(0, reps, body, jnp.zeros((CH, RL), jnp.float32))


def onehot_matmul_bf16(table_ref, ids_ref, out_ref, *, reps):
    iota = jax.lax.broadcasted_iota(jnp.int32, (CELLS, RL), 0)
    tb = table_ref[:].astype(jnp.bfloat16)
    def body(r, acc):
        oh = (iota == (ids_ref[0:1, :] + r)).astype(jnp.bfloat16)
        return acc + jax.lax.dot_general(
            tb, oh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = jax.lax.fori_loop(0, reps, body, jnp.zeros((CH, RL), jnp.float32))


def big_matmul(a_ref, b_ref, out_ref, *, reps):
    def body(r, acc):
        return acc + jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (1.0 + r)
    out_ref[:] = jax.lax.fori_loop(0, reps, body, jnp.zeros((128, 128), jnp.float32))


def step_math(out_ref, *, reps):
    """~per-step VPU cost of the march for one (8,128) tile x8 corners x4 chan"""
    def body(r, c):
        px, py, pz, dx, dy, dz = c
        fx, fy, fz = px - 1.0, py - 2.0, pz - 3.0
        gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz
        w = (gx*gy*gz, gx*gy*fz, gx*fy*gz, gx*fy*fz, fx*gy*gz, fx*gy*fz, fx*fy*gz, fx*fy*fz)
        acc = [jnp.zeros((RS, RL), jnp.float32) for _ in range(4)]
        for o in range(8):
            for ch in range(4):
                acc[ch] = acc[ch] + w[o] * (px + o + ch)
        ndx, ndy, ndz = dx + acc[0]*0.1, dy + acc[1]*0.1, dz + acc[2]*0.1
        il = 1.0 / (ndx*ndx + ndy*ndy + ndz*ndz)
        ok = acc[3] > 0
        px = jnp.where(ok, px + ndx*il, px)
        py = jnp.where(ok, py + ndy*il, py)
        pz = jnp.where(ok, pz + ndz*il, pz)
        return px, py, pz, ndx, ndy, ndz
    z = jnp.ones((RS, RL), jnp.float32)
    c = jax.lax.fori_loop(0, reps, body, (z, z*2, z*3, z, z, z))
    out_ref[:] = c[0]


if __name__ == "__main__":
    R = 800
    table = jnp.asarray(np.random.rand(CH, CELLS), jnp.float32)
    oh = jnp.asarray((np.random.rand(CELLS, RL) < 0.001), jnp.float32)
    ids = jnp.asarray(np.random.randint(0, CELLS - R, (RS, RL)), jnp.int32)
    a = jnp.asarray(np.random.rand(128, 1024), jnp.float32)
    b = jnp.asarray(np.random.rand(1024, 128), jnp.float32)

    bench("matmul(40,1024)x(1024,128) const-oh", functools.partial(matmul_only, reps=R),
          jax.ShapeDtypeStruct((CH, RL), jnp.float32), table, oh, reps=R)
    bench("onehot build (1024,128)", functools.partial(onehot_only, reps=R),
          jax.ShapeDtypeStruct((CELLS, RL), jnp.float32), ids, reps=R)
    bench("onehot+matmul f32", functools.partial(onehot_matmul, reps=R),
          jax.ShapeDtypeStruct((CH, RL), jnp.float32), table, ids, reps=R)
    bench("onehot+matmul bf16", functools.partial(onehot_matmul_bf16, reps=R),
          jax.ShapeDtypeStruct((CH, RL), jnp.float32), table, ids, reps=R)
    bench("matmul(128,1024)x(1024,128)", functools.partial(big_matmul, reps=R),
          jax.ShapeDtypeStruct((128, 128), jnp.float32), a, b, reps=R)
    bench("step-math tile (8,128) 8corner", functools.partial(step_math, reps=R),
          jax.ShapeDtypeStruct((RS, RL), jnp.float32), reps=R)
