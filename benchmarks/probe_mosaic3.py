"""Is there a huge fixed per-iteration fori_loop overhead in Pallas on this chip?"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RS, RL = 8, 128


def run(name, f, *args, reps=1):
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(*args)); np.asarray(jax.tree.leaves(out)[0])
    t1 = time.perf_counter()
    for _ in range(3):
        out = jax.block_until_ready(f(*args)); np.asarray(jax.tree.leaves(out)[0])
    t2 = time.perf_counter()
    print(f"{name}: compile {t1-t0:.2f}s, {(t2-t1)/3/reps*1e6:.3f} us/rep")


def trivial_loop(x_ref, out_ref, *, reps, unroll):
    def body(r, acc):
        return acc + 1.0
    out_ref[:] = jax.lax.fori_loop(0, reps, body, x_ref[:], unroll=unroll)


def trivial_loop_big(x_ref, out_ref, *, reps, unroll):
    def body(r, acc):
        return acc + 1.0
    out_ref[:] = jax.lax.fori_loop(0, reps, body, x_ref[:], unroll=unroll)


if __name__ == "__main__":
    x = jnp.ones((RS, RL), jnp.float32)
    xb = jnp.ones((256, RL), jnp.float32)
    R = 6400

    for unroll in (1,):
        @jax.jit
        def f(x, unroll=unroll):
            return pl.pallas_call(
                functools.partial(trivial_loop, reps=R, unroll=unroll),
                out_shape=jax.ShapeDtypeStruct((RS, RL), jnp.float32),
            )(x)
        run(f"pallas fori(add1,(8,128)) unroll={unroll} x{R}", f, x, reps=R)

    @jax.jit
    def fbig(xb):
        return pl.pallas_call(
            functools.partial(trivial_loop_big, reps=R, unroll=1),
            out_shape=jax.ShapeDtypeStruct((256, RL), jnp.float32),
        )(xb)
    run(f"pallas fori(add1,(256,128)) x{R}", fbig, xb, reps=R)

    # XLA matmul sanity: chip raw speed
    a = jnp.asarray(np.random.rand(4096, 4096), jnp.float32)
    @jax.jit
    def mm(a):
        def body(r, acc):
            return jnp.dot(acc, a, preferred_element_type=jnp.float32) * 1e-3
        return jax.lax.fori_loop(0, 30, body, a)
    run("XLA matmul 4096^3 f32 x30 (expect ~1-3ms/rep)", mm, a, reps=30)

    # XLA elementwise loop
    @jax.jit
    def ew(a):
        def body(r, acc):
            return acc * 1.000001 + 0.5
        return jax.lax.fori_loop(0, 1000, body, a)
    run("XLA elementwise (4096,4096) x1000", ew, a, reps=1000)
