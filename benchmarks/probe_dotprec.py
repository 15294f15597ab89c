"""MXU pass-count probe: the per-window gather dot at different precisions.

Times, inside one pallas_call via slope-fit over in-kernel repetitions:

  G32H  gather dot (64, PVP) @ (PVP, 128), f32 operands, HIGHEST
  G32D  same, f32 operands, DEFAULT
  G16   same, bf16 operands (explicit), f32 accumulate
  OH    one-hot build alone: (PVP, RL) iota-compare + cast
  ROLL8 8 corner rolls of an (8, PVP) f32 brick + stores

Decides the split-channel-table redesign (hi/lo bf16-representable rows,
single-pass MXU gather) and quantifies the brick-arrival roll cost.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_dotprec.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.kernels.march_pallas import CORNER_OFF, PVP, RCH, RL, RS, TCH

RSUB = 8


def timecall(f):
    out = jax.block_until_ready(f())
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(3):
        out = jax.block_until_ready(f())
        np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / 3


def slope(make_f, r1, r2, name):
    f1, f2 = make_f(r1), make_f(r2)
    t1, t2 = timecall(f1), timecall(f2)
    per = (t2 - t1) / (r2 - r1)
    print(f"{name}: {per*1e6:.3f} us/rep  (@{r1}={t1*1e3:.2f}ms, @{r2}={t2*1e3:.2f}ms)",
          flush=True)
    return per


def make(reps, mode):
    def kern(lid_ref, out_ref, bro_ref, bro16_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (PVP, RL), 0)

        def body(w, acc):
            lid = lid_ref[:] + (w % 2)
            if mode == "OH":
                onehot = (iota == lid[0:1, :]).astype(jnp.float32)
                r = onehot[0:8, :]
            elif mode == "ROLL8":
                b = bro_ref[0, 0:TCH] + jnp.float32(w)
                for o in range(8):
                    bro_ref[1, o * TCH: (o + 1) * TCH] = pltpu.roll(
                        b, (PVP - CORNER_OFF[o]) % PVP, 1)
                r = bro_ref[1, 0:8, 0:RL]
            else:
                onehot = (iota == lid[0:1, :])
                if mode == "G16":
                    oh = onehot.astype(jnp.bfloat16)
                    lhs = bro16_ref[0]
                    r = jax.lax.dot_general(
                        lhs, oh, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)[0:8]
                else:
                    oh = onehot.astype(jnp.float32)
                    prec = (jax.lax.Precision.HIGHEST if mode == "G32H"
                            else jax.lax.Precision.DEFAULT)
                    r = jax.lax.dot_general(
                        bro_ref[0], oh, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec)[0:8]
            return acc + r

        out_ref[:] = jax.lax.fori_loop(
            0, reps, body, jnp.zeros((8, RL), jnp.float32))

    @jax.jit
    def f(lid, b0, b16):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, RL), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, RCH, PVP), jnp.float32),
                pltpu.VMEM((1, RCH, PVP), jnp.bfloat16),
            ],
        )(lid)

    lid = jnp.asarray(np.random.randint(0, 1200, (RSUB, RL)), jnp.int32)
    b0 = jnp.zeros((2, RCH, PVP), jnp.float32)
    b16 = jnp.zeros((1, RCH, PVP), jnp.bfloat16)
    return lambda: f(lid, b0, b16)


def main():
    assert jax.default_backend() in ("tpu", "axon")
    for mode in ("G32H", "G32D", "G16", "OH", "ROLL8"):
        slope(lambda r, m=mode: make(r, m), 200, 1200, mode)


if __name__ == "__main__":
    main()
