"""Microprobe: pl.reciprocal(approx=True) vs exact f32 division in Mosaic.

The fused step kernel pays two f32 divisions per pair slab (r2 = 1/rsq_den
and fb = -kf/rlog); PERF_NOTES established f32 division lowers to a
multi-op VPU sequence.  The VPU has a single-op reciprocal-approximate
instruction — this probe measures (a) its speed advantage in a
division-heavy chain, (b) its max relative error over the kernel's two
input domains (rsq_den in [0.5625, 2.6], rlog in [0.1, 1]).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 27008
ROWS = 8
REPS = 2000


def make_kernel(approx, reps):
    def kernel(x_ref, o_ref, acc_ref):
        acc_ref[...] = jnp.zeros((ROWS, P), jnp.float32)

        def body(i, c):
            x = x_ref[...] + acc_ref[...]
            if approx:
                r = pl.reciprocal(x, approx=True)
            else:
                r = 1.0 / x
            acc_ref[...] = acc_ref[...] + r * 1e-7
            return c

        jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int32))
        o_ref[...] = acc_ref[...]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, P), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ROWS, P), jnp.float32)],
    )


def time_call(approx):
    x = jnp.asarray(
        np.random.RandomState(0).uniform(0.5, 2.6, (ROWS, P)), jnp.float32)
    call = jax.jit(make_kernel(approx, REPS))
    jax.device_get(call(x))
    t0 = time.time()
    jax.device_get(call(x))
    dt = time.time() - t0
    print(f"{'approx' if approx else 'exact ':6s} rcp chain: "
          f"{dt*1e3:8.2f} ms ({dt/REPS*1e6:6.2f} us/iter)", flush=True)
    return dt


def precision(lo, hi, label):
    def kernel(x_ref, o_ref):
        o_ref[...] = pl.reciprocal(x_ref[...], approx=True)

    call = jax.jit(pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((ROWS, P), jnp.float32)))
    xs = np.linspace(lo, hi, ROWS * P).astype(np.float32).reshape(ROWS, P)
    got = np.asarray(jax.device_get(call(jnp.asarray(xs))))
    want = 1.0 / xs.astype(np.float64)
    rel = np.max(np.abs(got - want) / np.abs(want))
    print(f"approx rcp over [{lo}, {hi}] ({label}): max rel err {rel:.3e}",
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    de = time_call(False)
    da = time_call(True)
    print(f"speedup {de/da:.2f}x", flush=True)
    precision(0.5625, 2.6, "rsq_den domain")
    precision(0.1, 1.0, "rlog domain")
