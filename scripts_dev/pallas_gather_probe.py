"""Pallas probe: VMEM-resident table gather vs XLA HBM gather.

The 4 MB single-level message table fits in VMEM; if Mosaic's in-kernel
dynamic gather (take_along_axis along lanes) works at 2^19 lanes, a Pallas
kernel avoids HBM gather latency for the watermark encoder.  This probes
(a) whether it compiles/validates, (b) whether it beats the XLA gather.
"""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 19
TBL = 1 << S
M = 4096 * 128
CHUNK = 8 * 1024


def timeit(name, fn, *args, iters=10):
    s = jnp.float32(0.0)
    s = fn(s, *args)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s, *args)
    float(s)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:30s} {dt:8.2f} ms", flush=True)
    return dt


def chained(f):
    @jax.jit
    def g(s, *args):
        out = f(*args)
        return s + jnp.sum(out.astype(jnp.float32)) * 1e-12
    return g


def pallas_gather(table_row, idx):
    """table_row: [1, TBL] f32; idx: [1, M] int32 -> [1, M] f32.

    Mosaic's dynamic_gather requires input and indices to share a shape, so
    the kernel processes index blocks of exactly TBL lanes (here M == TBL)."""

    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=-1)

    grid = M // TBL
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, TBL), lambda i: (0, 0)),     # whole table, VMEM
            pl.BlockSpec((1, TBL), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((1, TBL), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, M), jnp.float32),
    )(table_row, idx)


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    table = jax.random.uniform(k1, (TBL,), jnp.float32)
    idx = jax.random.randint(k2, (M,), 0, TBL, jnp.int32)
    table_row = table[None, :]
    idx_row = idx[None, :]

    def xla_gather(table, idx):
        return table[idx]

    print(f"devices: {jax.devices()}", flush=True)
    # correctness first (tiny)
    try:
        out = pallas_gather(table_row, idx_row)
        ref = np.asarray(table)[np.asarray(idx)]
        np.testing.assert_allclose(np.asarray(out)[0], ref, rtol=1e-6)
        print("pallas gather: CORRECT", flush=True)
    except Exception as e:
        print(f"pallas gather failed: {type(e).__name__}: {e}"[:500],
              flush=True)
        return
    timeit("xla HBM gather [67M/8]", chained(xla_gather), table, idx)
    timeit("pallas VMEM gather", chained(pallas_gather), table_row, idx_row)


if __name__ == "__main__":
    main()
