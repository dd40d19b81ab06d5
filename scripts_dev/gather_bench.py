"""Compare hash-table gather strategies on the real chip.

The multiresolution-hash gather dominates the train step (PERF.md).  The
current implementation issues 8 corners x F=2 scalar gathers of [L, M] each.
Candidates to reduce that:

  a) baseline          : 16 gathers of [L*2^S] f32
  b) complex64 packing : 8 gathers of [L*2^S] c64 (both features per gather)
  c) row gather        : 8 gathers table[idx] -> [L, M, 2] (minor-dim 2)
  d) f32-pair bitcast  : features stored bf16-packed in one f32 word;
                         8 gathers + bitcast split (fwd-only check; the real
                         impl would need a custom_vjp)

Run on axon (no flags) — timings are relative; the tunnel throttles
everything uniformly enough for A/B (see PERF.md methodology).
"""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

S = 19
L = 16
M = 4096 * 128  # samples per step at the headline config
TBL = L << S


def timeit(name, fn, *args, iters=10):
    s = jnp.float32(0.0)
    s = fn(s, *args)
    float(s)  # materialise: the only reliable barrier under the axon relay
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s, *args)
    float(s)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:28s} {dt:8.2f} ms", flush=True)
    return dt


def chained(f):
    @jax.jit
    def g(s, *args):
        out = f(*args)
        return s + jnp.sum(out.astype(jnp.float32)) * 1e-12
    return g


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    table = jax.random.uniform(k1, (TBL, 2), jnp.float32)
    idx = jax.random.randint(k2, (8, L, M), 0, TBL, jnp.int32)

    tflat0 = table[:, 0]
    tflat1 = table[:, 1]
    tc = jax.lax.complex(tflat0, tflat1)
    # bf16 pair packed into one f32 word
    tb = jax.lax.bitcast_convert_type(
        jnp.stack([tflat0.astype(jnp.bfloat16),
                   tflat1.astype(jnp.bfloat16)], -1).view(), jnp.float32
    ) if False else None

    def base(t0, t1, idx):
        acc = jnp.zeros((L, M), jnp.float32)
        for c in range(8):
            acc = acc + t0[idx[c]] + t1[idx[c]]
        return acc

    def cplx(tc, idx):
        acc = jnp.zeros((L, M), jnp.float32)
        for c in range(8):
            g = tc[idx[c]]
            acc = acc + g.real + g.imag
        return acc

    def rowg(table, idx):
        acc = jnp.zeros((L, M), jnp.float32)
        for c in range(8):
            g = table[idx[c]]          # [L, M, 2]
            acc = acc + g[..., 0] + g[..., 1]
        return acc

    def pair_bitcast(tp, idx):
        acc = jnp.zeros((L, M), jnp.float32)
        for c in range(8):
            g = jax.lax.bitcast_convert_type(tp[idx[c]], jnp.uint32)
            lo = jax.lax.bitcast_convert_type(
                (g & jnp.uint32(0xFFFF0000)).astype(jnp.uint32), jnp.float32)
            # bf16 hi half: shift up
            hi = jax.lax.bitcast_convert_type(
                (g << jnp.uint32(16)), jnp.float32)
            acc = acc + lo + hi
        return acc

    tp = jax.lax.bitcast_convert_type(
        ((jax.lax.bitcast_convert_type(tflat0, jnp.uint32)
          & jnp.uint32(0xFFFF0000))
         | (jax.lax.bitcast_convert_type(tflat1, jnp.uint32) >> 16)),
        jnp.float32)

    print(f"devices: {jax.devices()}", flush=True)
    timeit("a) 16x f32 gather", chained(base), tflat0, tflat1, idx)
    timeit("b) 8x complex64 gather", chained(cplx), tc, idx)
    timeit("c) 8x row gather [.,2]", chained(rowg), table, idx)
    timeit("d) 8x f32 bitcast-pair", chained(pair_bitcast), tp, idx)
    # single-feature reference point: 8 gathers
    def single(t0, idx):
        acc = jnp.zeros((L, M), jnp.float32)
        for c in range(8):
            acc = acc + t0[idx[c]]
        return acc
    timeit("e) 8x f32 gather (1 feat)", chained(single), tflat0, idx)


if __name__ == "__main__":
    main()


def extra():
    """bf16-table row gather: is the gather index-bound or bandwidth-bound?"""
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    table = jax.random.uniform(k1, (TBL, 2), jnp.float32)
    idx = jax.random.randint(k2, (8, L, M), 0, TBL, jnp.int32)
    tb16 = table.astype(jnp.bfloat16)
    t4 = jnp.concatenate([table, table], -1)  # [TBL, 4] rows

    def rowg(table, idx):
        acc = jnp.zeros((L, M), jnp.float32)
        for c in range(8):
            g = table[idx[c]]
            acc = acc + g[..., 0].astype(jnp.float32) + g[..., 1].astype(jnp.float32)
        return acc

    print(f"devices: {jax.devices()}", flush=True)
    timeit("c) 8x f32 row gather [.,2]", chained(rowg), table, idx)
    timeit("i) 8x bf16 row gather [.,2]", chained(rowg), tb16, idx)
    timeit("j) 8x f32 row gather [.,4]", chained(rowg), t4, idx)


if __name__ == "__main__" and os.environ.get("ARG") == "extra":
    extra()
