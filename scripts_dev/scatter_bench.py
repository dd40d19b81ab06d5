"""Compare hash-table scatter-add (gradient) strategies on the real chip.

The row-gather forward (gather_bench.py: 3.3x) made the *backward* 10x
worse: XLA's grad of a row gather is a row scatter-add into [T, 2], measured
~5 s vs the old per-feature scalar scatter.  Find the fastest backward to put
inside a custom_vjp.
"""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

S = 19
L = 16
M = 4096 * 128
TBL = L << S


def timeit(name, fn, *args, iters=5):
    s = jnp.float32(0.0)
    s = fn(s, *args)
    float(s)  # materialise: the only reliable barrier under the axon relay
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s, *args)
    float(s)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:34s} {dt:8.2f} ms", flush=True)
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
    ct = jax.random.uniform(k1, (8, L, M, 2), jnp.float32)  # cotangent rows
    idx = jax.random.randint(k2, (8, L, M), 0, TBL, jnp.int32)

    def row_scatter(ct, idx):
        acc = jnp.zeros((TBL, 2), jnp.float32)
        for c in range(8):
            acc = acc.at[idx[c]].add(ct[c])
        return acc

    def feat_scatter(ct, idx):
        outs = []
        for f in range(2):
            acc = jnp.zeros((TBL,), jnp.float32)
            for c in range(8):
                acc = acc.at[idx[c]].add(ct[c, ..., f])
            outs.append(acc)
        return jnp.stack(outs, -1)

    def cplx_scatter(ct, idx):
        acc = jnp.zeros((TBL,), jnp.complex64)
        for c in range(8):
            acc = acc.at[idx[c]].add(
                jax.lax.complex(ct[c, ..., 0], ct[c, ..., 1])
            )
        return acc.real + acc.imag

    def fused_idx_scatter(ct, idx):
        # one scatter over all 8 corners concatenated (fewer kernel launches)
        acc = jnp.zeros((TBL, 2), jnp.float32)
        return acc.at[idx.reshape(-1)].add(ct.reshape(-1, 2))

    def interleave_scatter(ct, idx):
        # view the [TBL, 2] table as flat [2*TBL]; scatter feature f at
        # 2*idx + f as scalar adds
        acc = jnp.zeros((2 * TBL,), jnp.float32)
        for c in range(8):
            base = idx[c] * 2
            acc = acc.at[base].add(ct[c, ..., 0])
            acc = acc.at[base + 1].add(ct[c, ..., 1])
        return acc

    print(f"devices: {jax.devices()}", flush=True)
    timeit("a) 8x row scatter [.,2]", chained(row_scatter), ct, idx)
    timeit("b) 16x per-feature scalar scatter", chained(feat_scatter), ct, idx)
    timeit("c) 8x complex64 scatter", chained(cplx_scatter), ct, idx)
    timeit("d) 1x fused row scatter (8x rows)", chained(fused_idx_scatter), ct, idx)
    timeit("e) 16x interleaved scalar scatter", chained(interleave_scatter), ct, idx)


if __name__ == "__main__":
    main()


def extra():
    """Round 2 of backward candidates (run with ARG=extra)."""
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    ct = jax.random.uniform(k1, (8, L, M, 2), jnp.float32)
    idx = jax.random.randint(k2, (8, L, M), 0, TBL, jnp.int32)

    def feat_scatter_fused(ct, idx):
        # ONE scatter per feature over all corners concatenated
        outs = []
        flat_idx = idx.reshape(-1)
        for f in range(2):
            acc = jnp.zeros((TBL,), jnp.float32)
            outs.append(acc.at[flat_idx].add(ct[..., f].reshape(-1)))
        return jnp.stack(outs, -1)

    def feat_scatter_bf16(ct, idx):
        ct = ct.astype(jnp.bfloat16)
        outs = []
        for f in range(2):
            acc = jnp.zeros((TBL,), jnp.bfloat16)
            for c in range(8):
                acc = acc.at[idx[c]].add(ct[c, ..., f])
            outs.append(acc.astype(jnp.float32))
        return jnp.stack(outs, -1)

    def sort_segsum(ct, idx):
        # radix sort keys once, segment-sum both features
        flat_idx = idx.reshape(-1)
        order = jnp.argsort(flat_idx)
        sk = flat_idx[order]
        outs = []
        for f in range(2):
            sv = ct[..., f].reshape(-1)[order]
            outs.append(jax.ops.segment_sum(sv, sk, num_segments=TBL))
        return jnp.stack(outs, -1)

    print(f"devices: {jax.devices()}", flush=True)
    timeit("f) 2x fused per-feature scatter", chained(feat_scatter_fused), ct, idx)
    timeit("g) 16x bf16 scalar scatter", chained(feat_scatter_bf16), ct, idx)
    timeit("h) argsort + segment_sum", chained(sort_segsum), ct, idx, iters=2)


if __name__ == "__main__" and os.environ.get("ARG") == "extra":
    extra()
