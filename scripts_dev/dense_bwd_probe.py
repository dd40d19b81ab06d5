"""Probe: dense-accumulation backward for coarse hash levels (VERDICT r4
next #1c) — can a dense coarse level's table gradient (tiny row count:
side**3 = 5832...205379 rows vs 2^19 hashed) be accumulated FASTER than the
generic per-feature scalar scatter-add?

Candidate mechanisms, measured on the real chip with the relay-safe
protocol (scalar-chained programs + float() materialisation — see
scatter_bench.py):

  a) per-feature scalar scatter-add (the current backward, control),
     restricted to one level's population;
  b) chunked one-hot matmul: grad = one_hot(idx, R).T @ ct, computed in
     sample chunks so the [Mc, R] mask stays bounded — moves the work to
     the MXU, but materialises M*R mask bytes of HBM traffic;
  c) same in f32 (exact-dtype accumulation, no bf16 rounding of ct).

Also measured: how the JOINT scatter scales with level count ([16,M] vs
[12,M] vs [8,M] populations) — the direct headroom of removing levels from
the scatter by ANY mechanism (dense-bwd split-off or table-geometry L8).
Prior facts this probe tests against (PERF.md): the scatter is
update-rate-bound at ~49 M upd/s and TABLE-SIZE-INSENSITIVE, and
argsort+segment_sum is 4.6 s — so the one-hot matmul is the only untried
mechanism; its predicted cost is bandwidth (M*R mask bytes), which at
R >= 5832 already exceeds the scatter's per-level cost unless the MXU path
fuses the comparison into the dot (XLA does not, on current Mosaic).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

S = 19
L = 16
M = int(os.environ.get("PROBE_M", str(4096 * 128 // 4)))  # compact-0.25 pop
F = 2


def timeit(name, fn, *args, iters=5):
    s = jnp.float32(0.0)
    s = fn(s, *args)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s, *args)
    float(s)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:9.2f} ms", flush=True)
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
    print(f"devices: {jax.devices()}  M={M}", flush=True)

    # ---- joint-scatter level scaling (the headroom measurement) ----------
    ct = jax.random.uniform(k1, (L, M, F), jnp.float32)
    idx = jax.random.randint(k2, (L, M), 0, L << S, jnp.int32)

    def joint_scatter(ct, idx, lvls):
        acc0 = jnp.zeros(((L << S),), jnp.float32)
        outs = []
        for f in range(F):
            outs.append(acc0.at[idx[:lvls].reshape(-1)].add(
                ct[:lvls, :, f].reshape(-1)))
        return jnp.stack(outs, -1)

    for lvls in (16, 12, 8):
        timeit(f"joint per-feature scatter, {lvls} levels",
               chained(lambda ct, idx, lv=lvls: joint_scatter(ct, idx, lv)),
               ct, idx)

    # ---- per-level mechanisms at dense-coarse row counts ------------------
    for R in (5832, 19683, 64000):
        idx_l = jax.random.randint(jax.random.PRNGKey(R), (M,), 0, R,
                                   jnp.int32)
        ct_l = jax.random.uniform(jax.random.PRNGKey(R + 1), (M, F),
                                  jnp.float32)

        def scatter_one(ct_l, idx_l, R=R):
            outs = []
            for f in range(F):
                outs.append(jnp.zeros((R,), jnp.float32).at[idx_l].add(
                    ct_l[:, f]))
            return jnp.stack(outs, -1)

        def onehot_mm(ct_l, idx_l, R=R, dtype=jnp.bfloat16, chunk=16384):
            chunk = min(chunk, M)
            iota = jnp.arange(R, dtype=jnp.int32)

            def body(acc, args):
                ic, cc = args
                oh = (ic[:, None] == iota[None, :]).astype(dtype)
                return acc + jax.lax.dot_general(
                    oh, cc.astype(dtype), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ), None

            n = M // chunk
            acc0 = jnp.zeros((R, F), jnp.float32)
            acc, _ = jax.lax.scan(
                body, acc0,
                (idx_l[: n * chunk].reshape(n, chunk),
                 ct_l[: n * chunk].reshape(n, chunk, F)),
            )
            return acc

        timeit(f"R={R:6d} a) per-feature scatter", chained(scatter_one),
               ct_l, idx_l)
        timeit(f"R={R:6d} b) one-hot matmul bf16",
               chained(lambda c, i, R=R: onehot_mm(c, i, R, jnp.bfloat16)),
               ct_l, idx_l, iters=3)
        timeit(f"R={R:6d} c) one-hot matmul f32",
               chained(lambda c, i, R=R: onehot_mm(c, i, R, jnp.float32)),
               ct_l, idx_l, iters=3)


if __name__ == "__main__":
    main()
