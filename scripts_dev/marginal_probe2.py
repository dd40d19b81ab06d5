"""Follow-up marginal probes (see marginal_probe.py):

1. scatter re-fit over K in {1,2,3,4} — the K=8 scatter program went
   super-linear (buffer pressure), poisoning the least-squares fit.
2. coarse-table bool gather: 32^3 table (32 KB — VMEM-resident class) at the
   pre-filter candidate population, to size the march coarse-pre-filter win.
3. fine bool gather at the REDUCED population the pre-filter would leave.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_RAYS = 4096
REPS = 6


def _time_program(fn, *args):
    s = jnp.float32(0.0)
    s = fn(s, *args)
    float(s)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        s = fn(s, *args)
        float(s)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1e3


def _fit(ks, ts):
    A = np.stack([np.ones(len(ks)), np.asarray(ks, np.float64)], axis=1)
    coef, *_ = np.linalg.lstsq(A, np.asarray(ts, np.float64), rcond=None)
    return float(coef[0]), float(coef[1])


def probe(name, make_prog, args, pop, unit, ks=(1, 2, 3, 4)):
    ts = []
    for K in ks:
        t = _time_program(make_prog(K), *args)
        ts.append(t)
        print(f"  {name} K={K}: {t:8.2f} ms", flush=True)
    a, b = _fit(ks, ts)
    rate = pop / (b * 1e-3)
    print(f"  -> intercept {a:7.2f} ms  slope {b:7.2f} ms/op  "
          f"marginal rate {rate / 1e6:10.1f} M {unit}/s", flush=True)
    return rate


def main():
    rng = np.random.default_rng(0)
    T = 8388608
    print(f"chip = {jax.devices()[0]}", flush=True)

    # 1. scatter re-fit at K <= 4
    sidx = jnp.asarray(rng.integers(0, T, (4194304,)), jnp.int32)
    upd = jnp.asarray(rng.normal(0, 1, (4194304, 2)), jnp.float32)

    def make_scatter(K):
        @jax.jit
        def prog(s, i, u):
            acc = s
            for k in range(K):
                z = jnp.zeros((T, 2), jnp.float32).at[(i + k + 1) % T].add(u)
                acc = acc + jnp.sum(z) * 1e-12
            return acc
        return prog

    print("\n== fp32 scatter-add re-fit (8.4M upd / instance, K<=4) ==")
    probe("scatter", make_scatter, (sidx, upd), 2 * 4194304, "upd")

    # 2. coarse 32^3 bool gather at the pre-filter population
    occ_c = jnp.asarray(rng.random(32 ** 3) < 0.15)
    cidx = jnp.asarray(rng.integers(0, 32 ** 3, (N_RAYS, 256)), jnp.int32)

    def make_coarse(K):
        @jax.jit
        def prog(s, o, i):
            acc = s
            for k in range(K):
                acc = acc + jnp.sum(
                    o[(i + k + 1) % o.shape[0]].astype(jnp.float32)) * 1e-9
            return acc
        return prog

    print("\n== coarse 32^3 bool gather (1.05M idx / instance) ==")
    probe("coarse-gather", make_coarse, (occ_c, cidx), N_RAYS * 256, "idx",
          ks=(1, 2, 4, 8))

    # 3. fine bool gather at the reduced (512/ray) population
    occ_f = jnp.asarray(rng.random(128 ** 3) < 0.065)
    fidx = jnp.asarray(rng.integers(0, 128 ** 3, (N_RAYS, 512)), jnp.int32)

    def make_fine(K):
        @jax.jit
        def prog(s, o, i):
            acc = s
            for k in range(K):
                acc = acc + jnp.sum(
                    o[(i + k + 1) % o.shape[0]].astype(jnp.float32)) * 1e-9
            return acc
        return prog

    print("\n== fine bool gather at 512/ray (2.1M idx / instance) ==")
    probe("fine-gather", make_fine, (occ_f, fidx), N_RAYS * 512, "idx",
          ks=(1, 2, 4, 8))


if __name__ == "__main__":
    main()
