"""Probe: is per-sample level subsampling of the hash-gradient scatter a win?

The stochastic-corner backward scatters one update per (level, sample):
[L=16, M=131k] x F=2 -> 4.2M updates at the measured 50 M upd/s = ~84 ms,
the largest term of the train step.  Subsampling K of L levels per sample
(scaled L/K, unbiased) would cut the scatter to K/L of that — IF selecting
the (idx, ct) rows for the chosen levels is cheap.  This probes the three
candidate selection layouts plus the end-to-end subsampled scatter, all
marginal-fit over chained instances so the dispatch tax drops out.

Run on the real chip: python scripts_dev/level_sample_probe.py
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

L, M, F = 16, 131072, 2
T = L * (1 << 19)
KS = (1, 2, 4)
REPS = 5


def _time(fn, *args):
    s = jnp.float32(0.0)
    s = fn(s, *args)
    float(s)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        s = fn(s, *args)
        float(s)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def _fit(ks, ts):
    A = np.stack([np.ones(len(ks)), np.asarray(ks, np.float64)], 1)
    c, *_ = np.linalg.lstsq(A, np.asarray(ts, np.float64), rcond=None)
    return float(c[0]), float(c[1])


def probe(name, make, args, ks=KS):
    ts = [_time(make(k), *args) for k in ks]
    a, b = _fit(ks, ts)
    print(f"  {name}: " + " ".join(f"K={k}:{t:.1f}ms" for k, t in zip(ks, ts))
          + f"  -> slope {b:.2f} ms/inst", flush=True)
    return b


def main():
    rng = np.random.default_rng(0)
    print(f"chip = {jax.devices()[0]}", flush=True)
    idx = jnp.asarray(rng.integers(0, T, (L, M)), jnp.int32)
    ct = jnp.asarray(rng.normal(0, 1, (L, M, F)), jnp.float32)
    phase = jnp.asarray(rng.integers(0, 2, (M,)), jnp.int32)

    # baseline: full scatter, per-feature (the current backward)
    def make_full(KK):
        @jax.jit
        def prog(s, idx, ct):
            acc = s
            for k in range(KK):
                i = (idx + k) % T
                for f in range(F):
                    z = jnp.zeros((T,), jnp.float32).at[i.reshape(-1)].add(
                        ct[..., f].reshape(-1))
                    acc = acc + z[0] * 1e-9
            return acc
        return prog

    print("\n== full scatter (L*M*F = 4.2M upd/inst) ==")
    b_full = probe("full", make_full, (idx, ct))

    # A: stride-2 level subsample via take_along_axis on [L, M] arrays
    def make_sub_taa(KK):
        @jax.jit
        def prog(s, idx, ct, phase):
            acc = s
            lvl = (phase[None, :] + jnp.arange(L // 2)[:, None] * 2) % L
            for k in range(KK):
                i = jnp.take_along_axis((idx + k) % T, lvl, axis=0)
                for f in range(F):
                    c = jnp.take_along_axis(ct[..., f], lvl, axis=0) * 2.0
                    z = jnp.zeros((T,), jnp.float32).at[i.reshape(-1)].add(
                        c.reshape(-1))
                    acc = acc + z[0] * 1e-9
            return acc
        return prog

    print("\n== subsampled, take_along_axis layout (2.1M upd/inst) ==")
    b_taa = probe("sub-taa", make_sub_taa, (idx, ct, phase))

    # B: even/odd static-slice halves selected by where(phase) — static
    # slices are free; each sample keeps its own half by select
    def make_sub_sel(KK):
        @jax.jit
        def prog(s, idx, ct, phase):
            acc = s
            for k in range(KK):
                i = (idx + k) % T
                ev_i, od_i = i[0::2], i[1::2]          # [L/2, M]
                pick = (phase[None, :] == 0)
                i_s = jnp.where(pick, ev_i, od_i)
                for f in range(F):
                    ev_c, od_c = ct[0::2, :, f], ct[1::2, :, f]
                    c_s = jnp.where(pick, ev_c, od_c) * 2.0
                    z = jnp.zeros((T,), jnp.float32).at[i_s.reshape(-1)].add(
                        c_s.reshape(-1))
                    acc = acc + z[0] * 1e-9
            return acc
        return prog

    print("\n== subsampled, static-slice + select layout (2.1M upd/inst) ==")
    b_sel = probe("sub-select", make_sub_sel, (idx, ct, phase))

    print(f"\nfull {b_full:.1f} ms vs taa {b_taa:.1f} ms vs select "
          f"{b_sel:.1f} ms per instance; win = full - best "
          f"= {b_full - min(b_taa, b_sel):.1f} ms/step if selection is the "
          f"bottleneck-free layout", flush=True)


if __name__ == "__main__":
    main()
