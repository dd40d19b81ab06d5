"""Measure sequential vs message-batched ownership verification on the
real chip (the per-dispatch-latency win recorded in PERF.md)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from nerf_signature_tpu.models.ngp import NGPConfig
from nerf_signature_tpu.models.watermark import (
    WatermarkConfig, init_watermark_params,
)
from nerf_signature_tpu.ops.grid import init_occupancy_grid
from nerf_signature_tpu.render.renderer import RenderConfig
from nerf_signature_tpu.train.trainer_wtmk import (
    _wtmk_decode_blocks, _wtmk_decode_blocks_batched,
)

D, bh, bw = 16, 16, 16
cfg = NGPConfig(bound=1.0, compute_dtype=jnp.bfloat16)
wcfg = WatermarkConfig(ngp=cfg, message_dim=D)
rc = RenderConfig(bound=1.0, grid_size=128, max_steps=1024)
p = init_watermark_params(jax.random.PRNGKey(0), wcfg)
occ = init_occupancy_grid(1.0, 128)
occupancy = occ.occupancy.at[:, 48:80, 48:80, 48:80].set(True)

rng = np.random.default_rng(0)
ro = jnp.asarray(rng.normal(0, 0.05, (D, bh, bw, 3)) - [2.0, 0, 0],
                 jnp.float32)
rd = np.tile(np.array([1.0, 0, 0], np.float32), (D, bh, bw, 1))
rd += rng.normal(0, 0.02, rd.shape)
rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))

msgs = jnp.asarray(rng.integers(0, 2, (16, D)).astype(np.int32))
keys = jax.random.split(jax.random.PRNGKey(1), 16)

# sequential: one dispatch per message
_, d0 = _wtmk_decode_blocks(p["backbone"], p["trainable"], occupancy, ro, rd,
                            msgs[0], keys[0], wcfg, rc, 128, "none")
float(jnp.sum(d0))  # compile
t0 = time.perf_counter()
s = 0.0
for i in range(16):
    _, d = _wtmk_decode_blocks(p["backbone"], p["trainable"], occupancy, ro,
                               rd, msgs[i], keys[i], wcfg, rc, 128, "none")
    s += float(jnp.sum(d))
t_seq = time.perf_counter() - t0

# batched: 2 dispatches of 8
db = _wtmk_decode_blocks_batched(p["backbone"], p["trainable"], occupancy,
                                 ro, rd, msgs[:8], keys[:8], wcfg, rc, 128,
                                 "none")
float(jnp.sum(db))  # compile
t0 = time.perf_counter()
s2 = 0.0
for g in range(2):
    db = _wtmk_decode_blocks_batched(
        p["backbone"], p["trainable"], occupancy, ro, rd,
        msgs[g * 8:(g + 1) * 8], keys[g * 8:(g + 1) * 8], wcfg, rc, 128,
        "none",
    )
    s2 += float(jnp.sum(db))
t_bat = time.perf_counter() - t0
print(f"sequential 16 msgs: {t_seq:.2f}s   batched (2x8): {t_bat:.2f}s   "
      f"speedup {t_seq / t_bat:.1f}x")
