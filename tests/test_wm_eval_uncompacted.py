"""Block-decode evals must be EXACT — independent of the sample-compaction
fraction the training loop resolved.

Root cause of the round-2 in-train (0.933) vs fresh-process (0.9987) bit-acc
discrepancy: ``resolve_auto_compaction`` sizes ``compact_frac`` from a
CONTENT-ray probe (full-view rays, most missing geometry), but key-block
rays are concentrated on textured surfaces with far higher sample fill —
rendering blocks through that compaction overflows the packed buffer and
silently drops samples.  ``WatermarkTrainer._rc_eval`` now forces
``compact_frac=0`` for every block decode (in-train test_bitacc, eval_blocks,
and the attack suite's decode_batch).
"""

import dataclasses
import types

import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.api import WatermarkModel
from nerf_signature_tpu.data.rays import get_rays
from nerf_signature_tpu.models.ngp import NGPConfig
from nerf_signature_tpu.models.watermark import WatermarkConfig
from nerf_signature_tpu.train.trainer_wtmk import WatermarkTrainer


def _trainer():
    cfg = NGPConfig(bound=1.0, n_levels=4, log2_hashmap_size=10,
                    finest_resolution=64, compute_dtype=jnp.float32)
    wcfg = WatermarkConfig(ngp=cfg, message_dim=2, msg_resolution=64,
                           msg_log2_hashmap_size=10)
    model = WatermarkModel(wcfg, grid_size=16, max_steps=64,
                           train_budget=16, infer_budget=16)
    opt = types.SimpleNamespace(
        seed=0, iters=4, lr=1e-2, lambda_w=0.5, lambda_i=1.0,
        loss_w="bce", distortion="none", message_dim=2, devices=0,
        num_rays=16, compact_frac=-1, bitacc_batch=2,
    )
    return WatermarkTrainer("uc", opt, model, workspace=None,
                            use_checkpoint="scratch", mute=True)


def _wm_data(H=32, W=32):
    pose = np.eye(4, dtype=np.float32)[None]
    pose[0, 2, 3] = -2.0  # camera at -z; this convention looks along +z
    intr = np.array([32.0, 32.0, W / 2, H / 2], np.float32)
    rays = get_rays(pose, intr, H, W, -1)
    ro = np.asarray(rays["rays_o"]).reshape(H, W, 3)
    rd = np.asarray(rays["rays_d"]).reshape(H, W, 3)
    # 2 blocks of 16x16 rays — big enough that N*S (512*16 = 8192 slots)
    # exceeds the 1024-slot compaction floor, so a tiny compact_frac REALLY
    # overflows (the failure mode under test)
    return {
        "rays_o_block": np.stack([ro[:16, :16], ro[16:, 16:]]),
        "rays_d_block": np.stack([rd[:16, :16], rd[16:, 16:]]),
    }


def test_eval_blocks_ignores_train_compaction():
    tr = _trainer()
    m = tr.model
    # fully-occupied grid -> every budget slot fills -> an absurdly small
    # compact_frac WOULD overflow and corrupt the decode if eval used it
    m.occ = m.occ._replace(occupancy=jnp.ones_like(m.occ.occupancy))
    wm = _wm_data()
    msg = np.array([1, 0], np.float32)

    m.rc = dataclasses.replace(m.rc, compact_frac=0.0)
    m.key = __import__("jax").random.PRNGKey(7)
    blocks_exact, dec_exact = tr.eval_blocks(wm, msg)

    m.rc = dataclasses.replace(m.rc, compact_frac=0.01)
    m.key = __import__("jax").random.PRNGKey(7)
    blocks_cmp, dec_cmp = tr.eval_blocks(wm, msg)

    np.testing.assert_allclose(blocks_cmp, blocks_exact, atol=0)
    np.testing.assert_allclose(dec_cmp, dec_exact, atol=0)
    # sanity: the compacted render path REALLY would differ at this frac
    from nerf_signature_tpu.train.trainer_wtmk import _wtmk_decode_blocks
    blocks_bad, _ = _wtmk_decode_blocks(
        m.backbone, m.trainable, m.occ.occupancy,
        jnp.asarray(wm["rays_o_block"]), jnp.asarray(wm["rays_d_block"]),
        jnp.asarray(msg), __import__("jax").random.PRNGKey(7), m.wcfg,
        m.rc, m.infer_budget, "none",
    )
    assert not np.allclose(np.asarray(blocks_bad), blocks_exact)


def test_test_bitacc_ignores_train_compaction():
    tr = _trainer()
    m = tr.model
    m.occ = m.occ._replace(occupancy=jnp.ones_like(m.occ.occupancy))
    wm = _wm_data()

    class _Loader:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __iter__(self):
            for _ in range(self.n):
                yield {"watermark": wm}

    import jax

    m.rc = dataclasses.replace(m.rc, compact_frac=0.0)
    m.key = jax.random.PRNGKey(3)
    tr.rng = np.random.default_rng(3)
    acc_exact = tr.test_bitacc(_Loader(4))

    m.rc = dataclasses.replace(m.rc, compact_frac=0.01)
    m.key = jax.random.PRNGKey(3)
    tr.rng = np.random.default_rng(3)
    acc_cmp = tr.test_bitacc(_Loader(4))

    assert acc_exact == acc_cmp
