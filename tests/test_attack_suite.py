"""Attack-suite tests: named-attack sweep decode path, single- and
multi-view, and the epsilon-ball parameter attack projection.

(The reference has no tests; its robustness tooling is exercised only
manually via ``--distortion`` / the adv-attack checkpoint variant.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.api import WatermarkModel
from nerf_signature_tpu.models.ngp import NGPConfig
from nerf_signature_tpu.models.watermark import WatermarkConfig
from nerf_signature_tpu.train.attack import attack_sweep

TINY = NGPConfig(bound=1.0, n_levels=4, log2_hashmap_size=10,
                 finest_resolution=64, compute_dtype=jnp.float32)


class StubTrainer:
    def __init__(self, model, message_dim):
        self.model = model
        self.message_dim = message_dim
        self.rng = np.random.default_rng(0)

    def random_message(self):
        return self.rng.integers(0, 2, self.message_dim).astype(np.int32)

    def log(self, *a, **k):
        pass


def _make(n_views):
    D, bh, bw = 2, 4, 4
    wcfg = WatermarkConfig(ngp=TINY, message_dim=D, n_views=n_views,
                           msg_resolution=64, msg_log2_hashmap_size=10)
    m = WatermarkModel(wcfg=wcfg, grid_size=16, max_steps=32,
                       infer_budget=8, train_budget=8)
    m.occ = m.occ._replace(occupancy=m.occ.occupancy.at[:].set(True))
    rng = np.random.default_rng(0)
    shape = (D, bh, bw, 3) if n_views == 1 else (D, n_views, bh, bw, 3)
    ro = np.zeros(shape, np.float32) - 2.0
    rd = np.tile(np.array([1, 0, 0], np.float32), shape[:-1] + (1,))
    loader = [{"watermark": {"rays_o_block": ro, "rays_d_block": rd}}]
    return StubTrainer(m, D), loader


class TestFinetuneAttack:
    def test_only_hash_table_changes(self):
        """The attacker's update touches ONLY the backbone hash table (ref
        network_finetuning_attack_tcnn-checkpoint.py:231-241 trains just
        ``self.encoder``); msg tables/decoder stay untouched."""
        from nerf_signature_tpu.train.attack import finetune_attack

        tr, _ = _make(1)
        m = tr.model
        rng = np.random.default_rng(1)
        o = np.asarray(rng.normal(0, 0.1, (16, 3)) - [2.0, 0, 0], np.float32)
        d = np.asarray(rng.normal([1, 0, 0], 0.05, (16, 3)), np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        gt = np.full((16, 3), 0.5, np.float32)
        loader = [{"content": {"rays_o": o, "rays_d": d, "images": gt}}]

        bb_before = jax.tree_util.tree_map(np.asarray, m.backbone)
        tr_before = jax.tree_util.tree_map(np.asarray, m.trainable)
        attacked = finetune_attack(tr, loader, steps=2, lr=1e-2, num_rays=16)

        assert not np.array_equal(
            bb_before["hash_table"], np.asarray(attacked["hash_table"])
        )
        for k in bb_before:
            if k == "hash_table":
                continue
            for a, b in zip(jax.tree_util.tree_leaves(bb_before[k]),
                            jax.tree_util.tree_leaves(attacked[k])):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(tr_before),
                        jax.tree_util.tree_leaves(m.trainable)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # full-backbone variant (ref network_finetune_tcnn): the MLPs that
        # shape the rendered image move too
        attacked_full = finetune_attack(tr, loader, steps=2, lr=1e-2,
                                        num_rays=16, full_backbone=True)
        changed = any(
            not np.array_equal(a, np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(bb_before["sigma_net"]),
                            jax.tree_util.tree_leaves(
                                attacked_full["sigma_net"]))
        )
        assert changed


class TestRandomBlockSelection:
    def test_random_blocks_distinct_and_in_bounds(self):
        from nerf_signature_tpu.data.provider_wtmk import select_key_blocks

        img = np.random.default_rng(0).random((32, 32, 3)).astype(np.float32)
        coords, bh, bw = select_key_blocks(
            img, 4, 4, 6, selection="random",
            rng=np.random.default_rng(1),
        )
        assert coords.shape == (6, 4)
        assert bh == 8 and bw == 8
        keys = {tuple(c) for c in coords.tolist()}
        assert len(keys) == 6  # distinct blocks
        assert (coords[:, 2] <= 32).all() and (coords[:, 3] <= 32).all()
        # same rng seed -> reproducible key material
        coords2, _, _ = select_key_blocks(
            img, 4, 4, 6, selection="random", rng=np.random.default_rng(1),
        )
        np.testing.assert_array_equal(coords, coords2)


class TestAttackSweep:
    def test_single_view(self):
        tr, loader = _make(1)
        res = attack_sweep(tr, loader, attacks=["none", "noise_01"], n_test=2)
        assert set(res) == {"none", "noise_01"}
        assert all(0.0 <= v <= 1.0 for v in res.values())

    def test_multi_view(self):
        tr, loader = _make(3)
        res = attack_sweep(tr, loader, attacks=["none", "brightness_1_5"],
                           n_test=2)
        assert set(res) == {"none", "brightness_1_5"}
        assert all(0.0 <= v <= 1.0 for v in res.values())

    def test_whole_image_decoder_mode(self):
        """Whole-image decoder modes (legacy / CopyRNeRF) extract from the
        strided key image, not block bundles — the sweep must agree with
        the trainer's ray selection (wm_rays)."""
        D = 2
        wcfg = WatermarkConfig(ngp=TINY, message_dim=D, msg_resolution=64,
                               msg_log2_hashmap_size=10, whole_image=True)
        m = WatermarkModel(wcfg=wcfg, grid_size=16, max_steps=32,
                           infer_budget=8, train_budget=8)
        m.occ = m.occ._replace(occupancy=m.occ.occupancy.at[:].set(True))
        H = W = 12
        ro = np.zeros((1, H, W, 3), np.float32) - 2.0
        rd = np.tile(np.array([1, 0, 0], np.float32), (1, H, W, 1))
        loader = [{"watermark": {"rays_o": ro, "rays_d": rd}}]
        tr = StubTrainer(m, D)
        res = attack_sweep(tr, loader, attacks=["none"], n_test=2)
        assert 0.0 <= res["none"] <= 1.0
