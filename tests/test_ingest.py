"""torch-ngp .pth ingestion tests against synthetic torch checkpoints."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nerf_signature_tpu.models.ngp import NGPConfig
from nerf_signature_tpu.models.watermark import WatermarkConfig
from nerf_signature_tpu.train.torch_ingest import (
    _unpack_tcnn_mlp,
    ingest_clean_pth,
    ingest_wtmk_pth,
)


def _pad16(n):
    return ((n + 15) // 16) * 16


def _pack_tcnn(mats_in_out):
    """Inverse of _unpack: mats are [in, out]; pack padded row-major [out, in]."""
    flat = []
    for w in mats_in_out:
        n_in, n_out = w.shape
        p = np.zeros((_pad16(n_out), _pad16(n_in)), np.float32)
        p[:n_out, :n_in] = w.T
        flat.append(p.reshape(-1))
    return np.concatenate(flat)


def _make_clean_state(cfg, rng):
    state = {}
    for i in range(cfg.n_levels):
        state[f"encoder.embeddings.{i}.weight"] = torch.from_numpy(
            rng.normal(0, 1e-4, (1 << cfg.log2_hashmap_size, 2)).astype(np.float32)
        )
    sigma_dims = [cfg.enc_dim, cfg.hidden_dim, 1 + cfg.geo_feat_dim]
    color_dims = [cfg.sh_dim + cfg.geo_feat_dim, cfg.hidden_dim_color,
                  cfg.hidden_dim_color, 3]
    sig_mats = [rng.normal(0, 0.1, (sigma_dims[i], sigma_dims[i + 1])).astype(np.float32)
                for i in range(len(sigma_dims) - 1)]
    col_mats = [rng.normal(0, 0.1, (color_dims[i], color_dims[i + 1])).astype(np.float32)
                for i in range(len(color_dims) - 1)]
    state["sigma_net.params"] = torch.from_numpy(_pack_tcnn(sig_mats))
    state["color_net.params"] = torch.from_numpy(_pack_tcnn(col_mats))
    return state, sig_mats, col_mats


class TestUnpack:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        dims = [32, 64, 16]
        mats = [rng.normal(size=(32, 64)).astype(np.float32),
                rng.normal(size=(64, 16)).astype(np.float32)]
        flat = _pack_tcnn(mats)
        out = _unpack_tcnn_mlp(flat, dims)
        for a, b in zip(mats, out):
            np.testing.assert_allclose(a, b, rtol=1e-6)

    def test_padded_dims(self):
        rng = np.random.default_rng(1)
        dims = [31, 64, 3]  # 31 -> pad 32, 3 -> pad 16
        mats = [rng.normal(size=(31, 64)).astype(np.float32),
                rng.normal(size=(64, 3)).astype(np.float32)]
        flat = _pack_tcnn(mats)
        out = _unpack_tcnn_mlp(flat, dims)
        for a, b in zip(mats, out):
            np.testing.assert_allclose(a, b, rtol=1e-6)


class TestCleanIngest:
    def test_ingest(self, tmp_path):
        cfg = NGPConfig(n_levels=4, log2_hashmap_size=8)
        rng = np.random.default_rng(0)
        state, sig, col = _make_clean_state(cfg, rng)
        path = str(tmp_path / "clean.pth")
        torch.save({"model": state, "mean_density": 0.5}, path)

        params, extras = ingest_clean_pth(path, cfg)
        assert params["hash_table"].shape == (4 * 256, 2)
        np.testing.assert_allclose(params["sigma_net"][0], sig[0], rtol=1e-6)
        np.testing.assert_allclose(params["color_net"][2], col[2], rtol=1e-6)
        assert extras["mean_density"] == 0.5


class TestWtmkIngest:
    def test_ingest(self, tmp_path):
        cfg = NGPConfig(n_levels=4, log2_hashmap_size=8)
        wcfg = WatermarkConfig(ngp=cfg, message_dim=2,
                               msg_log2_hashmap_size=8)
        rng = np.random.default_rng(0)
        state, _, _ = _make_clean_state(cfg, rng)
        for j in range(4):  # 2*message_dim msg tables
            state[f"msg_encoder.embeddings.{j}.weight"] = torch.from_numpy(
                rng.normal(0, 1e-4, (256, 2)).astype(np.float32)
            )
        ch, nb = 64, 8
        cin = 3
        for k in range(nb + 1):
            cout = ch if k < nb else 1
            state[f"msg_decoder.layers.{k}.layers.0.weight"] = torch.from_numpy(
                rng.normal(0, 0.1, (cout, cin, 3, 3)).astype(np.float32))
            state[f"msg_decoder.layers.{k}.layers.0.bias"] = torch.from_numpy(
                rng.normal(0, 0.1, (cout,)).astype(np.float32))
            state[f"msg_decoder.layers.{k}.layers.1.weight"] = torch.from_numpy(
                np.ones(cout, np.float32))
            state[f"msg_decoder.layers.{k}.layers.1.bias"] = torch.from_numpy(
                np.zeros(cout, np.float32))
            cin = cout
        state["msg_decoder.linear.weight"] = torch.from_numpy(
            rng.normal(size=(1, 1)).astype(np.float32))
        state["msg_decoder.linear.bias"] = torch.from_numpy(
            np.zeros(1, np.float32))

        path = str(tmp_path / "wm.pth")
        torch.save({"model": state}, path)

        backbone, trainable, extras = ingest_wtmk_pth(path, wcfg)
        assert trainable["msg_tables"].shape == (2, 2, 256, 2)
        assert len(trainable["decoder"]["blocks"]) == nb
        # conv HWIO layout
        assert trainable["decoder"]["blocks"][0]["conv"]["w"].shape == (3, 3, 3, 64)
        assert trainable["decoder"]["head"]["conv"]["w"].shape == (3, 3, 64, 1)


class TestDenseCoarseIngest:
    def test_densified_encode_matches_hashed(self, tmp_path):
        """Ingesting with dense_coarse=True must reproduce the hashed
        layout's encode output exactly (dense[cell] = hashed[hash(cell)])."""
        import jax
        import jax.numpy as jnp

        from nerf_signature_tpu.ops.hashenc import hash_encode

        rng = np.random.default_rng(3)
        cfg_h = NGPConfig(n_levels=4, log2_hashmap_size=10,
                          base_resolution=4, finest_resolution=64)
        cfg_d = NGPConfig(n_levels=4, log2_hashmap_size=10,
                          base_resolution=4, finest_resolution=64,
                          dense_coarse=True)
        state, _, _ = _make_clean_state(
            NGPConfig(n_levels=4, log2_hashmap_size=10), rng
        )
        path = str(tmp_path / "clean_dc.pth")
        torch.save({"model": state}, path)

        ph, _ = ingest_clean_pth(path, cfg_h)
        pd, _ = ingest_clean_pth(path, cfg_d)
        assert any(cfg_d.dense_sides)
        assert pd["hash_table"].shape[0] != ph["hash_table"].shape[0]

        x = jax.random.uniform(jax.random.PRNGKey(0), (64, 3))
        out_h = hash_encode(x, jnp.asarray(ph["hash_table"]),
                            cfg_h.resolutions, 10)
        out_d = hash_encode(x, jnp.asarray(pd["hash_table"]),
                            cfg_d.resolutions, 10,
                            dense_sides=cfg_d.dense_sides)
        np.testing.assert_allclose(np.asarray(out_h), np.asarray(out_d),
                                   rtol=1e-6)
