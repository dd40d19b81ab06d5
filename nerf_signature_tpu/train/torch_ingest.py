"""torch-ngp ``.pth`` checkpoint ingestion.

The reference workflow trains the clean model with torch-ngp and feeds its
``.pth`` into the watermark stage (``load_checkpoint(strict=False)``,
``nerf/utils_wtmk_disen.py:1474-1479``); this module lets users bring those
checkpoints to the TPU framework.

Key mapping (clean model, ``nerf/network_hash.py``):
  * ``encoder.embeddings.{i}.weight`` [2^19, 2]  -> rows i of the fused
    ``hash_table`` [(16*2^19), 2],
  * ``sigma_net.params`` / ``color_net.params``: tcnn ``FullyFusedMLP`` packs
    all layers into ONE flat fp16 vector, each layer a row-major
    [n_out, n_in] matrix with in/out widths padded to multiples of 16;
    we split, transpose to our [in, out] layout and strip padding,
  * ``density_grid`` [CAS, H^3] is MORTON-ordered in torch-ngp
    (``nerf/renderer.py:469``); we permute it to this framework's row-major
    cell order via ``morton3d_invert``.

Watermark extras (``nerf/network_wtmk_tcnn.py``):
  * ``msg_encoder.embeddings.{2i+b}.weight`` -> ``msg_tables[i, b]``,
  * ``msg_decoder.layers.{k}.layers.{0,1}`` (Conv2d OIHW + BatchNorm) and
    ``msg_decoder.linear`` -> the HiDDeN decoder pytree (HWIO layout).

SH basis (VERIFIED, round 3): tcnn SH (``encoder_dir``,
``nerf/network_hash.py:55-61``) has no params, and its basis — tiny-cuda-nn
``encodings/spherical_harmonics.h`` ``sh_enc``, enumerated literally in
``tests/test_sh_tcnn_basis.py`` — matches our ``sh_encode`` (and the
reference's pure-torch ``SHEncoder``) feature-for-feature on UNIT direction
vectors: same order, same signs, same coefficients; tcnn's pure-z² forms
(e.g. ``0.9462 z² − 0.3154``) equal the sphere-restricted forms
(``0.3154 (2z² − x² − y²)``) exactly when ``x²+y²+z² = 1``, which every
caller guarantees (dirs are normalized, ref ``network_hash.py:90``).  An
imported frozen color net therefore renders identically; no basis
permutation is needed.
"""

import numpy as np


def _load_torch_state(path):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt)
    return {k: v.detach().float().numpy() for k, v in state.items()
            if hasattr(v, "detach")}, ckpt


def _unpack_tcnn_mlp(flat, dims):
    """flat: 1-D param vector; dims: true layer dims [in, h, ..., out].
    Returns list of [in, out] float32 matrices (padding stripped)."""

    def pad16(n):
        return ((n + 15) // 16) * 16

    mats, off = [], 0
    padded = [pad16(d) for d in dims]
    for i in range(len(dims) - 1):
        n_in, n_out = padded[i], padded[i + 1]
        w = flat[off : off + n_in * n_out].reshape(n_out, n_in)
        off += n_in * n_out
        mats.append(w[: dims[i + 1], : dims[i]].T.astype(np.float32))
    return mats


def _morton_to_linear_grid(grid, grid_size=128):
    """Permute [CAS, H^3] from Morton cell order to row-major order."""
    from ..ops.morton import morton3d_invert
    import jax.numpy as jnp

    codes = jnp.arange(grid_size**3, dtype=jnp.uint32)
    coords = np.asarray(morton3d_invert(codes))  # [H^3, 3] (x, y, z)
    linear_idx = (
        coords[:, 0].astype(np.int64) * grid_size + coords[:, 1]
    ) * grid_size + coords[:, 2]
    out = np.empty_like(grid)
    out[:, linear_idx] = grid
    return out


def ingest_clean_pth(path, cfg):
    """Returns (params dict for the clean NGP, extras dict with density_grid/
    mean_density if present)."""
    state, ckpt = _load_torch_state(path)

    n_levels = cfg.n_levels
    tables = [state[f"encoder.embeddings.{i}.weight"] for i in range(n_levels)]
    if cfg.dense_coarse:
        # densify coarse levels: copy the hashed row every dense cell maps
        # to.  Colliding cells share one row upstream, so each dense cell
        # receives exactly the value the reference would have looked up —
        # the encode output is bit-identical (gradients then diverge:
        # collision-free training, which is the point of dense storage).
        from ..ops.hashenc import _hash3, level_sides
        import jax.numpy as jnp

        sides = level_sides(cfg.resolutions, cfg.log2_hashmap_size, True)
        for i, side in enumerate(sides):
            if not side:
                continue
            ax = np.arange(side, dtype=np.uint32)
            cx, cy, cz = np.meshgrid(ax, ax, ax, indexing="ij")
            h = np.asarray(_hash3(jnp.asarray(cx.ravel()),
                                  jnp.asarray(cy.ravel()),
                                  jnp.asarray(cz.ravel()),
                                  cfg.log2_hashmap_size))
            tables[i] = tables[i][h]
    hash_table = np.concatenate(tables, axis=0).astype(np.float32)

    sigma_dims = [cfg.enc_dim] + [cfg.hidden_dim] * (cfg.num_layers - 1) + [
        1 + cfg.geo_feat_dim
    ]
    color_dims = [cfg.sh_dim + cfg.geo_feat_dim] + [
        cfg.hidden_dim_color
    ] * (cfg.num_layers_color - 1) + [3]

    params = {
        "hash_table": hash_table,
        "sigma_net": _unpack_tcnn_mlp(state["sigma_net.params"], sigma_dims),
        "color_net": _unpack_tcnn_mlp(state["color_net.params"], color_dims),
    }

    extras = {}
    if "density_grid" in state:
        g = state["density_grid"]
        if g.ndim == 1:
            g = g.reshape(1, -1)
        H = round(g.shape[-1] ** (1 / 3))
        extras["density_grid"] = _morton_to_linear_grid(g, H)
    for k in ("mean_count", "mean_density"):
        if k in ckpt:
            extras[k] = ckpt[k]
    return params, extras


def _conv_to_hwio(w):
    return np.transpose(w, (2, 3, 1, 0)).astype(np.float32)  # OIHW -> HWIO


def ingest_wtmk_pth(path, wcfg):
    """Returns (backbone params, trainable {msg_tables, decoder}, extras)."""
    backbone, extras = ingest_clean_pth(path, wcfg.ngp)
    state, _ = _load_torch_state(path)

    D = wcfg.message_dim
    msg = np.stack(
        [
            np.stack(
                [state[f"msg_encoder.embeddings.{2*i + b}.weight"] for b in (0, 1)]
            )
            for i in range(D)
        ]
    ).astype(np.float32)  # [D, 2, T, F]

    dec_cfg = wcfg.decoder
    blocks = []
    for k in range(dec_cfg.num_blocks + 1):  # +1: the head block
        conv_w = state[f"msg_decoder.layers.{k}.layers.0.weight"]
        conv_b = state[f"msg_decoder.layers.{k}.layers.0.bias"]
        bn_w = state[f"msg_decoder.layers.{k}.layers.1.weight"]
        bn_b = state[f"msg_decoder.layers.{k}.layers.1.bias"]
        blocks.append({
            "conv": {"w": _conv_to_hwio(conv_w), "b": conv_b.astype(np.float32)},
            "bn": {"scale": bn_w.astype(np.float32),
                   "bias": bn_b.astype(np.float32)},
        })
    decoder = {
        "blocks": blocks[:-1],
        "head": blocks[-1],
        "linear": {
            "w": state["msg_decoder.linear.weight"].T.astype(np.float32),
            "b": state["msg_decoder.linear.bias"].astype(np.float32),
        },
    }
    trainable = {"msg_tables": msg, "decoder": decoder}
    return backbone, trainable, extras
