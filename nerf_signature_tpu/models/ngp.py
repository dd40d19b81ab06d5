"""Clean instant-NGP field network.

TPU-native equivalent of ``nerf/network_hash.py:13-166``:
  * positions in [-bound, bound] -> [0, 1] -> 16-level hash encoding (32 feats)
  * sigma MLP 32 -> 64 -> (1 + 15); sigma = trunc_exp(h[..., 0])
  * dirs -> SH degree-4 (16 feats) concat geo_feat (15) -> color MLP
    31 -> 64 -> 64 -> 3 -> sigmoid

All pure functions over a params pytree; density/color split mirrors the
reference's ``density()`` / masked ``color()`` API for the occupancy-grid
update and the fixed-step render path.
"""

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.activation import trunc_exp
from ..ops.hashenc import (
    hash_encode,
    hash_encode_2d,
    init_hash_table,
    init_hash_table_sized,
    level_resolutions,
    level_sides,
)
from ..ops.intersect import sph_from_ray
from ..ops.sh import sh_encode
from .mlp import init_mlp, mlp_apply


@dataclasses.dataclass(frozen=True)
class NGPConfig:
    bound: float = 1.0
    n_levels: int = 16
    n_features: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    finest_resolution: int = 2048
    hidden_dim: int = 64
    num_layers: int = 2           # sigma net: num_layers-1 hidden layers
    geo_feat_dim: int = 15
    hidden_dim_color: int = 64
    num_layers_color: int = 3
    sh_degree: int = 4
    density_scale: float = 1.0
    compute_dtype: Any = jnp.bfloat16
    # exact-forward / one-corner-unbiased-backward hash gradients: ~8x fewer
    # table scatter updates, the train-step wall on TPU (PERF.md).  Off by
    # default for exact parity with the reference's gradients.
    stochastic_hash_grad: bool = False
    # backward level subsampling ON TOP of stochastic corners: each sample
    # scatters only every `hash_level_stride`-th level (pseudo-random phase,
    # cotangent scaled by the stride — unbiased; gather-free selection).
    # The hash-gradient scatter is ~44% of the train step (PERF.md round 3),
    # so stride 2 removes ~half of the largest term.  1 = off (default).
    # Only active when stochastic_hash_grad is on.
    hash_level_stride: int = 1
    # Forward corner subsampling: 8 = exact trilinear (default); 1 = gather
    # only the weight-sampled corner per (level, sample) — an unbiased
    # one-sample estimate of the interpolated FEATURE with 8x fewer forward
    # gather rows (the train step's largest engine term, PERF.md round 3/4).
    # The loss gradient is of the estimator and is biased through the
    # nonlinear field (measured ~1 dB at equal wall-clock, PERF.md round 4).
    # TRAIN-STEP ONLY: trainers thread replace(cfg, hash_fwd_corners=k) into
    # their step functions; every eval/render path keeps the model's own cfg
    # (this default), so renders stay exact.  Requires stochastic_hash_grad.
    hash_fwd_corners: int = 8
    # tcnn-style dense storage for coarse levels (collision-free, spatially
    # ordered rows -> gather-engine locality; see ops.hashenc.level_sides).
    # Off by default: the reference's pure-torch encoder hashes every level,
    # and .pth ingestion parity assumes the hashed layout unless densified.
    dense_coarse: bool = False
    # background-sphere model (bg_radius > 0 enables it).  The reference's
    # active networks reference a ``bg_net`` in ``get_params``
    # (``nerf/network_hash.py:164``) but never define it — ``bg_radius > 0``
    # crashes upstream; this is a working TPU-native completion of that
    # feature: 2D hash-encode (theta, phi) on the sphere + SH(dir) -> MLP.
    bg_radius: float = -1.0
    bg_n_levels: int = 4
    bg_log2_hashmap_size: int = 15
    bg_base_resolution: int = 16
    bg_finest_resolution: int = 2048
    bg_hidden_dim: int = 64
    bg_num_layers: int = 2

    @property
    def resolutions(self):
        return tuple(
            level_resolutions(
                self.n_levels, self.base_resolution, self.finest_resolution
            ).tolist()
        )

    @property
    def dense_sides(self):
        if not self.dense_coarse:
            return None
        return level_sides(self.resolutions, self.log2_hashmap_size, True)

    @property
    def enc_dim(self):
        return self.n_levels * self.n_features

    @property
    def sh_dim(self):
        return self.sh_degree**2

    @property
    def bg_resolutions(self):
        return tuple(
            level_resolutions(
                self.bg_n_levels, self.bg_base_resolution,
                self.bg_finest_resolution,
            ).tolist()
        )


def exact_field_cfg(cfg: NGPConfig) -> NGPConfig:
    """The exactness-contract view of a config: same field, exact 8-corner
    forward.  Every eval / render / occupancy-maintenance / pseudo-GT path
    must query the field through this (train-step-only subsampling knobs
    like ``hash_fwd_corners`` never leak into exactness paths)."""
    if cfg.hash_fwd_corners == 8:
        return cfg
    return dataclasses.replace(cfg, hash_fwd_corners=8)


def init_ngp_params(key, cfg: NGPConfig) -> Dict[str, Any]:
    k_hash, k_sigma, k_color, k_bgt, k_bgn = jax.random.split(key, 5)
    sigma_dims = (
        [cfg.enc_dim]
        + [cfg.hidden_dim] * (cfg.num_layers - 1)
        + [1 + cfg.geo_feat_dim]
    )
    color_dims = (
        [cfg.sh_dim + cfg.geo_feat_dim]
        + [cfg.hidden_dim_color] * (cfg.num_layers_color - 1)
        + [3]
    )
    params = {
        "hash_table": (
            init_hash_table_sized(
                k_hash, cfg.dense_sides, cfg.n_features, cfg.log2_hashmap_size
            )
            if cfg.dense_coarse else
            init_hash_table(
                k_hash, cfg.n_levels, cfg.n_features, cfg.log2_hashmap_size
            )
        ),
        "sigma_net": init_mlp(k_sigma, sigma_dims),
        "color_net": init_mlp(k_color, color_dims),
    }
    if cfg.bg_radius > 0:
        bg_dims = (
            [cfg.bg_n_levels * cfg.n_features + cfg.sh_dim]
            + [cfg.bg_hidden_dim] * (cfg.bg_num_layers - 1)
            + [3]
        )
        params["bg_table"] = init_hash_table(
            k_bgt, cfg.bg_n_levels, cfg.n_features, cfg.bg_log2_hashmap_size
        )
        params["bg_net"] = init_mlp(k_bgn, bg_dims)
    return params


def _encode_pos(params, cfg: NGPConfig, x):
    """x in [-bound, bound] -> hash features [N, enc_dim].  Table rows are
    gathered in the compute dtype (bf16 halves gather bandwidth, 1.5x on
    v5e); the fp32 master table still receives exact fp32 gradients."""
    x01 = (x + cfg.bound) / (2.0 * cfg.bound)
    return hash_encode(
        x01, params["hash_table"], cfg.resolutions, cfg.log2_hashmap_size,
        gather_dtype=jnp.dtype(cfg.compute_dtype).name,
        stochastic_grad=cfg.stochastic_hash_grad,
        dense_sides=cfg.dense_sides,
        level_stride=cfg.hash_level_stride,
        fwd_corners=cfg.hash_fwd_corners,
    )


def _sigma_head(params, cfg: NGPConfig, feat):
    h = mlp_apply(params["sigma_net"], feat, compute_dtype=cfg.compute_dtype)
    sigma = trunc_exp(h[..., 0])
    geo_feat = h[..., 1:]
    return sigma, geo_feat


def ngp_density(params, cfg: NGPConfig, x):
    """x: [N, 3] in [-bound, bound] -> dict(sigma [N], geo_feat [N, 15]).
    Ref ``nerf/network_hash.py:104-118``."""
    sigma, geo_feat = _sigma_head(params, cfg, _encode_pos(params, cfg, x))
    return {"sigma": sigma, "geo_feat": geo_feat}


def ngp_color(params, cfg: NGPConfig, d, geo_feat):
    """dirs [N, 3] (unit) + geo_feat [N, 15] -> rgb [N, 3] in [0, 1].
    Ref ``nerf/network_hash.py:121-151`` (masked variant is handled by the
    caller masking outputs — cheaper than gather/scatter on TPU)."""
    sh = sh_encode(d, cfg.sh_degree)
    h = mlp_apply(
        params["color_net"],
        jnp.concatenate([sh, geo_feat], axis=-1),
        compute_dtype=cfg.compute_dtype,
    )
    return jax.nn.sigmoid(h)


def ngp_background(params, cfg: NGPConfig, rays_o, rays_d):
    """Per-ray background colour from the bg-sphere model.

    rays_o/d: [N, 3] -> rgb [N, 3] in [0, 1].  Equivalent of the reference's
    missing ``background(sph, d)`` (``nerf/renderer.py:232-235`` calls it; the
    active networks never define it)."""
    sph = sph_from_ray(rays_o, rays_d, cfg.bg_radius)  # [N, 2] in [-1, 1]
    h2 = hash_encode_2d(
        (sph + 1.0) * 0.5, params["bg_table"], cfg.bg_resolutions,
        cfg.bg_log2_hashmap_size,
        gather_dtype=jnp.dtype(cfg.compute_dtype).name,
    )
    d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    sh = sh_encode(d, cfg.sh_degree)
    h = mlp_apply(
        params["bg_net"],
        jnp.concatenate([h2, sh], axis=-1),
        compute_dtype=cfg.compute_dtype,
    )
    return jax.nn.sigmoid(h)


def ngp_field(params, cfg: NGPConfig, x, d):
    """Fused forward: (sigma [N], rgb [N, 3]).  Ref ``network_hash.py:77-102``."""
    sigma, geo_feat = _sigma_head(params, cfg, _encode_pos(params, cfg, x))
    rgb = ngp_color(params, cfg, d, geo_feat)
    return sigma, rgb
