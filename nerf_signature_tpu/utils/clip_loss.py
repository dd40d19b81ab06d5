"""CLIP text-image guidance loss for GT-free poses — in-graph, differentiable.

Equivalent of the reference's ``nerf/clip_utils.py:11-64`` (``CLIPLoss``):
negative cosine similarity between CLIP embeddings of the rendered image and
a text prompt, applied to batches WITHOUT ground truth when training with
random poses (``--rand_pose`` / ``--clip_text``; ref ``nerf/utils.py:
474-489`` — upstream the branch exists but its CLIP prep is commented out,
so this is a working completion).

A torch-side CLIP cannot back-propagate into a JAX train step, so the
VISION tower (ViT) runs natively in jnp — jittable and differentiable, the
whole render->encode->cosine loss is one fused XLA program.  Text features
need no gradients and are embedded once at startup through the torch model.

Weights resolve from ``transformers`` (``openai/clip-vit-base-patch32`` or a
local path via ``--clip_model``); in a zero-egress image with no local
weights the loss is UNAVAILABLE and consumers must fail with an explicit
message (never silently no-op).  The jnp ViT is parity-tested against a
randomly initialised ``transformers`` CLIP vision model
(``tests/test_clip.py``) so correctness does not depend on real weights.
"""

import jax
import jax.numpy as jnp
import numpy as np

_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


# --------------------------------------------------------------- ingestion
def clip_vision_params_from_torch(model):
    """Convert a ``transformers`` CLIP vision tower (+ visual projection) to
    a jnp pytree.  ``model``: CLIPModel or CLIPVisionModelWithProjection."""
    def arr(t):
        return jnp.asarray(t.detach().cpu().numpy(), jnp.float32)

    vm = getattr(model, "vision_model", None) or model.clip.vision_model
    cfg = vm.config
    emb = vm.embeddings
    params = {
        "class_embedding": arr(emb.class_embedding),
        # Conv2d(3, D, patch, patch, bias=False) [D, 3, p, p] -> HWIO
        "patch_embedding": jnp.transpose(
            arr(emb.patch_embedding.weight), (2, 3, 1, 0)
        ),
        "position_embedding": arr(emb.position_embedding.weight),
        "pre_ln": {"scale": arr(vm.pre_layrnorm.weight),
                   "bias": arr(vm.pre_layrnorm.bias)},
        "post_ln": {"scale": arr(vm.post_layernorm.weight),
                    "bias": arr(vm.post_layernorm.bias)},
        "proj": jnp.transpose(arr(model.visual_projection.weight)),  # [D, P]
        "layers": [],
    }
    for lyr in vm.encoder.layers:
        a = lyr.self_attn
        params["layers"].append({
            "ln1": {"scale": arr(lyr.layer_norm1.weight),
                    "bias": arr(lyr.layer_norm1.bias)},
            "ln2": {"scale": arr(lyr.layer_norm2.weight),
                    "bias": arr(lyr.layer_norm2.bias)},
            # torch Linear stores [out, in]; transpose to [in, out]
            "q_w": jnp.transpose(arr(a.q_proj.weight)), "q_b": arr(a.q_proj.bias),
            "k_w": jnp.transpose(arr(a.k_proj.weight)), "k_b": arr(a.k_proj.bias),
            "v_w": jnp.transpose(arr(a.v_proj.weight)), "v_b": arr(a.v_proj.bias),
            "o_w": jnp.transpose(arr(a.out_proj.weight)), "o_b": arr(a.out_proj.bias),
            "fc1_w": jnp.transpose(arr(lyr.mlp.fc1.weight)),
            "fc1_b": arr(lyr.mlp.fc1.bias),
            "fc2_w": jnp.transpose(arr(lyr.mlp.fc2.weight)),
            "fc2_b": arr(lyr.mlp.fc2.bias),
        })
    meta = {
        "n_heads": cfg.num_attention_heads,
        "patch": cfg.patch_size,
        "image_size": cfg.image_size,
        "act": getattr(cfg, "hidden_act", "quick_gelu"),
    }
    return params, meta


# ----------------------------------------------------------------- forward
def _ln(p, x, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _act(kind, x):
    if kind == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


def _attn(lp, x, n_heads):
    B, T, D = x.shape
    hd = D // n_heads

    def split(h):
        return h.reshape(B, T, n_heads, hd).transpose(0, 2, 1, 3)

    q = split(x @ lp["q_w"] + lp["q_b"]) * (hd ** -0.5)
    k = split(x @ lp["k_w"] + lp["k_b"])
    v = split(x @ lp["v_w"] + lp["v_b"])
    w = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2), axis=-1)
    o = (w @ v).transpose(0, 2, 1, 3).reshape(B, T, D)
    return o @ lp["o_w"] + lp["o_b"]


def clip_image_features(params, meta, images):
    """images: [B, S, S, 3] already resized to meta['image_size'] and in
    [0, 1].  Returns L2-normalised projected features [B, P]."""
    x = (images - _CLIP_MEAN) / _CLIP_STD
    p = meta["patch"]
    x = jax.lax.conv_general_dilated(
        x, params["patch_embedding"], (p, p), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B, S/p, S/p, D]
    B = x.shape[0]
    D = x.shape[-1]
    x = x.reshape(B, -1, D)
    cls = jnp.broadcast_to(params["class_embedding"], (B, 1, D))
    x = jnp.concatenate([cls, x], axis=1) + params["position_embedding"]
    x = _ln(params["pre_ln"], x)
    for lp in params["layers"]:
        x = x + _attn(lp, _ln(lp["ln1"], x), meta["n_heads"])
        h = _ln(lp["ln2"], x)
        h = _act(meta["act"], h @ lp["fc1_w"] + lp["fc1_b"])
        x = x + (h @ lp["fc2_w"] + lp["fc2_b"])
    pooled = _ln(params["post_ln"], x[:, 0])
    feats = pooled @ params["proj"]
    return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)


def clip_guidance_loss(params, meta, text_features, images):
    """-mean cos(text, image) for rendered images [B, H, W, 3] in [0, 1];
    differentiable wrt images (ref ``clip_utils.py:49-64``)."""
    S = meta["image_size"]
    x = jax.image.resize(images, (images.shape[0], S, S, 3), "bilinear")
    x = jnp.clip(x, 0.0, 1.0)
    feats = clip_image_features(params, meta, x)
    sim = jnp.mean(feats @ text_features.T)
    return -sim


# -------------------------------------------------------------- host shell
class CLIPLoss:
    """Host-side resolver: loads weights (or marks itself unavailable with
    the reason), embeds the text prompt once, exposes the jnp params."""

    def __init__(self, model_name="openai/clip-vit-base-patch32"):
        self.available = False
        self.params = self.meta = self.text_features = None
        try:
            import torch  # noqa: F401
            from transformers import CLIPModel, CLIPProcessor

            self._model = CLIPModel.from_pretrained(model_name)
            self._processor = CLIPProcessor.from_pretrained(model_name)
            self._model.eval()
            self.params, self.meta = clip_vision_params_from_torch(self._model)
            self.available = True
        except Exception as e:  # no weights in a zero-egress image
            self.error = (
                f"CLIP weights unavailable ({model_name}): {e}. "
                "Provide a local model path via --clip_model."
            )

    def prepare_text(self, texts):
        if not self.available:
            return
        import torch

        if isinstance(texts, str):
            texts = [texts]
        inputs = self._processor(text=texts, return_tensors="pt", padding=True)
        with torch.no_grad():
            tf = self._model.get_text_features(**inputs)
            tf = tf / tf.norm(dim=-1, keepdim=True)
        self.text_features = jnp.asarray(tf.cpu().numpy(), jnp.float32)

    def __call__(self, images):
        """Eval-style host entry: scalar loss for [B, H, W, 3] in [0, 1]."""
        if not self.available:
            raise RuntimeError(self.error)
        return float(clip_guidance_loss(
            self.params, self.meta, self.text_features,
            jnp.asarray(images, jnp.float32),
        ))
