"""CLIP text-image guidance loss for GT-free poses.

Equivalent of the reference's ``nerf/clip_utils.py:11-64`` (``CLIPLoss``):
negative cosine similarity between CLIP embeddings of the rendered image and
a text prompt, used when training with random poses (``--rand_pose`` /
``--clip_text``; ref ``nerf/utils.py:474-489``).

The reference uses openai-clip (not vendored here); we use the transformers
CLIP (``openai/clip-vit-base-patch32``) when its weights are available
locally, and degrade to an inert loss otherwise (zero-egress images cannot
download weights).  The CLIP forward runs in torch on host — it is an
auxiliary guidance signal, not a hot-path op.
"""

import numpy as np

_IMAGENET_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_IMAGENET_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class CLIPLoss:
    def __init__(self, model_name="openai/clip-vit-base-patch32"):
        self.available = False
        try:
            import torch
            from transformers import CLIPModel, CLIPProcessor

            self.model = CLIPModel.from_pretrained(model_name)
            self.processor = CLIPProcessor.from_pretrained(model_name)
            self.model.eval()
            self.torch = torch
            self.available = True
        except Exception as e:  # no weights in a zero-egress image
            self._err = str(e)

    def prepare_text(self, texts):
        if not self.available:
            return
        inputs = self.processor(text=texts, return_tensors="pt", padding=True)
        with self.torch.no_grad():
            self.text_features = self.model.get_text_features(**inputs)
            self.text_features = self.text_features / self.text_features.norm(
                dim=-1, keepdim=True
            )

    def __call__(self, images):
        """images: [B, H, W, 3] numpy/jax array in [0, 1].
        Returns scalar loss (host float) = -cos(text, image)."""
        if not self.available:
            return 0.0
        t = self.torch
        x = t.from_numpy(np.asarray(images, np.float32)).permute(0, 3, 1, 2)
        x = t.nn.functional.interpolate(
            x, size=(224, 224), mode="bilinear", align_corners=False
        )
        mean = t.tensor(_IMAGENET_CLIP_MEAN).view(1, 3, 1, 1)
        std = t.tensor(_IMAGENET_CLIP_STD).view(1, 3, 1, 1)
        x = (x - mean) / std
        with t.no_grad():
            feats = self.model.get_image_features(pixel_values=x)
            feats = feats / feats.norm(dim=-1, keepdim=True)
            sim = (feats @ self.text_features.T).mean()
        return float(-sim)
