"""SAMCLIP predictor: SAM automatic masks x CLIP crop embeddings, in JAX.

Native implementation of the reference's SAMCLIP 2D provider
(/root/reference/model/samclip_predictor.py): generate multi-scale masks
with the automatic mask generator (points_per_side 32, pred_iou 0.7,
stability 0.85, box-NMS 0.7, min region 100), then for every merged-set
mask sorted by DESCENDING area: crop the masked image to the mask's bbox,
zero outside the mask, pad to a centered square, resize to the CLIP input
size (336), CLIP-encode, and ADD the (unnormalized) crop embedding into all
of the mask's pixels; finally L2-normalize per pixel. embedding_dim = 768.

Output layout: [H, W, 768] float32 (channel-last, vs the reference's
(768, H, W) half — the fusion pipeline consumes HWC maps).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .automask import AutoMaskConfig, SamAutoMask
from .clip_vision import JaxCLIPImageEncoder
from .predictors import load_image
from .sam import SamConfig


def pad_square_crop(
    image: np.ndarray, seg: np.ndarray, bbox, out_size: int
) -> np.ndarray:
    """Masked bbox crop -> centered square pad -> (out, out, 3) float [0,1]
    (samclip_predictor.py:66-84 semantics)."""
    x1, y1 = int(bbox[0]), int(bbox[1])
    x2, y2 = int(bbox[0] + bbox[2]), int(bbox[1] + bbox[3])
    # crop first: masking the full image is O(HW) per annotation
    crop = image[y1:y2, x1:x2] * seg[y1:y2, x1:x2, None]
    h, w = crop.shape[:2]
    if h == 0 or w == 0:
        return np.zeros((out_size, out_size, 3), np.float32)
    side = max(h, w)
    pad = np.zeros((side, side, 3), np.float32)
    if h > w:
        off = (h - w) // 2
        pad[:, off : off + w] = crop
    else:
        off = (w - h) // 2
        pad[off : off + h, :] = crop
    out = jax.image.resize(
        jnp.asarray(pad), (out_size, out_size, 3), method="linear"
    )
    return np.asarray(out, np.float32)


class SAMCLIPPredictor:
    """Predictor2D protocol provider (embedding_dim, extract_image_feature,
    extract_text_feature) backed by the JAX SAM + CLIP towers."""

    embedding_dim = 768

    def __init__(
        self,
        sam_checkpoint: Optional[str] = None,
        clip_checkpoint: Optional[str] = None,
        *,
        sam_cfg: Optional[SamConfig] = None,
        sam_variables: Optional[dict] = None,
        clip_encoder: Optional[JaxCLIPImageEncoder] = None,
        text_encoder=None,
        amg: AutoMaskConfig = AutoMaskConfig(),
        clip_batch: int = 64,
    ):
        cfg = sam_cfg or SamConfig.vit_h()
        if sam_variables is None:
            if sam_checkpoint is None:
                raise ValueError("need sam_checkpoint or sam_variables")
            import torch

            from .sam import params_from_sam_state_dict

            sd = torch.load(sam_checkpoint, map_location="cpu")
            sam_variables = params_from_sam_state_dict(sd, cfg)
        self.mask_generator = SamAutoMask(cfg, sam_variables, amg)
        if clip_encoder is None:
            clip_encoder = JaxCLIPImageEncoder(checkpoint_path=clip_checkpoint)
        self.clip = clip_encoder
        self.embedding_dim = self.clip.embedding_dim
        self.text_encoder = text_encoder
        self.clip_batch = clip_batch
        self.classes: Optional[str] = None

    # -- protocol surface (openseg_predictor.py:16-99 duck type) -----------

    def set_predefined_cls(self, cls: Sequence[str]):
        self.classes = ".".join(cls)

    def set_predefined_part(self, cls: str, parts: Sequence[str]):
        self.classes = ".".join(f"{cls}:{e}" for e in parts)

    def get_text(self, vocabulary: str, prefix_prompt: str = "a "):
        vocab = vocabulary.split(".")
        return [
            prefix_prompt + x.lower().replace(":", " ").replace("_", " ")
            for x in vocab
        ]

    def extract_image_feature(self, img_path, img_size=None) -> np.ndarray:
        """[H, W, D] per-pixel CLIP-space map. Accepts a path or an RGB
        array; resized to img_size first. img_size follows the repo's
        Predictor2D convention (W, H) — fusion.img_dim is (W, H)."""
        img = load_image(img_path)
        if img_size is not None:
            w, h = int(img_size[0]), int(img_size[1])
            img = np.asarray(
                jax.image.resize(
                    jnp.asarray(img, jnp.float32), (h, w, 3), method="linear"
                )
            )
        img01 = np.clip(img.astype(np.float32) / 255.0, 0.0, 1.0)
        h, w = img01.shape[:2]

        anns, _s, _m, _l = self.mask_generator.generate(
            (img01 * 255).astype(np.uint8)
        )
        if not anns:
            return np.zeros((h, w, self.embedding_dim), np.float32)
        anns = sorted(anns, key=lambda a: a["area"], reverse=True)

        size = self.clip.tower.image_size
        crops = np.stack(
            [
                pad_square_crop(img01, a["segmentation"], a["bbox"], size)
                for a in anns
            ]
        )
        embs = []
        for i0 in range(0, len(crops), self.clip_batch):
            embs.append(self.clip.encode_image(crops[i0 : i0 + self.clip_batch]))
        embs = np.concatenate(embs)  # (M, D)

        feats = np.zeros((h, w, self.embedding_dim), np.float32)
        for a, e in zip(anns, embs):
            feats[a["segmentation"]] += e
        feats /= np.linalg.norm(feats, axis=-1, keepdims=True) + 1e-8
        return feats

    def extract_text_feature(self, labelset) -> np.ndarray:
        if self.text_encoder is None:
            raise ValueError("no text tower; pass text_encoder")
        return np.asarray(self.text_encoder.extract_text_feature(labelset))

