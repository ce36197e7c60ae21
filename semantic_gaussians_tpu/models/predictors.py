"""2D open-vocabulary predictor protocol + providers.

The reference wraps four heavyweight 2D models behind one duck-typed
protocol (SURVEY.md §2.3: OpenSeg/TF, LSeg, SAM+CLIP, VLPart+SAM — all
`embedding_dim`, `extract_image_feature`, `extract_text_feature`,
`set_predefined_cls`; /root/reference/model/openseg_predictor.py:16-99).
The fusion/distill/eval core only consumes per-pixel CLIP-space feature maps
and text embeddings, so here the protocol is explicit and the providers are:

  * PrecomputedFeatureProvider — loads exported per-view feature maps
    (.npy/.npz/.pt) from disk. This is the production path on TPU pods for
    OpenSeg (a TensorFlow SavedModel the reference itself treats as a black
    box): run extraction offline, fuse on-device.
  * NATIVE JAX providers (separate modules, weights from local torch
    checkpoints): models.lseg.LSegPredictor (ViT-L/16 + DPT, 512-d),
    models.samclip.SAMCLIPPredictor (SAM automasks x CLIP crops, 768-d),
    models.vlpart.VLPartPredictor (detector + SAM box refinement + CLIP
    text, 768-d), models.clip_text.JaxCLIPTextEncoder /
    models.clip_vision.JaxCLIPImageEncoder (the towers themselves).
    `make_predictor` dispatches by name (reference fusion.py:260-294).
  * TorchCLIPTextEncoder — CLIP text tower via transformers (CPU torch),
    loading from a LOCAL checkpoint path (the sandbox has no egress).
  * RandomFeatureProvider — deterministic random features for tests.

All feature maps are channel-last [H, W, C]; text features [K, C],
L2-normalized (reference extract_text_feature, openseg_predictor.py:81-99).
"""
from __future__ import annotations

import hashlib
from pathlib import Path
from typing import Protocol, Sequence, Tuple

import numpy as np


class Predictor2D(Protocol):
    embedding_dim: int

    def extract_image_feature(
        self, img_path: str, img_size: Tuple[int, int]
    ) -> np.ndarray:  # [H, W, C]
        ...

    def extract_text_feature(self, labelset: Sequence[str]) -> np.ndarray:
        ...  # [K, C] normalized


def _resize_chw_nearest(feat_hwc: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize to (W, H) — parity with the reference's
    F.interpolate(..., mode='nearest') on feature maps."""
    w, h = size
    src_h, src_w = feat_hwc.shape[:2]
    ys = (np.arange(h) * src_h // h).clip(0, src_h - 1)
    xs = (np.arange(w) * src_w // w).clip(0, src_w - 1)
    return feat_hwc[ys][:, xs]


class PrecomputedFeatureProvider:
    """Per-view feature maps exported by an offline 2D model.

    Files are looked up as <dir>/<image_stem>.{npy,npz,pt}; content is
    [H, W, C] or [C, H, W] (auto-detected via embedding_dim).
    """

    def __init__(self, feature_dir: str, embedding_dim: int = 768):
        self.feature_dir = Path(feature_dir)
        self.embedding_dim = embedding_dim

    def extract_image_feature(self, img_path, img_size):
        stem = Path(img_path).stem
        for ext in (".npy", ".npz", ".pt"):
            p = self.feature_dir / (stem + ext)
            if p.exists():
                break
        else:
            raise FileNotFoundError(
                f"no feature map for {stem} in {self.feature_dir}"
            )
        if p.suffix == ".npy":
            feat = np.load(p)
        elif p.suffix == ".npz":
            data = np.load(p)
            feat = data[list(data.keys())[0]]
        else:
            import torch

            obj = torch.load(p, map_location="cpu", weights_only=False)
            feat = obj["feat"] if isinstance(obj, dict) else obj
            feat = np.asarray(feat.float())
        if feat.ndim != 3:
            raise ValueError(f"bad feature map shape {feat.shape}")
        # Reference exports are CHW; on the (rare) ambiguous C==H==dim case
        # CHW wins. Only an unambiguous HWC map skips the transpose.
        if feat.shape[0] == self.embedding_dim:
            feat = np.moveaxis(feat, 0, -1)  # CHW -> HWC
        if img_size is not None and (feat.shape[1], feat.shape[0]) != tuple(img_size):
            feat = _resize_chw_nearest(feat, img_size)
        return feat.astype(np.float32)

    def extract_text_feature(self, labelset):
        raise NotImplementedError(
            "precomputed provider has no text tower; pair with a CLIP text "
            "encoder"
        )


class TorchCLIPTextEncoder:
    """CLIP text tower (transformers, CPU torch) from a LOCAL checkpoint.

    Parity with the reference's extract_text_feature
    (openseg_predictor.py:81-99): tokenizes 'a photo of a {label}'-free raw
    labels (the reference encodes the raw label strings), L2-normalizes.
    """

    def __init__(self, model_path: str, embedding_dim: int = 768):
        from transformers import CLIPModel, CLIPProcessor

        self.model = CLIPModel.from_pretrained(model_path)
        self.processor = CLIPProcessor.from_pretrained(model_path)
        self.embedding_dim = embedding_dim

    def extract_text_feature(self, labelset):
        import torch

        with torch.no_grad():
            inputs = self.processor(
                text=list(labelset), return_tensors="pt", padding=True
            )
            feats = self.model.get_text_features(**inputs)
            feats = feats / feats.norm(dim=-1, keepdim=True)
        return feats.numpy().astype(np.float32)

    def extract_image_feature(self, img_path, img_size):
        raise NotImplementedError("text-only encoder")


def make_predictor(name: str, cfg: dict) -> "Predictor2D":
    """Build a 2D provider by name (the reference's model_2d dispatch,
    fusion.py:260-294 / eval_segmentation.py). `cfg` is the `fusion` (or
    `eval`) config section as a mapping."""
    get = cfg.get if hasattr(cfg, "get") else lambda k, d=None: d
    if name in ("precomputed", "openseg"):
        # OpenSeg stays an offline exporter (TF SavedModel, SURVEY §7.3)
        return PrecomputedFeatureProvider(
            cfg["feature_dir"], int(get("embedding_dim", 768))
        )
    bpe = get("bpe_path")  # CLIP BPE vocab file for string text queries
    if name == "lseg":
        from .lseg import LSegPredictor

        return LSegPredictor(
            checkpoint_path=cfg["lseg_checkpoint"], bpe_path=bpe
        )
    if name == "samclip":
        from .clip_text import JaxCLIPTextEncoder
        from .samclip import SAMCLIPPredictor

        return SAMCLIPPredictor(
            sam_checkpoint=cfg["sam_checkpoint"],
            clip_checkpoint=cfg["clip_checkpoint"],
            text_encoder=JaxCLIPTextEncoder(
                checkpoint_path=cfg["clip_checkpoint"], bpe_path=bpe
            ),
        )
    if name == "vlpart":
        import torch

        from .clip_text import JaxCLIPTextEncoder
        from .clip_vision import JaxCLIPImageEncoder
        from .sam import SamConfig, params_from_sam_state_dict
        from .vlpart import (
            NativeOpenVocabDetector,
            PrecomputedDetections,
            VLPartPredictor,
        )

        text_encoder = JaxCLIPTextEncoder(
            checkpoint_path=cfg["clip_checkpoint"], bpe_path=bpe
        )
        sam_cfg = SamConfig.vit_h()
        sam_vars = params_from_sam_state_dict(
            torch.load(cfg["sam_checkpoint"], map_location="cpu"), sam_cfg
        )
        if get("detections_dir"):
            # offline exports from the upstream detectron2 stack
            # (tools/export_vlpart_detections.py)
            detector = PrecomputedDetections(cfg["detections_dir"])
        else:
            # fully native path: SAM proposals x CLIP classification,
            # sharing the SAM weights with the box-refinement stage
            from .automask import SamAutoMask

            detector = NativeOpenVocabDetector(
                SamAutoMask(sam_cfg, sam_vars),
                JaxCLIPImageEncoder(checkpoint_path=cfg["clip_checkpoint"]),
                text_encoder,
            )
        return VLPartPredictor(
            detector,
            sam_cfg=sam_cfg,
            sam_variables=sam_vars,
            text_encoder=text_encoder,
            vocabulary=list(get("vocabulary", [])) or None,
        )
    if name == "random":
        return RandomFeatureProvider(int(get("embedding_dim", 768)))
    raise ValueError(f"unknown model_2d: {name}")


class RandomFeatureProvider:
    """Deterministic random features keyed by file path (tests/benchmarks)."""

    def __init__(self, embedding_dim: int = 16, feat_hw: Tuple[int, int] = (60, 80)):
        self.embedding_dim = embedding_dim
        self.feat_hw = feat_hw

    def _rng(self, key: str):
        seed = int.from_bytes(
            hashlib.sha256(key.encode()).digest()[:4], "little"
        )
        return np.random.default_rng(seed)

    def extract_image_feature(self, img_path, img_size):
        rng = self._rng(str(img_path))
        h, w = self.feat_hw
        feat = rng.normal(size=(h, w, self.embedding_dim)).astype(np.float32)
        if img_size is not None:
            feat = _resize_chw_nearest(feat, img_size)
        return feat

    def extract_text_feature(self, labelset):
        feats = np.stack(
            [
                self._rng("text:" + l).normal(size=self.embedding_dim)
                for l in labelset
            ]
        ).astype(np.float32)
        return feats / np.linalg.norm(feats, axis=-1, keepdims=True)


def load_image(img) -> np.ndarray:
    """Path-or-array loader shared by the native providers: returns RGB
    uint8 (float arrays in [0,1] or [0,255] are normalized)."""
    if not isinstance(img, np.ndarray):
        from PIL import Image

        return np.asarray(Image.open(str(img)).convert("RGB"))
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0 if arr.max() <= 1.0 else arr, 0, 255)
        arr = arr.astype(np.uint8)
    return arr
