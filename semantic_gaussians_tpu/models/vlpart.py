"""VLPart-style open-vocabulary part/object predictor (detector + SAM + CLIP).

Native implementation of the reference's VLPart provider pipeline
(/root/reference/model/vlpart_predictor.py): an open-vocabulary DETECTOR
proposes (boxes, scores, class ids) over a text vocabulary; detections with
score >= box_threshold are refined into masks with SAM BOX prompts
(multimask_output=False); holes smaller than 400 px are filled; the per-pixel
feature map is the score-weighted sum of each detection's CLIP TEXT embedding
over its mask, L2-normalized per pixel. embedding_dim = 768.

The SAM refinement and CLIP text side run natively in JAX (models.sam,
models.clip_text). The detector itself is PLUGGABLE: the reference's VLPart
detector is a detectron2 SwinB cascade R-CNN (model/vlpart/vlpart.py — a
vendored third-party CUDA/detectron2 stack, consumed here the same way the
TF-SavedModel OpenSeg is: via exported outputs). Provide either

  * `detector`: a callable (rgb uint8 HxWx3) -> (boxes xyxy [N,4] float,
    scores [N] float, class_ids [N] int) in image coordinates, or
  * `PrecomputedDetections(dir)`: loads `<stem>.npz` exports with those
    three arrays (produced by running the upstream detector offline).

Output layout: [H, W, 768] float32 channel-last.
"""
from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .automask import remove_small_regions
from .predictors import load_image
from .sam import Sam, SamConfig, preprocess_image


class PrecomputedDetections:
    """Detector adapter over offline `.npz` exports keyed by image stem:
    arrays `boxes` [N,4] xyxy, `scores` [N], `classes` [N]."""

    def __init__(self, det_dir: str):
        self.dir = Path(det_dir)
        self._current: Optional[str] = None

    def set_current(self, img_path):
        self._current = Path(str(img_path)).stem

    def __call__(self, image: np.ndarray):
        if self._current is None:
            raise ValueError("call set_current(img_path) first")
        f = self.dir / f"{self._current}.npz"
        z = np.load(f)
        return (
            np.asarray(z["boxes"], np.float32),
            np.asarray(z["scores"], np.float32),
            np.asarray(z["classes"], np.int64),
        )


class VLPartPredictor:
    """Predictor2D provider: detector proposals -> SAM mask refinement ->
    score-weighted CLIP-text semantic map."""

    embedding_dim = 768

    def __init__(
        self,
        detector: Callable,
        *,
        sam_checkpoint: Optional[str] = None,
        sam_cfg: Optional[SamConfig] = None,
        sam_variables: Optional[dict] = None,
        text_encoder=None,
        vocabulary: Optional[Sequence[str]] = None,
        box_threshold: float = 0.3,
        min_hole_area: int = 400,
        sam_batch: int = 32,
    ):
        self.detector = detector
        cfg = sam_cfg or SamConfig.vit_h()
        if sam_variables is None:
            if sam_checkpoint is None:
                raise ValueError("need sam_checkpoint or sam_variables")
            import torch

            from .sam import params_from_sam_state_dict

            sd = torch.load(sam_checkpoint, map_location="cpu")
            sam_variables = params_from_sam_state_dict(sd, cfg)
        self.cfg = cfg
        self.vars = sam_variables
        self.model = Sam(cfg)
        self.text_encoder = text_encoder
        self.box_threshold = box_threshold
        self.min_hole_area = min_hole_area
        self.sam_batch = sam_batch
        self.classes: Optional[str] = None
        self.text_features: Optional[np.ndarray] = None
        if vocabulary is not None:
            self.set_predefined_cls(vocabulary)
        self._encode = jax.jit(
            lambda v, x: self.model.apply(v, x, method=Sam.encode_image)
        )
        self._boxes_jit = jax.jit(
            lambda v, emb, b: self.model.apply(
                v, emb, b, method=Sam.predict_boxes
            )
        )

    # -- protocol surface ---------------------------------------------------

    def set_predefined_cls(self, cls: Sequence[str]):
        self.classes = ".".join(cls)
        self._refresh_text()

    def set_predefined_part(self, cls: str, parts: Sequence[str]):
        self.classes = ".".join(f"{cls}:{e}" for e in parts)
        self._refresh_text()

    def get_text(self, vocabulary: str, prefix_prompt: str = "a "):
        """Prompted texts + trailing 'background' row
        (vlpart_predictor.py:56-60)."""
        vocab = vocabulary.split(".")
        texts = [
            prefix_prompt + x.lower().replace(":", " ").replace("_", " ")
            for x in vocab
        ]
        return texts + ["background"]

    def _refresh_text(self):
        if self.text_encoder is not None and self.classes:
            self.text_features = np.asarray(
                self.text_encoder.extract_text_feature(
                    self.get_text(self.classes)
                )
            )
            self.embedding_dim = int(self.text_features.shape[-1])

    def extract_text_feature(self, labelset) -> np.ndarray:
        if self.text_encoder is None:
            raise ValueError("no text tower; pass text_encoder")
        return np.asarray(self.text_encoder.extract_text_feature(labelset))

    # -- image path ---------------------------------------------------------

    def extract_image_feature(self, img_path, img_size=None) -> np.ndarray:
        assert self.text_features is not None, "set_predefined_cls first"
        if hasattr(self.detector, "set_current"):
            if isinstance(img_path, np.ndarray):
                raise ValueError(
                    "PrecomputedDetections needs an image PATH (detections "
                    "are keyed by file stem); got an array"
                )
            self.detector.set_current(img_path)
        img = load_image(img_path)
        h, w = img.shape[:2]
        # img_size follows the Predictor2D (W, H) convention
        out_hw = (
            (int(img_size[1]), int(img_size[0])) if img_size is not None
            else (h, w)
        )

        boxes, scores, classes = self.detector(img)
        keep = scores >= self.box_threshold
        boxes, scores, classes = boxes[keep], scores[keep], classes[keep]
        if len(boxes) == 0:
            return np.zeros((*out_hw, self.embedding_dim), np.float32)

        x, (rh, rw) = preprocess_image(img, self.cfg.img_size)
        emb = self._encode(self.vars, jnp.asarray(x)[None])[0]
        scale = self.cfg.img_size / max(h, w)
        boxes_enc = boxes * scale

        s = self.cfg.img_size
        masks = []
        for i0 in range(0, len(boxes_enc), self.sam_batch):
            b = jnp.asarray(boxes_enc[i0 : i0 + self.sam_batch])
            logits, _iou = self._boxes_jit(self.vars, emb, b)
            lg = jax.image.resize(
                logits, (logits.shape[0], s, s), method="linear"
            )[:, :rh, :rw]
            lg = jax.image.resize(lg, (lg.shape[0], h, w), method="linear")
            masks.append(np.asarray(lg > 0.0))
        masks = np.concatenate(masks)

        fine = [
            remove_small_regions(m, self.min_hole_area, "holes")[0]
            for m in masks
        ]
        masks = np.stack(fine)

        if out_hw != (h, w):
            # nearest resize (skimage order=0 in the reference)
            yi = (np.arange(out_hw[0]) * h / out_hw[0]).astype(np.int64)
            xi = (np.arange(out_hw[1]) * w / out_hw[1]).astype(np.int64)
            masks = masks[:, yi][:, :, xi]

        class_sem = self.text_features[np.asarray(classes, np.int64)]
        class_sem = class_sem * scores[:, None]
        sem = np.einsum(
            "nc,nhw->hwc", class_sem.astype(np.float32),
            masks.astype(np.float32),
        )
        sem /= np.linalg.norm(sem, axis=-1, keepdims=True) + 1e-8
        return sem.astype(np.float32)

