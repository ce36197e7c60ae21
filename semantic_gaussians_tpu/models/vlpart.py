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


def save_detections(path, boxes, scores, classes) -> None:
    """Write one image's detections in the PrecomputedDetections `.npz`
    schema (the contract tools/export_vlpart_detections.py produces):
    boxes [N,4] float32 xyxy in image coordinates, scores [N] float32,
    classes [N] int64 indices into the export vocabulary."""
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    scores = np.asarray(scores, np.float32).reshape(-1)
    classes = np.asarray(classes, np.int64).reshape(-1)
    if not (len(boxes) == len(scores) == len(classes)):
        raise ValueError(
            f"ragged detections: {len(boxes)} boxes, {len(scores)} scores, "
            f"{len(classes)} classes"
        )
    if len(boxes) and not (
        (boxes[:, 0] <= boxes[:, 2]).all() and (boxes[:, 1] <= boxes[:, 3]).all()
    ):
        raise ValueError("boxes must be xyxy with x1<=x2, y1<=y2")
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    np.savez(p, boxes=boxes, scores=scores, classes=classes)


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


class NativeOpenVocabDetector:
    """Open-vocabulary detector: SAM proposals classified by CLIP (native).

    TPU-native replacement for the reference's detectron2 SwinB cascade
    R-CNN VLPart detector (/root/reference/model/vlpart/vlpart.py:34-71,
    box-score path :72-126). The reference couples a region-proposal
    network with CLIP-text classifier box heads; here the two stages map
    onto towers this framework already ships:

      1. class-agnostic region proposals from the JAX SAM automatic mask
         generator (models.automask) — the analogue of the RPN + cascade
         box refinement, with SAM's predicted-IoU as the objectness score;
      2. per-proposal open-vocab classification with the JAX CLIP image
         tower (models.clip_vision) against the vocabulary's CLIP text
         embeddings + a 'background' row, softmax at CLIP's logit scale.

    Detections whose argmax is 'background' are dropped; the rest return
    (boxes xyxy, scores = p_class x predicted_iou, class ids) in image
    coordinates — the same detector protocol VLPartPredictor consumes, so
    `fusion.py fusion.model_2d=vlpart` runs image->features with no
    precomputed directory (VERDICT r2 item 4a).
    """

    def __init__(
        self,
        automask,
        clip_encoder,
        text_encoder,
        *,
        vocabulary: Optional[Sequence[str]] = None,
        logit_scale: float = 100.0,
        clip_batch: int = 64,
        prefix_prompt: str = "a ",
    ):
        self.automask = automask
        self.clip_encoder = clip_encoder
        self.text_encoder = text_encoder
        self.logit_scale = logit_scale
        self.clip_batch = clip_batch
        self.prefix_prompt = prefix_prompt
        self.text_features: Optional[np.ndarray] = None
        if vocabulary is not None:
            self.set_vocabulary(vocabulary)

    def set_vocabulary(self, vocab: Sequence[str]):
        """CLIP-embed prompted class texts + trailing 'background' row (the
        reference's text classifier weights, vlpart.py text_encoder path)."""
        texts = [
            self.prefix_prompt + v.lower().replace(":", " ").replace("_", " ")
            for v in vocab
        ] + ["background"]
        t = np.asarray(self.text_encoder.extract_text_feature(texts))
        self.text_features = t / (
            np.linalg.norm(t, axis=-1, keepdims=True) + 1e-8
        )

    def __call__(self, image: np.ndarray):
        assert self.text_features is not None, "set_vocabulary first"
        from .samclip import pad_square_crop

        img = load_image(image)
        h, w = img.shape[:2]
        anns = self.automask.generate(img)[0]  # merged multi-scale set
        if not anns:
            z = np.zeros((0,), np.float32)
            return np.zeros((0, 4), np.float32), z, z.astype(np.int64)

        size = self.clip_encoder.tower.image_size
        fimg = img.astype(np.float32) / 255.0
        crops = np.stack(
            [
                pad_square_crop(fimg, a["segmentation"], a["bbox"], size)
                for a in anns
            ]
        )
        embs = []
        for i0 in range(0, len(crops), self.clip_batch):
            embs.append(self.clip_encoder.encode_image(crops[i0:i0 + self.clip_batch]))
        emb = np.concatenate(embs)
        emb = emb / (np.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)

        logits = self.logit_scale * (emb @ self.text_features.T)
        logits -= logits.max(axis=-1, keepdims=True)
        probs = np.exp(logits)
        probs /= probs.sum(axis=-1, keepdims=True)
        cls = np.argmax(probs[:, :-1], axis=-1)  # best non-background class
        keep = np.argmax(probs, axis=-1) != probs.shape[1] - 1
        iou = np.array([a["predicted_iou"] for a in anns], np.float32)
        scores = probs[np.arange(len(anns)), cls] * iou
        boxes = np.array(
            [
                [b[0], b[1], b[0] + b[2], b[1] + b[3]]
                for b in (a["bbox"] for a in anns)
            ],
            np.float32,
        )
        return (
            boxes[keep],
            scores[keep].astype(np.float32),
            cls[keep].astype(np.int64),
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
        if hasattr(self.detector, "set_vocabulary") and self.classes:
            # native detector classifies against the same vocabulary; its
            # class ids index get_text()'s rows (background row excluded)
            self.detector.set_vocabulary(self.classes.split("."))

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

        masks = []
        for i0 in range(0, len(boxes_enc), self.sam_batch):
            b = jnp.asarray(boxes_enc[i0 : i0 + self.sam_batch])
            logits, _iou = self._boxes_jit(self.vars, emb, b)
            # fused low-res -> original resample (see models/automask.py:
            # one scale_and_translate composes the reference's two bilinear
            # interps without the (B, S, S) intermediate)
            lg = jax.image.scale_and_translate(
                logits, (logits.shape[0], h, w), (1, 2),
                jnp.array([4.0 * h / rh, 4.0 * w / rw]), jnp.zeros(2),
                method="linear", antialias=False,
            )
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

