"""Automatic multi-scale mask generation over a point grid (SAM AMG).

JAX/numpy re-implementation of the reference's multi-scale
SamAutomaticMaskGenerator (/root/reference/submodules/segment-anything/
segment_anything/automask.py — itself a fork of the standard AMG that keeps
the small/medium/large mask-token outputs as SEPARATE sets in addition to
the merged set). Behavior parity:

  * a points_per_side x points_per_side grid of positive single-point
    prompts over the image, run through the mask decoder in batches with
    multimask_output (tokens 1..3 = s/m/l);
  * per batch: filter by predicted IoU (> pred_iou_thresh), compute the
    stability score (IoU of the >+offset and >-offset thresholdings of the
    logits) and filter (>= stability_score_thresh), threshold at 0, boxes
    from masks;
  * greedy box-NMS per set scored by predicted IoU (box_nms_thresh);
  * min_mask_region_area > 0: fill holes / drop islands smaller than the
    area (scipy.ndimage.label instead of cv2), then NMS again preferring
    unchanged masks.

The device side (decoder batch + upscale + stability/box math) is one
jitted function; filtering/NMS/bookkeeping run on host numpy. Single crop
layer only (the reference predictor instantiates crop_n_layers=0,
samclip_predictor.py:20-29).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sam import Sam, SamConfig, preprocess_image


@dataclasses.dataclass(frozen=True)
class AutoMaskConfig:
    points_per_side: int = 32
    points_per_batch: int = 64
    pred_iou_thresh: float = 0.7
    stability_score_thresh: float = 0.85
    stability_score_offset: float = 1.0
    box_nms_thresh: float = 0.7
    min_mask_region_area: int = 100
    mask_threshold: float = 0.0


def build_point_grid(n: int) -> np.ndarray:
    """(n*n, 2) normalized [0,1] xy grid with half-cell offset."""
    off = 1.0 / (2 * n)
    g = np.linspace(off, 1.0 - off, n, dtype=np.float32)
    gx, gy = np.meshgrid(g, g)
    return np.stack([gx, gy], axis=-1).reshape(-1, 2)


def greedy_nms(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> np.ndarray:
    """Indices kept by greedy IoU NMS over xyxy boxes."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    areas = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * np.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-9)
        suppressed |= iou > thresh
    return np.array(keep, np.int64)


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """(…, H, W) bool -> (…, 4) xyxy; [0,0,0,0] for empty masks
    (amg.py batched_mask_to_box semantics, x2/y2 exclusive +1 edge)."""
    h, w = masks.shape[-2:]
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    in_h = jnp.max(masks, axis=-1)  # (..., H)
    in_w = jnp.max(masks, axis=-2)  # (..., W)
    bottom = jnp.max(in_h * ys, axis=-1)
    top = jnp.min(jnp.where(in_h, ys, h), axis=-1)
    right = jnp.max(in_w * xs, axis=-1)
    left = jnp.min(jnp.where(in_w, xs, w), axis=-1)
    empty = ~jnp.any(masks, axis=(-2, -1))
    box = jnp.stack([left, top, right + 1, bottom + 1], axis=-1)
    return jnp.where(empty[..., None], 0, box).astype(jnp.int32)


def remove_small_regions(mask: np.ndarray, area_thresh: int, mode: str):
    """Fill small holes / drop small islands (amg.py remove_small_regions,
    scipy label instead of cv2 connectedComponents)."""
    from scipy import ndimage

    assert mode in ("holes", "islands")
    correct_holes = mode == "holes"
    working = (correct_holes ^ mask).astype(np.uint8)
    # 8-connectivity: parity with the reference's cv2.connectedComponents
    labels, n = ndimage.label(working, structure=np.ones((3, 3), np.uint8))
    if n == 0:
        return mask, False
    sizes = ndimage.sum_labels(np.ones_like(working), labels, np.arange(1, n + 1))
    small = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if not small:
        return mask, False
    fill = np.isin(labels, small)
    if correct_holes:
        return mask | fill, True
    out = mask & ~fill
    if not out.any():
        # keep the largest island rather than deleting the mask
        big = 1 + int(np.argmax(sizes))
        out = labels == big
    return out, True


class SamAutoMask:
    """Automatic mask generator over a JAX Sam model."""

    def __init__(
        self,
        cfg: SamConfig,
        variables: dict,
        amg: AutoMaskConfig = AutoMaskConfig(),
    ):
        self.cfg = cfg
        self.vars = variables
        self.amg = amg
        self.model = Sam(cfg)
        self._encode = jax.jit(
            lambda v, x: self.model.apply(v, x, method=Sam.encode_image)
        )
        self._cache = {}

    def _predict_fn(self, hw: Tuple[int, int]):
        """Jitted: (emb, points(B,1,2)) -> bool masks (B,3,h,w), iou (B,3),
        stability (B,3), boxes (B,3,4)."""
        if hw in self._cache:
            return self._cache[hw]
        h, w = hw
        s = self.cfg.img_size
        scale = s / max(h, w)
        rh, rw = int(round(h * scale)), int(round(w * scale))
        thr = self.amg.mask_threshold
        off = self.amg.stability_score_offset

        @jax.jit
        def run(variables, emb, points):
            b = points.shape[0]
            labels = jnp.ones((b, 1), jnp.int32)
            logits, iou = self.model.apply(
                variables, emb, points, labels, method=Sam.predict_points
            )
            logits = logits[:, 1:]  # s/m/l tokens
            iou = iou[:, 1:]
            # low-res (4g) -> original size in ONE resample. The reference
            # chains two bilinear interps (postprocess_masks: low-res ->
            # padded square, crop, -> original); composing the two affine
            # sample maps gives src = (dst + 0.5) * r / (4 * out) - 0.5,
            # i.e. one scale_and_translate at scale 4*out/r. This skips the
            # (B, 3, 1024, 1024) intermediate (~800 MB HBM traffic per
            # 64-point batch — the AMG hot loop's bandwidth hog) and is
            # CLOSER to torch semantics than chaining jax resizes (torch
            # never antialiases; measured max-err 0.21 vs 0.57 on
            # white-noise logits, 99.5% mask agreement).
            lg = jax.image.scale_and_translate(
                logits, (b, 3, h, w), (2, 3),
                jnp.array([4.0 * h / rh, 4.0 * w / rw]), jnp.zeros(2),
                method="linear", antialias=False,
            )
            inter = jnp.sum(lg > (thr + off), axis=(-2, -1))
            union = jnp.sum(lg > (thr - off), axis=(-2, -1))
            stability = inter / jnp.maximum(union, 1)
            masks = lg > thr
            boxes = masks_to_boxes(masks)
            return masks, iou, stability, boxes

        self._cache[hw] = run
        return run

    def generate(self, image: np.ndarray):
        """image: (H, W, 3) uint8/float RGB. Returns (anns, anns_s, anns_m,
        anns_l) — lists of dicts with segmentation/bbox/area/predicted_iou/
        stability_score (the reference generator's 4-tuple)."""
        h, w = image.shape[:2]
        amg = self.amg
        x, (rh, rw) = preprocess_image(image, self.cfg.img_size)
        emb = self._encode(self.vars, jnp.asarray(x)[None])[0]

        pts01 = build_point_grid(amg.points_per_side)
        pts = pts01 * np.array([[w, h]], np.float32)  # original frame xy
        scale = self.cfg.img_size / max(h, w)
        pts_enc = pts * scale  # encoder frame
        run = self._predict_fn((h, w))

        per_scale = [dict(masks=[], iou=[], stab=[], boxes=[]) for _ in range(3)]
        bsz = amg.points_per_batch
        npad = (-len(pts_enc)) % bsz
        if npad:
            pts_enc = np.concatenate([pts_enc, np.zeros((npad, 2), np.float32)])
        nreal = len(pts01)
        for i0 in range(0, len(pts_enc), bsz):
            batch = jnp.asarray(pts_enc[i0 : i0 + bsz])[:, None, :]
            masks, iou, stab, boxes = jax.tree.map(
                np.asarray, run(self.vars, emb, batch)
            )
            nvalid = min(bsz, nreal - i0)
            if nvalid <= 0:
                break
            for sc in range(3):
                keep = (
                    (iou[:nvalid, sc] > amg.pred_iou_thresh)
                    & (stab[:nvalid, sc] >= amg.stability_score_thresh)
                )
                idx = np.nonzero(keep)[0]
                per_scale[sc]["masks"].append(masks[idx, sc])
                per_scale[sc]["iou"].append(iou[idx, sc])
                per_scale[sc]["stab"].append(stab[idx, sc])
                per_scale[sc]["boxes"].append(boxes[idx, sc])

        def finish(sets):
            """NMS + small-region postprocess + record building."""
            if not sets["masks"]:
                return []
            masks = np.concatenate(sets["masks"])
            iou = np.concatenate(sets["iou"])
            stab = np.concatenate(sets["stab"])
            boxes = np.concatenate(sets["boxes"]).astype(np.float32)
            if len(masks) == 0:
                return []
            keep = greedy_nms(boxes, iou, amg.box_nms_thresh)
            masks, iou, stab, boxes = masks[keep], iou[keep], stab[keep], boxes[keep]
            if amg.min_mask_region_area > 0:
                new_masks, unchanged = [], []
                for m in masks:
                    m2, ch1 = remove_small_regions(
                        m, amg.min_mask_region_area, "holes"
                    )
                    m2, ch2 = remove_small_regions(
                        m2, amg.min_mask_region_area, "islands"
                    )
                    new_masks.append(m2)
                    unchanged.append(float(not (ch1 or ch2)))
                masks = np.stack(new_masks)
                boxes = np.asarray(masks_to_boxes(jnp.asarray(masks))).astype(
                    np.float32
                )
                keep = greedy_nms(boxes, np.asarray(unchanged), amg.box_nms_thresh)
                masks, iou, stab, boxes = (
                    masks[keep], iou[keep], stab[keep], boxes[keep],
                )
            anns = []
            for m, i, st, b in zip(masks, iou, stab, boxes):
                area = int(m.sum())
                if area == 0:
                    continue
                anns.append(
                    dict(
                        segmentation=m,
                        bbox=[
                            float(b[0]), float(b[1]),
                            float(b[2] - b[0]), float(b[3] - b[1]),
                        ],
                        area=area,
                        predicted_iou=float(i),
                        stability_score=float(st),
                    )
                )
            return anns

        anns_s = finish(per_scale[0])
        anns_m = finish(per_scale[1])
        anns_l = finish(per_scale[2])
        merged = dict(
            masks=[s for sc in per_scale for s in sc["masks"]],
            iou=[s for sc in per_scale for s in sc["iou"]],
            stab=[s for sc in per_scale for s in sc["stab"]],
            boxes=[s for sc in per_scale for s in sc["boxes"]],
        )
        anns = finish(merged)
        return anns, anns_s, anns_m, anns_l
