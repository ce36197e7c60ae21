import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
"""Export VLPart detections from the UPSTREAM torch/detectron2 stack.

The reference's VLPart detector is a detectron2 SwinB cascade R-CNN with
CLIP-text classifier heads (/root/reference/model/vlpart/vlpart.py:34-71) —
a vendored CUDA/torch tree this framework deliberately does not port
(SURVEY §7.3). Two ways to run the vlpart fusion mode here:

  * fully native (no exports needed): fusion.model_2d=vlpart with no
    `detections_dir` uses models.vlpart.NativeOpenVocabDetector — SAM
    proposals classified by the JAX CLIP image tower.
  * reference-exact detections: run THIS tool once, offline, in an
    environment with the upstream stack (torch + detectron2 + the
    reference repo on PYTHONPATH + swinbase_cascade_lvis_paco weights),
    then point fusion at the export directory:
      fusion.model_2d=vlpart fusion.detections_dir=<out>

Per image it writes `<out>/<image_stem>.npz` in the PrecomputedDetections
schema (models/vlpart.py:save_detections): boxes [N,4] float32 xyxy,
scores [N] float32, classes [N] int64 into the vocabulary passed here.
A `vocabulary.json` with the exact class list is written alongside so the
consumer can rebuild identical CLIP text rows.

Usage:
  python tools/export_vlpart_detections.py \
      --images scene/color --out exports/vlpart/scene \
      --vlpart-checkpoint swinbase_cascade_lvis_paco.pth \
      [--vocab chair table ...]        # default: ScanNet-20 classes
      [--box-threshold 0.3]

The detector inference mirrors the reference provider
(model/vlpart_predictor.py:62-99): ResizeShortestEdge([800,800], 1333)
preprocessing, `vlpart.inference([inputs], text_prompt=".".join(vocab))`,
keep instances with score >= box_threshold.
"""
import argparse
import json
from pathlib import Path

import numpy as np

from semantic_gaussians_tpu.data.scannet_constants import SCANNET20_CLASS_LABELS
from semantic_gaussians_tpu.models.vlpart import save_detections


def build_upstream_detector(vlpart_checkpoint: str):
    """Import the upstream stack; raise a clear error when unavailable."""
    try:
        import detectron2.data.transforms as T  # noqa: F401
        import torch  # noqa: F401
        from model.vlpart.vlpart import build_vlpart
    except ImportError as e:
        raise SystemExit(
            "the upstream VLPart stack is not importable here "
            f"({e}).\nThis exporter must run in an environment with "
            "detectron2 + the reference repo on PYTHONPATH; see the module "
            "docstring. For a no-export path use the native detector "
            "(fusion.model_2d=vlpart without detections_dir)."
        )
    return build_vlpart(vlpart_checkpoint)


def run_upstream(vlpart, image_rgb: np.ndarray, text_prompt: str,
                 box_threshold: float):
    """One image through the upstream detector -> (boxes, scores, classes).

    Mirrors /root/reference/model/vlpart_predictor.py:68-99 minus the SAM
    refinement (the consumer does that natively).
    """
    import detectron2.data.transforms as T
    import torch

    preprocess = T.ResizeShortestEdge([800, 800], 1333)
    height, width = image_rgb.shape[:2]
    image = preprocess.get_transform(image_rgb).apply_image(image_rgb)
    image = torch.as_tensor(image.astype("float32").transpose(2, 0, 1))
    inputs = {"image": image, "height": height, "width": width}
    with torch.no_grad():
        predictions = vlpart.inference([inputs], text_prompt=text_prompt)[0]
    boxes = np.zeros((0, 4), np.float32)
    scores = np.zeros((0,), np.float32)
    classes = np.zeros((0,), np.int64)
    if "instances" in predictions:
        inst = predictions["instances"].to("cpu")
        keep = inst.scores.numpy() >= box_threshold
        boxes = inst.pred_boxes.tensor.numpy()[keep]
        scores = inst.scores.numpy()[keep]
        classes = inst.pred_classes.numpy()[keep]
    return boxes, scores, classes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True, help="directory of RGB images")
    ap.add_argument("--out", required=True)
    ap.add_argument("--vlpart-checkpoint", required=True)
    ap.add_argument("--vocab", nargs="*", default=list(SCANNET20_CLASS_LABELS))
    ap.add_argument("--box-threshold", type=float, default=0.3)
    args = ap.parse_args()

    from PIL import Image

    vlpart = build_upstream_detector(args.vlpart_checkpoint)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "vocabulary.json").write_text(json.dumps(list(args.vocab)))
    text_prompt = ".".join(args.vocab)

    imgs = sorted(
        p for p in Path(args.images).iterdir()
        if p.suffix.lower() in (".jpg", ".jpeg", ".png")
    )
    for p in imgs:
        rgb = np.asarray(Image.open(p).convert("RGB"))
        boxes, scores, classes = run_upstream(
            vlpart, rgb, text_prompt, args.box_threshold
        )
        save_detections(out / f"{p.stem}.npz", boxes, scores, classes)
        print(f"{p.stem}: {len(boxes)} detections")
    print(f"wrote {len(imgs)} exports -> {out}")


if __name__ == "__main__":
    main()
