#!/usr/bin/env bash
# Drive every root CLI entry point end-to-end on the REAL TPU (pallas
# backend) — the user-facing chain exactly as the reference exposes it:
#   make scene -> train.py -> fusion.py -> distill.py ->
#   eval_segmentation.py -> view_server.py
# The CPU test suite covers these CLIs functionally (tests/test_train_cli,
# test_eval_cli, test_view_server); this script is the hardware drive whose
# log is committed as E2E_CLI_TPU.log. Quality is asserted by the
# harnesses (PARITY_HARNESS / SEMANTIC_HARNESS); this proves the entry
# points themselves run on the chip.
set -euo pipefail
cd "$(dirname "$0")/.."
W=${1:-/tmp/tpu_e2e}
Y=semantic_gaussians_tpu/config/yamls
rm -rf "$W" output/TPU_E2E output_distill/TPU_E2E
mkdir -p "$W"

echo "== [1/6] toy scene =="
python tools/make_toy_scene.py "$W/scene"

echo "== [2/6] train.py (pallas, 400 iters incl. densify window) =="
python train.py $Y/official_train.yaml "scene.scene_path=$W/scene" \
  train.exp_name=TPU_E2E train.iterations=400 train.densify_from_iter=100 \
  train.densify_until_iter=300 train.steps_per_dispatch=20
test -f output/TPU_E2E/point_cloud/iteration_400/point_cloud.ply

echo "== [3/6] fusion.py (random 16-dim provider, render-depth) =="
python fusion.py $Y/fusion_scannet.yaml "scene.scene_path=$W/scene" \
  model.model_dir=output/TPU_E2E fusion.model_2d=random \
  fusion.embedding_dim=16 'fusion.img_dim=[128,96]' \
  fusion.every_k_views=2 "fusion.out_dir=$W/fused"
test -f "$W/fused/scene/0.pt"

echo "== [4/6] distill.py (MinkUNet14A, 15 epochs) =="
python distill.py $Y/distill_scannet.yaml model.model_dir=output/TPU_E2E \
  model.load_iteration=-1 \
  "fusion.out_dir=$W/fused/scene" fusion.embedding_dim=16 \
  distill.model_3d=MinkUNet14A distill.epochs=15 distill.voxel_size=0.05 \
  distill.voxel_budget=2048 distill.exp_name=TPU_E2E \
  distill.save_interval=15
ls output_distill/TPU_E2E/model_15.npz

echo "== [5/6] eval_segmentation.py (2d + 3d modes, planted labels) =="
python - "$W" <<'EOF'
import pathlib, sys
import numpy as np
from PIL import Image
sys.path.insert(0, ".")
from semantic_gaussians_tpu.io.scene import load_scene
w = pathlib.Path(sys.argv[1])
scene = load_scene(str(w / "scene"), eval_split=False)
rng = np.random.default_rng(0)
d = w / "scene" / "label-filt"
d.mkdir(exist_ok=True)
for c in scene.train_cameras:
    lbl = rng.integers(0, 21, size=(96, 128)).astype(np.uint8)
    Image.fromarray(lbl).save(d / f"{c.image_name}.png")
print(f"wrote {len(scene.train_cameras)} label images")
EOF
for MODE in 2d 3d; do
  python eval_segmentation.py $Y/eval.yaml "scene.scene_path=$W/scene" \
    model.model_dir=output/TPU_E2E model.load_iteration=-1 "fusion.out_dir=$W/fused" \
    fusion.embedding_dim=16 "distill.model_dir=output_distill/TPU_E2E" \
    distill.model_3d=MinkUNet14A distill.iteration=15 \
    distill.voxel_size=0.05 distill.voxel_budget=2048 \
    eval.eval_mode=$MODE eval.width=128 eval.height=96
done

echo "== [6/6] view_server.py (RGB + Depth + edit roundtrip) =="
python view_server.py $Y/view_scannet.yaml model.model_dir=output/TPU_E2E \
  render.port=8765 "fusion.out_dir=$W/fused" fusion.embedding_dim=16 &
VPID=$!
trap 'kill $VPID 2>/dev/null || true' EXIT
for i in $(seq 60); do
  sleep 2
  curl -sf -o "$W/rgb.png" "http://localhost:8765/render?mode=RGB" && break
done
test -s "$W/rgb.png"
curl -sf -o "$W/depth.png" "http://localhost:8765/render?mode=Depth"
test -s "$W/depth.png"
curl -sf -X POST -d "op=remove&prompts=thing" http://localhost:8765/edit
curl -sf -X POST -d "" http://localhost:8765/reset > /dev/null
kill $VPID
trap - EXIT
echo "E2E CLI TPU: ALL STAGES OK"
