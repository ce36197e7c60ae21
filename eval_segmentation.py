"""Open-vocab segmentation evaluation entry point (reference parity).

Usage:
    python eval_segmentation.py semantic_gaussians_tpu/config/yamls/eval.yaml \
        scene.scene_path=... model.model_dir=... fusion.out_dir=... \
        eval.eval_mode=2d

Modes: 2d | 3d | 2d_and_3d | pretrained | labelmap (eval_segmentation.py:51-60).
GT labels: <scene>/label-filt/<frame>.png raw ids mapped via the scannetv2
TSV, or precomputed train-id label images in eval.label_dir.
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np


def main():
    import jax

    from semantic_gaussians_tpu.utils.platform import setup_backend

    setup_backend()  # SGTPU_PLATFORM=cpu escape hatch + TPU compile cache

    import jax.numpy as jnp

    from semantic_gaussians_tpu.config.config import load_config, pretty
    from semantic_gaussians_tpu.data.scannet_constants import (
        COCOMAP_CLASS_LABELS,
        SCANNET20_CLASS_LABELS,
        map_label_image,
        read_label_mapping,
    )
    from semantic_gaussians_tpu.core.gaussians import packed_features
    from semantic_gaussians_tpu.io.ply import load_gaussian_ply
    from semantic_gaussians_tpu.io.scene import load_scene, realize_camera
    from semantic_gaussians_tpu.models.predictors import (
        RandomFeatureProvider,
        TorchCLIPTextEncoder,
    )
    from semantic_gaussians_tpu.pipelines.distill import (
        load_distill_checkpoint,
    )
    from semantic_gaussians_tpu.models.unet3d import mink_unet
    from semantic_gaussians_tpu.pipelines.eval_segmentation import (
        EvalAccumulator,
        ensemble_features,
        eval_views,
        text_feature_matrix,
        voxel_feats_to_gaussians,
        voxelize_for_net,
    )
    from semantic_gaussians_tpu.pipelines.fusion import load_fused_features
    from semantic_gaussians_tpu.utils.checkpoint import latest_iteration

    cfg = load_config(sys.argv[1])
    print(pretty(cfg))
    e = cfg.eval
    dataset = cfg.scene.get("dataset_name", "cocomap")
    labels = (
        SCANNET20_CLASS_LABELS if dataset == "scannet20" else COCOMAP_CLASS_LABELS
    )

    # text features; eval.model_2d selects a full native provider (lseg /
    # samclip / vlpart — used for BOTH text and the `pretrained` mode's
    # per-view image features, like the reference's model_2d dispatch)
    if e.get("model_2d"):
        from semantic_gaussians_tpu.models.predictors import make_predictor

        enc = make_predictor(e.model_2d, e)
    else:
        tmp = e.get("text_model_path")
        if tmp:
            enc = TorchCLIPTextEncoder(
                tmp, int(cfg.fusion.get("embedding_dim", 768))
            )
        else:
            print("WARNING: no local CLIP checkpoint; using random text features")
            enc = RandomFeatureProvider(int(cfg.fusion.get("embedding_dim", 768)))
    text = text_feature_matrix(enc, labels)

    # scene + gaussians
    scene = load_scene(cfg.scene.scene_path, eval_split=False)
    model_dir = pathlib.Path(cfg.model.model_dir)
    it = cfg.model.get("load_iteration", -1)
    if it == -1:
        it = latest_iteration(model_dir / "point_cloud")
    ply = model_dir / "point_cloud" / f"iteration_{it}" / "point_cloud.ply"
    params, alive = load_gaussian_ply(ply)

    mode = e.get("eval_mode", "2d")
    scene_name = pathlib.Path(cfg.scene.scene_path).name
    feats_2d = feats_3d = None
    if mode in ("2d", "2d_and_3d"):
        fused = sorted(
            (pathlib.Path(cfg.fusion.out_dir) / scene_name).glob("*.pt")
        )[0]
        feats_2d, _ = load_fused_features(fused, capacity=params.capacity)
    if mode in ("3d", "2d_and_3d"):
        dcfg = cfg.distill
        ckpt = pathlib.Path(dcfg.model_dir) / f"model_{dcfg.iteration}.npz"
        variables = load_distill_checkpoint(ckpt)
        n_alive = int(np.asarray(alive).sum())
        locs = np.asarray(params.means)[:n_alive]
        pf = np.asarray(packed_features(params, alive, dcfg.get("feature_type", "all")))[:n_alive]
        budget = int(cfg.distill.get("voxel_budget", 200_000))
        feats_in, topo, inverse, num_valid = voxelize_for_net(
            locs, pf, float(dcfg.get("voxel_size", 0.02)), budget
        )
        model = mink_unet(
            pf.shape[-1], int(cfg.fusion.get("embedding_dim", 768)),
            dcfg.get("model_3d", "MinkUNet34A"),
        )
        vout = model.apply(variables, feats_in, topo, train=False)
        feats_3d = voxel_feats_to_gaussians(
            np.asarray(vout), inverse, n_alive, params.capacity,
            num_valid=num_valid,
        )

    gauss_feats = None
    if mode == "2d":
        gauss_feats = feats_2d
    elif mode == "3d":
        gauss_feats = feats_3d
    elif mode == "2d_and_3d":
        if e.get("feature_fusion", "concat") == "concat":
            gauss_feats = ensemble_features(feats_2d, feats_3d)
            text = np.concatenate([text, text], axis=-1)
        else:
            from semantic_gaussians_tpu.pipelines.eval_segmentation import (
                ensemble_argmax_class,
            )

            # argmax ensemble: per-Gaussian class by max of the two sims,
            # evaluated through the one-hot render path (pred_on_3d)
            cls = ensemble_argmax_class(feats_2d, feats_3d, jnp.asarray(text))
            gauss_feats = jnp.asarray(text)[cls]  # exact class feature
    elif mode not in ("pretrained", "labelmap"):
        raise ValueError(f"unknown eval_mode {mode!r}")

    # eval views + GT labels
    cams, gts, eval_infos = [], [], []
    label_dir = e.get("label_dir")
    wh = (int(e.get("width", 648)), int(e.get("height", 484)))
    mapping_tsv = pathlib.Path(cfg.scene.scene_path) / "scannetv2-labels.modified.tsv"
    mapping = (
        read_label_mapping(
            mapping_tsv,
            label_to="scannetid" if dataset == "scannet20" else "cocomapid",
        )
        if mapping_tsv.exists()
        else None
    )
    from PIL import Image

    for ci in scene.train_cameras[:: 10]:
        lbl_path = None
        if label_dir:
            lbl_path = pathlib.Path(label_dir) / f"{ci.image_name}.png"
        else:
            cand = pathlib.Path(cfg.scene.scene_path) / "label-filt" / f"{ci.image_name}.png"
            if cand.exists():
                lbl_path = cand
        if lbl_path is None or not lbl_path.exists():
            continue
        raw = np.asarray(
            Image.open(lbl_path).resize(wh, Image.NEAREST)
        )
        gt = (
            map_label_image(raw, mapping, len(labels))
            if mapping
            else raw.astype(np.int64)
        )
        gt = np.clip(gt, 0, len(labels))
        from semantic_gaussians_tpu.utils.camera import make_camera

        cams.append(
            make_camera(ci.R, ci.T, ci.fov_x, ci.fov_y, wh[0], wh[1])
        )
        gts.append(gt)
        eval_infos.append(ci)
    if not cams:
        print("no GT label images found — nothing to evaluate")
        return

    if mode == "pretrained":
        # Run the 2D model directly on each eval view, compare per-pixel
        # sims against GT (eval_segmentation.py 'pretrained', :445+).
        acc = EvalAccumulator(len(labels))
        tj = text / np.maximum(
            np.linalg.norm(text, axis=-1, keepdims=True), 1e-8
        )
        for ci, gt in zip(eval_infos, gts):
            feat = enc.extract_image_feature(ci.image_path, wh)
            f = feat / np.maximum(
                np.linalg.norm(feat, axis=-1, keepdims=True), 1e-8
            )
            sims = np.einsum("hwd,kd->hwk", f, tj)
            pix = np.argmax(sims, axis=-1)
            pred = np.where(pix == 0, len(labels), pix - 1)
            acc.add_view(pred, gt)
        miou, macc = acc.report(
            labels, stdout=True, log_file="eval_result.log",
            dataset=f"pretrained/{dataset}",
        )
    elif mode == "labelmap":
        # Precomputed per-view label maps (.pt / .png train-ids) — the
        # LangSplat-comparison path (eval_segmentation.py:535-585).
        import torch

        lm_dir = pathlib.Path(e.get("labelmap_dir") or e.label_dir)
        acc = EvalAccumulator(len(labels))
        for ci, gt in zip(eval_infos, gts):
            p_pt = lm_dir / f"{ci.image_name}.pt"
            p_png = lm_dir / f"{ci.image_name}.png"
            if p_pt.exists():
                lm = torch.load(p_pt, map_location="cpu", weights_only=False)
                lm = np.asarray(lm, np.int64)
            elif p_png.exists():
                lm = np.asarray(Image.open(p_png), np.int64)
            else:
                continue
            if lm.shape != gt.shape:
                lm = np.asarray(
                    Image.fromarray(lm.astype(np.int32), mode="I").resize(
                        (gt.shape[1], gt.shape[0]), Image.NEAREST
                    )
                )
            acc.add_view(np.clip(lm, 0, len(labels)), gt)
        miou, macc = acc.report(
            labels, stdout=True, log_file="eval_result.log",
            dataset=f"labelmap/{dataset}",
        )
    else:
        miou, macc, _ = eval_views(
            cams, gts, params, alive, jnp.asarray(gauss_feats), text, labels,
            pred_on_3d=bool(e.get("pred_on_3d", True)),
            backend=cfg.pipeline.get("backend", "pallas"),
            stdout=True, log_file="eval_result.log",
            chunk_views=int(e.get("chunk_views", 8)),
        )
    print(f"mIoU {miou:.4f}  mAcc {macc:.4f}")


if __name__ == "__main__":
    main()
