"""3D distillation entry point (reference distill.py parity).

Usage:
    python distill.py semantic_gaussians_tpu/config/yamls/distill_scannet.yaml \
        model.model_dir=... fusion.out_dir=... distill.exp_name=...

model_dir/fusion out_dir may contain multiple scenes (subdirectories); each
scene needs point_cloud/iteration_N/point_cloud.ply and <fusion>/<scene>/*.pt.
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))


def main():
    import jax

    from semantic_gaussians_tpu.utils.platform import setup_backend

    setup_backend()  # SGTPU_PLATFORM=cpu escape hatch + TPU compile cache

    from semantic_gaussians_tpu.config.config import load_config, pretty
    from semantic_gaussians_tpu.data.feature_dataset import FeatureDataset
    from semantic_gaussians_tpu.pipelines.distill import (
        DistillConfig,
        train_distill,
    )
    from semantic_gaussians_tpu.utils.checkpoint import latest_iteration

    cfg = load_config(sys.argv[1])
    print(pretty(cfg))
    d = cfg.distill

    model_dir = pathlib.Path(cfg.model.model_dir)
    fusion_dir = pathlib.Path(cfg.fusion.out_dir)
    load_it = cfg.model.get("load_iteration", -1)

    plys, fused = [], []
    scene_dirs = (
        [model_dir]
        if (model_dir / "point_cloud").exists()
        else sorted(p for p in model_dir.iterdir() if p.is_dir())
    )
    for sd in scene_dirs:
        it = load_it if load_it != -1 else latest_iteration(sd / "point_cloud")
        ply = sd / "point_cloud" / f"iteration_{it}" / "point_cloud.ply"
        fdir = fusion_dir / sd.name if (fusion_dir / sd.name).exists() else fusion_dir
        for pt in sorted(fdir.glob("*.pt")):
            plys.append(str(ply))
            fused.append(str(pt))
    print(f"distilling over {len(plys)} (scene, fusion-file) pairs")
    if not plys:
        raise SystemExit(
            f"no (point_cloud.ply, fused .pt) pairs found under "
            f"model_dir={model_dir} / fusion.out_dir={fusion_dir} — check "
            f"that the fusion out_dir contains <scene>/*.pt matching the "
            f"model_dir scene layout"
        )

    ds = FeatureDataset(
        plys, fused,
        voxel_size=float(d.get("voxel_size", 0.02)),
        aug=bool(d.get("aug", True)),
        feature_type=d.get("feature_type", "all"),
        voxel_budget=int(d.get("voxel_budget", 200_000)),
    )
    dcfg = DistillConfig(
        model_3d=d.get("model_3d", "MinkUNet34A"),
        feature_dim=int(cfg.fusion.get("embedding_dim", 768)),
        in_channels=56 if d.get("feature_type", "all") == "all" else 48,
        lr=float(d.get("lr", 1e-3)),
        epochs=int(d.get("epochs", 100)),
        loss_type=d.get("loss_type", "cosine"),
        aug=bool(d.get("aug", True)),
    )
    out_dir = pathlib.Path("output_distill") / str(d.get("exp_name", "distill"))

    # Every-N-epoch semantic render of a validation scene (reference
    # distill.py:151-232): distill.eval_scene names the scene dir; its
    # gaussians come from model_dir/<scene> (or model_dir for single-scene).
    eval_hook = None
    if d.get("eval_scene"):
        from semantic_gaussians_tpu.data.scannet_constants import (
            COCOMAP_CLASS_LABELS,
            SCANNET20_CLASS_LABELS,
        )
        from semantic_gaussians_tpu.io.scene import load_scene, realize_camera
        from semantic_gaussians_tpu.models.predictors import (
            RandomFeatureProvider,
            TorchCLIPTextEncoder,
        )
        from semantic_gaussians_tpu.pipelines.distill import (
            make_eval_render_hook,
        )
        from semantic_gaussians_tpu.pipelines.eval_segmentation import (
            text_feature_matrix,
        )

        labels = (
            SCANNET20_CLASS_LABELS
            if cfg.scene.get("dataset_name", "cocomap") == "scannet20"
            else COCOMAP_CLASS_LABELS
        )
        tmp = cfg.get("eval", {}).get("text_model_path")
        if tmp:
            enc = TorchCLIPTextEncoder(tmp, dcfg.feature_dim)
        else:
            print("WARNING: no local CLIP checkpoint; random text features")
            enc = RandomFeatureProvider(dcfg.feature_dim)
        text = text_feature_matrix(enc, labels)
        escene = pathlib.Path(str(d.eval_scene))
        sd = model_dir / escene.name
        if not (sd / "point_cloud").exists():
            sd = model_dir
        it = load_it if load_it != -1 else latest_iteration(sd / "point_cloud")
        eply = sd / "point_cloud" / f"iteration_{it}" / "point_cloud.ply"
        esc = load_scene(str(escene), eval_split=False)
        cams = [realize_camera(c) for c in esc.train_cameras[:: 40][:3]]
        eval_hook = make_eval_render_hook(
            eply, cams, text, out_dir, dcfg,
            feature_type=d.get("feature_type", "all"),
            voxel_size=float(d.get("voxel_size", 0.02)),
            voxel_budget=int(d.get("voxel_budget", 200_000)),
            backend=cfg.pipeline.get("backend", "pallas"),
        )

    train_distill(
        ds, dcfg, log_every=1, ckpt_dir=str(out_dir),
        save_interval=int(d.get("save_interval", 10)),
        seed=int(cfg.pipeline.get("seed", 1)),
        eval_hook=eval_hook,
        eval_interval=int(d.get("eval_interval", 10)),
    )


if __name__ == "__main__":
    main()
