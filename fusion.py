"""2D->3D fusion entry point (reference fusion.py parity).

Usage:
    python fusion.py semantic_gaussians_tpu/config/yamls/fusion_scannet.yaml \
        scene.scene_path=... model.model_dir=... fusion.out_dir=...
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np


def main():
    import jax

    from semantic_gaussians_tpu.utils.platform import setup_backend

    setup_backend()  # SGTPU_PLATFORM=cpu escape hatch + TPU compile cache

    from semantic_gaussians_tpu.config.config import load_config, pretty
    from semantic_gaussians_tpu.io.ply import load_gaussian_ply
    from semantic_gaussians_tpu.io.dynamic_npz import load_dynamic_npz
    from semantic_gaussians_tpu.io.scene import load_scene, realize_camera
    from semantic_gaussians_tpu.models.predictors import make_predictor
    from semantic_gaussians_tpu.pipelines.fusion import (
        FusionConfig,
        fuse_scene,
        save_fused_features,
    )
    from semantic_gaussians_tpu.utils.checkpoint import latest_iteration

    cfg = load_config(sys.argv[1])
    print(pretty(cfg))
    f = cfg.fusion

    scene = load_scene(
        cfg.scene.scene_path,
        eval_split=bool(cfg.scene.get("test_cameras", False)),
        downscale=float(cfg.scene.get("downscale_ratio", 1)),
        images_dir=cfg.scene.get("colmap_images", "images"),
    )
    cameras = [realize_camera(c, with_image=False) for c in scene.train_cameras]
    image_paths = [c.image_path for c in scene.train_cameras]

    model_dir = pathlib.Path(cfg.model.model_dir)
    if cfg.model.get("dynamic"):
        dyn = load_dynamic_npz(model_dir / "params.npz")
        params, alive = dyn.params_at(0)
    else:
        it = cfg.model.get("load_iteration", -1)
        if it == -1:
            it = latest_iteration(model_dir / "point_cloud")
        ply = model_dir / "point_cloud" / f"iteration_{it}" / "point_cloud.ply"
        params, alive = load_gaussian_ply(ply)
        print(f"loaded {ply}: {int(np.asarray(alive).sum())} gaussians")

    # model_2d dispatch (reference fusion.py:260-294): precomputed/openseg
    # (offline exports), lseg / samclip / vlpart (native JAX towers from
    # local torch checkpoints), random (tests).
    provider = make_predictor(f.get("model_2d", "precomputed"), f)

    fcfg = FusionConfig(
        img_dim=tuple(f.get("img_dim", (648, 484))),
        every_k_views=int(f.get("every_k_views", 5)),
        depth=f.get("depth", "render"),
        depth_scale=float(f.get("depth_scale", 1000.0)),
        visibility_threshold=float(f.get("visibility_threshold", 0.05)),
        cut_boundary=int(f.get("cut_boundary", 10)),
        chunk_views=int(f.get("chunk_views", 4)),
    )
    feats, visited = fuse_scene(
        params, alive, cameras, provider, fcfg, image_paths=image_paths,
        backend=cfg.pipeline.get("backend", "pallas"),
    )
    scene_name = pathlib.Path(cfg.scene.scene_path).name
    out = pathlib.Path(f.out_dir) / scene_name / "0.pt"
    save_fused_features(
        out, np.asarray(feats), np.asarray(visited),
        n_split_points=int(f.get("n_split_points", 999_999_999)),
        num_rand_file_per_scene=int(f.get("num_rand_file_per_scene", 1)),
    )
    print(f"fused {int(np.asarray(visited).sum())} gaussians -> {out}")


if __name__ == "__main__":
    main()
