"""RGB 3DGS training entry point.

Usage (reference train.py parity):
    python train.py <config.yaml> [key=value ...]
e.g.
    python train.py semantic_gaussians_tpu/config/yamls/official_train.yaml \
        scene.scene_path=/data/scene0000_00 train.exp_name=run1
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
    from semantic_gaussians_tpu.core.gaussians import init_from_pcd, num_alive
    from semantic_gaussians_tpu.io.ply import save_gaussian_ply
    from semantic_gaussians_tpu.io.scene import load_scene, realize_camera
    from semantic_gaussians_tpu.pipelines.train import (
        TrainConfig,
        init_train_state,
        train_loop,
    )
    from semantic_gaussians_tpu.core.densify import DensifyConfig
    from semantic_gaussians_tpu.core.optimizer import TrainHyper
    from semantic_gaussians_tpu.utils.checkpoint import save_state
    from semantic_gaussians_tpu.utils.seeding import set_seed

    cfg = load_config(sys.argv[1])
    # Multi-host: jax.distributed.initialize MUST precede any backend touch
    # (parallel.multihost docstring has the 2-host launch recipe).
    distributed = bool(cfg.pipeline.get("distributed", False))
    if distributed:
        from semantic_gaussians_tpu.parallel import multihost

        multihost.init_distributed()
        print(
            f"[distributed] process {jax.process_index()}/"
            f"{jax.process_count()}, {jax.local_device_count()} local devices"
        )
    print(pretty(cfg))
    key = set_seed(int(cfg.pipeline.get("seed", 0)))

    scene = load_scene(
        cfg.scene.scene_path,
        eval_split=bool(cfg.scene.get("test_cameras", True)),
        downscale=float(cfg.scene.get("downscale_ratio", 1)),
        images_dir=cfg.scene.get("colmap_images", "images"),
        white_background=bool(cfg.scene.get("white_background", False)),
    )
    print(
        f"scene: {len(scene.train_cameras)} train / {len(scene.test_cameras)} "
        f"test cameras, {len(scene.points)} init points, "
        f"extent {scene.nerf_normalization['radius']:.2f}"
    )
    cameras = [
        realize_camera(c, white_background=bool(cfg.scene.get("white_background")))
        for c in scene.train_cameras
    ]

    t = cfg.train
    params, alive = init_from_pcd(
        scene.points, scene.colors, sh_degree=int(cfg.model.sh_degree),
        capacity=cfg.model.get("capacity"),
    )
    state = init_train_state(params, alive)
    tc = TrainConfig(
        hyper=TrainHyper(
            position_lr_init=t.position_lr_init,
            position_lr_final=t.position_lr_final,
            position_lr_delay_mult=t.position_lr_delay_mult,
            position_lr_max_steps=t.position_lr_max_steps,
            feature_lr=t.feature_lr,
            opacity_lr=t.opacity_lr,
            scaling_lr=t.scaling_lr,
            rotation_lr=t.rotation_lr,
        ),
        densify=DensifyConfig(
            grad_threshold=t.densify_grad_threshold,
            percent_dense=t.percent_dense,
        ),
        iterations=int(t.iterations),
        lambda_dssim=float(t.lambda_dssim),
        cut_edge=bool(t.get("cut_edge", False)),
        densification_interval=int(t.densification_interval),
        opacity_reset_interval=int(t.opacity_reset_interval),
        densify_from_iter=int(t.densify_from_iter),
        densify_until_iter=int(t.densify_until_iter),
        max_sh_degree=int(cfg.model.sh_degree),
        white_background=bool(cfg.scene.get("white_background", False)),
        random_background=bool(t.get("random_background", False)),
        spatial_lr_scale=float(scene.nerf_normalization["radius"]),
    )

    import jax as _jax
    primary = (not distributed) or _jax.process_index() == 0
    out_dir = pathlib.Path("output") / str(t.exp_name)
    if primary:
        out_dir.mkdir(parents=True, exist_ok=True)
        (out_dir / "config.yaml").write_text(pretty(cfg))

    save_iters = set(int(i) for i in t.get("save_iterations", []))
    ckpt_iters = set(int(i) for i in t.get("checkpoint_iterations", []))
    test_iters = set(int(i) for i in t.get("test_iterations", []))
    backend = cfg.pipeline.get("backend", "pallas")
    budget = cfg.pipeline.get("pair_budget")

    test_cams = None
    if scene.test_cameras:
        test_cams = [
            realize_camera(
                c, white_background=bool(cfg.scene.get("white_background"))
            )
            for c in scene.test_cameras
        ]

    # chunked driver: snapshot / checkpoint / evaluate at milestone iters
    done = 0
    # Milestones beyond the requested iteration count (e.g. the yaml's
    # default test/save lists when iterations is overridden down) must not
    # extend training past it (ref train.py trains exactly `iterations`).
    milestones = sorted(
        set(
            i
            for i in (
                list(save_iters) + list(ckpt_iters) + list(test_iters)
                + [int(t.iterations)]
            )
            if i <= int(t.iterations)
        )
    )
    if distributed:
        from semantic_gaussians_tpu.parallel.multihost import (
            make_view_band_mesh,
        )

        dist_mesh = make_view_band_mesh()
        print(f"[distributed] mesh {dict(dist_mesh.shape)}")

    for target in milestones:
        if target <= done:
            continue
        if distributed:
            from semantic_gaussians_tpu.parallel.train_parallel import (
                hybrid_train_loop,
            )

            state, _ = hybrid_train_loop(
                state, cameras, tc, key, dist_mesh,
                scene_extent=scene.nerf_normalization["radius"],
                num_iters=target - done, log_every=100,
                pair_budget=budget, iter_offset=done,
                zero=bool(cfg.pipeline.get("zero", False)),
            )
        else:
            state, _ = train_loop(
                state, cameras, tc, key, scene.nerf_normalization["radius"],
                num_iters=target - done, backend=backend, log_every=100,
                pair_budget=budget, tb_dir=str(out_dir / "tb_logs"),
                iter_offset=done,
                steps_per_dispatch=int(t.get("steps_per_dispatch", 10)),
            )
        done = target
        if target in test_iters and test_cams:
            # reference eval() (train.py:34-72): L1/PSNR over test views
            from semantic_gaussians_tpu.renderer import render as _render
            from semantic_gaussians_tpu.utils.losses import l1_loss, psnr

            l1s, psnrs = [], []
            for tc_cam in test_cams[:8]:
                out = _render(
                    tc_cam, state.params, alive=state.alive,
                    bg=jnp.ones(3) if tc.white_background else jnp.zeros(3),
                    backend=backend, pair_budget=budget,
                )
                l1s.append(float(l1_loss(out["render"], tc_cam.image)))
                psnrs.append(float(psnr(out["render"], tc_cam.image)))
            print(
                f"[test @ {target}] L1 {np.mean(l1s):.4f} "
                f"PSNR {np.mean(psnrs):.2f}"
            )
        if primary and (target in save_iters or target == int(t.iterations)):
            ply = out_dir / "point_cloud" / f"iteration_{target}" / "point_cloud.ply"
            save_gaussian_ply(ply, state.params, np.asarray(state.alive))
            print(f"saved {ply} ({int(num_alive(state.alive))} gaussians)")
        if primary and target in ckpt_iters:
            save_state(out_dir / f"ckpt_{target}", state)
            print(f"checkpointed iteration {target}")


if __name__ == "__main__":
    main()
