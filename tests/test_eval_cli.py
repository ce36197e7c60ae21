"""eval_segmentation.py CLI smoke: all 5 modes end-to-end on a tmp scene.

Pins the thin root-level CLI branches (pretrained / labelmap in particular,
which the pipeline-level tests don't reach): build a toy Blender scene with
label images, a trained-PLY stand-in, fused features, and a distill
checkpoint, then drive eval_segmentation.main() in-process per mode.
"""
import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

EMB = 8
N_CLASSES = 20  # cocomap labelset


@pytest.fixture(scope="module")
def eval_setup(tmp_path_factory):
    from PIL import Image

    sys.path.insert(0, str(REPO / "tools"))
    import make_toy_scene

    from semantic_gaussians_tpu.core.gaussians import init_from_pcd
    from semantic_gaussians_tpu.io.ply import save_gaussian_ply
    from semantic_gaussians_tpu.io.scene import load_scene
    from semantic_gaussians_tpu.models.unet3d import mink_unet
    from semantic_gaussians_tpu.pipelines.distill import (
        save_distill_checkpoint,
    )
    from semantic_gaussians_tpu.pipelines.fusion import save_fused_features

    tmp = tmp_path_factory.mktemp("eval_cli")
    scene_dir = tmp / "toy_scene"
    make_toy_scene.main(scene_dir, n_cams=2, w=64, h=48, n_gauss=150)

    rng = np.random.default_rng(0)
    # eval iterates train_cameras[::10] and needs label images per view
    scene = load_scene(str(scene_dir), eval_split=False)
    (scene_dir / "label-filt").mkdir()
    for c in scene.train_cameras:
        lbl = rng.integers(0, N_CLASSES + 1, size=(48, 64)).astype(np.uint8)
        Image.fromarray(lbl).save(scene_dir / "label-filt" / f"{c.image_name}.png")

    # trained-model stand-in
    pts = (rng.normal(size=(150, 3)) * 0.4).astype(np.float32)
    cols = rng.uniform(size=(150, 3)).astype(np.float32)
    params, alive = init_from_pcd(pts, cols, capacity=256)
    model_dir = tmp / "model"
    save_gaussian_ply(
        model_dir / "point_cloud" / "iteration_100" / "point_cloud.ply",
        params, np.asarray(alive),
    )

    # fused 2D features
    fdir = tmp / "fusion" / scene_dir.name
    save_fused_features(
        fdir / "0.pt",
        rng.normal(size=(256, EMB)).astype(np.float32),
        np.asarray(alive),
    )

    # distill checkpoint (in_channels=56 'all' packing, EMB out)
    import jax

    ddir = tmp / "distill"
    model = mink_unet(56, EMB, "MinkUNet14A")
    from semantic_gaussians_tpu.models.unet3d import build_topology
    import jax.numpy as jnp

    coords = jnp.zeros((64, 3), jnp.int32)
    mask = jnp.arange(64) < 8
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((64, 56)),
        build_topology(coords, mask), train=False,
    )
    save_distill_checkpoint(ddir / "model_100.npz", variables)

    # labelmap predictions dir
    lmdir = tmp / "labelmaps"
    lmdir.mkdir()
    for c in scene.train_cameras:
        lm = rng.integers(0, N_CLASSES + 1, size=(48, 64)).astype(np.uint8)
        Image.fromarray(lm).save(lmdir / f"{c.image_name}.png")

    return dict(
        scene=scene_dir, model=model_dir, fusion=tmp / "fusion",
        distill=ddir, labelmaps=lmdir,
    )


def _run_eval(setup, mode, extra=()):
    import eval_segmentation
    from unittest import mock

    argv = [
        "eval_segmentation.py",
        str(REPO / "semantic_gaussians_tpu/config/yamls/eval.yaml"),
        f"scene.scene_path={setup['scene']}",
        f"model.model_dir={setup['model']}",
        f"fusion.out_dir={setup['fusion']}",
        f"fusion.embedding_dim={EMB}",
        f"distill.model_dir={setup['distill']}",
        "distill.model_3d=MinkUNet14A",
        "distill.iteration=100",
        "distill.voxel_size=0.05",
        "distill.voxel_budget=512",
        f"eval.eval_mode={mode}",
        "eval.width=64",
        "eval.height=48",
        "pipeline.backend=dense",
        *extra,
    ]
    with mock.patch.object(sys, "argv", argv):
        eval_segmentation.main()


@pytest.mark.slow
@pytest.mark.parametrize(
    "mode,extra",
    [
        ("2d", ()),
        ("3d", ()),
        ("2d_and_3d", ("eval.feature_fusion=argmax",)),
        ("pretrained", ()),
        ("labelmap", ()),
    ],
)
def test_eval_cli_modes(eval_setup, mode, extra, capsys):
    if mode == "labelmap":
        extra = (*extra, f"eval.labelmap_dir={eval_setup['labelmaps']}")
    _run_eval(eval_setup, mode, extra)
    out = capsys.readouterr().out
    assert "mIoU" in out
