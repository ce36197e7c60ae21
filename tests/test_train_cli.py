"""train.py CLI smoke: the root entry point end-to-end on a tmp toy scene.

Pins the milestone schedule: yaml default test/save iteration lists reach
30000, so an `train.iterations` override below them must still stop training
at the override (regression: the milestone loop kept training to the yaml's
30000 list entries) and save the final PLY at exactly that iteration.
"""
import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


@pytest.mark.slow
def test_train_cli_stops_at_iterations_override(tmp_path, monkeypatch):
    sys.path.insert(0, str(REPO / "tools"))
    import make_toy_scene

    scene_dir = tmp_path / "scene"
    make_toy_scene.main(scene_dir, n_cams=3, w=64, h=48, n_gauss=120)

    monkeypatch.chdir(tmp_path)  # train.py writes ./output/<exp_name>
    import train as train_cli
    from unittest import mock

    argv = [
        "train.py",
        str(REPO / "semantic_gaussians_tpu/config/yamls/official_train.yaml"),
        f"scene.scene_path={scene_dir}",
        "train.exp_name=CLI_SMOKE",
        "pipeline.backend=dense",
        "train.iterations=30",
        "train.densify_from_iter=10",
        "train.densify_until_iter=20",
        "train.steps_per_dispatch=5",
        # default yaml lists contain 100/7000/30000 — all above the override
    ]
    with mock.patch.object(sys, "argv", argv):
        train_cli.main()

    out = tmp_path / "output" / "CLI_SMOKE"
    iters = sorted(p.name for p in (out / "point_cloud").iterdir())
    assert iters == ["iteration_30"], iters
    ply = out / "point_cloud" / "iteration_30" / "point_cloud.ply"
    assert ply.exists() and ply.stat().st_size > 0
    assert (out / "config.yaml").exists()
