import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
"""Generate a tiny synthetic Blender-format scene on disk (for e2e drives).

Renders a known random Gaussian set from a camera ring with the dense oracle
and writes transforms_train.json + PNGs + points3d.ply.
"""
import json
import math

import numpy as np


def main(out_dir, n_cams=6, w=128, h=96, n_gauss=300, seed=3):
    from semantic_gaussians_tpu.utils.platform import setup_backend

    setup_backend()  # honors SGTPU_PLATFORM=cpu
    from PIL import Image

    from semantic_gaussians_tpu.core.gaussians import init_from_pcd
    from semantic_gaussians_tpu.io.ply import save_point_cloud
    from semantic_gaussians_tpu.renderer import render
    from semantic_gaussians_tpu.utils.camera import make_camera_from_c2w

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    pts = (rng.normal(size=(n_gauss, 3)) * 0.4).astype(np.float32)
    cols = rng.uniform(size=(n_gauss, 3)).astype(np.float32)
    params, alive = init_from_pcd(pts, cols, sh_degree=3)
    save_point_cloud(out / "points3d.ply", pts, cols)

    fov_x = 1.0
    frames = []
    for i in range(n_cams):
        ang = 2 * math.pi * i / n_cams
        r = 3.0
        pos = np.array([r * math.sin(ang), 0.3, -r * math.cos(ang)])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        c2w_cv = np.eye(4)
        c2w_cv[:3, :3] = np.stack([right, upv, fwd], axis=1)
        c2w_cv[:3, 3] = pos
        cam = make_camera_from_c2w(c2w_cv, fov_x, fov_x * h / w, w, h)
        img = render(cam, params, alive, backend="dense")["render"]
        img8 = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
        name = f"r_{i}"
        Image.fromarray(img8).save(out / f"{name}.png")
        # transforms json stores OpenGL-convention c2w (loader flips back)
        c2w_gl = c2w_cv.copy()
        c2w_gl[:3, 1:3] *= -1
        frames.append(
            {"file_path": name, "transform_matrix": c2w_gl.tolist()}
        )
    json.dump(
        {"camera_angle_x": fov_x, "frames": frames},
        open(out / "transforms_train.json", "w"),
    )
    print(f"wrote toy scene to {out} ({n_cams} views)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/toy_scene")
