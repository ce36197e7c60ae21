"""COLMAP parser tests: text/binary parity, empty-POINTS2D pairing, FoV,
scene assembly (reference scene/colmap_loader.py:45-388 semantics)."""
import struct

import numpy as np
import pytest

from semantic_gaussians_tpu.io.colmap import (
    intrinsics_to_fov,
    load_colmap_model,
    qvec2rotmat,
    read_cameras_binary,
    read_cameras_text,
    read_images_binary,
    read_images_text,
    read_points3d_binary,
    read_points3d_text,
)


def _write_text_model(d, empty_points_line=True):
    (d / "cameras.txt").write_text(
        "# Camera list\n"
        "1 PINHOLE 640 480 500.0 510.0 320.0 240.0\n"
        "2 SIMPLE_PINHOLE 320 240 260.0 160.0 120.0\n"
    )
    # image 1 has 2D points, image 2's POINTS2D line is EMPTY (unregistered/
    # filtered images do this) — the 2-line pairing must survive it
    lines = [
        "# Image list",
        "1 0.9961947 0.08715574 0.0 0.0 0.1 -0.2 0.3 1 a.png",
        "10.5 20.5 7 30.0 40.0 -1",
        "2 1.0 0.0 0.0 0.0 0.5 0.6 0.7 2 b.png",
        "" if empty_points_line else "1.0 2.0 3",
    ]
    (d / "images.txt").write_text("\n".join(lines) + "\n")
    (d / "points3D.txt").write_text(
        "# 3D points\n"
        "7 1.0 2.0 3.0 255 128 0 0.5 1 0 2 1\n"
        "9 -1.0 0.0 4.0 0 255 64 1.25 1 1\n"
    )


def _write_binary_model(d):
    with open(d / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))  # PINHOLE
        f.write(struct.pack("<dddd", 500.0, 510.0, 320.0, 240.0))
    with open(d / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<i", 1))
        f.write(struct.pack("<dddd", 0.9961947, 0.08715574, 0.0, 0.0))
        f.write(struct.pack("<ddd", 0.1, -0.2, 0.3))
        f.write(struct.pack("<i", 1))
        f.write(b"a.png\x00")
        f.write(struct.pack("<Q", 1))  # one 2D point
        f.write(struct.pack("<ddq", 10.5, 20.5, 7))
    with open(d / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<QdddBBBd", 7, 1.0, 2.0, 3.0, 255, 128, 0, 0.5))
        f.write(struct.pack("<Q", 2))  # track of length 2
        f.write(struct.pack("<iiii", 1, 0, 2, 1))


def test_text_model_with_empty_points2d_line(tmp_path):
    _write_text_model(tmp_path)
    cams = read_cameras_text(tmp_path / "cameras.txt")
    images = read_images_text(tmp_path / "images.txt")
    assert set(cams) == {1, 2} and set(images) == {1, 2}
    assert images[2].name == "b.png" and images[2].camera_id == 2
    np.testing.assert_allclose(images[2].tvec, [0.5, 0.6, 0.7])
    xyz, rgb, err = read_points3d_text(tmp_path / "points3D.txt")
    assert xyz.shape == (2, 3)
    np.testing.assert_allclose(rgb[0], [1.0, 128 / 255.0, 0.0])
    np.testing.assert_allclose(err, [0.5, 1.25])


def test_binary_matches_text(tmp_path):
    _write_text_model(tmp_path)
    _write_binary_model(tmp_path)
    ct = read_cameras_text(tmp_path / "cameras.txt")[1]
    cb = read_cameras_binary(tmp_path / "cameras.bin")[1]
    assert (ct.model, ct.width, ct.height) == (cb.model, cb.width, cb.height)
    np.testing.assert_allclose(ct.params, cb.params)
    it = read_images_text(tmp_path / "images.txt")[1]
    ib = read_images_binary(tmp_path / "images.bin")[1]
    assert it.name == ib.name and it.camera_id == ib.camera_id
    np.testing.assert_allclose(it.qvec, ib.qvec)
    np.testing.assert_allclose(it.tvec, ib.tvec)
    xt = read_points3d_text(tmp_path / "points3D.txt")
    xb = read_points3d_binary(tmp_path / "points3D.bin")
    np.testing.assert_allclose(xt[0][0], xb[0][0])
    np.testing.assert_allclose(xt[1][0], xb[1][0])


def test_qvec2rotmat_oracle():
    # 90 deg about z: q = (cos45, 0, 0, sin45)
    q = np.array([np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)])
    R = qvec2rotmat(q)
    np.testing.assert_allclose(
        R, [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-12
    )
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)


def test_intrinsics_to_fov():
    import math

    from semantic_gaussians_tpu.io.colmap import ColmapCamera

    cam = ColmapCamera(1, "PINHOLE", 640, 480,
                       np.array([500.0, 510.0, 320.0, 240.0]))
    fx, fy = intrinsics_to_fov(cam)
    assert fx == pytest.approx(2 * math.atan(640 / 1000.0))
    assert fy == pytest.approx(2 * math.atan(480 / 1020.0))
    s = ColmapCamera(2, "SIMPLE_PINHOLE", 320, 240,
                     np.array([260.0, 160.0, 120.0]))
    fx, fy = intrinsics_to_fov(s)
    assert fx == pytest.approx(2 * math.atan(320 / 520.0))


def test_load_colmap_scene_text_and_ply_fallback(tmp_path):
    import jax

    from semantic_gaussians_tpu.io.ply import save_point_cloud
    from semantic_gaussians_tpu.io.scene import load_colmap_scene

    sparse = tmp_path / "sparse"  # NOT sparse/0 — probe must follow this
    sparse.mkdir()
    _write_text_model(sparse)
    info = load_colmap_scene(tmp_path, eval_split=False)
    assert len(info.train_cameras) == 2
    assert info.points.shape == (2, 3)

    # same model without points3D.txt, with a PLY in the FOUND model dir
    t2 = tmp_path / "ply_case"
    (t2 / "sparse").mkdir(parents=True)
    _write_text_model(t2 / "sparse")
    (t2 / "sparse" / "points3D.txt").unlink()
    pts = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0], [6.0, 7.0, 8.0]],
                   np.float32)
    cols = np.full((3, 3), 0.5, np.float32)
    save_point_cloud(t2 / "sparse" / "points3D.ply", pts, cols)
    info2 = load_colmap_scene(t2, eval_split=False)
    np.testing.assert_allclose(info2.points, pts)
