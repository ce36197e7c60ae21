"""scannet_sens_reader round-trip: synth .sens -> export -> scene loader.

Pins the tool against the .sens v4 container layout (reference
tools/scannet_sens_reader.py / public ScanNet SensReader) without needing a
real capture: a 3-frame file is synthesized byte-for-byte, exported, and the
export is consumed by load_scannet_scene.
"""
import io
import struct
import zipfile
import zlib
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from tools.scannet_sens_reader import SensFile, export


def _make_sens(path, n_frames=3, cw=32, ch=24, dw=16, dh=12, seed=0):
    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    buf.write(struct.pack("<I", 4))
    name = b"synthetic"
    buf.write(struct.pack("<Q", len(name)) + name)
    K_color = np.array(
        [[40.0, 0, cw / 2, 0], [0, 40.0, ch / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32,
    )
    K_depth = np.array(
        [[20.0, 0, dw / 2, 0], [0, 20.0, dh / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32,
    )
    eye = np.eye(4, dtype=np.float32)
    for m in (K_color, eye, K_depth, eye):
        buf.write(m.astype("<f4").tobytes())
    buf.write(struct.pack("<ii", 2, 1))  # jpeg color, zlib_ushort depth
    buf.write(struct.pack("<4I", cw, ch, dw, dh))
    buf.write(struct.pack("<f", 1000.0))
    buf.write(struct.pack("<Q", n_frames))

    poses, depths = [], []
    for i in range(n_frames):
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [0.1 * i, 0.0, 0.2 * i]
        poses.append(c2w)
        buf.write(c2w.astype("<f4").tobytes())
        buf.write(struct.pack("<QQ", i, i))
        img = Image.fromarray(
            rng.integers(0, 255, size=(ch, cw, 3), dtype=np.uint8), "RGB"
        )
        jb = io.BytesIO()
        img.save(jb, format="JPEG", quality=95)
        color = jb.getvalue()
        dep = rng.integers(100, 5000, size=(dh, dw), dtype=np.uint16)
        depths.append(dep)
        depth = zlib.compress(dep.tobytes())
        buf.write(struct.pack("<QQ", len(color), len(depth)))
        buf.write(color)
        buf.write(depth)
    path.write_bytes(buf.getvalue())
    return poses, depths


def test_sens_roundtrip(tmp_path):
    sens_path = tmp_path / "scene0000_00.sens"
    poses, depths = _make_sens(sens_path)

    sens = SensFile(sens_path)
    assert len(sens.frames) == 3
    assert sens.color_width == 32 and sens.depth_height == 12
    assert sens.depth_shift == 1000.0
    np.testing.assert_allclose(sens.frames[2].camera_to_world, poses[2])
    np.testing.assert_array_equal(sens.decode_depth(sens.frames[1]), depths[1])

    out = tmp_path / "export"
    export(sens, out, size=None, frame_skip=1)
    assert sorted(p.name for p in (out / "color").iterdir()) == [
        "0.jpg", "1.jpg", "2.jpg",
    ]
    # depth PNGs round-trip the uint16 values exactly
    back = np.asarray(Image.open(out / "depth" / "1.png"))
    np.testing.assert_array_equal(back.astype(np.uint16), depths[1])
    pose1 = np.loadtxt(out / "pose" / "1.txt")
    np.testing.assert_allclose(pose1, poses[1], atol=1e-5)

    # the export is a loadable ScanNet scene
    from semantic_gaussians_tpu.io.scene import load_scannet_scene

    scene = load_scannet_scene(out, eval_split=False)
    assert len(scene.train_cameras) == 3
    assert scene.train_cameras[0].width == 32


def test_unzip_label_filt(tmp_path):
    from tools.unzip_label_filt import extract_scene

    scene = tmp_path / "scene0000_00"
    (scene / "color").mkdir(parents=True)
    for i in (0, 5):
        (scene / "color" / f"{i}.jpg").write_bytes(b"x")
    zip_path = tmp_path / "labels.zip"
    lab = Image.fromarray(np.full((4, 4), 7, np.uint8))
    with zipfile.ZipFile(zip_path, "w") as zf:
        for i in (0, 5, 10):  # 10 exists in zip but was not exported
            b = io.BytesIO()
            lab.save(b, format="PNG")
            zf.writestr(f"label-filt/{i}.png", b.getvalue())
    n = extract_scene(scene, zip_path)
    assert n == 2
    assert (scene / "label-filt" / "5.png").exists()
    assert not (scene / "label-filt" / "10.png").exists()
