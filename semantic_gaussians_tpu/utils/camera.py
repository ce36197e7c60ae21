"""Camera model.

Parity targets: /root/reference/scene/camera.py (Camera, MiniCam) and
/root/reference/utils/graphics_utils.py:34-85 (getWorld2View2,
getProjectionMatrix, fov/focal conversions).

Convention note: the reference stores matrices TRANSPOSED (glm row-vector
style, camera.py:81-94). We store plain column-vector matrices:
  p_cam  = world_view @ [p, 1]
  p_clip = full_proj  @ [p, 1]
and convert at the PLY/loader boundary. `Camera` is a frozen dataclass
registered as a JAX pytree; image sizes are static (hashable) fields so a
jitted render specializes per resolution, not per pose.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def world_to_view(
    R: np.ndarray,
    t: np.ndarray,
    translate: np.ndarray = np.zeros(3),
    scale: float = 1.0,
) -> np.ndarray:
    """4x4 world->camera matrix with optional recentring.

    `R` is the camera-to-world rotation (the reference stores it transposed and
    calls it R — scene/scannet_loader.py:40); `t` is the world->camera
    translation, exactly the reference's getWorld2View2 inputs
    (graphics_utils.py:42-53).
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    cam_center = (C2W[:3, 3] + translate) * scale
    C2W[:3, 3] = cam_center
    return np.linalg.inv(C2W).astype(np.float32)


def projection_matrix(
    znear: float, zfar: float, fov_x: float, fov_y: float
) -> np.ndarray:
    """OpenGL-ish perspective projection; reference graphics_utils.py:56-76."""
    tan_half_fov_y = math.tan(fov_y / 2)
    tan_half_fov_x = math.tan(fov_x / 2)
    top = tan_half_fov_y * znear
    right = tan_half_fov_x * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """A single view. Pytree: matrices/image are leaves; sizes/fovs static."""

    world_view: jnp.ndarray  # [4,4] world->camera (column convention)
    full_proj: jnp.ndarray  # [4,4] proj @ world_view
    camera_center: jnp.ndarray  # [3] camera position in world
    image: Optional[jnp.ndarray]  # [H,W,3] float in [0,1], or None (MiniCam)
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    fov_x: float = dataclasses.field(metadata=dict(static=True))
    fov_y: float = dataclasses.field(metadata=dict(static=True))
    znear: float = dataclasses.field(default=0.01, metadata=dict(static=True))
    zfar: float = dataclasses.field(default=100.0, metadata=dict(static=True))
    image_name: str = dataclasses.field(default="", metadata=dict(static=True))

    @property
    def tan_half_fov_x(self) -> float:
        return math.tan(self.fov_x / 2)

    @property
    def tan_half_fov_y(self) -> float:
        return math.tan(self.fov_y / 2)

    @property
    def focal_x(self) -> float:
        return fov2focal(self.fov_x, self.width)

    @property
    def focal_y(self) -> float:
        return fov2focal(self.fov_y, self.height)

    def resized(self, width: int, height: int) -> "Camera":
        """Same pose/fov, different render resolution (render override_shape)."""
        return dataclasses.replace(self, width=width, height=height, image=None)


def make_camera(
    R: np.ndarray,
    t: np.ndarray,
    fov_x: float,
    fov_y: float,
    width: int,
    height: int,
    image: Optional[np.ndarray] = None,
    znear: float = 0.01,
    zfar: float = 100.0,
    translate: np.ndarray = np.zeros(3),
    scale: float = 1.0,
    image_name: str = "",
) -> Camera:
    """Build a Camera from reference-style (R, t) extrinsics + FoVs.

    Mirrors scene/camera.py:41-95 (including znear=0.01, zfar=100 defaults).
    """
    wv = world_to_view(R, t, translate, scale)
    proj = projection_matrix(znear, zfar, fov_x, fov_y)
    full = (proj @ wv).astype(np.float32)
    cam_center = np.linalg.inv(wv)[:3, 3].astype(np.float32)
    return Camera(
        world_view=jnp.asarray(wv),
        full_proj=jnp.asarray(full),
        camera_center=jnp.asarray(cam_center),
        image=None if image is None else jnp.asarray(image),
        width=int(width),
        height=int(height),
        fov_x=float(fov_x),
        fov_y=float(fov_y),
        znear=float(znear),
        zfar=float(zfar),
        image_name=image_name,
    )


def make_camera_from_c2w(
    c2w: np.ndarray,
    fov_x: float,
    fov_y: float,
    width: int,
    height: int,
    **kw,
) -> Camera:
    """Camera from a 4x4 camera-to-world pose (viewer path,
    utils/camera_utils.py:89-103)."""
    w2c = np.linalg.inv(np.asarray(c2w, dtype=np.float64))
    R = w2c[:3, :3].T  # reference convention: R stored transposed
    t = w2c[:3, 3]
    return make_camera(R, t, fov_x, fov_y, width, height, **kw)
