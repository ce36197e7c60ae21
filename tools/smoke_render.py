import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
"""Smoke-drive the library surface: pcd -> Gaussians -> project -> render -> grad."""
import jax
if __name__ == "__main__":
    import sys
    if "--tpu" not in sys.argv:
        jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp
from semantic_gaussians_tpu.core.gaussians import init_from_pcd
from semantic_gaussians_tpu.utils.camera import make_camera
from semantic_gaussians_tpu.ops.projection import project_gaussians
from semantic_gaussians_tpu.ops.composite_ref import rasterize_dense

def main():
    rng = np.random.default_rng(0)
    n = 500
    pts = rng.normal(size=(n,3)).astype(np.float32) * 0.5 + np.array([0,0,4], np.float32)
    cols = rng.uniform(size=(n,3)).astype(np.float32)
    params, alive = init_from_pcd(pts, cols, sh_degree=3)
    cam = make_camera(np.eye(3), np.zeros(3), 1.0, 0.8, 160, 120)
    def fwd(means):
        p = project_gaussians(means, params.scales, params.quats, params.opacity[:,0],
            cam.world_view, cam.full_proj, cam.camera_center, cam.width, cam.height,
            cam.tan_half_fov_x, cam.tan_half_fov_y, sh_coeffs=params.sh_coeffs,
            sh_degree=3, alive=alive)
        return rasterize_dense(p, cam.width, cam.height, jnp.zeros(3))
    out = fwd(params.means)
    img = np.asarray(out["render"])
    print("render:", img.shape, "range", img.min(), img.max())
    print("depth:", float(out["depth"].min()), float(out["depth"].max()))
    g = jax.grad(lambda m: fwd(m)["render"].sum())(params.means)
    g = np.asarray(g)
    print("grad finite:", bool(np.isfinite(g).all()), "nonzero rows:", int((np.abs(g).sum(-1)>0).sum()))

if __name__ == "__main__":
    main()
