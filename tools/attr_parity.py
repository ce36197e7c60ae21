import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
"""Attribution harness for TPU grad-parity drift: dump per-backend grads.

Usage: python tools/attr_parity.py out.npz [--cpu]
Then compare npz files across backends to see WHICH side (pallas kernel vs
dense oracle) moves between CPU (exact f32) and TPU hardware.
"""
import numpy as np
import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from smoke_parity import _scene, cache_dir  # noqa: E402


def main():
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from semantic_gaussians_tpu.ops.projection import project_gaussians
    from semantic_gaussians_tpu.ops.rasterize import rasterize
    from semantic_gaussians_tpu.utils.camera import make_camera
    from semantic_gaussians_tpu.utils.sh import rgb_to_sh

    n, W, H, seed = 500, 128, 128, 4
    rng = np.random.default_rng(seed)
    means, scales, quats, opac, _ = _scene(n, seed)
    k = 16
    sh = np.zeros((n, k, 3), np.float32)
    sh[:, 0] = np.asarray(rgb_to_sh(rng.uniform(size=(n, 3)).astype(np.float32)))
    sh[:, 1:] = rng.normal(size=(n, k - 1, 3)) * 0.02
    sh = jnp.asarray(sh)
    cam = make_camera(np.eye(3), np.zeros(3), 1.4, 1.1, W, H)
    wgt = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    bg = jnp.zeros(3)

    def loss_fn(backend, m, s, q, o, c):
        proj = project_gaussians(
            m, s, q, o,
            cam.world_view, cam.full_proj, cam.camera_center,
            cam.width, cam.height, cam.tan_half_fov_x, cam.tan_half_fov_y,
            sh_coeffs=c, sh_degree=3,
        )
        return jnp.sum(rasterize(proj, bg, W, H, backend=backend)["render"] * wgt)

    out = {}
    for backend in ("pallas", "dense"):
        g = jax.jit(
            jax.grad(lambda *a: loss_fn(backend, *a), argnums=(0, 1, 2, 3, 4))
        )(means, scales, quats, opac, sh)
        for nm, arr in zip(["means", "scales", "quats", "opac", "sh"], g):
            out[f"{backend}_{nm}"] = np.asarray(arr)
    np.savez(sys.argv[1], **out)
    print("saved", sys.argv[1], "backend:", jax.default_backend())


if __name__ == "__main__":
    main()
