import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
"""Drive the tiled Pallas rasterizer on the current backend (TPU by default)."""
import time
import numpy as np
import jax, jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update('jax_platforms', 'cpu')

from semantic_gaussians_tpu.ops.projection import project_gaussians
from semantic_gaussians_tpu.ops.rasterize import rasterize
from semantic_gaussians_tpu.utils.camera import make_camera
from semantic_gaussians_tpu.utils.sh import rgb_to_sh

def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    n = 20000
    W, H = 640, 480
    means = rng.normal(size=(n,3)).astype(np.float32) * np.array([1.2,0.9,0.8],np.float32) + np.array([0,0,4],np.float32)
    scales = jnp.asarray(np.exp(rng.uniform(-3.5,-2.0,size=(n,3))).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(n,4)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.2,0.9,size=(n,)).astype(np.float32))
    k = 16
    sh = np.zeros((n,k,3), np.float32)
    sh[:,0] = np.asarray(rgb_to_sh(rng.uniform(size=(n,3)).astype(np.float32)))
    sh[:,1:] = rng.normal(size=(n,k-1,3))*0.02
    sh = jnp.asarray(sh)
    cam = make_camera(np.eye(3), np.zeros(3), 1.4, 1.1, W, H)
    bg = jnp.zeros(3)

    def fwd(means, scales, quats, opac, sh):
        proj = project_gaussians(means, scales, quats, opac,
            cam.world_view, cam.full_proj, cam.camera_center,
            cam.width, cam.height, cam.tan_half_fov_x, cam.tan_half_fov_y,
            sh_coeffs=sh, sh_degree=3)
        return rasterize(proj, bg, W, H)

    t0 = time.time()
    out = jax.block_until_ready(fwd(means, scales, quats, opac, sh))
    print(f"fwd compile+run: {time.time()-t0:.1f}s; overflow={int(out['overflow'])}")
    img = np.asarray(out["render"]) 
    print("render:", img.shape, "range", float(img.min()), float(img.max()),
          "finite:", bool(np.isfinite(img).all()))
    print("covered px:", int((np.asarray(out['final_T'])<0.9).sum()), "/", H*W)

    # timing fwd
    for _ in range(2):
        jax.block_until_ready(fwd(means, scales, quats, opac, sh))
    t0 = time.time(); iters = 10
    for _ in range(iters):
        out = fwd(means, scales, quats, opac, sh)
    jax.block_until_ready(out)
    dt = (time.time()-t0)/iters
    print(f"fwd: {dt*1000:.2f} ms => {H*W/dt/1e6:.1f} Mrays/s")

    # fwd+bwd
    lossf = jax.jit(jax.grad(lambda m,s,q,o,c: jnp.sum(fwd(m,s,q,o,c)["render"]**2), argnums=(0,1,2,3,4)))
    t0 = time.time()
    g = jax.block_until_ready(lossf(means, scales, quats, opac, sh))
    print(f"bwd compile+run: {time.time()-t0:.1f}s; grads finite:",
          all(bool(np.isfinite(np.asarray(x)).all()) for x in g))
    t0 = time.time()
    for _ in range(iters):
        g = lossf(means, scales, quats, opac, sh)
    jax.block_until_ready(g)
    dt = (time.time()-t0)/iters
    print(f"fwd+bwd: {dt*1000:.2f} ms => {H*W/dt/1e6:.1f} Mrays/s")

if __name__ == "__main__":
    main()
