import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
"""Hardware oracle-parity smoke: compiled Pallas kernels vs the dense oracle.

Runs ON THE CURRENT BACKEND (TPU by default) and reports max abs diffs for
the render and for gradients, at three configs:

  rgb     render parity at N=5000 @ 640x480; end-to-end grad parity (through
          projection+SH) at N=500 @ 128x128 — the dense oracle's BACKWARD
          materializes (N, H, W) temporaries (its scan transpose), so the
          grad configs are sized to HBM, not to the render size.
  c512    N=400 @ 128x128, C=512 feature compositing, grads wrt proj fields
  c768    N=400 @ 128x128, C=768 (OpenSeg embedding width,
          /root/reference/submodules/channel-rasterization/cuda_rasterizer/forward.cu:304
          caps at 768), grads wrt proj fields

Budget: every diff must be <= 1e-3 (BASELINE.md north-star parity). The wide-C
grad check is the guard the reference never had — its N-channel backward was
compiled for C=3 only and silently wrong beyond it (SURVEY.md §2.1-B).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"


def _maxdiff(a, b):
    return float(jnp.max(jnp.abs(a - b)))


def _scene(n, seed=0, num_ch=3):
    rng = np.random.default_rng(seed)
    means = jnp.asarray(
        rng.normal(size=(n, 3)).astype(np.float32)
        * np.array([1.2, 0.9, 0.8], np.float32)
        + np.array([0, 0, 4], np.float32)
    )
    scales = jnp.asarray(np.exp(rng.uniform(-3.5, -2.0, size=(n, 3))).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.2, 0.9, size=(n,)).astype(np.float32))
    feats = jnp.asarray(rng.uniform(size=(n, num_ch)).astype(np.float32))
    return means, scales, quats, opac, feats


def run_rgb():
    from semantic_gaussians_tpu.ops.projection import project_gaussians
    from semantic_gaussians_tpu.ops.rasterize import rasterize
    from semantic_gaussians_tpu.utils.camera import make_camera
    from semantic_gaussians_tpu.utils.sh import rgb_to_sh

    def build(n, W, H, seed):
        rng = np.random.default_rng(seed)
        means, scales, quats, opac, _ = _scene(n, seed)
        k = 16
        sh = np.zeros((n, k, 3), np.float32)
        sh[:, 0] = np.asarray(rgb_to_sh(rng.uniform(size=(n, 3)).astype(np.float32)))
        sh[:, 1:] = rng.normal(size=(n, k - 1, 3)) * 0.02
        sh = jnp.asarray(sh)
        cam = make_camera(np.eye(3), np.zeros(3), 1.4, 1.1, W, H)
        wgt = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
        return (means, scales, quats, opac, sh), cam, wgt

    def make_fns(cam, wgt, W, H):
        bg = jnp.zeros(3)

        def out_fn(backend, m, s, q, o, c):
            proj = project_gaussians(
                m, s, q, o,
                cam.world_view, cam.full_proj, cam.camera_center,
                cam.width, cam.height, cam.tan_half_fov_x, cam.tan_half_fov_y,
                sh_coeffs=c, sh_degree=3,
            )
            return rasterize(proj, bg, W, H, backend=backend)

        def loss_fn(backend, *a):
            return jnp.sum(out_fn(backend, *a)["render"] * wgt)

        return out_fn, loss_fn

    # Render parity at full bench resolution.
    args, cam, wgt = build(5000, 640, 480, 1)
    out_fn, _ = make_fns(cam, wgt, 640, 480)
    o_p = jax.jit(lambda *a: out_fn("pallas", *a))(*args)
    o_d = jax.jit(lambda *a: out_fn("dense", *a))(*args)
    assert int(o_p["overflow"]) == 0
    print(f"[rgb] render maxdiff {_maxdiff(o_p['render'], o_d['render']):.2e}  "
          f"depth {_maxdiff(o_p['depth'], o_d['depth']):.2e}  "
          f"final_T {_maxdiff(o_p['final_T'], o_d['final_T']):.2e}")
    assert _maxdiff(o_p["render"], o_d["render"]) <= 1e-3, "render parity"

    # End-to-end grad parity at an HBM-sized config (oracle backward is
    # O(N*H*W) memory).
    args, cam, wgt = build(500, 128, 128, 4)
    _, loss_fn = make_fns(cam, wgt, 128, 128)
    g_p = jax.jit(jax.grad(lambda *a: loss_fn("pallas", *a), argnums=(0, 1, 2, 3, 4)))(*args)
    g_d = jax.jit(jax.grad(lambda *a: loss_fn("dense", *a), argnums=(0, 1, 2, 3, 4)))(*args)
    names = ["means", "scales", "quats", "opac", "sh"]
    worst = 0.0
    for nm, a, b in zip(names, g_p, g_d):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        d = _maxdiff(a, b) / scale
        worst = max(worst, d)
        print(f"[rgb] grad {nm:>7}: scaled maxdiff {d:.2e}")
    assert worst <= 1e-3, "grad parity"


def run_wide(num_ch):
    from semantic_gaussians_tpu.ops.projection import project_gaussians
    from semantic_gaussians_tpu.ops.rasterize import rasterize
    from semantic_gaussians_tpu.utils.camera import make_camera
    import dataclasses

    n, W, H = 400, 128, 128
    means, scales, quats, opac, feats = _scene(n, 2, num_ch)
    cam = make_camera(np.eye(3), np.zeros(3), 1.4, 1.1, W, H)
    bg = jnp.zeros(num_ch)
    rng = np.random.default_rng(3)
    wgt = jnp.asarray(rng.uniform(size=(H, W, num_ch)).astype(np.float32))

    proj0 = jax.jit(
        lambda m, s, q, o, f: project_gaussians(
            m, s, q, o,
            cam.world_view, cam.full_proj, cam.camera_center,
            cam.width, cam.height, cam.tan_half_fov_x, cam.tan_half_fov_y,
            override_color=f,
        )
    )(means, scales, quats, opac, feats)

    def loss_fn(backend, m2d, con, op, col):
        p = dataclasses.replace(
            proj0, means2d=m2d, conics=con, opacities=op, colors=col
        )
        return jnp.sum(rasterize(p, bg, W, H, backend=backend)["render"] * wgt)

    args = (proj0.means2d, proj0.conics, proj0.opacities, proj0.colors)
    t0 = time.time()
    o_p = jax.jit(lambda *a: jnp.sum(
        rasterize(dataclasses.replace(
            proj0, means2d=a[0], conics=a[1], opacities=a[2], colors=a[3]),
            bg, W, H, backend="pallas")["render"] * wgt))(*args)
    o_d = jax.jit(lambda *a: jnp.sum(
        rasterize(dataclasses.replace(
            proj0, means2d=a[0], conics=a[1], opacities=a[2], colors=a[3]),
            bg, W, H, backend="dense")["render"] * wgt))(*args)
    g_p = jax.jit(jax.grad(lambda *a: loss_fn("pallas", *a), argnums=(0, 1, 2, 3)))(*args)
    g_d = jax.jit(jax.grad(lambda *a: loss_fn("dense", *a), argnums=(0, 1, 2, 3)))(*args)
    jax.block_until_ready((g_p, g_d))
    names = ["means2d", "conics", "opac", "colors"]
    worst = 0.0
    for nm, a, b in zip(names, g_p, g_d):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        d = _maxdiff(a, b) / scale
        worst = max(worst, d)
        print(f"[c{num_ch}] grad {nm:>8}: scaled maxdiff {d:.2e}")
    print(f"[c{num_ch}] weighted-render diff {abs(float(o_p) - float(o_d)) / max(1.0, abs(float(o_d))):.2e}  "
          f"({time.time() - t0:.0f}s)")
    assert worst <= 1e-3, f"C={num_ch} grad parity"


def main():
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("backend:", jax.default_backend())
    which = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "all"
    if which in ("all", "rgb"):
        run_rgb()
    if which in ("all", "c512"):
        run_wide(512)
    if which in ("all", "c768"):
        run_wide(768)
    print("PARITY OK")


if __name__ == "__main__":
    main()
