"""Unit tests for the math core: SH, transforms, camera, losses, knn.

Oracles are independent NumPy re-derivations of the closed-form math (per
SURVEY.md §4: the reference's Python mirrors give exact expectations).
"""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from semantic_gaussians_tpu.utils import sh as sh_mod
from semantic_gaussians_tpu.utils.transforms import (
    build_covariance_3d,
    build_scaling_rotation,
    normalize_quat,
    quat_to_rotmat,
    rotmat_to_quat,
    strip_symmetric,
    unstrip_symmetric,
)
from semantic_gaussians_tpu.utils.camera import (
    make_camera,
    projection_matrix,
    world_to_view,
    fov2focal,
    focal2fov,
)
from semantic_gaussians_tpu.utils.losses import l1_loss, photometric_loss, psnr, ssim
from semantic_gaussians_tpu.utils.schedules import expon_lr_schedule
from semantic_gaussians_tpu.ops.knn import knn_mean_sq_dist


# --- SH -------------------------------------------------------------------
def _ref_eval_sh(deg, sh, dirs):
    """Direct port of the polynomial form (reference sh_utils.py:56-115)."""
    C0, C1 = 0.28209479177387814, 0.4886025119029199
    C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
          -1.0925484305920792, 0.5462742152960396]
    C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
          0.3731763325901154, -0.4570457994644658, 1.445305721320277,
          -0.5900435899266435]
    result = C0 * sh[..., 0]
    if deg > 0:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = result - C1 * y * sh[..., 1] + C1 * z * sh[..., 2] - C1 * x * sh[..., 3]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result + C2[0] * xy * sh[..., 4] + C2[1] * yz * sh[..., 5]
                      + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6]
                      + C2[3] * xz * sh[..., 7] + C2[4] * (xx - yy) * sh[..., 8])
            if deg > 2:
                result = (result
                          + C3[0] * y * (3 * xx - yy) * sh[..., 9]
                          + C3[1] * xy * z * sh[..., 10]
                          + C3[2] * y * (4 * zz - xx - yy) * sh[..., 11]
                          + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12]
                          + C3[4] * x * (4 * zz - xx - yy) * sh[..., 13]
                          + C3[5] * z * (xx - yy) * sh[..., 14]
                          + C3[6] * x * (xx - 3 * yy) * sh[..., 15])
    return result


@pytest.mark.parametrize("deg", [0, 1, 2, 3])
def test_eval_sh_matches_polynomial(rng, deg):
    n, c = 64, 3
    k = (deg + 1) ** 2
    sh = rng.normal(size=(n, c, k)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    got = np.asarray(sh_mod.eval_sh(deg, jnp.asarray(sh), jnp.asarray(dirs)))
    want = _ref_eval_sh(deg, sh, dirs)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_rgb_sh_roundtrip(rng):
    rgb = rng.uniform(size=(10, 3)).astype(np.float32)
    back = np.asarray(sh_mod.sh_to_rgb(sh_mod.rgb_to_sh(jnp.asarray(rgb))))
    np.testing.assert_allclose(back, rgb, rtol=1e-5, atol=1e-6)


# --- transforms -----------------------------------------------------------
def test_quat_to_rotmat_orthonormal(rng):
    q = normalize_quat(jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32)))
    R = np.asarray(quat_to_rotmat(q))
    eye = np.eye(3)[None].repeat(32, 0)
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(32), atol=1e-5)


def test_quat_identity():
    R = np.asarray(quat_to_rotmat(jnp.array([[1.0, 0, 0, 0]])))
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-7)


def test_quat_roundtrip(rng):
    q = np.asarray(normalize_quat(jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32))))
    # canonicalize sign (q and -q are the same rotation)
    q = q * np.sign(q[:, :1] + 1e-12)
    q2 = np.asarray(rotmat_to_quat(quat_to_rotmat(jnp.asarray(q))))
    q2 = q2 * np.sign(q2[:, :1] + 1e-12)
    np.testing.assert_allclose(q2, q, atol=1e-4)


def test_covariance_psd_and_eigs(rng):
    scales = jnp.asarray(np.abs(rng.normal(size=(16, 3))).astype(np.float32) + 0.1)
    quats = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    cov = np.asarray(build_covariance_3d(scales, quats))
    np.testing.assert_allclose(cov, cov.transpose(0, 2, 1), atol=1e-6)
    eigs = np.sort(np.linalg.eigvalsh(cov), axis=-1)
    want = np.sort(np.asarray(scales) ** 2, axis=-1)
    np.testing.assert_allclose(eigs, want, rtol=1e-3, atol=1e-5)


def test_strip_unstrip_roundtrip(rng):
    scales = jnp.asarray(np.abs(rng.normal(size=(8, 3))).astype(np.float32) + 0.1)
    quats = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    cov = build_covariance_3d(scales, quats)
    np.testing.assert_allclose(
        np.asarray(unstrip_symmetric(strip_symmetric(cov))), np.asarray(cov), atol=1e-6
    )


# --- camera ---------------------------------------------------------------
def test_projection_matrix_reference_values():
    znear, zfar = 0.01, 100.0
    fovx, fovy = math.radians(60), math.radians(45)
    P = projection_matrix(znear, zfar, fovx, fovy)
    # Reference getProjectionMatrix (graphics_utils.py:56-76)
    assert np.isclose(P[0, 0], znear / (math.tan(fovx / 2) * znear))
    assert np.isclose(P[1, 1], 1.0 / math.tan(fovy / 2))
    assert np.isclose(P[2, 2], zfar / (zfar - znear))
    assert np.isclose(P[2, 3], -(zfar * znear) / (zfar - znear))
    assert P[3, 2] == 1.0


def test_world_to_view_identity():
    wv = world_to_view(np.eye(3), np.zeros(3))
    np.testing.assert_allclose(wv, np.eye(4), atol=1e-7)


def test_camera_center_matches_inverse():
    rng = np.random.default_rng(3)
    # random rotation via QR
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.normal(size=3)
    cam = make_camera(Q, t, 1.0, 0.8, 64, 48)
    wv = np.asarray(cam.world_view)
    center = np.asarray(cam.camera_center)
    # camera center maps to origin in view space
    p = wv[:3, :3] @ center + wv[:3, 3]
    np.testing.assert_allclose(p, np.zeros(3), atol=1e-5)


def test_fov_focal_roundtrip():
    assert np.isclose(focal2fov(fov2focal(1.1, 640), 640), 1.1)


def test_camera_is_pytree():
    cam = make_camera(np.eye(3), np.zeros(3), 1.0, 0.8, 64, 48)
    leaves = jax.tree_util.tree_leaves(cam)
    assert len(leaves) == 3  # world_view, full_proj, camera_center (image None)
    f = jax.jit(lambda c: c.world_view @ jnp.ones(4))
    f(cam)


# --- losses ---------------------------------------------------------------
def test_ssim_self_is_one(rng):
    img = jnp.asarray(rng.uniform(size=(32, 40, 3)).astype(np.float32))
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-4)


def test_psnr_known():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    assert float(psnr(a, b)) == pytest.approx(20.0, abs=1e-3)


def test_photometric_loss_zero_at_match(rng):
    img = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))
    assert float(photometric_loss(img, img)) == pytest.approx(0.0, abs=1e-5)
    assert float(l1_loss(img, img)) == 0.0


def test_expon_lr_schedule_endpoints():
    s = expon_lr_schedule(1e-2, 1e-4, max_steps=100)
    assert float(s(0)) == pytest.approx(1e-2, rel=1e-5)
    assert float(s(100)) == pytest.approx(1e-4, rel=1e-5)
    mid = float(s(50))
    assert mid == pytest.approx(1e-3, rel=1e-4)  # log-linear midpoint


# --- knn ------------------------------------------------------------------
def test_knn_matches_bruteforce(rng):
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    got = np.asarray(knn_mean_sq_dist(jnp.asarray(pts), block_q=64, block_p=128))
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_cov2d_elementwise_matches_matmul_oracle(rng):
    """The fused elementwise EWA paths (packed-6 and scales/quats) must match
    the straightforward J W Sigma W^T J^T batched-matmul construction
    (forward.cu:74-113) in value AND gradient."""
    import jax
    import jax.numpy as jnp
    from semantic_gaussians_tpu.ops.projection import (
        LOWPASS,
        NEAR_CULL_Z,
        compute_cov2d,
        compute_cov2d_from_scales_quats,
    )
    from semantic_gaussians_tpu.utils.transforms import (
        build_covariance_3d,
        strip_symmetric,
    )

    n = 64
    means = jnp.asarray(
        rng.normal(size=(n, 3)).astype(np.float32) + np.array([0, 0, 4])
    )
    scales = jnp.asarray(np.exp(rng.normal(size=(n, 3)) * 0.3).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    th = 0.3
    wv = np.eye(4, dtype=np.float32)
    wv[:3, :3] = np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
        np.float32,
    )
    wv = jnp.asarray(wv)
    fx, fy, tx, ty = 200.0, 180.0, 1.1, 0.9

    def oracle(means, scales, quats):
        W = wv[:3, :3]
        t = means @ W.T + wv[:3, 3]
        tz = jnp.where(t[:, 2] > NEAR_CULL_Z, t[:, 2], 1.0)
        txy = jnp.clip(t[:, 0] / tz, -1.3 * tx, 1.3 * tx) * tz
        tyy = jnp.clip(t[:, 1] / tz, -1.3 * ty, 1.3 * ty) * tz
        iz = 1.0 / tz
        zeros = jnp.zeros_like(tz)
        J = jnp.stack(
            [
                jnp.stack([fx * iz, zeros, -fx * txy * iz * iz], -1),
                jnp.stack([zeros, fy * iz, -fy * tyy * iz * iz], -1),
            ],
            -2,
        )
        JW = J @ W
        cov3d = build_covariance_3d(scales, quats)
        cov = JW @ cov3d @ jnp.swapaxes(JW, -1, -2)
        return jnp.stack(
            [cov[:, 0, 0] + LOWPASS, cov[:, 0, 1], cov[:, 1, 1] + LOWPASS], -1
        )

    ref = np.asarray(oracle(means, scales, quats))
    got_sq = np.asarray(
        compute_cov2d_from_scales_quats(
            means, scales, quats, wv, fx, fy, tx, ty
        )
    )
    np.testing.assert_allclose(got_sq, ref, rtol=2e-5, atol=2e-5)
    cov6 = strip_symmetric(build_covariance_3d(scales, quats))
    got_p6 = np.asarray(compute_cov2d(means, cov6, wv, fx, fy, tx, ty))
    np.testing.assert_allclose(got_p6, ref, rtol=2e-5, atol=2e-5)

    # gradient parity through a scalar functional
    w = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))

    def f_new(m, s, q):
        return jnp.sum(
            compute_cov2d_from_scales_quats(m, s, q, wv, fx, fy, tx, ty) * w
        )

    def f_ref(m, s, q):
        return jnp.sum(oracle(m, s, q) * w)

    g_new = jax.grad(f_new, argnums=(0, 1, 2))(means, scales, quats)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(means, scales, quats)
    for a, b in zip(g_new, g_ref):
        scale = np.abs(np.asarray(b)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-5
        )


def test_bin_gaussians_matches_bruteforce(rng):
    """Pair expansion + tile decode (bit-packed table, cummax offsets) vs a
    numpy enumeration, including rect clamping at grid edges and the
    gen-order invariants the segment-sum VJP relies on."""
    import jax
    import jax.numpy as jnp
    from semantic_gaussians_tpu.ops.binning import bin_gaussians, tile_rects

    n = 120
    th, tw = 16, 32
    nty, ntx = 6, 5  # 96 x 160 px image
    means2d = jnp.asarray(
        rng.uniform(-40, 200, size=(n, 2)).astype(np.float32)
    )  # includes off-screen means (rects clamp to the grid edge)
    depths = jnp.asarray(rng.uniform(0.5, 10, size=(n,)).astype(np.float32))
    radii = jnp.asarray(
        (rng.uniform(0, 60, size=(n, 2)) * (rng.uniform(size=(n, 1)) > 0.2))
        .astype(np.float32)
    )  # ~20% zero -> culled
    budget = 4096
    b = bin_gaussians(means2d, depths, radii, (th, tw), (nty, ntx), budget)

    # numpy enumeration
    x0, x1, y0, y1, counts = map(np.asarray, tile_rects(
        means2d, radii, (th, tw), (nty, ntx)
    ))
    pairs = []  # (tile, depth, gid)
    d = np.asarray(depths)
    for g in range(n):
        if counts[g] == 0:
            continue
        for ty in range(y0[g], y1[g]):
            for tx in range(x0[g], x1[g]):
                pairs.append((ty * ntx + tx, d[g], g))
    total = len(pairs)
    assert int(b.num_pairs) == total and int(b.overflow) == 0
    pairs.sort(key=lambda p: (p[0], p[1]))  # tile-major, depth within tile
    want_g = np.array([p[2] for p in pairs])
    got_g = np.asarray(b.pair_gaussian)[:total]
    np.testing.assert_array_equal(got_g, want_g)
    np.testing.assert_array_equal(
        np.asarray(b.pair_tile)[:total], [p[0] for p in pairs]
    )
    # tile ranges partition the sorted list
    starts = np.asarray(b.tile_start)
    cnts = np.asarray(b.tile_count)
    assert cnts.sum() == total
    for t in range(nty * ntx):
        seg = np.asarray(b.pair_tile)[starts[t] : starts[t] + cnts[t]]
        assert (seg == t).all()

    # gen-order invariants (segment-sum contract): owners non-decreasing,
    # increments <= 1; gen_of_tile_pos maps tile slots to their gen pairs
    owners = np.asarray(b.gen_owner)[:total]
    diffs = np.diff(owners)
    assert (diffs >= 0).all() and (diffs <= 1).all()
    gtp = np.asarray(b.gen_of_tile_pos)[:total]
    assert len(np.unique(gtp)) == total
    # the gaussian at tile slot p is gen pair gen_of_tile_pos[p], whose
    # owner's original id must match
    o2d = np.asarray(b.orig_to_dense)
    np.testing.assert_array_equal(o2d[got_g], owners[gtp])


def test_expand_kernel_matches_xla_path(rng, monkeypatch):
    """The Pallas pair-expand kernel (ops.expand) must agree BITWISE with
    the XLA scatter/cummax/gather fallback it replaces — same scene as the
    bruteforce test plus overflow (budget smaller than the pair count)."""
    import jax.numpy as jnp
    from semantic_gaussians_tpu.ops.binning import bin_gaussians

    n = 120
    means2d = jnp.asarray(rng.uniform(-40, 200, size=(n, 2)).astype(np.float32))
    depths = jnp.asarray(rng.uniform(0.5, 10, size=(n,)).astype(np.float32))
    radii = jnp.asarray(
        (rng.uniform(0, 60, size=(n, 2)) * (rng.uniform(size=(n, 1)) > 0.2))
        .astype(np.float32)
    )
    for budget in (4096, 512):  # 512 overflows this scene: clipped pair list
        b_kernel = bin_gaussians(
            means2d, depths, radii, (16, 32), (6, 5), budget
        )
        monkeypatch.setenv("SGTPU_NO_EXPAND", "1")
        b_xla = bin_gaussians.__wrapped__(
            means2d, depths, radii, (16, 32), (6, 5), budget
        )
        monkeypatch.delenv("SGTPU_NO_EXPAND")
        for f in (
            "pair_gaussian", "pair_tile", "tile_start", "tile_count",
            "num_pairs", "overflow", "gen_of_tile_pos", "gen_owner",
            "orig_to_dense", "gen_live",
        ):
            np.testing.assert_array_equal(
                np.asarray(getattr(b_kernel, f)),
                np.asarray(getattr(b_xla, f)),
                err_msg=f"{f} (budget {budget})",
            )
