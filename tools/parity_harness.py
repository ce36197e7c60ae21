import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
"""Synthetic full-protocol training-parity harness (VERDICT r1 item 7).

Real ScanNet/MipNeRF data is unavailable in this sandbox, so this is the
higher-fidelity stand-in: a TEXTURED multi-object scene (checker ground
plane, striped sphere, per-face-textured cube shell, dust) rendered to GT
images from an orbit ring, then the reference's FULL 30k-iteration protocol
(official_train.yaml constants: densify every 100 in [500, 15000], opacity
reset every 3000, SH degree warmup every 1000, exp xyz LR) run from an
SfM-like sparse init. The harness records the densify curve (alive count),
held-out-view PSNR, and schedule invariants, and asserts the behaviors the
reference protocol guarantees:

  * PSNR on held-out views RISES substantially and exceeds a floor.
  * The Gaussian count GROWS during the densify window (clone/split live)
    and does not grow after densify_until_iter (ref train.py:156-174).
  * Right after each opacity reset, max opacity <= 0.011 (reset clamps to
    0.01, one optimizer step may nudge it; gaussian_model.py:283-286).

Reading the curve: PSNR samples are taken 50 iterations AFTER each
multiple-of-500 boundary (iters 550, 1050, ...), so they read recovered fit
quality rather than the bottom of the protocol's deliberate transients
(clone doubles local alpha; reset clamps opacity to 0.01; a densify event
drops test PSNR ~8 dB instantly and ~100 iters recover it —
tools/densify_effect_cpu.py). Round 3 sampled exactly ON the boundaries and
produced a curve of transient bottoms (VERDICT r3 weak #6).

Usage: python tools/parity_harness.py [--iters 30000] [--out PARITY_HARNESS.json]
                                      [--state /tmp/parity_state.pkl]
With --state, progress (train state + curve) checkpoints after every chunk
and a rerun RESUMES — the harness is driven in bounded chunks by the session
runner (long detached processes get reaped in this sandbox).
"""
import argparse
import json
import math
import pickle
import time

import numpy as np


def build_true_scene(rng, density: int = 1, return_classes: bool = False):
    """Textured surfaces as 'true' Gaussians (~21k at density=1, ~107k at 2).

    density=2 is the harness default: it halves the 3-NN init scales so
    splats project at ~6 px median — the regime real SfM-initialized scenes
    occupy. At density=1 the median splat is 16 px and >26% of one view's
    splats exceed the protocol's 20 px screen-size prune
    (gaussian_model.py:592-606, active after the first opacity reset);
    accumulated over 40 views that prunes essentially everything — the
    REFERENCE would annihilate this scene the same way, so the sparse
    variant is a protocol-hostile input, not a parity target.

    Texture frequencies scale WITH density (round 4): at fixed frequency a
    round-3-style scene is smooth at the point spacing — measured 68 dB
    between the true scene rendered 1:1 and 2x-supersampled GT — so ANY
    modest Gaussian set fits it (stride-2/7/20 inits all reached 33-37 dB
    pre-densify) and the densify protocol has nothing to resolve. Real
    captures carry texture beyond the SfM point density; scaling the
    checker/stripe wavelengths down with d restores that property: a
    sparse init renders mush where the texture lives, and only a densified
    model resolves it."""
    pts, cols = [], []
    d = density

    # Checker ground plane y = -0.55 over [-1.6, 1.6]^2.
    g = np.linspace(-1.6, 1.6, 110 * d)
    gx, gz = np.meshgrid(g, g)
    gy = np.full_like(gx, -0.55) + rng.normal(0, 0.004, gx.shape)
    cw = 0.12 / d  # checker cell: ~5 px at d=3 from the ring distance
    cell = ((np.floor(gx / cw) + np.floor(gz / cw)) % 2).astype(bool)
    c = np.where(
        cell[..., None], np.array([0.88, 0.86, 0.80]), np.array([0.16, 0.22, 0.34])
    )
    pts.append(np.stack([gx, gy, gz], -1).reshape(-1, 3))
    cols.append(c.reshape(-1, 3))

    # Striped sphere r=0.5 at origin (fibonacci spiral, longitude stripes x
    # latitude bands -> high-frequency texture).
    n = 6000 * d * d
    i = np.arange(n)
    phi = math.pi * (3.0 - math.sqrt(5.0)) * i
    y = 1 - 2 * (i + 0.5) / n
    r = np.sqrt(1 - y * y)
    sp = 0.5 * np.stack([r * np.cos(phi), y, r * np.sin(phi)], -1)
    lon = np.arctan2(sp[:, 2], sp[:, 0])
    stripes = (np.sin(8 * d * lon) > 0).astype(np.float32)
    bands = (np.sin(7 * d * np.arcsin(np.clip(sp[:, 1] / 0.5, -1, 1))) > 0)
    c = np.stack(
        [
            0.15 + 0.75 * stripes,
            0.2 + 0.6 * bands.astype(np.float32),
            0.8 - 0.6 * stripes,
        ],
        -1,
    )
    pts.append(sp + np.array([0.55, 0.0, 0.1]))
    cols.append(c)

    # Cube shell (side 0.6) at (-0.6, -0.25, -0.2), per-face hue + checker.
    m = 28 * d
    u = np.linspace(-0.3, 0.3, m)
    uu, vv = np.meshgrid(u, u)
    face_pts, face_cols = [], []
    hues = np.array(
        [[0.9, 0.3, 0.2], [0.2, 0.8, 0.3], [0.25, 0.35, 0.9],
         [0.9, 0.8, 0.2], [0.8, 0.25, 0.8], [0.2, 0.8, 0.8]]
    )
    checker = ((np.floor(uu / (0.1 / d)) + np.floor(vv / (0.1 / d))) % 2)[
        ..., None
    ]
    for f in range(6):
        ax = f // 2
        sign = 1.0 if f % 2 == 0 else -1.0
        p = np.zeros((m, m, 3))
        other = [a for a in range(3) if a != ax]
        p[..., other[0]] = uu
        p[..., other[1]] = vv
        p[..., ax] = 0.3 * sign
        face_pts.append(p.reshape(-1, 3))
        fc = hues[f] * (0.45 + 0.55 * checker)
        face_cols.append(np.broadcast_to(fc, (m, m, 3)).reshape(-1, 3))
    cube = np.concatenate(face_pts) + np.array([-0.6, -0.25, -0.2])
    pts.append(cube)
    cols.append(np.concatenate(face_cols))

    # Sparse dust.
    pts.append(rng.normal(0, 0.8, (800, 3)) * np.array([1.2, 0.5, 1.2]))
    cols.append(rng.uniform(0.2, 0.9, (800, 3)))

    pts = np.concatenate(pts).astype(np.float32)
    cols = np.clip(np.concatenate(cols), 0, 1).astype(np.float32)
    if return_classes:
        # Semantic labels per construction segment (semantic_harness.py):
        # 0 = floor (checker plane), 1 = ball, 2 = box, 3 = unlabeled dust.
        n_plane = (110 * d) ** 2
        n_sphere = 6000 * d * d
        n_cube = 6 * (28 * d) ** 2
        cls = np.concatenate([
            np.full(n_plane, 0), np.full(n_sphere, 1),
            np.full(n_cube, 2), np.full(len(pts) - n_plane - n_sphere - n_cube, 3),
        ]).astype(np.int32)
        assert len(cls) == len(pts)
        return pts, cols, cls
    return pts, cols


def ring_camera(i, n, w, h, radius=2.6, height=0.55, fov_x=1.1, make=None):
    ang = 2 * math.pi * i / n
    pos = np.array([radius * math.sin(ang), height, -radius * math.cos(ang)])
    fwd = -pos / np.linalg.norm(pos)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd); right /= np.linalg.norm(right)
    upv = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, :3] = np.stack([right, upv, fwd], axis=1)
    c2w[:3, 3] = pos
    return make(c2w, fov_x, fov_x * h / w, w, h)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30000)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=352)
    ap.add_argument("--out", default="PARITY_HARNESS.json")
    ap.add_argument("--state", default=None, help="chunked resume file")
    ap.add_argument(
        "--max-seconds", type=float, default=1e9,
        help="checkpoint state and exit 3 after this budget (resume later)",
    )
    ap.add_argument(
        "--chunk-iters", type=int, default=50,
        help="50 puts chunk ends at boundary+50 so PSNR samples (every 500, "
        "offset +50) read recovered fit, not densify/reset transients",
    )
    ap.add_argument(
        "--pair-budget", type=int, default=1_572_864,
        help="FIXED pair budget: adaptive budgets recompile the scan graph "
        "on every resize; a generous constant compiles once per capacity",
    )
    ap.add_argument(
        "--init-frac", type=float, default=0.015,
        help="SfM-like init keeps a RANDOM fraction of the true points "
        "(isotropic; round 3's strided row-major selection produced "
        "anisotropic point stripes whose 3-NN scales were wrong). "
        "History: round 2 ran ~17%% and cloning ran away (x45 points, "
        "PSNR stuck at 8) — root-caused to the TPU SSIM precision bug "
        "(commit 738c742) injecting garbage image cotangents into the "
        "densify grad stats, NOT to the sparsity. Round 3 dodged it with "
        "50%%, which over-fit to 37 dB by iter 500 — grad norms sat below "
        "the 0.0002 clone/split threshold, prune outpaced growth, and the "
        "protocol could only LOSE PSNR (VERDICT r3 weak #1). Post-fix, a "
        "genuinely SfM-sparse init leaves densification real work, "
        "matching the regime the reference runs in (ref train.py:112-174). "
        "Round 4 pilots (full-protocol, TPU): at d=3/5%% the run hit "
        "41-42 dB by 7k iters and growth saturated at ~12.7k alive (grad "
        "norms drop under the 0.0002 clone threshold once the GT is fit) "
        "= 1.23x from 10.3k; at d=3/3%% growth peaked 6.2k->8.4k (1.36x) "
        "while under-fit, then the scene saturated at ~40 dB with ~8k "
        "splats and the 3k/6k opacity-reset prunes trimmed the "
        "over-parameterization back to ~7.8k (1.26x at 15k). The growth "
        "a reset-pruned protocol SUSTAINS is bounded by the gaussian "
        "count the GT demands for fit, so the bar is set by scene "
        "difficulty (see --density), and the init must sit well below "
        "that demand. The d=4 GT's measured equilibrium is ~10.3k alive "
        "(41 dB by 4.5k iters), and equilibrium also DRIFTS down ~6%% "
        "per reset cycle as prune culls redundancy from an ever-better "
        "fit — so 2%% (7.3k, bar 9.5k) was still marginal. 1.5%% (5.5k, "
        "bar 7.1k) keeps the sustained population 1.4-1.9x the init "
        "with the drift included.",
    )
    ap.add_argument(
        "--density", type=int, default=4,
        help="true-scene point density d (~206k gaussians at 3, ~366k at "
        "4). The texture wavelength representable by the TRUE scene is "
        "bounded below by its own splat size; at d=2 (6 px splats) every "
        "texture the scene can carry is also fittable by a few thousand "
        "big splats — pilots at 5-50%% init all reached 33-38 dB "
        "pre-densify. d=3 (~6 px checker cells) is the first regime "
        "where a sparse init CANNOT represent the texture; its GT still "
        "saturates at ~40 dB with ~8k splats (round-4 pilots under "
        "--init-frac), so d=4 (~4.5 px cells) is the default: fit "
        "demands a splat population several x any SfM-sparse init and "
        "sustained densification is required, the regime real captures "
        "occupy.",
    )
    ap.add_argument(
        "--init-jitter", type=float, default=0.05,
        help="SfM-like position noise (world units; scene spans ~3.2). "
        "0.02 left the strided subset so faithful that the scene fit to "
        "34.8 dB before densification even started (stride 7 pilot) — "
        "real SfM points carry cm-scale noise at room scale",
    )
    ap.add_argument(
        "--color-noise", type=float, default=0.2,
        help="SfM-like color noise (SfM colors come from one view's pixel)",
    )
    ap.add_argument(
        "--gt-ss", type=int, default=2,
        help="GT supersampling factor: render the true scene at ss x the "
        "training resolution and average-pool down. GT rendered 1:1 from "
        "tiny Gaussians is low-pass smooth (the rasterizer's +0.3 px "
        "dilation), so a 5%% sparse init already fit it to 34 dB and "
        "densification had nothing to resolve (stride-20 pilot). "
        "Supersampled GT carries the sub-pixel detail real photos have — "
        "a denser model with smaller splats approaches it; a sparse one "
        "cannot. This is what makes 'the protocol RAISES PSNR' a "
        "demonstrable claim on synthetic data.",
    )
    ap.add_argument(
        "--capacity", type=int, default=131072,
        help="initial padded capacity: pre-size so capacity-doubling "
        "recompiles (2-5 min each on the remote AOT service) stay rare",
    )
    args = ap.parse_args()

    import jax

    from semantic_gaussians_tpu.utils.platform import setup_backend

    setup_backend()  # honors SGTPU_PLATFORM=cpu; enables TPU compile cache
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from semantic_gaussians_tpu.core.gaussians import init_from_pcd
    from semantic_gaussians_tpu.pipelines.train import (
        TrainConfig,
        init_train_state,
        train_loop,
    )
    from semantic_gaussians_tpu.renderer import render
    from semantic_gaussians_tpu.utils.camera import make_camera_from_c2w
    from semantic_gaussians_tpu.utils.losses import psnr as psnr_fn

    rng = np.random.default_rng(11)
    w, h = args.width, args.height
    tpts, tcols = build_true_scene(rng, density=args.density)
    print(f"true scene: {len(tpts)} gaussians; {w}x{h}")
    true_params, true_alive = init_from_pcd(tpts, tcols, sh_degree=3)

    n_train, n_test = 40, 8
    make = make_camera_from_c2w
    train_cams, test_cams = [], []
    for i in range(n_train):
        cam = ring_camera(i + 0.5 / n_train, n_train, w, h, make=make)
        train_cams.append(cam)
    # Held-out views INTERLEAVED on the SAME ring (half-step between train
    # views) — the reference's eval protocol holds out every 8th frame of
    # the same capture trajectory (llffhold=8, ref scene/dataset_readers),
    # not a different orbit. Round 3 used a wider/higher test ring, which
    # measured out-of-trajectory generalization (train PSNR 43 vs test 30)
    # — a claim the reference protocol never makes.
    for i in range(n_test):
        cam = ring_camera(
            (i + 0.25) * n_train / n_test + 0.5 / n_train, n_train, w, h,
            make=make,
        )
        test_cams.append(cam)

    # GT renders from the true scene (compiled path; renderer parity vs the
    # sequential oracle is separately verified by tools/smoke_parity.py).
    # Cached on disk so chunked resumes skip the ~1 min re-render.
    import dataclasses as dc
    ss = args.gt_ss
    gt_cache = pathlib.Path(
        f"/tmp/parity_gt_v3_ss{ss}_{w}x{h}_{len(tpts)}.npz"
    )
    if gt_cache.exists():
        gt = list(np.load(gt_cache)["gt"])
    else:
        gt = []
        for cam in train_cams + test_cams:
            out = render(cam.resized(w * ss, h * ss), true_params,
                         true_alive, pair_budget=4_194_304 * ss)
            assert int(out["overflow"]) == 0, "GT render clipped pairs"
            img = np.clip(np.asarray(out["render"]), 0.0, 1.0)
            if ss > 1:  # area downsample (pixel-footprint integral)
                img = img.reshape(h, ss, w, ss, 3).mean((1, 3))
            gt.append(img.astype(np.float32))
        np.savez_compressed(gt_cache, gt=np.stack(gt))
    train_cams = [
        dc.replace(c, image=jnp.asarray(gt[i])) for i, c in enumerate(train_cams)
    ]
    test_gt = gt[n_train:]
    print("GT renders done")

    # SfM-like sparse noisy init: every k-th true point + position jitter +
    # color noise (exact-position subsets start at 38 dB, leaving the
    # protocol nothing to demonstrate; SfM points are never exact).
    sel = rng.choice(
        len(tpts), size=max(64, int(len(tpts) * args.init_frac)),
        replace=False,
    )
    init_pts = tpts[sel] + rng.normal(0, args.init_jitter, (len(sel), 3))
    init_cols = np.clip(
        tcols[sel] + rng.normal(0, args.color_noise, (len(sel), 3)), 0, 1
    ).astype(np.float32)
    params, alive = init_from_pcd(
        init_pts.astype(np.float32), init_cols, sh_degree=3,
        capacity=args.capacity,
    )
    state = init_train_state(params, alive)
    cfg = TrainConfig()
    scene_extent = 3.2  # camera-ring norm radius analogue

    def test_psnr(state):
        vals = []
        for cam, g in zip(test_cams, test_gt):
            img = render(
                cam, state.params, alive=state.alive,
                active_sh_degree=min(3, it_done // 1000),
            )["render"]
            vals.append(float(psnr_fn(img, jnp.asarray(g))))
        return float(np.mean(vals))

    key = jax.random.PRNGKey(0)
    curve = []
    reset_checks = []
    it_done = 0
    wall_used = 0.0
    chunk = args.chunk_iters
    if args.state and pathlib.Path(args.state).exists():
        from semantic_gaussians_tpu.utils.checkpoint import load_state

        blob = pickle.loads(pathlib.Path(args.state).read_bytes())
        curve, reset_checks, it_done = (
            blob["curve"], blob["reset_checks"], blob["it_done"],
        )
        wall_used = blob.get("wall_used", 0.0)
        state = load_state(blob["state_path"], state)
        print(f"resumed at iter {it_done} (alive "
              f"{int(np.asarray(state.alive).sum())})", flush=True)
    t0 = time.time()
    while it_done < args.iters:
        n = min(chunk, args.iters - it_done)
        # fold the chunk start into the RNG streams: a fixed key/seed
        # would replay the same densify noise and camera-order prefix in
        # every resumed chunk
        chunk_key = jax.random.fold_in(key, it_done)
        state, hist = train_loop(
            state, train_cams, cfg, chunk_key, scene_extent=scene_extent,
            num_iters=n, log_every=n, iter_offset=it_done,
            steps_per_dispatch=10, pair_budget=args.pair_budget,
            shuffle_seed=it_done,
        )
        ov = max((int(m["overflow"]) for _, m in hist), default=0)
        if ov:
            print(f"WARNING: pair budget overflow {ov} pairs dropped")
        it_done += n
        n_alive = int(np.asarray(state.alive).sum())
        # sample PSNR at boundary+50 (550, 1050, ...): densify fires at
        # multiples of 100 and resets at 3000, so +50 reads recovered fit
        tp = test_psnr(state) if it_done % 500 == 50 or it_done == args.iters \
            else (curve[-1]["test_psnr"] if curve else float("nan"))
        curve.append(
            dict(iter=it_done, alive=n_alive, test_psnr=tp,
                 capacity=int(state.params.capacity), overflow=ov)
        )
        # schedule invariant: right after an opacity reset boundary the max
        # opacity must be near the 0.01 clamp (<= ~50 steps of drift).
        # STRICT < densify_until: the trainer (matching ref train.py:156,172)
        # performs NO reset at exactly iter 15000 — round 3's <= here was an
        # off-by-one that failed the run on correct trainer behavior.
        if it_done % cfg.opacity_reset_interval == 0 and it_done < cfg.densify_until_iter:
            mx = float(
                np.asarray(state.params.opacity)[np.asarray(state.alive)].max()
            )
            reset_checks.append(dict(iter=it_done, max_opacity=mx))
        print(
            f"[{wall_used + time.time()-t0:7.1f}s] iter {it_done}: alive "
            f"{n_alive} test-PSNR {tp:.2f}", flush=True,
        )
        if args.state:
            from semantic_gaussians_tpu.utils.checkpoint import save_state

            sp = args.state + ".ckpt"
            save_state(sp, state)
            pathlib.Path(args.state).write_bytes(
                pickle.dumps(
                    dict(
                        curve=curve, reset_checks=reset_checks,
                        it_done=it_done, state_path=sp,
                        wall_used=wall_used + time.time() - t0,
                    )
                )
            )
            if time.time() - t0 > args.max_seconds and it_done < args.iters:
                print(f"CHUNK DONE at iter {it_done}; resume me", flush=True)
                sys.exit(3)

    alive0 = curve[0]["alive"]
    alive_15k = next(c["alive"] for c in curve if c["iter"] >= min(15000, args.iters))
    alive_end = curve[-1]["alive"]
    alive_peak = max(c["alive"] for c in curve)
    valid_psnrs = [c["test_psnr"] for c in curve if np.isfinite(c["test_psnr"])]
    psnr_first = valid_psnrs[0] if valid_psnrs else float("nan")
    psnr_end = valid_psnrs[-1] if valid_psnrs else float("nan")

    total_overflow = sum(c.get("overflow", 0) for c in curve)
    checks = dict(
        psnr_rises=psnr_end > psnr_first + 3.0,
        psnr_floor=psnr_end >= 27.0,
        densify_grew=alive_15k > alive0 * 1.3,
        no_growth_after_window=(
            args.iters <= 15000 or alive_end <= alive_15k * 1.02
        ),
        opacity_resets_clamped=all(
            rc["max_opacity"] <= 0.011 for rc in reset_checks
        ),
        # VERDICT r2 item 9: no step in the run trained on a clipped pair
        # list (the fixed --pair-budget must be generous enough end-to-end)
        zero_overflow=total_overflow == 0,
    )
    report = dict(
        config=dict(iters=args.iters, width=w, height=h,
                    n_true=len(tpts), n_init=len(sel)),
        curve=curve,
        opacity_reset_checks=reset_checks,
        final=dict(test_psnr=psnr_end, alive=alive_end,
                   alive_peak=alive_peak,
                   total_overflow=total_overflow,
                   wall_s=round(wall_used + time.time() - t0, 1)),
        checks=checks,
    )
    out = pathlib.Path(args.out)
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps(dict(final=report["final"], checks=checks)))
    if not all(checks.values()):
        print("PARITY HARNESS: CHECK FAILURES", flush=True)
        sys.exit(1)
    print("PARITY HARNESS: OK")


if __name__ == "__main__":
    main()
