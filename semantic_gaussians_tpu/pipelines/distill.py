"""3D distillation: train the sparse UNet to predict fused 2D features.

Parity: /root/reference/distill.py:60-148 — MinkUNet34A (56 -> embedding_dim),
AdamW lr 1e-3 + cosine annealing over epochs, cosine-similarity loss over
voxels with supervision (||gt|| > 0), random global coordinate shift per
batch (:104), periodic checkpointing. The step is fully jitted (topology
build + UNet fwd/bwd); data prep is host-side (FeatureDataset).
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.feature_dataset import DistillItem, FeatureDataset
from ..models.unet3d import build_topology, mink_unet
from ..utils.losses import cosine_distill_loss, l1_loss, l2_loss


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    model_3d: str = "MinkUNet34A"
    feature_dim: int = 768
    in_channels: int = 56  # feature_type 'all'
    voxel_size: float = 0.02
    lr: float = 1e-3
    weight_decay: float = 0.01
    epochs: int = 100
    loss_type: str = "cosine"  # cosine | l1 | l2
    aug: bool = True
    # multiple 2D teachers: the net emits num_heads * feature_dim channels and
    # each fused-feature source supervises its head slice (distill.py:118-124)
    num_heads: int = 1
    head_id: int = 0


def make_distill_state(
    cfg: DistillConfig, voxel_budget: int, steps_per_epoch: int, seed: int = 0
):
    """Init model params + optimizer. Returns (model, variables, tx, opt_state)."""
    model = mink_unet(
        in_channels=cfg.in_channels,
        out_channels=cfg.feature_dim * cfg.num_heads,
        arch=cfg.model_3d,
    )
    rng = np.random.default_rng(seed)
    coords = jnp.asarray(
        rng.integers(0, 32, size=(min(voxel_budget, 512), 3)), jnp.int32
    )
    cap = coords.shape[0]
    mask = jnp.ones((cap,), bool)
    topo = build_topology(coords, mask)
    x = jnp.zeros((cap, cfg.in_channels))
    variables = model.init(jax.random.PRNGKey(seed), x, topo)
    schedule = optax.cosine_decay_schedule(
        cfg.lr, cfg.epochs * max(steps_per_epoch, 1)
    )
    tx = optax.adamw(schedule, weight_decay=cfg.weight_decay)
    opt_state = tx.init(variables["params"])
    return model, variables, tx, opt_state


def make_distill_step(model, tx, cfg: DistillConfig):
    loss_fns = {"cosine": cosine_distill_loss, "l1": l1_loss, "l2": l2_loss}

    @jax.jit
    def step(variables, opt_state, coords, feats, gt, gt_mask, mask):
        topo = build_topology(coords, mask)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                feats, topo, train=True, mutable=["batch_stats"],
            )
            out = out[
                :, cfg.head_id * cfg.feature_dim : (cfg.head_id + 1) * cfg.feature_dim
            ]
            if cfg.loss_type == "cosine":
                loss = cosine_distill_loss(out, gt, mask=gt_mask)
            else:
                m = gt_mask.astype(out.dtype)[:, None]
                diff = loss_fns[cfg.loss_type](out * m, gt * m)
                loss = diff
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        new_params = optax.apply_updates(variables["params"], updates)
        new_vars = {
            "params": new_params,
            "batch_stats": mutated["batch_stats"],
        }
        return new_vars, opt_state, loss

    return step


def make_parallel_distill_step(model, tx, cfg: DistillConfig, mesh, axis="data"):
    """Scene-parallel distillation: one scene per chip, pmean'd grads
    (BASELINE config #5: multi-scene distill sharded across hosts).

    Batch arrays carry a leading mesh-axis dim (use stack of DistillItems).
    """
    from jax.sharding import PartitionSpec as P

    def device_step(variables, opt_state, coords, feats, gt, gt_mask, mask):
        c0, f0, g0, gm0, m0 = (
            coords[0], feats[0], gt[0], gt_mask[0], mask[0]
        )
        topo = build_topology(c0, m0)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                f0, topo, train=True, mutable=["batch_stats"],
            )
            return cosine_distill_loss(out, g0, mask=gm0), mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        # batch stats averaged across scenes (sync BN analogue)
        stats = jax.lax.pmean(mutated["batch_stats"], axis)
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        new_params = optax.apply_updates(variables["params"], updates)
        return {"params": new_params, "batch_stats": stats}, opt_state, loss

    sharded = jax.shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def stack_items(items):
    """Stack DistillItems into leading-axis batch arrays for the parallel
    step: (coords, feats, gt, gt_mask, mask)."""
    import numpy as np

    return tuple(
        jnp.asarray(np.stack([getattr(it, f) for it in items]))
        for f in ("coords", "feats", "gt", "gt_mask", "mask")
    )


def distill_scene_features(model, variables, item: DistillItem):
    """Inference: per-voxel features + per-Gaussian scatter-back helper."""
    coords = jnp.asarray(item.coords)
    mask = jnp.asarray(item.mask)
    topo = build_topology(coords, mask)
    out = model.apply(variables, jnp.asarray(item.feats), topo, train=False)
    return out


def make_eval_render_hook(
    ply_path,
    cameras,
    text_features,  # [num_classes, feature_dim] (unnormalized ok)
    out_dir,
    cfg: DistillConfig,
    feature_type: str = "all",
    voxel_size: float = 0.02,
    voxel_budget: int = 200_000,
    num_views: int = 3,
    backend: str = "pallas",
):
    """Every-N-epoch semantic render of a validation scene.

    Reference parity: distill.py:151-232 — run the 3D net on the val scene's
    voxelized Gaussians, argmax CLIP-text similarity per Gaussian, render the
    palette color of the predicted class for a few views, and write
    out_dir/semantic/<epoch>/<i>.png. Voxelization/topology are precomputed
    once; each call is one net forward + K renders."""
    import numpy as np
    from PIL import Image

    from ..core.gaussians import packed_features
    from ..data.scannet_constants import COLORMAP
    from ..io.ply import load_gaussian_ply
    from ..renderer import render
    from .eval_segmentation import voxel_feats_to_gaussians, voxelize_for_net

    params, alive = load_gaussian_ply(ply_path)
    n_alive = int(np.asarray(alive).sum())
    locs = np.asarray(params.means)[:n_alive]
    pf = np.asarray(packed_features(params, alive, feature_type))[:n_alive]
    feats_in, topo, inverse, num_valid = voxelize_for_net(
        locs, pf, voxel_size, voxel_budget
    )

    text = np.asarray(text_features, np.float32)
    text = text / np.maximum(np.linalg.norm(text, axis=-1, keepdims=True), 1e-8)
    text_j = jnp.asarray(text)
    # class colors: palette entry i+1 (0 = unlabeled/black stays for "other")
    pal = jnp.asarray(COLORMAP[1 : len(text) + 1] / 255.0, jnp.float32)
    views = cameras[:num_views]
    out_dir = Path(out_dir)

    def hook(epoch, model, variables):
        vout = model.apply(variables, feats_in, topo, train=False)
        gfeat = voxel_feats_to_gaussians(
            np.asarray(vout), inverse, n_alive, params.capacity,
            num_valid=num_valid,
        )
        g = jnp.asarray(gfeat)
        g = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-8)
        cls = jnp.argmax(g @ text_j.T, axis=-1)  # [capacity]
        colors = pal[cls]
        dirp = out_dir / "semantic" / str(epoch)
        dirp.mkdir(parents=True, exist_ok=True)
        for i, cam in enumerate(views):
            out = render(
                cam, params, alive=alive, override_color=colors,
                backend=backend,
            )
            img = np.clip(np.asarray(out["render"]) * 255, 0, 255).astype(
                np.uint8
            )
            Image.fromarray(img).save(dirp / f"{i}.png")
        return str(dirp)

    return hook


def train_distill(
    dataset: FeatureDataset,
    cfg: DistillConfig = DistillConfig(),
    num_epochs: Optional[int] = None,
    log_every: int = 0,
    seed: int = 0,
    ckpt_dir: Optional[str] = None,
    save_interval: int = 10,
    eval_hook=None,
    eval_interval: int = 10,
):
    """Host driver: epochs over the dataset with a random global coord shift
    per item (distill.py:104)."""
    model, variables, tx, opt_state = make_distill_state(
        cfg, dataset.voxel_budget, len(dataset), seed
    )
    step = make_distill_step(model, tx, cfg)
    rng = np.random.default_rng(seed)
    losses = []
    for epoch in range(num_epochs or cfg.epochs):
        order = rng.permutation(len(dataset))
        for i in order:
            item = dataset.__getitem__(int(i), seed=int(rng.integers(1 << 31)))
            # random global shift (ref distill.py:104), capped so shifted
            # coords stay inside the unet3d int32-key grid (no key collisions)
            from ..models.unet3d import GRID_MAX

            max_c = int(item.coords.max()) if item.coords.size else 0
            hi = max(1, min(100, GRID_MAX - max_c))
            coords = item.coords + rng.integers(0, hi, size=(1, 3)).astype(
                np.int32
            )
            variables, opt_state, loss = step(
                variables, opt_state, jnp.asarray(coords),
                jnp.asarray(item.feats), jnp.asarray(item.gt),
                jnp.asarray(item.gt_mask), jnp.asarray(item.mask),
            )
            losses.append(float(loss))
        if log_every and (epoch + 1) % log_every == 0:
            print(f"epoch {epoch + 1}: loss {np.mean(losses[-len(dataset):]):.4f}")
        if ckpt_dir and (epoch + 1) % save_interval == 0:
            save_distill_checkpoint(
                Path(ckpt_dir) / f"model_{epoch + 1}.npz", variables
            )
        if eval_hook and (epoch + 1) % eval_interval == 0:
            # ref distill.py:141-142: every-10-epoch semantic render eval
            eval_hook(epoch + 1, model, variables)
    return model, variables, losses


def save_distill_checkpoint(path, variables):
    import pickle

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = jax.tree.map(np.asarray, variables)
    with open(path, "wb") as f:
        pickle.dump(flat, f)


def load_distill_checkpoint(path):
    import pickle

    with open(path, "rb") as f:
        flat = pickle.load(f)
    return jax.tree.map(jnp.asarray, flat)
