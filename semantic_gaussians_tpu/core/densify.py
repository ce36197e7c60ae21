"""Densification (clone / split / prune / opacity-reset) as pure functions.

Functional re-design of the reference's optimizer-surgery densification
(/root/reference/model/gaussian_model.py:499-613): instead of concatenating
tensors and rebuilding torch.optim state, Gaussians live in a fixed
capacity-padded buffer with an `alive` mask; densify inserts new entries into
dead slots (argsort-based slot assignment — static shapes, jit-safe) and
zeroes the Adam moments of touched slots, matching cat_tensors_to_optimizer /
prune_points semantics exactly. If free slots run out the overflow count is
returned so the host can grow capacity (planned doubling, rare recompile).

Semantics parity notes:
  * clone: grad-norm >= threshold and max-scale <= percent_dense * extent
    (gaussian_model.py:568-590); the clone inherits parameters and zero
    moments.
  * split: grad-norm >= threshold and max-scale > percent_dense * extent;
    N=2 children sampled from N(0, scale) rotated into world, scales / 1.6,
    parent removed (gaussian_model.py:529-566).
  * prune: opacity < min_opacity, plus (if max_screen_size) the 0.1*extent
    world-size test (gaussian_model.py:592-604). The reference's
    screen-RADIUS test is inert (densification_postfix zeroes max_radii2D
    before the prune mask reads it, :525-527 vs :600-603) and we reproduce
    that by default; DensifyConfig.screen_size_prune_active=True applies
    the test as written — see that flag's comment for why the active
    variant can annihilate a well-fit scene.
  * low-opacity parents are not cloned/split (the reference clones then
    immediately prunes both copies — same net effect).
  * stats (xyz grad accum / denom / max radii) reset after densify
    (densification_postfix, gaussian_model.py:525-527).
  * mean2D gradient stats use the reference's NDC half-extent scaling
    (grad_pix * [W/2, H/2]) so densify_grad_threshold keeps its calibration
    (channel backward.cu:455-456 scales by 0.5*W, 0.5*H).
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..utils.transforms import quat_to_rotmat
from .gaussians import GaussianParams
from .optimizer import AdamState, zero_moments_at, zero_moments_leaf


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DensifyState:
    xyz_grad_accum: jnp.ndarray  # [cap]
    denom: jnp.ndarray  # [cap]
    max_radii2d: jnp.ndarray  # [cap] float

    @staticmethod
    def zeros(capacity: int) -> "DensifyState":
        z = jnp.zeros((capacity,), jnp.float32)
        return DensifyState(z, z, z)


@dataclasses.dataclass(frozen=True)
class DensifyConfig:
    grad_threshold: float = 0.0002
    min_opacity: float = 0.005
    percent_dense: float = 0.01
    max_screen_size: float | None = None  # 20.0 after first opacity reset
    split_n: int = 2
    # The reference's screen-radius prune is INERT: densification_postfix
    # zeroes max_radii2D (gaussian_model.py:525-527) before the prune mask
    # reads it (:600-603), so big_points_vs is always all-False — only the
    # world-size (0.1*extent) test actually fires. Default False reproduces
    # that behavior exactly; True applies the test as WRITTEN (on radii
    # accumulated since the last densify). Active pruning is NOT a free
    # upgrade: on a well-fit scene the grads sit below the clone/split
    # threshold while flat-region splats legitimately exceed 20 px, so
    # nothing replenishes what the prune removes — measured on the parity
    # harness as a death spiral from 47k gaussians (PSNR 47.6) to literally
    # 1 over three densify windows.
    screen_size_prune_active: bool = False


def add_stats(
    dstate: DensifyState,
    mean2d_grad: jnp.ndarray,  # [cap, 2] pixel-space dL/dmean2D
    radii: jnp.ndarray,  # [cap] int32
    img_width: int,
    img_height: int,
) -> DensifyState:
    """Accumulate view-space gradient norms for visible Gaussians
    (train.py:156-161 + gaussian_model.py:608-612)."""
    visible = radii > 0
    g = mean2d_grad * jnp.array([[img_width * 0.5, img_height * 0.5]])
    norm = jnp.linalg.norm(g, axis=-1)
    return DensifyState(
        xyz_grad_accum=dstate.xyz_grad_accum + jnp.where(visible, norm, 0.0),
        denom=dstate.denom + visible.astype(jnp.float32),
        max_radii2d=jnp.maximum(
            dstate.max_radii2d, jnp.where(visible, radii.astype(jnp.float32), 0.0)
        ),
    )


def add_stats_prereduced(
    dstate: DensifyState,
    norm_sum: jnp.ndarray,  # [cap] sum over views of per-view grad norms
    vis_sum: jnp.ndarray,  # [cap] sum over views of visibility counts
    radii_max: jnp.ndarray,  # [cap] max radii over views
) -> DensifyState:
    """Accumulate stats already reduced over a view batch.

    Multi-view parity: the reference processes one view per step and adds a
    per-view norm + a per-view visibility increment (gaussian_model.py:608-612).
    With V views per parallel step, the equivalent accumulation is
    sum_v ||g_v|| and sum_v visible_v — NOT ||mean_v g_v|| (cross-view
    cancellation would under-trigger densification). Callers psum per-view
    norms/counts across the mesh and pass the sums here.
    """
    return DensifyState(
        xyz_grad_accum=dstate.xyz_grad_accum + norm_sum,
        denom=dstate.denom + vis_sum,
        max_radii2d=jnp.maximum(dstate.max_radii2d, radii_max.astype(jnp.float32)),
    )


def _insert(
    params: GaussianParams,
    alive: jnp.ndarray,
    adam: AdamState,
    cand: GaussianParams,
    cand_valid: jnp.ndarray,
):
    """Insert candidate rows into dead slots. Returns
    (params, alive, adam, dropped_count)."""
    cap = alive.shape[0]
    src = jnp.argsort(~cand_valid)  # valid candidates first (stable)
    tgt = jnp.argsort(alive)  # dead slots first (stable)
    k = jnp.minimum(jnp.sum(cand_valid), jnp.sum(~alive))
    take = jnp.arange(cap) < k

    def leaf(p, c):
        shape = (-1,) + (1,) * (p.ndim - 1)
        vals = jnp.where(take.reshape(shape), c[src], p[tgt])
        return p.at[tgt].set(vals)

    new_params = jax.tree.map(leaf, params, cand)
    new_alive = alive.at[tgt].set(alive[tgt] | take)
    touched = jnp.zeros((cap,), bool).at[tgt].set(take)
    return new_params, new_alive, zero_moments_at(adam, touched), jnp.sum(cand_valid) - k


def _kill(params: GaussianParams, mask: jnp.ndarray) -> GaussianParams:
    """Make dead slots inert (opacity logit -20) for kernel safety."""
    return dataclasses.replace(
        params,
        opacity_logits=jnp.where(mask[:, None], -20.0, params.opacity_logits),
    )


def densify_and_prune(
    params: GaussianParams,
    alive: jnp.ndarray,
    adam: AdamState,
    dstate: DensifyState,
    key: jax.Array,
    scene_extent: float,
    cfg: DensifyConfig,
):
    """One densification pass. Returns (params, alive, adam, dstate, dropped)."""
    grads = dstate.xyz_grad_accum / jnp.maximum(dstate.denom, 1.0)
    grads = jnp.where(jnp.isnan(grads), 0.0, grads)

    scales = params.scales
    max_scale = jnp.max(scales, axis=-1)
    opacity = params.opacity[:, 0]

    prune = opacity < cfg.min_opacity
    if cfg.max_screen_size is not None:
        if cfg.screen_size_prune_active:  # the as-written (non-reference) test
            prune = prune | (dstate.max_radii2d > cfg.max_screen_size)
        prune = prune | (max_scale > 0.1 * scene_extent)
    prune = prune & alive

    high_grad = grads >= cfg.grad_threshold
    clone_mask = alive & ~prune & high_grad & (
        max_scale <= cfg.percent_dense * scene_extent
    )
    split_mask = alive & ~prune & high_grad & (
        max_scale > cfg.percent_dense * scene_extent
    )

    # Candidate sources must be captured BEFORE killing slots (split parents
    # are removed from `alive` but still parent the children below).
    params0 = params
    alive_new = alive & ~prune & ~split_mask
    params = _kill(params, ~alive_new)

    # Clones: identical copies.
    params, alive_new, adam, drop0 = _insert(
        params, alive_new, adam, params0, clone_mask
    )

    # Split children: mean + R @ (scale * eps), scales / (0.8 * N).
    dropped = drop0
    rot = quat_to_rotmat(
        params0.quats
        / jnp.maximum(jnp.linalg.norm(params0.quats, axis=-1, keepdims=True), 1e-12)
    )
    n = cfg.split_n
    child_log_scales = jnp.log(scales / (0.8 * n))
    for i in range(n):
        key, sub = jax.random.split(key)
        eps = jax.random.normal(sub, params0.means.shape)
        offset = jnp.einsum("nij,nj->ni", rot, scales * eps)
        child = dataclasses.replace(
            params0,
            means=params0.means + offset,
            log_scales=child_log_scales,
        )
        child_valid = split_mask
        if cfg.max_screen_size is not None:
            # children inherit opacity; over-large children die immediately
            child_valid = child_valid & ~(
                jnp.max(jnp.exp(child_log_scales), axis=-1) > 0.1 * scene_extent
            )
        child_valid = child_valid & ~(opacity < cfg.min_opacity)
        params, alive_new, adam, d = _insert(params, alive_new, adam, child, child_valid)
        dropped = dropped + d

    dstate = DensifyState.zeros(alive.shape[0])
    return params, alive_new, adam, dstate, dropped


def reset_opacity(params: GaussianParams, adam: AdamState):
    """Clamp opacity to <= 0.01 and clear its Adam moments
    (gaussian_model.py:283-286, train.py opacity_reset_interval)."""
    # plain-Python constant: float(jnp...) would concretize a tracer when
    # this runs under jit (opacity_reset_step)
    target = math.log(0.01 / 0.99)
    new_logits = jnp.minimum(params.opacity_logits, target)
    return (
        dataclasses.replace(params, opacity_logits=new_logits),
        zero_moments_leaf(adam, "opacity_logits"),
    )
