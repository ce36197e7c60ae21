"""Per-group Adam optimizer over the GaussianParams pytree.

Re-implements the reference's named-param-group torch.optim.Adam
(/root/reference/model/gaussian_model.py:196-240: xyz at position_lr *
spatial_scale with an exponential schedule, f_dc at feature_lr, f_rest at
feature_lr/20, opacity/scaling/rotation fixed LRs, eps=1e-15) as a tiny
explicit optimizer rather than optax.multi_transform: the Adam moments are
plain GaussianParams-shaped pytrees, which makes the densification-time
moment surgery (zeroing cloned/split slots — gaussian_model.py:420-497) a
trivial masked update instead of state-tree spelunking.

Update rule matches torch.optim.Adam exactly:
  m_hat = m / (1 - b1^t);  v_hat = v / (1 - b2^t)
  p -= lr * m_hat / (sqrt(v_hat) + eps)
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.schedules import expon_lr_schedule
from .gaussians import GaussianParams


class AdamState(NamedTuple):
    count: jnp.ndarray  # [] int32
    mu: GaussianParams
    nu: GaussianParams


@dataclasses.dataclass(frozen=True)
class TrainHyper:
    """LR hyperparameters (reference config/official_train.yaml:24-44)."""

    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 10000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-15


def lr_tree(hyper: TrainHyper, spatial_lr_scale: float, step) -> GaussianParams:
    """Per-leaf learning rates at `step` (traced ok)."""
    xyz_sched = expon_lr_schedule(
        hyper.position_lr_init * spatial_lr_scale,
        hyper.position_lr_final * spatial_lr_scale,
        lr_delay_mult=hyper.position_lr_delay_mult,
        max_steps=hyper.position_lr_max_steps,
    )
    return GaussianParams(
        means=xyz_sched(step),
        sh_dc=jnp.asarray(hyper.feature_lr),
        sh_rest=jnp.asarray(hyper.feature_lr / 20.0),
        log_scales=jnp.asarray(hyper.scaling_lr),
        quats=jnp.asarray(hyper.rotation_lr),
        opacity_logits=jnp.asarray(hyper.opacity_lr),
    )


def adam_init(params: GaussianParams) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(count=jnp.zeros((), jnp.int32), mu=zeros, nu=zeros)


def adam_update(
    grads: GaussianParams,
    state: AdamState,
    params: GaussianParams,
    lrs: GaussianParams,
    hyper: TrainHyper,
) -> tuple[GaussianParams, AdamState]:
    count = state.count + 1
    t = count.astype(jnp.float32)
    b1, b2 = hyper.beta1, hyper.beta2
    bc1 = 1.0 - b1**t
    bc2 = 1.0 - b2**t

    def upd(p, g, m, v, lr):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        m_hat = m / bc1
        v_hat = v / bc2
        p = p - lr * m_hat / (jnp.sqrt(v_hat) + hyper.eps)
        return p, m, v

    out = jax.tree.map(upd, params, grads, state.mu, state.nu, lrs)
    leaves, treedef = jax.tree.flatten(out, is_leaf=lambda x: isinstance(x, tuple))
    new_p = jax.tree.unflatten(treedef, [l[0] for l in leaves])
    new_m = jax.tree.unflatten(treedef, [l[1] for l in leaves])
    new_v = jax.tree.unflatten(treedef, [l[2] for l in leaves])
    return new_p, AdamState(count=count, mu=new_m, nu=new_v)


def zero_moments_at(state: AdamState, slot_mask: jnp.ndarray) -> AdamState:
    """Zero Adam moments at masked slots (densification surgery parity:
    cloned/split/pruned entries restart with zero moments)."""
    keep = (~slot_mask).astype(jnp.float32)

    def z(x):
        return x * keep.reshape((-1,) + (1,) * (x.ndim - 1))

    return AdamState(
        count=state.count, mu=jax.tree.map(z, state.mu), nu=jax.tree.map(z, state.nu)
    )


def zero_moments_leaf(state: AdamState, leaf: str) -> AdamState:
    """Zero one leaf's moments entirely (opacity reset parity,
    gaussian_model.py:283-286 + replace_tensor_to_optimizer)."""
    mu = dataclasses.replace(
        state.mu, **{leaf: jnp.zeros_like(getattr(state.mu, leaf))}
    )
    nu = dataclasses.replace(
        state.nu, **{leaf: jnp.zeros_like(getattr(state.nu, leaf))}
    )
    return AdamState(count=state.count, mu=mu, nu=nu)
