"""Multi-chip training step: view-parallel rendering with psum'd gradients.

New design (the reference is single-GPU; SURVEY.md §5 "Distributed
communication backend: absent"). Strategy for round 1:

  * mesh axis "data": each chip renders a DIFFERENT training view of the same
    (replicated) Gaussian scene — rays sharded across chips at view
    granularity.
  * gradients are `lax.pmean`'d over the mesh inside shard_map, then the Adam
    update runs replicated (deterministic, no broadcast needed).
  * densification stats are psum'd the same way, so densify decisions stay
    bitwise identical across chips.

Tile-band sharding of a single view (finer ray sharding with the same
collective structure) is the planned follow-up; it reuses this exact step
with the tile grid split over a second mesh axis.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.densify import add_stats
from ..core.optimizer import adam_update, lr_tree
from ..pipelines.train import TrainConfig, TrainState
from ..renderer import render
from ..utils.camera import Camera
from ..utils.losses import photometric_loss, psnr


def stack_cameras(cams: list) -> Camera:
    """Stack per-view leaves into a leading batch axis (static fields must
    match across views)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def make_parallel_train_step(
    mesh: Mesh,
    cfg: TrainConfig,
    active_sh_degree: int,
    backend: str = "pallas",
    pair_budget: Optional[int] = None,
    axis: str = "data",
):
    """Build a jitted multi-chip train step: (state, cam_batch, bg) ->
    (state, metrics). cam_batch leading axis == mesh axis size."""

    def device_step(state: TrainState, cam_batch: Camera, bg):
        cam = jax.tree.map(lambda x: x[0], cam_batch)  # this chip's view
        offset0 = jnp.zeros((state.params.capacity, 2), jnp.float32)

        def loss_fn(params, offset):
            out = render(
                cam,
                params,
                alive=state.alive,
                bg=bg,
                active_sh_degree=active_sh_degree,
                mean2d_offset=offset,
                backend=backend,
                pair_budget=pair_budget,
            )
            return photometric_loss(out["render"], cam.image, cfg.lambda_dssim), out

        (loss, out), (gparams, goffset) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, offset0)

        # Collectives over ICI: average parameter grads; sum densify stats.
        gparams = jax.lax.pmean(gparams, axis)
        goffset = jax.lax.pmean(goffset, axis)
        radii_any = jax.lax.pmax(out["radii"], axis)
        loss = jax.lax.pmean(loss, axis)
        step_psnr = jax.lax.pmean(psnr(out["render"], cam.image), axis)

        dstate = add_stats(state.dstate, goffset, radii_any, cam.width, cam.height)
        lrs = lr_tree(cfg.hyper, cfg.spatial_lr_scale, state.step)
        new_params, new_adam = adam_update(
            gparams, state.adam, state.params, lrs, cfg.hyper
        )
        new_state = dataclasses.replace(
            state,
            params=new_params,
            adam=new_adam,
            dstate=dstate,
            step=state.step + 1,
        )
        metrics = dict(loss=loss, psnr=step_psnr, overflow=out["overflow"])
        return new_state, metrics

    sharded = jax.shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_band_train_step(
    mesh: Mesh,
    cfg: TrainConfig,
    active_sh_degree: int,
    pair_budget: Optional[int] = None,
    axis: str = "data",
):
    """Tile-band-sharded train step: ONE view per step, its rays sharded
    across the mesh (render_sharded), loss on the assembled image, grads
    psum'd by the shard_map transpose, replicated Adam update.

    This is the BASELINE.md north-star schedule: pixels/tiles across chips,
    Gaussians replicated.
    """
    from ..core.densify import add_stats
    from .render_sharded import render_sharded

    def step(state: TrainState, cam: Camera, bg):
        def loss_fn(params):
            out = render_sharded(
                cam, params, state.alive, mesh, bg,
                active_sh_degree=active_sh_degree, pair_budget=pair_budget,
                axis=axis,
            )
            return (
                photometric_loss(out["render"], cam.image, cfg.lambda_dssim),
                out,
            )

        # NOTE: densification stats (mean2D grads) are not yet plumbed
        # through the banded path; pair band training with periodic
        # single-chip densify steps, or use the view-parallel step.
        (loss, out), gparams = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        lrs = lr_tree(cfg.hyper, cfg.spatial_lr_scale, state.step)
        new_params, new_adam = adam_update(
            gparams, state.adam, state.params, lrs, cfg.hyper
        )
        new_state = dataclasses.replace(
            state, params=new_params, adam=new_adam, step=state.step + 1
        )
        metrics = dict(
            loss=loss,
            psnr=psnr(out["render"], cam.image),
            overflow=out["overflow"],
        )
        return new_state, metrics

    return jax.jit(step)
