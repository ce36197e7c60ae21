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

from ..core.densify import add_stats, add_stats_prereduced
from ..core.optimizer import AdamState, adam_update, lr_tree
from ..pipelines.train import TrainConfig, TrainState
from ..renderer import render
from ..utils.camera import Camera
from ..utils.losses import photometric_loss, psnr


def stack_cameras(cams: list) -> Camera:
    """Stack per-view leaves into a leading batch axis (static fields must
    match across views)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def _psum_scatter_leaf(g, axis):
    """reduce-scatter one grad leaf along the Gaussian axis, flattened 2D.

    Collapsing the trailing dims to (capacity, D) before the collective makes
    the scatter dimension the MAJOR dim of a row-major 2D layout. Fed the raw
    (capacity, 15, 3) sh_rest leaf, XLA:TPU picks layout {0,1,2} (capacity
    minormost, so each Gaussian's 45 floats are strided across tiles); the
    ring reduce-scatter emitter then bails — at 8k capacity it falls back to
    SingleInputAllReduceScatterFusion scheduled synchronously, and at 131k it
    REWRITES the op into a full all-reduce (RotatedPincerEmitter, 2x the ICI
    bytes — observed in the AOT v5e 2x4 schedule dumps, ZERO_OVERLAP.json
    round 3 vs 4). With contiguous per-shard rows the backend keeps a true
    ring reduce-scatter and the latency-hiding scheduler can split it
    async around the remaining backward compute.
    """
    shp = g.shape
    g2 = g.reshape(shp[0], -1) if g.ndim != 2 else g
    out = jax.lax.psum_scatter(g2, axis, scatter_dimension=0, tiled=True)
    return out.reshape(out.shape[:1] + shp[1:])


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

        # Collectives over ICI: average parameter grads; SUM densify stats.
        # Densify parity (gaussian_model.py:608-612): the reference adds a
        # per-view grad norm + per-view visibility count; averaging grads
        # across views before the norm would cancel and under-trigger
        # densification (ADVICE r1). So: norm locally, psum the norms/counts.
        gparams = jax.lax.pmean(gparams, axis)
        visible = out["radii"] > 0
        g = goffset * jnp.array([[cam.width * 0.5, cam.height * 0.5]])
        norm_local = jnp.where(visible, jnp.linalg.norm(g, axis=-1), 0.0)
        norm_sum = jax.lax.psum(norm_local, axis)
        vis_sum = jax.lax.psum(visible.astype(jnp.float32), axis)
        radii_any = jax.lax.pmax(out["radii"], axis)
        loss = jax.lax.pmean(loss, axis)
        step_psnr = jax.lax.pmean(psnr(out["render"], cam.image), axis)

        dstate = add_stats_prereduced(state.dstate, norm_sum, vis_sum, radii_any)
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
        metrics = dict(
            loss=loss,
            psnr=step_psnr,
            overflow=jax.lax.psum(out["overflow"], axis),
        )
        return new_state, metrics

    sharded = jax.shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    nview = mesh.shape[axis]

    def checked(state, cam_batch, bg):
        # Pod-readiness guard (VERDICT r2 weak #4): P(axis) over a leading
        # dim shorter than the mesh axis mis-shards with an opaque XLA
        # error; fail loudly in Python instead.
        n = jax.tree.leaves(cam_batch)[0].shape[0]
        if n != nview:
            raise ValueError(
                f"cam_batch has {n} views but mesh axis '{axis}' has "
                f"{nview} devices; stack exactly one camera per device "
                "(repeat views if the scene has fewer cameras than chips)"
            )
        return jitted(state, cam_batch, bg)

    return checked


def make_hybrid_train_step(
    mesh: Mesh,
    cfg: TrainConfig,
    active_sh_degree: int,
    img_height: int,
    img_width: int,
    pair_budget: Optional[int] = None,
    axis_view: str = "view",
    axis_band: str = "band",
):
    """Hybrid multi-host step over a 2D (view=host, band=chip) mesh.

    Each host row trains a DIFFERENT view whose tile bands are sharded over
    that host's chips — the heavy per-pixel transposes psum over the band
    axis (ICI); only parameter grads cross hosts (DCN), once per step.
    Densify semantics match view-DP (per-view grad norms summed, ADVICE r1):
    the mean2D offset is per-view (sharded over `axis_view`), so its
    cotangent arrives per-view, band-psum'd by the shard_map transpose.
    """
    from .render_sharded import band_render_core
    from ..ops.composite_pallas import CompositeConfig
    from ..ops.rasterize import DEFAULT_TILE, _untile
    from ..ops.binning import band_pair_budget
    from ..pipelines.train import _edge_crop

    th, tw = DEFAULT_TILE
    nview = mesh.shape[axis_view]
    nband = mesh.shape[axis_band]
    grid_w = -(-img_width // tw)
    grid_h = -(-img_height // th)
    band_rows = -(-grid_h // nband)
    crop = _edge_crop(img_height, img_width, cfg.cut_edge)

    def render_body(params, alive, cam_batch, bg, offsets):
        cam = jax.tree.map(lambda x: x[0], cam_batch)  # this host's view
        band = jax.lax.axis_index(axis_band)
        # 2x headroom over the even split (see render_sharded: clustered
        # splats would overflow an even 1/nband budget)
        budget = pair_budget or band_pair_budget(params.capacity, nband)
        ccfg = CompositeConfig(
            tile_h=th, tile_w=tw, grid_h=band_rows, grid_w=grid_w,
            num_channels=3, interpret=jax.default_backend() == "cpu",
        )
        color, depth, final_t, n_contrib, overflow, radii = band_render_core(
            cam, params, alive, None, bg, offsets[0],
            band, band_rows, (th, tw), grid_w, budget, ccfg,
            active_sh_degree,
        )
        radii = jax.lax.pmax(radii, axis_band)  # identical across bands
        return color[None], overflow[None], radii

    sharded_render = jax.shard_map(
        render_body,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_view), P(), P(axis_view)),
        out_specs=(
            P(axis_view, axis_band),
            P(axis_view, axis_band),
            P(axis_view),
        ),
        check_vma=False,
    )

    full_cfg = CompositeConfig(
        tile_h=th, tile_w=tw, grid_h=nband * band_rows, grid_w=grid_w,
        num_channels=3, interpret=jax.default_backend() == "cpu",
    )

    def step(state: TrainState, cam_batch: Camera, bg):
        offset0 = jnp.zeros((nview, state.params.capacity, 2), jnp.float32)

        def loss_fn(params, offsets):
            color, overflow, radii = sharded_render(
                params, state.alive, cam_batch, bg, offsets
            )

            def one_view(tiles, gt):
                img = _untile(tiles, full_cfg, img_height, img_width)
                pred, g = img, gt
                if crop is not None:
                    ch, cw = crop
                    pred = pred[ch : img_height - ch, cw : img_width - cw]
                    g = g[ch : img_height - ch, cw : img_width - cw]
                return photometric_loss(pred, g, cfg.lambda_dssim), psnr(
                    img, gt
                )

            losses, psnrs = jax.vmap(one_view)(color, cam_batch.image)
            return jnp.mean(losses), (psnrs, overflow, radii)

        (loss, (psnrs, overflow, radii)), (gparams, goffsets) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, offset0
            )
        )
        # Per-view densify stats (ref gaussian_model.py:608-612 semantics):
        # norm each view's mean2D grad, then sum norms/counts over views.
        scale = jnp.array([[img_width * 0.5, img_height * 0.5]])
        # loss averaging divided each view's image grad by nview; undo for
        # per-view stats parity with single-view training.
        g = goffsets * scale * nview
        visible = radii > 0
        norm_sum = jnp.sum(
            jnp.where(visible, jnp.linalg.norm(g, axis=-1), 0.0), axis=0
        )
        vis_sum = jnp.sum(visible.astype(jnp.float32), axis=0)
        radii_any = jnp.max(radii, axis=0)
        dstate = add_stats_prereduced(state.dstate, norm_sum, vis_sum, radii_any)
        lrs = lr_tree(cfg.hyper, cfg.spatial_lr_scale, state.step)
        new_params, new_adam = adam_update(
            gparams, state.adam, state.params, lrs, cfg.hyper
        )
        new_state = dataclasses.replace(
            state, params=new_params, adam=new_adam, dstate=dstate,
            step=state.step + 1,
        )
        metrics = dict(
            loss=loss, psnr=jnp.mean(psnrs), overflow=jnp.sum(overflow)
        )
        return new_state, metrics

    return jax.jit(step)


def make_band_train_step_zero(
    mesh: Mesh,
    cfg: TrainConfig,
    active_sh_degree: int,
    img_height: int,
    img_width: int,
    pair_budget: Optional[int] = None,
    axis: str = "data",
):
    """Band-sharded step with REDUCE-SCATTERED gradients and a sharded
    optimizer (the ZeRO recipe on the north-star schedule).

    vs make_band_train_step (full psum of every grad leaf + replicated
    Adam): each device backpropagates only its own tile band (the loss is
    computed on all-gathered band tiles, whose shard_map transpose delivers
    exactly this band's slice of the image cotangent), producing LOCAL
    partial parameter grads; each leaf is then `psum_scatter`'d so a device
    reduces and keeps a 1/ndev Gaussian shard, Adam updates that shard, and
    the new params are all-gathered for the next step.

    Why this is the overlap design (BASELINE.md north star "grad psum
    overlapped with the backward composite pass"): the per-leaf
    reduce-scatters are independent dataflow from the other leaves'
    backward chains (means/scales/quats/opacity/SH split after the shared
    segment-sum), so XLA's latency-hiding scheduler starts leaf k's
    collective while leaf k+1's projection-backward still computes, and a
    reduce_scatter moves HALF the bytes of the all-reduce it replaces.
    Adam moments also shard ndev-ways (2x param memory at 10M+ Gaussians).
    Numerical equivalence with the replicated-Adam band step is asserted in
    tests/test_parallel.py on an 8-device CPU mesh.
    """
    from .render_sharded import band_render_core
    from ..ops.composite_pallas import CompositeConfig
    from ..ops.rasterize import DEFAULT_TILE, _untile
    from ..ops.binning import band_pair_budget
    from ..pipelines.train import _edge_crop

    th, tw = DEFAULT_TILE
    ndev = mesh.shape[axis]
    grid_w = -(-img_width // tw)
    grid_h = -(-img_height // th)
    band_rows = -(-grid_h // ndev)
    crop = _edge_crop(img_height, img_width, cfg.cut_edge)
    full_cfg = CompositeConfig(
        tile_h=th, tile_w=tw, grid_h=ndev * band_rows, grid_w=grid_w,
        num_channels=3, interpret=jax.default_backend() == "cpu",
    )

    def device_step(params, alive, mu, nu, count, cam: Camera, bg):
        assert params.capacity % ndev == 0, "capacity must divide the mesh"
        blk = params.capacity // ndev
        band = jax.lax.axis_index(axis)
        budget = pair_budget or band_pair_budget(params.capacity, ndev)
        ccfg = CompositeConfig(
            tile_h=th, tile_w=tw, grid_h=band_rows, grid_w=grid_w,
            num_channels=3, interpret=full_cfg.interpret,
        )
        offset0 = jnp.zeros((params.capacity, 2), jnp.float32)

        def loss_fn(p, offset):
            color, _d, _t, _n, overflow, radii = band_render_core(
                cam, p, alive, None, bg, offset,
                band, band_rows, (th, tw), grid_w, budget, ccfg,
                active_sh_degree,
            )
            # all_gather the band tiles and compute the loss REPLICATED:
            # the all_gather's transpose is a psum_scatter handing each
            # band exactly its own slice of the image cotangent, so the
            # grads below are this band's PARTIAL contribution (no implicit
            # full psum anywhere in the backward).
            tiles = jax.lax.all_gather(color, axis, axis=0, tiled=True)
            img = _untile(tiles, full_cfg, img_height, img_width)
            pred, gt = img, cam.image
            if crop is not None:
                ch, cw = crop
                pred = pred[ch : img_height - ch, cw : img_width - cw]
                gt = gt[ch : img_height - ch, cw : img_width - cw]
            loss = photometric_loss(pred, gt, cfg.lambda_dssim)
            # Every device computes this same replicated loss, so the
            # all_gather's transpose (a psum_scatter) SUMS ndev identical
            # image cotangents; pre-scaling by 1/ndev makes the band
            # cotangents — and hence the partial grads — exact.
            return loss / ndev, (img, overflow[0], radii[0])

        (loss, (img, overflow, radii)), (gparams, goffset) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, offset0
            )
        )

        # Per-leaf reduce_scatter: reduce + keep this device's Gaussian shard.
        gshard = jax.tree.map(lambda g: _psum_scatter_leaf(g, axis), gparams)
        pshard = jax.tree.map(
            lambda x: jax.lax.dynamic_slice_in_dim(x, band * blk, blk, 0),
            params,
        )
        lrs = lr_tree(cfg.hyper, cfg.spatial_lr_scale, count)
        new_pshard, new_adam = adam_update(
            gshard, AdamState(count=count, mu=mu, nu=nu), pshard, lrs,
            cfg.hyper,
        )
        new_params = jax.tree.map(
            lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True),
            new_pshard,
        )

        # Densify stats need the FULL mean2D grad (each pixel lives in
        # exactly one band): plain psum of the (capacity, 2) offset grad.
        goffset = jax.lax.psum(goffset, axis)
        overflow = jax.lax.psum(overflow, axis)
        metrics = dict(
            loss=loss * ndev, psnr=psnr(img, cam.image), overflow=overflow
        )
        return (
            new_params, new_adam.mu, new_adam.nu, new_adam.count,
            goffset, radii, metrics,
        )

    sharded = jax.shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(), P(), P()),
        out_specs=(P(), P(axis), P(axis), P(), P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(state: TrainState, cam: Camera, bg):
        new_params, mu, nu, count, goffset, radii, metrics = sharded(
            state.params, state.alive, state.adam.mu, state.adam.nu,
            state.adam.count, cam, bg,
        )
        dstate = add_stats(state.dstate, goffset, radii, cam.width, cam.height)
        new_state = dataclasses.replace(
            state,
            params=new_params,
            adam=AdamState(count=count, mu=mu, nu=nu),
            dstate=dstate,
            step=state.step + 1,
        )
        return new_state, metrics

    return step


def make_hybrid_train_step_zero(
    mesh: Mesh,
    cfg: TrainConfig,
    active_sh_degree: int,
    img_height: int,
    img_width: int,
    pair_budget: Optional[int] = None,
    axis_view: str = "view",
    axis_band: str = "band",
):
    """ZeRO variant of the hybrid (view=host x band=chip) schedule.

    Per device: render its (view, band) cell; all_gather band tiles WITHIN
    the view row; compute that view's loss replicated across the row (the
    all_gather transpose hands back this band's image-cotangent slice,
    1/nband-prescaled); average view losses IMPLICITLY by scaling 1/nview.
    Parameter grads then cross the mesh exactly once per leaf:
    `psum_scatter` over the band axis (each chip keeps a 1/nband Gaussian
    shard of the band-sum) followed by `psum` over the view axis (the DCN
    hop, now 1/nband the bytes of the replicated hybrid step). Adam runs on
    the shard; params all_gather over the band axis.

    Densify stats keep per-view semantics (ADVICE r1): the offset cotangent
    arrives per (view, band); band-psum restores the per-view mean2D grad,
    whose norm is computed per view and then view-psum'd with visibility
    counts.
    """
    from .render_sharded import band_render_core
    from ..ops.composite_pallas import CompositeConfig
    from ..ops.rasterize import DEFAULT_TILE, _untile
    from ..ops.binning import band_pair_budget
    from ..pipelines.train import _edge_crop

    th, tw = DEFAULT_TILE
    nview = mesh.shape[axis_view]
    nband = mesh.shape[axis_band]
    grid_w = -(-img_width // tw)
    grid_h = -(-img_height // th)
    band_rows = -(-grid_h // nband)
    crop = _edge_crop(img_height, img_width, cfg.cut_edge)
    full_cfg = CompositeConfig(
        tile_h=th, tile_w=tw, grid_h=nband * band_rows, grid_w=grid_w,
        num_channels=3, interpret=jax.default_backend() == "cpu",
    )

    def device_step(params, alive, mu, nu, count, cam_batch: Camera, bg):
        assert params.capacity % nband == 0
        blk = params.capacity // nband
        cam = jax.tree.map(lambda x: x[0], cam_batch)  # this row's view
        band = jax.lax.axis_index(axis_band)
        budget = pair_budget or band_pair_budget(params.capacity, nband)
        ccfg = CompositeConfig(
            tile_h=th, tile_w=tw, grid_h=band_rows, grid_w=grid_w,
            num_channels=3, interpret=full_cfg.interpret,
        )
        offset0 = jnp.zeros((params.capacity, 2), jnp.float32)

        def loss_fn(p, offset):
            color, _d, _t, _n, overflow, radii = band_render_core(
                cam, p, alive, None, bg, offset,
                band, band_rows, (th, tw), grid_w, budget, ccfg,
                active_sh_degree,
            )
            tiles = jax.lax.all_gather(color, axis_band, axis=0, tiled=True)
            img = _untile(tiles, full_cfg, img_height, img_width)
            pred, gt = img, cam.image
            if crop is not None:
                ch, cw = crop
                pred = pred[ch : img_height - ch, cw : img_width - cw]
                gt = gt[ch : img_height - ch, cw : img_width - cw]
            loss = photometric_loss(pred, gt, cfg.lambda_dssim)
            # 1/nband: replicated-within-row loss differentiated on every
            # band (all_gather transpose sums nband identical cotangents);
            # 1/nview: mean over view rows.
            return loss / (nband * nview), (img, overflow[0], radii[0])

        (loss, (img, overflow, radii)), (gparams, goffset) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, offset0
            )
        )

        # One collective pass per leaf: band reduce-scatter (ICI), then the
        # small per-shard view psum (DCN at 1/nband bytes).
        gshard = jax.tree.map(
            lambda g: jax.lax.psum(
                _psum_scatter_leaf(g, axis_band), axis_view
            ),
            gparams,
        )
        pshard = jax.tree.map(
            lambda x: jax.lax.dynamic_slice_in_dim(x, band * blk, blk, 0),
            params,
        )
        lrs = lr_tree(cfg.hyper, cfg.spatial_lr_scale, count)
        new_pshard, new_adam = adam_update(
            gshard, AdamState(count=count, mu=mu, nu=nu), pshard, lrs,
            cfg.hyper,
        )
        new_params = jax.tree.map(
            lambda x: jax.lax.all_gather(x, axis_band, axis=0, tiled=True),
            new_pshard,
        )

        # densify stats: per-view grad (band psum, un-scale the 1/nview),
        # then norms/counts summed over views.
        gview = jax.lax.psum(goffset, axis_band) * nview
        scale2 = jnp.array([[img_width * 0.5, img_height * 0.5]])
        visible = radii > 0
        norm_local = jnp.where(
            visible, jnp.linalg.norm(gview * scale2, axis=-1), 0.0
        )
        norm_sum = jax.lax.psum(norm_local, axis_view)
        vis_sum = jax.lax.psum(visible.astype(jnp.float32), axis_view)
        radii_any = jax.lax.pmax(radii, axis_view)
        loss = jax.lax.psum(loss * nband, axis_view)  # mean over views
        step_psnr = jax.lax.pmean(psnr(img, cam.image), axis_view)
        overflow = jax.lax.psum(
            jax.lax.psum(overflow, axis_band), axis_view
        )
        metrics = dict(loss=loss, psnr=step_psnr, overflow=overflow)
        return (
            new_params, new_adam.mu, new_adam.nu, new_adam.count,
            norm_sum, vis_sum, radii_any, metrics,
        )

    sharded = jax.shard_map(
        device_step,
        mesh=mesh,
        in_specs=(
            P(), P(), P(axis_band), P(axis_band), P(), P(axis_view), P(),
        ),
        out_specs=(
            P(), P(axis_band), P(axis_band), P(), P(), P(), P(), P(),
        ),
        check_vma=False,
    )

    @jax.jit
    def step(state: TrainState, cam_batch: Camera, bg):
        new_params, mu, nu, count, norm_sum, vis_sum, radii_any, metrics = (
            sharded(
                state.params, state.alive, state.adam.mu, state.adam.nu,
                state.adam.count, cam_batch, bg,
            )
        )
        dstate = add_stats_prereduced(
            state.dstate, norm_sum, vis_sum, radii_any
        )
        new_state = dataclasses.replace(
            state,
            params=new_params,
            adam=AdamState(count=count, mu=mu, nu=nu),
            dstate=dstate,
            step=state.step + 1,
        )
        return new_state, metrics

    return step


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
    from .render_sharded import render_sharded
    from ..pipelines.train import _edge_crop

    def step(state: TrainState, cam: Camera, bg):
        offset0 = jnp.zeros((state.params.capacity, 2), jnp.float32)
        crop = _edge_crop(cam.height, cam.width, cfg.cut_edge)

        def loss_fn(params, offset):
            out = render_sharded(
                cam, params, state.alive, mesh, bg,
                active_sh_degree=active_sh_degree, pair_budget=pair_budget,
                axis=axis, mean2d_offset=offset,
            )
            pred, gt = out["render"], cam.image
            if crop is not None:
                ch, cw = crop
                pred = pred[ch : cam.height - ch, cw : cam.width - cw]
                gt = gt[ch : cam.height - ch, cw : cam.width - cw]
            return photometric_loss(pred, gt, cfg.lambda_dssim), out

        # The offset is a replicated shard_map input, so its cotangent is
        # psum'd over bands by the transpose — goffset equals the single-chip
        # full-image mean2D gradient, giving bitwise-equivalent densify
        # decisions (one view per step here; ref train.py:156-161).
        (loss, out), (gparams, goffset) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, offset0)
        dstate = add_stats(
            state.dstate, goffset, out["radii"], cam.width, cam.height
        )
        lrs = lr_tree(cfg.hyper, cfg.spatial_lr_scale, state.step)
        new_params, new_adam = adam_update(
            gparams, state.adam, state.params, lrs, cfg.hyper
        )
        new_state = dataclasses.replace(
            state, params=new_params, adam=new_adam, dstate=dstate,
            step=state.step + 1,
        )
        metrics = dict(
            loss=loss,
            psnr=psnr(out["render"], cam.image),
            overflow=out["overflow"],
        )
        return new_state, metrics

    return jax.jit(step)


def hybrid_train_loop(
    state: TrainState,
    cameras: list,
    cfg: TrainConfig,
    key: jax.Array,
    mesh: Mesh,
    scene_extent: float = 1.0,
    num_iters: Optional[int] = None,
    log_every: int = 0,
    pair_budget: Optional[int] = None,
    iter_offset: int = 0,
    zero: bool = False,
    axis_view: str = "view",
    axis_band: str = "band",
):
    """Multi-host training driver over the hybrid (view=host x band=chip)
    mesh — the pod counterpart of pipelines.train.train_loop.

    Every process runs IDENTICAL host logic on the replicated state (same
    RNG streams, same densify decisions); each host row contributes its own
    view per step via multihost.global_batch_from_local, so one step trains
    nview different views band-sharded over each host's chips. The full
    reference protocol applies: SH warmup every 1000 (steps rebuilt per
    degree — it is a static kernel parameter), densify/prune every 100 in
    the window (psum'd per-view stats), opacity reset every 3000, planned
    capacity doubling. `zero=True` uses the reduce-scatter + sharded-Adam
    step (make_hybrid_train_step_zero) — prefer it on pods; the replicated
    default keeps host-side state fully addressable for single-process runs.
    """
    from . import multihost
    from ..pipelines.train import (
        densify_step,
        grow_capacity,
        num_alive,
        opacity_reset_step,
    )

    import numpy as np

    nview = mesh.shape[axis_view]
    h, w = cameras[0].height, cameras[0].width
    iters = num_iters or cfg.iterations
    rng = np.random.default_rng(0)
    order: list = []
    history = []
    make = make_hybrid_train_step_zero if zero else make_hybrid_train_step
    steps_by_degree: dict = {}

    def step_fn(deg):
        if deg not in steps_by_degree:
            steps_by_degree[deg] = make(
                mesh, cfg, active_sh_degree=deg, img_height=h, img_width=w,
                pair_budget=pair_budget, axis_view=axis_view,
                axis_band=axis_band,
            )
        return steps_by_degree[deg]

    bg = jnp.ones(3) if cfg.white_background else jnp.zeros(3)
    me = jax.process_index() if jax.process_count() > 1 else 0
    for rel_it in range(1, iters + 1):
        it = iter_offset + rel_it
        # same permutation stream on every process; each host row takes its
        # own slot of the nview-view step batch
        while len(order) < nview:
            order = order + list(rng.permutation(len(cameras)))
        take, order = order[:nview], order[nview:]
        sh_deg = min(cfg.max_sh_degree, it // 1000)
        if jax.process_count() > 1:
            local = stack_cameras([cameras[take[me]]])
            cam_batch = multihost.global_batch_from_local(
                local, mesh, axis_view
            )
        else:
            cam_batch = stack_cameras([cameras[i] for i in take])
        state, metrics = step_fn(sh_deg)(state, cam_batch, bg)
        if it < cfg.densify_until_iter:
            if (
                it > cfg.densify_from_iter
                and it % cfg.densification_interval == 0
            ):
                key, sub = jax.random.split(key)
                state, _dropped = densify_step(
                    state, sub, scene_extent, cfg,
                    use_screen_size=it > cfg.opacity_reset_interval,
                )
                if int(num_alive(state.alive)) > 0.85 * state.params.capacity:
                    state = grow_capacity(state)
            if it % cfg.opacity_reset_interval == 0 or (
                cfg.white_background and it == cfg.densify_from_iter
            ):
                state = opacity_reset_step(state)
        if log_every and it % log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            history.append((it, m))
            multihost.primary_print(
                f"iter {it}: loss {m['loss']:.4f} psnr {m['psnr']:.2f} "
                f"alive {int(np.asarray(num_alive(state.alive)))}"
            )
    return state, history
