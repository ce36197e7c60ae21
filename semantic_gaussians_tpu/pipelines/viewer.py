"""Viewer core: render modes + text-driven scene editing (headless).

Parity: /root/reference/view_viser.py — render modes RGB / Depth / Semantic /
Relevancy (:256-330) and the edit operations applied to text-selected
Gaussians (:212-252):
  Remove -> opacity logit := -9999
  Color  -> DC color inverted (1 - rgb, clamped)
  Size   -> log-scales and positions doubled (reference doubles the raw
            _scaling, i.e. squares the activated scale — kept for parity)
  Move   -> xyz += 1
Selection: per-Gaussian argmax over ['other'] + edit prompts + preserve
prompts; selected iff 0 < label <= len(edit prompts) (:225).

The reference's viser web UI is replaced by a headless HTTP service
(view_server.py) — same capabilities, TPU-friendly (no GUI deps).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.gaussians import GaussianParams
from ..data.scannet_constants import COLORMAP
from ..renderer import render, render_chn
from ..utils.camera import Camera
from ..utils.sh import rgb_to_sh, sh_to_rgb


def _normalize(x, axis=-1, eps=1e-8):
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + eps)


def select_by_text(
    gauss_feats: jnp.ndarray,  # [cap, D]
    text_encoder,
    edit_prompts: Sequence[str],
    preserve_prompts: Sequence[str] = (),
) -> jnp.ndarray:
    """[cap] bool — Gaussians whose best prompt is one of edit_prompts."""
    labelset = ["other"] + list(edit_prompts) + list(preserve_prompts)
    text = jnp.asarray(text_encoder.extract_text_feature(labelset))
    sims = _normalize(gauss_feats) @ text.T
    label = jnp.argmax(sims, axis=-1)
    return (label > 0) & (label <= len(edit_prompts))


def apply_edit(
    params: GaussianParams, edit_mask: jnp.ndarray, mode: str
) -> GaussianParams:
    """Pure edit op on selected Gaussians (view_viser.py:226-247)."""
    m = edit_mask
    if mode == "Remove":
        return dataclasses.replace(
            params,
            opacity_logits=jnp.where(
                m[:, None], -9999.0, params.opacity_logits
            ),
        )
    if mode == "Color":
        rgb = sh_to_rgb(params.sh_dc)
        inv = rgb_to_sh(jnp.clip(1.0 - rgb, 0.0, 1.0))
        return dataclasses.replace(
            params, sh_dc=jnp.where(m[:, None, None], inv, params.sh_dc)
        )
    if mode == "Size":
        return dataclasses.replace(
            params,
            log_scales=jnp.where(
                m[:, None], params.log_scales * 2.0, params.log_scales
            ),
            means=jnp.where(m[:, None], params.means * 2.0, params.means),
        )
    if mode == "Move":
        return dataclasses.replace(
            params, means=jnp.where(m[:, None], params.means + 1.0, params.means)
        )
    raise ValueError(f"unknown edit mode {mode!r}")


def render_view(
    camera: Camera,
    params: GaussianParams,
    alive: jnp.ndarray,
    mode: str = "RGB",
    gauss_feats: Optional[jnp.ndarray] = None,
    text_encoder=None,
    prompts: Optional[Sequence[str]] = None,
    backend: str = "pallas",
) -> np.ndarray:
    """[H, W, 3] uint8 image for one of the four view modes."""
    if mode == "RGB":
        out = render(camera, params, alive=alive, backend=backend)
        img = np.asarray(jnp.clip(out["render"], 0, 1))
    elif mode == "Depth":
        out = render(camera, params, alive=alive, backend=backend)
        d = np.asarray(out["depth"])
        # clip-normalize like the viewer (view_viser.py depth path)
        lo, hi = np.percentile(d, 2), np.percentile(d, 98)
        img = np.repeat(
            ((np.clip(d, lo, hi) - lo) / max(hi - lo, 1e-6))[..., None], 3, -1
        )
    elif mode == "Semantic":
        assert gauss_feats is not None and prompts
        labelset = ["other"] + list(prompts)
        text = jnp.asarray(text_encoder.extract_text_feature(labelset))
        sims = _normalize(gauss_feats) @ text.T
        onehot = jax.nn.one_hot(jnp.argmax(sims, -1), len(labelset))
        out = render_chn(
            camera, params, onehot * alive[:, None], alive=alive,
            backend=backend,
        )
        cls = np.asarray(jnp.argmax(out["render"], axis=-1))
        palette = COLORMAP[: len(labelset)] / 255.0
        img = palette[cls]
    elif mode == "Relevancy":
        assert gauss_feats is not None and prompts
        text = jnp.asarray(text_encoder.extract_text_feature(list(prompts)))
        rel = (_normalize(gauss_feats) @ text.T).max(axis=-1, keepdims=True)
        rel = jnp.clip((rel + 1) / 2, 0, 1)
        out = render_chn(
            camera, params, rel * alive[:, None], alive=alive, backend=backend
        )
        r = np.asarray(out["render"])[..., 0]
        img = np.stack([r, 0.2 + 0.6 * r, 1.0 - r], axis=-1)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)
