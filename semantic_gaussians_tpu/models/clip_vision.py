"""CLIP image encoder (ViT) in pure JAX/Flax — the native image tower.

Counterpart of models.clip_text for the SAMCLIP predictor
(/root/reference/model/samclip_predictor.py:96 encodes every mask crop with
CLIP ViT-L/14@336px) and VLPart's text-aligned region features. Architecture
= OpenAI CLIP visual transformer: patch-conv embed (no bias), class token,
learned positional embedding, pre-LN residual blocks with QuickGELU MLPs,
ln_post on the class token, linear projection into the joint space.

Weights load from the OpenAI `clip` state_dict (`visual.*` keys, incl.
TorchScript archives) via `params_from_torch_state_dict`.
Preprocessing matches the reference crop path (samclip_predictor.py:91-95):
float RGB in [0,1], normalized with CLIP mean/std — resizing/padding of the
mask crops happens in the predictor.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from .clip_text import quick_gelu

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class SelfAttention(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x):  # [B, T, W]
        b, t, w = x.shape
        hd = w // self.heads
        qkv = nn.Dense(3 * w, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def hf(z):
            return z.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = hf(q), hf(k), hf(v)
        attn = jax.nn.softmax(
            (q / np.sqrt(hd)) @ k.transpose(0, 1, 3, 2), axis=-1
        )
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, t, w)
        return nn.Dense(w, name="out")(out)


class VisionBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(name="ln_1")(x)
        x = x + SelfAttention(self.width, self.heads, name="attn")(y)
        y = nn.LayerNorm(name="ln_2")(x)
        y = nn.Dense(self.width * 4, name="mlp_fc")(y)
        y = quick_gelu(y)
        y = nn.Dense(self.width, name="mlp_proj")(y)
        return x + y


class CLIPVisionTower(nn.Module):
    """ViT-L/14@336 defaults (the reference's SAMCLIP/OpenSeg text pairing)."""

    image_size: int = 336
    patch: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    embed_dim: int = 768

    @nn.compact
    def __call__(self, x):  # [B, S, S, 3] normalized -> [B, embed_dim]
        b = x.shape[0]
        g = self.image_size // self.patch
        x = nn.Conv(
            self.width, (self.patch, self.patch),
            strides=(self.patch, self.patch), padding="VALID", use_bias=False,
            name="patch_embed",
        )(x).reshape(b, g * g, self.width)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (self.width,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.width)), x], axis=1
        )
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.02),
            (g * g + 1, self.width),
        )
        x = x + pos
        x = nn.LayerNorm(name="ln_pre")(x)
        for i in range(self.layers):
            x = VisionBlock(self.width, self.heads, name=f"block{i}")(x)
        x = nn.LayerNorm(name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(0.02), (self.width, self.embed_dim)
        )
        return x @ proj


def _np(x):
    try:
        return np.asarray(x.detach().cpu().float().numpy())
    except AttributeError:
        return np.asarray(x, np.float32)


def params_from_torch_state_dict(sd, cfg: Optional[CLIPVisionTower] = None) -> dict:
    """OpenAI clip `visual.*` (or a full CLIP sd) -> flax params."""
    g = {k: _np(v) for k, v in sd.items()}

    def get(*names):
        for n in names:
            if n in g:
                return g[n]
        raise KeyError(names[0])

    pfx = "visual." if any(k.startswith("visual.") for k in g) else ""
    width = get(pfx + "class_embedding").shape[0]
    layers = len(
        {
            k.split(".resblocks.")[1].split(".")[0]
            for k in g
            if ".resblocks." in k
        }
    ) if any(".resblocks." in k for k in g) else (cfg.layers if cfg else 24)

    p = {
        "patch_embed": dict(
            kernel=get(pfx + "conv1.weight").transpose(2, 3, 1, 0)
        ),
        "class_embedding": get(pfx + "class_embedding"),
        "positional_embedding": get(pfx + "positional_embedding"),
        "ln_pre": dict(
            scale=get(pfx + "ln_pre.weight"), bias=get(pfx + "ln_pre.bias")
        ),
        "ln_post": dict(
            scale=get(pfx + "ln_post.weight"), bias=get(pfx + "ln_post.bias")
        ),
        "proj": get(pfx + "proj"),
    }
    for i in range(layers):
        rp = f"{pfx}transformer.resblocks.{i}."
        w_in = get(rp + "attn.in_proj_weight")
        b_in = get(rp + "attn.in_proj_bias")
        p[f"block{i}"] = {
            "ln_1": dict(
                scale=get(rp + "ln_1.weight"), bias=get(rp + "ln_1.bias")
            ),
            "ln_2": dict(
                scale=get(rp + "ln_2.weight"), bias=get(rp + "ln_2.bias")
            ),
            "attn": {
                "qkv": dict(kernel=w_in.T, bias=b_in),
                "out": dict(
                    kernel=get(rp + "attn.out_proj.weight").T,
                    bias=get(rp + "attn.out_proj.bias"),
                ),
            },
            "mlp_fc": dict(
                kernel=get(rp + "mlp.c_fc.weight").T,
                bias=get(rp + "mlp.c_fc.bias"),
            ),
            "mlp_proj": dict(
                kernel=get(rp + "mlp.c_proj.weight").T,
                bias=get(rp + "mlp.c_proj.bias"),
            ),
        }
    return {"params": p}


class JaxCLIPImageEncoder:
    """encode_image over preprocessed [B, S, S, 3] float [0,1] RGB batches."""

    def __init__(
        self,
        tower: Optional[CLIPVisionTower] = None,
        params: Optional[dict] = None,
        checkpoint_path: Optional[str] = None,
    ):
        self.tower = tower or CLIPVisionTower()
        if params is None:
            if checkpoint_path is None:
                raise ValueError("need params or checkpoint_path")
            # RAW state dict load (clip_text.load_checkpoint converts for
            # the TEXT tower and would double-convert here); handles plain
            # state dicts and TorchScript archives (the OpenAI .pt files).
            import torch

            try:
                sd = torch.load(
                    checkpoint_path, map_location="cpu", weights_only=False
                )
            except RuntimeError:
                sd = torch.jit.load(checkpoint_path, map_location="cpu")
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            params = params_from_torch_state_dict(sd, self.tower)
        self.params = params
        self.embedding_dim = self.tower.embed_dim
        self._jit = jax.jit(lambda v, x: self.tower.apply(v, x))

    def encode_image(self, batch: np.ndarray) -> np.ndarray:
        """batch: [B, S, S, 3] float32 in [0,1]. Returns [B, D] UNnormalized
        embeddings (the reference accumulates unnormalized crop features and
        normalizes per pixel, samclip_predictor.py:96-104)."""
        x = (np.asarray(batch, np.float32) - CLIP_MEAN) / CLIP_STD
        return np.asarray(self._jit(self.params, jnp.asarray(x)))
