"""Segment-Anything (SAM) in pure JAX/Flax: image encoder + prompt encoder +
mask decoder.

TPU-native re-implementation of the reference's vendored SAM
(/root/reference/submodules/segment-anything/segment_anything/modeling/
{image_encoder,prompt_encoder,mask_decoder,transformer}.py), used by the
SAMCLIP predictor (model/samclip_predictor.py) to generate masks for
open-vocabulary feature extraction. Behavior parity targets (from the
reference code, not copied):

  * ImageEncoderViT ("ViT-det"): 16x16 conv patch embed, learned absolute
    pos-embed added at (64, 64) token grid, transformer blocks with 14x14
    WINDOW attention except a few GLOBAL blocks, decomposed relative
    position bias added separately for the h and w axes, and a conv "neck"
    (1x1 -> LayerNorm2d -> 3x3 -> LayerNorm2d) to the 256-d embedding.
    Input is the image resized so its longest side is `img_size` (1024),
    normalized with ImageNet-ish pixel stats, zero-padded square.
  * PromptEncoder: random-Fourier positional encoding of point coords
    (coords scaled to [0,1], *2-1, matmul with a fixed gaussian matrix,
    2*pi, sin/cos concat), plus learned per-type embeddings (negative,
    positive, box corner 1/2, not-a-point) and a learned "no mask" dense
    embedding broadcast over the 64x64 grid.
  * MaskDecoder: iou token + 4 mask tokens prepended to sparse prompt
    embeddings; a 2-layer TwoWayTransformer (token self-attn, token->image
    cross-attn, MLP, image->token cross-attn, with 128-d downsampled
    attention and pre-residual LayerNorms; query/key position embeddings
    re-added at every layer); 4x transposed-conv upscaling of the image
    embedding; per-token hypernetwork MLPs predicting mask weights; an IoU
    MLP head. multimask output = tokens 1..3 (small/medium/large).

All dense math is jittable with static shapes; the batched point prompts of
the automatic mask generator run as one (B, 1, 2) batch through the prompt
encoder + decoder under jit.

Weight converters accept the public `sam_vit_*.pth` torch state dict layout.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


@dataclasses.dataclass(frozen=True)
class SamConfig:
    img_size: int = 1024
    patch: int = 16
    embed_dim: int = 1280  # vit_h
    depth: int = 32
    num_heads: int = 16
    window: int = 14
    global_blocks: Tuple[int, ...] = (7, 15, 23, 31)
    out_chans: int = 256
    decoder_dim: int = 256
    decoder_heads: int = 8
    decoder_mlp: int = 2048
    num_multimask: int = 3

    @staticmethod
    def vit_h() -> "SamConfig":
        return SamConfig()

    @staticmethod
    def vit_l() -> "SamConfig":
        return SamConfig(
            embed_dim=1024, depth=24, num_heads=16,
            global_blocks=(5, 11, 17, 23),
        )

    @staticmethod
    def vit_b() -> "SamConfig":
        return SamConfig(
            embed_dim=768, depth=12, num_heads=12,
            global_blocks=(2, 5, 8, 11),
        )

    @staticmethod
    def tiny(img_size: int = 64) -> "SamConfig":
        """Small config for tests: same topology, toy widths."""
        return SamConfig(
            img_size=img_size, patch=8, embed_dim=32, depth=2, num_heads=2,
            window=2, global_blocks=(1,), out_chans=16, decoder_dim=16,
            decoder_heads=2, decoder_mlp=32,
        )

    @property
    def grid(self) -> int:
        return self.img_size // self.patch


def _layer_norm_2d(x, scale, bias, eps=1e-6):
    """LayerNorm over the CHANNEL axis of an NHWC tensor (the reference's
    LayerNorm2d normalizes NCHW dim 1)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * scale + bias


def window_partition(x, w):
    """(B, H, W, C) -> (B*nW, w, w, C) with zero padding; returns padded HW."""
    b, h, wdt, c = x.shape
    ph, pw = (-h) % w, (-wdt) % w
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, wdt + pw
    x = x.reshape(b, hp // w, w, wp // w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w, w, c)
    return x, (hp, wp)


def window_unpartition(x, w, pad_hw, hw):
    hp, wp = pad_hw
    h, wdt = hw
    b = x.shape[0] // (hp // w * (wp // w))
    x = x.reshape(b, hp // w, wp // w, w, w, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :wdt]


def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Relative position table rows for each (q, k) pair along one axis.

    The table holds 2*max(q,k)-1 learned vectors (linearly resized if its
    length differs); entry [i, j] is table[(i - j) + (k_size - 1)] scaled
    for unequal q/k sizes (image_encoder.py get_rel_pos semantics)."""
    max_rel = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel, rel_pos.shape[1]), method="linear"
        )
    qi = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    kj = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    idx = (qi - kj + (k_size - 1) * max(q_size / k_size, 1.0)).astype(jnp.int32)
    return rel_pos[idx]


class VitDetAttention(nn.Module):
    """Multi-head attention over a (B, H, W, C) token grid with decomposed
    relative position bias."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hd = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(x)  # (B,H,W,3C)
        qkv = qkv.reshape(b, h * w, 3, self.heads, hd)
        q, k, v = (
            qkv[:, :, 0].transpose(0, 2, 1, 3),
            qkv[:, :, 1].transpose(0, 2, 1, 3),
            qkv[:, :, 2].transpose(0, 2, 1, 3),
        )  # (B, heads, N, hd)
        attn = (q * (hd ** -0.5)) @ k.transpose(0, 1, 3, 2)  # (B,hds,N,N)

        rel_h = self.param(
            "rel_pos_h", nn.initializers.zeros, (2 * h - 1, hd), jnp.float32
        )
        rel_w = self.param(
            "rel_pos_w", nn.initializers.zeros, (2 * w - 1, hd), jnp.float32
        )
        Rh = get_rel_pos(h, h, rel_h)  # (h, h, hd)
        Rw = get_rel_pos(w, w, rel_w)  # (w, w, hd)
        qg = q.reshape(b, self.heads, h, w, hd)
        bias_h = jnp.einsum("bnhwc,hkc->bnhwk", qg, Rh)
        bias_w = jnp.einsum("bnhwc,wkc->bnhwk", qg, Rw)
        attn = attn.reshape(b, self.heads, h, w, h, w)
        attn = attn + bias_h[..., :, None] + bias_w[..., None, :]
        attn = attn.reshape(b, self.heads, h * w, h * w)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class VitDetBlock(nn.Module):
    cfg: SamConfig
    window: int  # 0 = global

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window > 0:
            hw = x.shape[1:3]
            x, pad_hw = window_partition(x, self.window)
        x = VitDetAttention(c.embed_dim, c.num_heads, name="attn")(x)
        if self.window > 0:
            x = window_unpartition(x, self.window, pad_hw, hw)
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(c.embed_dim * 4, name="mlp_lin1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(c.embed_dim, name="mlp_lin2")(y)
        return x + y


class ImageEncoderViT(nn.Module):
    cfg: SamConfig

    @nn.compact
    def __call__(self, x):  # (B, S, S, 3) normalized
        c = self.cfg
        x = nn.Conv(
            c.embed_dim, (c.patch, c.patch), strides=(c.patch, c.patch),
            padding="VALID", name="patch_embed",
        )(x)  # (B, g, g, C)
        pos = self.param(
            "pos_embed", nn.initializers.zeros,
            (1, c.grid, c.grid, c.embed_dim), jnp.float32,
        )
        x = x + pos
        for i in range(c.depth):
            win = 0 if i in c.global_blocks else c.window
            x = VitDetBlock(c, win, name=f"block{i}")(x)
        # neck
        x = nn.Conv(c.out_chans, (1, 1), use_bias=False, name="neck0")(x)
        s0 = self.param("neck_ln0_scale", nn.initializers.ones, (c.out_chans,))
        b0 = self.param("neck_ln0_bias", nn.initializers.zeros, (c.out_chans,))
        x = _layer_norm_2d(x, s0, b0)
        x = nn.Conv(
            c.out_chans, (3, 3), padding="SAME", use_bias=False, name="neck1"
        )(x)
        s1 = self.param("neck_ln1_scale", nn.initializers.ones, (c.out_chans,))
        b1 = self.param("neck_ln1_bias", nn.initializers.zeros, (c.out_chans,))
        return _layer_norm_2d(x, s1, b1)  # (B, g, g, 256)


class PromptEncoder(nn.Module):
    """Point/box prompts -> sparse embeddings; 'no mask' dense embedding."""

    cfg: SamConfig

    def setup(self):
        c = self.cfg
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, c.decoder_dim // 2)
        )
        # 0: negative point, 1: positive point, 2/3: box corners
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0),
            (4, c.decoder_dim),
        )
        self.not_a_point = self.param(
            "not_a_point", nn.initializers.normal(1.0), (c.decoder_dim,)
        )
        self.no_mask = self.param(
            "no_mask", nn.initializers.normal(1.0), (c.decoder_dim,)
        )

    def pe_encode(self, coords01):
        """Random-Fourier PE of [0,1]-normalized coords (..., 2)."""
        z = (2.0 * coords01 - 1.0) @ self.pe_gaussian  # (..., D/2)
        z = 2.0 * jnp.pi * z
        return jnp.concatenate([jnp.sin(z), jnp.cos(z)], axis=-1)

    def dense_pe(self):
        g = self.cfg.grid
        ys = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        xs = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
        return self.pe_encode(grid)  # (g, g, D)

    def embed_boxes(self, boxes):
        """boxes: (B, 4) xyxy in the ENCODER's input frame -> (B, 2, D)
        corner embeddings (prompt_encoder.py _embed_boxes: +0.5, PE, then
        point_embeddings[2]/[3] on the two corners)."""
        c = self.cfg
        coords = (boxes.reshape(-1, 2, 2) + 0.5) / c.img_size
        pe = self.pe_encode(coords)
        corner = jnp.stack(
            [self.point_embeddings[2], self.point_embeddings[3]], axis=0
        )
        sparse = pe + corner[None]
        dense = jnp.broadcast_to(
            self.no_mask, (boxes.shape[0], c.grid, c.grid, c.decoder_dim)
        )
        return sparse, dense

    def __call__(self, points, labels):
        """points: (B, P, 2) pixel coords in the ENCODER's input frame;
        labels: (B, P) in {-1 pad, 0 negative, 1 positive}."""
        c = self.cfg
        coords01 = (points + 0.5) / c.img_size
        pe = self.pe_encode(coords01)
        pe = jnp.where((labels == -1)[..., None], 0.0, pe)
        emb = jnp.where(
            (labels == -1)[..., None],
            self.not_a_point,
            jnp.where(
                (labels == 1)[..., None],
                self.point_embeddings[1],
                self.point_embeddings[0],
            ),
        )
        sparse = pe + emb  # (B, P, D)
        dense = jnp.broadcast_to(
            self.no_mask, (points.shape[0], c.grid, c.grid, c.decoder_dim)
        )
        return sparse, dense


class _DownAttention(nn.Module):
    """Attention with internally downsampled channel dim (transformer.py
    Attention(downsample_rate))."""

    dim: int
    heads: int
    down: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        d = self.dim // self.down
        hd = d // self.heads
        qp = nn.Dense(d, name="q_proj")(q)
        kp = nn.Dense(d, name="k_proj")(k)
        vp = nn.Dense(d, name="v_proj")(v)

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = split(qp), split(kp), split(vp)
        attn = jax.nn.softmax(
            (qh / math.sqrt(hd)) @ kh.transpose(0, 1, 3, 2), axis=-1
        )
        out = (attn @ vh).transpose(0, 2, 1, 3)
        out = out.reshape(q.shape[0], q.shape[1], d)
        return nn.Dense(self.dim, name="out_proj")(out)


class TwoWayBlock(nn.Module):
    cfg: SamConfig
    skip_first_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, qpe, kpe):
        c = self.cfg
        if self.skip_first_pe:
            # first layer: output REPLACES queries (no residual, no PE)
            queries = _DownAttention(
                c.decoder_dim, c.decoder_heads, name="self_attn"
            )(queries, queries, queries)
        else:
            q = queries + qpe
            attn = _DownAttention(
                c.decoder_dim, c.decoder_heads, name="self_attn"
            )(q, q, queries)
            queries = queries + attn
        queries = nn.LayerNorm(name="norm1")(queries)
        q, k = queries + qpe, keys + kpe
        attn = _DownAttention(
            c.decoder_dim, c.decoder_heads, down=2, name="cross_t2i"
        )(q, k, keys)
        queries = nn.LayerNorm(name="norm2")(queries + attn)
        y = nn.Dense(c.decoder_mlp, name="mlp_lin1")(queries)
        y = jax.nn.relu(y)
        y = nn.Dense(c.decoder_dim, name="mlp_lin2")(y)
        queries = nn.LayerNorm(name="norm3")(queries + y)
        q, k = queries + qpe, keys + kpe
        attn = _DownAttention(
            c.decoder_dim, c.decoder_heads, down=2, name="cross_i2t"
        )(k, q, queries)
        keys = nn.LayerNorm(name="norm4")(keys + attn)
        return queries, keys


class MaskDecoder(nn.Module):
    cfg: SamConfig

    @nn.compact
    def __call__(self, image_emb, image_pe, sparse_prompt, dense_prompt):
        """image_emb/image_pe: (g, g, D); sparse: (B, P, D);
        dense: (B, g, g, D). Returns (masks (B, 4, 4g, 4g) logits,
        iou (B, 4))."""
        c = self.cfg
        b = sparse_prompt.shape[0]
        g = image_emb.shape[0]
        iou_token = self.param(
            "iou_token", nn.initializers.normal(1.0), (1, c.decoder_dim)
        )
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0),
            (1 + c.num_multimask, c.decoder_dim),
        )
        tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.broadcast_to(
            tokens[None], (b, tokens.shape[0], c.decoder_dim)
        )
        tokens = jnp.concatenate([tokens, sparse_prompt], axis=1)

        src = image_emb[None] + dense_prompt  # (B, g, g, D)
        src = src.reshape(b, g * g, c.decoder_dim)
        pe = jnp.broadcast_to(
            image_pe.reshape(1, g * g, c.decoder_dim), src.shape
        )
        q, k = tokens, src
        q, k = TwoWayBlock(c, skip_first_pe=True, name="tw0")(q, k, tokens, pe)
        q, k = TwoWayBlock(c, name="tw1")(q, k, tokens, pe)
        qf = q + tokens
        attn = _DownAttention(
            c.decoder_dim, c.decoder_heads, down=2, name="final_t2i"
        )(qf, k + pe, k)
        q = nn.LayerNorm(name="final_norm")(q + attn)

        iou_out = q[:, 0]
        mask_out = q[:, 1 : 2 + c.num_multimask]  # (B, 4, D)

        # upscale the transformer-UPDATED image embedding (the reference
        # decoder upscales the `src` returned by the two-way transformer,
        # mask_decoder.py predict_masks — the pretrained up/hyper weights
        # are trained against the attended embedding, not the input one)
        up = k.reshape(b, g, g, c.decoder_dim)
        up = nn.ConvTranspose(
            c.decoder_dim // 4, (2, 2), strides=(2, 2), name="up0"
        )(up)
        s = self.param(
            "up_ln_scale", nn.initializers.ones, (c.decoder_dim // 4,)
        )
        bb = self.param(
            "up_ln_bias", nn.initializers.zeros, (c.decoder_dim // 4,)
        )
        up = _layer_norm_2d(up, s, bb)
        up = jax.nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(
            c.decoder_dim // 8, (2, 2), strides=(2, 2), name="up1"
        )(up)
        up = jax.nn.gelu(up, approximate=False)  # (B, 4g, 4g, D/8)

        hyper = []
        for i in range(1 + c.num_multimask):
            t = mask_out[:, i]
            for j, width in enumerate(
                [c.decoder_dim, c.decoder_dim, c.decoder_dim // 8]
            ):
                t = nn.Dense(width, name=f"hyper{i}_lin{j}")(t)
                if j < 2:
                    t = jax.nn.relu(t)
            hyper.append(t)
        hyper = jnp.stack(hyper, axis=1)  # (B, 4, D/8)
        masks = jnp.einsum("bkc,bhwc->bkhw", hyper, up)

        t = iou_out
        for j, width in enumerate(
            [c.decoder_dim, c.decoder_dim, 1 + c.num_multimask]
        ):
            t = nn.Dense(width, name=f"iou_lin{j}")(t)
            if j < 2:
                t = jax.nn.relu(t)
        return masks, t


class Sam(nn.Module):
    cfg: SamConfig

    def setup(self):
        self.image_encoder = ImageEncoderViT(self.cfg)
        self.prompt_encoder = PromptEncoder(self.cfg)
        self.mask_decoder = MaskDecoder(self.cfg)

    def encode_image(self, x):
        return self.image_encoder(x)

    def predict_points(self, image_emb, points, labels):
        """image_emb (g, g, D); points (B, P, 2) encoder-frame pixels;
        labels (B, P). Returns (masks (B, 4, 4g, 4g), iou (B, 4))."""
        # box-less prompts get a (0,0)/-1 padding point (prompt_encoder.py
        # _embed_points pad=True path)
        b = points.shape[0]
        points = jnp.concatenate(
            [points, jnp.zeros((b, 1, 2), points.dtype)], axis=1
        )
        labels = jnp.concatenate(
            [labels, -jnp.ones((b, 1), labels.dtype)], axis=1
        )
        sparse, dense = self.prompt_encoder(points, labels)
        image_pe = self.prompt_encoder.dense_pe()
        return self.mask_decoder(image_emb, image_pe, sparse, dense)

    def predict_boxes(self, image_emb, boxes):
        """Box-prompted single-mask prediction (multimask_output=False:
        token 0). boxes (B, 4) encoder-frame xyxy. Returns (masks
        (B, 4g, 4g) logits, iou (B,))."""
        sparse, dense = self.prompt_encoder.embed_boxes(boxes)
        image_pe = self.prompt_encoder.dense_pe()
        masks, iou = self.mask_decoder(image_emb, image_pe, sparse, dense)
        return masks[:, 0], iou[:, 0]

    def __call__(self, x, points, labels):
        emb = self.encode_image(x)
        return self.predict_points(emb[0], points, labels)


# ---------------------------------------------------------------------------
# torch checkpoint conversion (public sam_vit_*.pth layout)
# ---------------------------------------------------------------------------


def _np_(t):
    import torch  # noqa

    return np.asarray(t.detach().cpu().float().numpy())


def params_from_sam_state_dict(sd, cfg: SamConfig) -> dict:
    """Convert a torch SAM state dict to this module's param tree."""
    g = {k: _np_(v) for k, v in sd.items()}

    def dense(prefix):
        return dict(kernel=g[prefix + ".weight"].T, bias=g[prefix + ".bias"])

    enc = {
        "patch_embed": dict(
            kernel=g["image_encoder.patch_embed.proj.weight"].transpose(
                2, 3, 1, 0
            ),
            bias=g["image_encoder.patch_embed.proj.bias"],
        ),
        "pos_embed": g["image_encoder.pos_embed"],
        "neck0": dict(
            kernel=g["image_encoder.neck.0.weight"].transpose(2, 3, 1, 0)
        ),
        "neck_ln0_scale": g["image_encoder.neck.1.weight"],
        "neck_ln0_bias": g["image_encoder.neck.1.bias"],
        "neck1": dict(
            kernel=g["image_encoder.neck.2.weight"].transpose(2, 3, 1, 0)
        ),
        "neck_ln1_scale": g["image_encoder.neck.3.weight"],
        "neck_ln1_bias": g["image_encoder.neck.3.bias"],
    }
    for i in range(cfg.depth):
        p = f"image_encoder.blocks.{i}"
        enc[f"block{i}"] = {
            "norm1": dict(scale=g[p + ".norm1.weight"], bias=g[p + ".norm1.bias"]),
            "norm2": dict(scale=g[p + ".norm2.weight"], bias=g[p + ".norm2.bias"]),
            "attn": {
                "qkv": dense(p + ".attn.qkv"),
                "proj": dense(p + ".attn.proj"),
                "rel_pos_h": g[p + ".attn.rel_pos_h"],
                "rel_pos_w": g[p + ".attn.rel_pos_w"],
            },
            "mlp_lin1": dense(p + ".mlp.lin1"),
            "mlp_lin2": dense(p + ".mlp.lin2"),
        }

    pe = {
        "pe_gaussian": g[
            "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"
        ],
        "point_embeddings": np.stack(
            [g[f"prompt_encoder.point_embeddings.{i}.weight"][0] for i in range(4)]
        ),
        "not_a_point": g["prompt_encoder.not_a_point_embed.weight"][0],
        "no_mask": g["prompt_encoder.no_mask_embed.weight"][0],
    }

    def attn_block(p):
        return {
            "q_proj": dense(p + ".q_proj"),
            "k_proj": dense(p + ".k_proj"),
            "v_proj": dense(p + ".v_proj"),
            "out_proj": dense(p + ".out_proj"),
        }

    def tw(i):
        p = f"mask_decoder.transformer.layers.{i}"
        return {
            "self_attn": attn_block(p + ".self_attn"),
            "cross_t2i": attn_block(p + ".cross_attn_token_to_image"),
            "cross_i2t": attn_block(p + ".cross_attn_image_to_token"),
            "norm1": dict(scale=g[p + ".norm1.weight"], bias=g[p + ".norm1.bias"]),
            "norm2": dict(scale=g[p + ".norm2.weight"], bias=g[p + ".norm2.bias"]),
            "norm3": dict(scale=g[p + ".norm3.weight"], bias=g[p + ".norm3.bias"]),
            "norm4": dict(scale=g[p + ".norm4.weight"], bias=g[p + ".norm4.bias"]),
            "mlp_lin1": dense(p + ".mlp.lin1"),
            "mlp_lin2": dense(p + ".mlp.lin2"),
        }

    dec = {
        "iou_token": g["mask_decoder.iou_token.weight"],
        "mask_tokens": g["mask_decoder.mask_tokens.weight"],
        "tw0": tw(0),
        "tw1": tw(1),
        "final_t2i": attn_block(
            "mask_decoder.transformer.final_attn_token_to_image"
        ),
        "final_norm": dict(
            scale=g["mask_decoder.transformer.norm_final_attn.weight"],
            bias=g["mask_decoder.transformer.norm_final_attn.bias"],
        ),
        # torch ConvTranspose IOHW -> flax HWIO + spatial flip (flax's
        # transpose_kernel=False omits the adjoint flip; verified against
        # torch.nn.ConvTranspose2d for the LSeg converter, models/lseg.py)
        "up0": dict(
            kernel=g["mask_decoder.output_upscaling.0.weight"]
            .transpose(2, 3, 0, 1)[::-1, ::-1]
            .copy(),
            bias=g["mask_decoder.output_upscaling.0.bias"],
        ),
        "up_ln_scale": g["mask_decoder.output_upscaling.1.weight"],
        "up_ln_bias": g["mask_decoder.output_upscaling.1.bias"],
        "up1": dict(
            kernel=g["mask_decoder.output_upscaling.3.weight"]
            .transpose(2, 3, 0, 1)[::-1, ::-1]
            .copy(),
            bias=g["mask_decoder.output_upscaling.3.bias"],
        ),
    }
    for i in range(1 + cfg.num_multimask):
        p = f"mask_decoder.output_hypernetworks_mlps.{i}.layers"
        for j in range(3):
            dec[f"hyper{i}_lin{j}"] = dense(f"{p}.{j}")
    for j in range(3):
        dec[f"iou_lin{j}"] = dense(
            f"mask_decoder.iou_prediction_head.layers.{j}"
        )

    return {
        "params": {
            "image_encoder": enc,
            "prompt_encoder": pe,
            "mask_decoder": dec,
        }
    }


def preprocess_image(img: np.ndarray, img_size: int) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Resize longest side to img_size, normalize, zero-pad square (the
    reference's ResizeLongestSide + Sam.preprocess). Returns (padded (S,S,3)
    f32, (rh, rw) resized dims)."""
    h, w = img.shape[:2]
    scale = img_size / max(h, w)
    rh, rw = int(round(h * scale)), int(round(w * scale))
    x = jax.image.resize(
        jnp.asarray(img, jnp.float32), (rh, rw, 3), method="linear"
    )
    x = (x - PIXEL_MEAN) / PIXEL_STD
    x = jnp.pad(x, ((0, img_size - rh), (0, img_size - rw), (0, 0)))
    return np.asarray(x), (rh, rw)
