"""CLIP text encoder in pure JAX/Flax — the native text tower.

TPU-native replacement for the torch text encoders every reference predictor
carries (LSeg: clip.load("ViT-B/32") text side, model/lseg_predictor.py:40-94;
OpenSeg: CLIP text with prompt templates, model/openseg_predictor.py:81-99).
SURVEY.md §7.1 requires this "needed everywhere": eval relevancy maps, the
viewer's text queries, and distillation targets all consume [K, D] normalized
CLIP text embeddings.

Architecture = OpenAI CLIP text transformer (Learning Transferable Visual
Models, Radford et al. 2021): token embedding + learned positional embedding,
`layers` pre-LN residual blocks with causal self-attention and QuickGELU
MLPs, final LayerNorm, pooling at each sequence's EOT token (the argmax token
id), then a linear projection to the joint space and L2 normalization.

Weights load from either naming scheme:
  * OpenAI `clip` state_dict  (token_embedding.weight, transformer.resblocks.N...)
  * HF transformers CLIPTextModelWithProjection (text_model.encoder.layers.N...)
via `params_from_torch_state_dict` — no torch import needed (accepts any
mapping of name -> array-like).

Tokenization: `SimpleTokenizer` implements CLIP's byte-pair encoding when the
vocab file (bpe_simple_vocab_16e6.txt.gz) is available locally; all public
entry points also accept pre-tokenized id arrays so the tower is usable
without any vocab file (the sandbox has no egress).
"""
from __future__ import annotations

import functools
import gzip
import html
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

CONTEXT_LENGTH = 77
SOT_TOKEN = 49406
EOT_TOKEN = 49407


def quick_gelu(x):
    """OpenAI CLIP's activation (x * sigmoid(1.702 x)), NOT tanh-GELU."""
    return x * jax.nn.sigmoid(1.702 * x)


class CausalSelfAttention(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x):  # [B, T, W]
        B, T, W = x.shape
        hd = W // self.heads
        qkv = nn.Dense(3 * W, name="qkv")(x)  # packed, matches in_proj
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):
            return t.reshape(B, T, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        scale = hd ** -0.5
        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k,
            preferred_element_type=jnp.float32,
        )
        causal = jnp.tril(jnp.ones((T, T), bool))
        attn = jnp.where(causal, attn, -jnp.inf)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, W)
        return nn.Dense(W, name="out")(out)


LN_EPS = 1e-5  # CLIP/HF LayerNorm epsilon (flax default 1e-6 drifts ~2e-3
# at init-scale activations, where pre-LN variance is tiny)


class TextBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x):
        x = x + CausalSelfAttention(self.width, self.heads, name="attn")(
            nn.LayerNorm(name="ln_1", epsilon=LN_EPS)(x)
        )
        h = nn.LayerNorm(name="ln_2", epsilon=LN_EPS)(x)
        h = nn.Dense(4 * self.width, name="fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, name="proj")(h)
        return x + h


class CLIPTextTower(nn.Module):
    """OpenAI CLIP text transformer; ViT-B/32 defaults (512-d joint space)."""

    vocab_size: int = 49408
    context_length: int = CONTEXT_LENGTH
    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 512

    @nn.compact
    def __call__(self, token_ids):  # [B, T] int32 -> [B, embed_dim] UNnormalized
        x = nn.Embed(self.vocab_size, self.width, name="token_embedding")(token_ids)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = x + pos[None, : x.shape[1]]
        for i in range(self.layers):
            x = TextBlock(self.width, self.heads, name=f"block_{i}")(x)
        x = nn.LayerNorm(name="ln_final", epsilon=LN_EPS)(x)
        # Pool at the EOT token = highest token id in each row (CLIP's rule:
        # ids are contiguous and EOT is the largest).
        eot = jnp.argmax(token_ids, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim),
        )
        return pooled @ proj


def _np(x):
    return np.asarray(x, dtype=np.float32)


def params_from_torch_state_dict(sd, cfg: Optional[CLIPTextTower] = None) -> dict:
    """Convert an OpenAI-CLIP or HF-CLIPText state_dict (any mapping of
    name -> array-like, e.g. a torch state_dict or an npz) into this module's
    param tree. Returns {'params': ...}."""
    sd = {k: v for k, v in sd.items()}
    hf = any(k.startswith("text_model.") for k in sd)

    def get(*names):
        for n in names:
            if n in sd:
                return _np(sd[n])
        raise KeyError(names[0])

    p = {}
    if hf:
        p["token_embedding"] = {
            "embedding": get("text_model.embeddings.token_embedding.weight")
        }
        p["positional_embedding"] = get(
            "text_model.embeddings.position_embedding.weight"
        )
        n_layers = 1 + max(
            int(k.split(".")[3]) for k in sd if k.startswith("text_model.encoder.layers.")
        )
        for i in range(n_layers):
            b = f"text_model.encoder.layers.{i}"
            qw, kw, vw = (get(f"{b}.self_attn.{t}_proj.weight") for t in "qkv")
            qb, kb, vb = (get(f"{b}.self_attn.{t}_proj.bias") for t in "qkv")
            p[f"block_{i}"] = {
                "ln_1": {"scale": get(f"{b}.layer_norm1.weight"),
                         "bias": get(f"{b}.layer_norm1.bias")},
                "ln_2": {"scale": get(f"{b}.layer_norm2.weight"),
                         "bias": get(f"{b}.layer_norm2.bias")},
                "attn": {
                    "qkv": {"kernel": np.concatenate([qw, kw, vw], 0).T,
                            "bias": np.concatenate([qb, kb, vb], 0)},
                    "out": {"kernel": get(f"{b}.self_attn.out_proj.weight").T,
                            "bias": get(f"{b}.self_attn.out_proj.bias")},
                },
                "fc": {"kernel": get(f"{b}.mlp.fc1.weight").T,
                       "bias": get(f"{b}.mlp.fc1.bias")},
                "proj": {"kernel": get(f"{b}.mlp.fc2.weight").T,
                         "bias": get(f"{b}.mlp.fc2.bias")},
            }
        p["ln_final"] = {"scale": get("text_model.final_layer_norm.weight"),
                         "bias": get("text_model.final_layer_norm.bias")}
        tp = get("text_projection.weight")  # HF: [embed, width] applied as x@W.T
        p["text_projection"] = tp.T
    else:
        p["token_embedding"] = {"embedding": get("token_embedding.weight")}
        p["positional_embedding"] = get("positional_embedding")
        n_layers = 1 + max(
            int(k.split(".")[2]) for k in sd if k.startswith("transformer.resblocks.")
        )
        for i in range(n_layers):
            b = f"transformer.resblocks.{i}"
            in_w = get(f"{b}.attn.in_proj_weight")  # [3W, W]
            in_b = get(f"{b}.attn.in_proj_bias")
            p[f"block_{i}"] = {
                "ln_1": {"scale": get(f"{b}.ln_1.weight"), "bias": get(f"{b}.ln_1.bias")},
                "ln_2": {"scale": get(f"{b}.ln_2.weight"), "bias": get(f"{b}.ln_2.bias")},
                "attn": {
                    "qkv": {"kernel": in_w.T, "bias": in_b},
                    "out": {"kernel": get(f"{b}.attn.out_proj.weight").T,
                            "bias": get(f"{b}.attn.out_proj.bias")},
                },
                "fc": {"kernel": get(f"{b}.mlp.c_fc.weight").T,
                       "bias": get(f"{b}.mlp.c_fc.bias")},
                "proj": {"kernel": get(f"{b}.mlp.c_proj.weight").T,
                         "bias": get(f"{b}.mlp.c_proj.bias")},
            }
        p["ln_final"] = {"scale": get("ln_final.weight"), "bias": get("ln_final.bias")}
        p["text_projection"] = get("text_projection")  # already [W, embed]
    return {"params": p}


# --------------------------------------------------------------------------
# Tokenizer (CLIP BPE). Needs bpe_simple_vocab_16e6.txt.gz locally; the id
# path below works without it.
# --------------------------------------------------------------------------


@functools.lru_cache()
def _bytes_to_unicode():
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


@functools.lru_cache(maxsize=4)
def _cached_tokenizer(bpe_path: str) -> "SimpleTokenizer":
    """BPE vocab parse is ~49k merges — cache per path (the viewer calls
    extract_text_feature on every client prompt)."""
    return SimpleTokenizer(bpe_path)


class SimpleTokenizer:
    """CLIP's BPE tokenizer (Radford et al.); requires the public
    bpe_simple_vocab_16e6.txt.gz merges file at `bpe_path`."""

    def __init__(self, bpe_path: str):
        import regex as re

        self.re = re
        merges = gzip.open(bpe_path, "rt", encoding="utf-8").read().split("\n")
        merges = [tuple(m.split()) for m in merges[1 : 49152 - 256 - 2 + 1]]
        vocab = list(_bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.byte_encoder = _bytes_to_unicode()
        self.cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )

    def _bpe(self, token):
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = set(zip(word[:-1], word[1:]))
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = set(zip(word[:-1], word[1:]))
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> list:
        bpe_tokens = []
        text = html.unescape(html.unescape(text)).strip().lower()
        text = self.re.sub(r"\s+", " ", text)
        for token in self.re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t] for t in self._bpe(token).split(" "))
        return bpe_tokens


def tokenize(
    texts: Sequence[str], bpe_path: str, context_length: int = CONTEXT_LENGTH
) -> np.ndarray:
    """[K, 77] int32 (SOT ... EOT, zero-padded), clip.tokenize parity."""
    tok = _cached_tokenizer(str(bpe_path))
    out = np.zeros((len(texts), context_length), np.int32)
    for i, t in enumerate(texts):
        ids = [SOT_TOKEN] + tok.encode(t) + [EOT_TOKEN]
        ids = ids[: context_length - 1] + [EOT_TOKEN] if len(ids) > context_length else ids
        out[i, : len(ids)] = ids
    return out


class JaxCLIPTextEncoder:
    """Predictor-protocol text side: normalized [K, embed_dim] features.

    Weights come from a local torch/npz checkpoint (no egress); texts are
    tokenized with a local BPE vocab, or passed pre-tokenized.
    """

    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        bpe_path: Optional[str] = None,
        tower: Optional[CLIPTextTower] = None,
        params: Optional[dict] = None,
    ):
        self.tower = tower or CLIPTextTower()
        self.embedding_dim = self.tower.embed_dim
        self.bpe_path = bpe_path
        if params is None:
            if checkpoint_path is None:
                raise ValueError("need checkpoint_path or params")
            params = load_checkpoint(checkpoint_path)
        self.params = params
        self._encode = jax.jit(
            lambda ids: _normalize(self.tower.apply(self.params, ids))
        )

    def encode_tokens(self, token_ids) -> np.ndarray:
        return np.asarray(self._encode(jnp.asarray(token_ids, jnp.int32)))

    def extract_text_feature(self, labelset: Sequence[str]) -> np.ndarray:
        if isinstance(labelset, str):
            labelset = labelset.split(",")
        if self.bpe_path is None:
            raise ValueError(
                "string input needs bpe_path (bpe_simple_vocab_16e6.txt.gz); "
                "use encode_tokens for pre-tokenized input"
            )
        return self.encode_tokens(tokenize(labelset, self.bpe_path))

    def extract_image_feature(self, img_path, img_size):
        raise NotImplementedError("text-only provider")


def _normalize(x):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def load_checkpoint(path: str) -> dict:
    """Load params from .npz (flat 'a/b/c' keys) or a torch .pt state_dict."""
    path = Path(path)
    if path.suffix == ".npz":
        flat = dict(np.load(path))
        tree = {}
        for k, v in flat.items():
            cur = tree
            parts = k.split("/")
            for part in parts[:-1]:
                cur = cur.setdefault(part, {})
            cur[parts[-1]] = v
        return tree if "params" in tree else {"params": tree}
    import torch  # CPU-only use: unpickle the state_dict

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items() if hasattr(v, "detach")}
    return params_from_torch_state_dict(sd)
