"""Converter insurance against the REAL public checkpoint layouts.

No pretrained weights exist in this sandbox (no egress), so the ground
truth for the public state-dict schemas is the reference's own vendored
torch model code: instantiating it with random weights yields state dicts
with exactly the keys/shapes that `sam_vit_b/h.pth` etc. carry (the
checkpoints are these modules' `state_dict()`s). These tests pin:

  * the SAM converter's expected key schema == the real
    `segment_anything.build_sam_vit_b()` schema (keys AND shapes) — so the
    hand-built generator in test_sam.py can't silently drift from the
    public layout (ref submodules/segment-anything/segment_anything/
    build_sam.py:15-55);
  * full-depth torch-vs-JAX forward parity of the converted ViT-det
    image encoder at the vit_b config (reduced img_size: same weights
    layout, 16x fewer pixels) — one wrong transpose anywhere in the 12
    blocks breaks this at O(1), not 1e-4;
  * the CLIP text converter at the EXACT ViT-L/14 text-tower
    configuration (49408 vocab / width 768 / 12 layers) against HF
    transformers' CLIPTextModelWithProjection forward.

tools/verify_converters.py is the companion harness for diffing against
the actual public checkpoints once they are available locally.
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

SAM_REF = Path("/root/reference/submodules/segment-anything")


def _import_reference_sam():
    """Import the reference's vendored segment_anything with a torchvision
    stub (only predictor/automask utilities touch torchvision, and only at
    call time — the modeling tree is pure torch)."""
    import importlib.machinery

    for n in (
        "torchvision",
        "torchvision.transforms",
        "torchvision.transforms.functional",
        "torchvision.ops",
        "torchvision.ops.boxes",
    ):
        if n not in sys.modules:
            mod = types.ModuleType(n)
            mod.__path__ = []
            # a well-formed spec so later importlib.util.find_spec probes
            # (e.g. transformers' optional-dependency checks) don't choke
            mod.__spec__ = importlib.machinery.ModuleSpec(n, None)
            sys.modules[n] = mod
    f = sys.modules["torchvision.transforms.functional"]
    f.resize = f.to_pil_image = lambda *a, **k: None
    b = sys.modules["torchvision.ops.boxes"]
    b.batched_nms = b.box_area = lambda *a, **k: None
    sys.path.insert(0, str(SAM_REF))
    import segment_anything

    return segment_anything


@pytest.mark.slow
@pytest.mark.skipif(not SAM_REF.exists(), reason="reference tree unavailable")
def test_sam_vit_b_public_key_schema(rng):
    """Our synthetic state-dict generator (and hence the converter's
    expectations) must match the real public sam_vit_b schema exactly."""
    from semantic_gaussians_tpu.models.sam import SamConfig
    from test_sam import _fake_sam_state_dict

    sa = _import_reference_sam()
    import torch

    torch.manual_seed(0)
    with torch.no_grad():
        ref_sd = sa.build_sam_vit_b(checkpoint=None).state_dict()
    ours = _fake_sam_state_dict(SamConfig.vit_b(), rng)

    # prompt_encoder.mask_downscaling.* only matters when a MASK prompt is
    # given (ref segment_anything/modeling/prompt_encoder.py:137-146); this
    # pipeline prompts with points/boxes only (automask + VLPart box
    # refinement), so the converter deliberately skips that tower — real
    # checkpoints carry it and it must be the ONLY difference.
    allowed_unused = {
        k for k in ref_sd if k.startswith("prompt_encoder.mask_downscaling.")
    }
    missing = sorted(set(ref_sd) - set(ours) - allowed_unused)
    extra = sorted(set(ours) - set(ref_sd))
    assert not missing and not extra, (missing[:8], extra[:8])
    bad_shapes = [
        k
        for k in ref_sd
        if k not in allowed_unused
        and tuple(ref_sd[k].shape) != tuple(ours[k].shape)
    ]
    assert not bad_shapes, bad_shapes[:8]


@pytest.mark.slow
@pytest.mark.skipif(not SAM_REF.exists(), reason="reference tree unavailable")
def test_sam_vit_b_image_encoder_forward_parity(rng):
    """Full-depth (12-block) ViT-det encoder parity at the vit_b layout,
    torch reference vs converted JAX, reduced to 256px input."""
    import dataclasses

    from semantic_gaussians_tpu.models.sam import (
        ImageEncoderViT as JaxEncoder,
        SamConfig,
        params_from_sam_state_dict,
    )
    from test_sam import _fake_sam_state_dict

    _import_reference_sam()
    import torch
    from segment_anything.modeling.image_encoder import ImageEncoderViT

    torch.manual_seed(1)
    size = 256
    with torch.no_grad():
        tenc = ImageEncoderViT(
            depth=12,
            embed_dim=768,
            img_size=size,
            mlp_ratio=4,
            norm_layer=lambda c: torch.nn.LayerNorm(c, eps=1e-6),
            num_heads=12,
            patch_size=16,
            qkv_bias=True,
            use_rel_pos=True,
            global_attn_indexes=(2, 5, 8, 11),
            window_size=14,
            out_chans=256,
        ).eval()
        # weights must not sit at their degenerate init (LN scales 1 etc.
        # still fine): perturb so a transpose bug can't cancel out
        for p in tenc.parameters():
            p.add_(torch.randn_like(p) * 0.02)

    cfg = dataclasses.replace(SamConfig.vit_b(), img_size=size)
    # converter wants the FULL sd; fill prompt/mask towers from the fake
    # generator and overwrite the encoder with the real reference module's
    sd = _fake_sam_state_dict(cfg, rng)
    sd.update(
        {"image_encoder." + k: v for k, v in tenc.state_dict().items()}
    )
    var = params_from_sam_state_dict(sd, cfg)
    enc_params = {"params": var["params"]["image_encoder"]}

    x = rng.normal(0, 1, (1, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        # vendored fork returns (features, interm_embeddings) — HQ hooks
        t_out, _ = tenc(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    j_out = JaxEncoder(cfg).apply(enc_params, jnp.asarray(x))
    t_np = t_out.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC
    scale = np.abs(t_np).max()
    diff = np.abs(np.asarray(j_out) - t_np).max() / scale
    assert diff < 1e-4, diff


@pytest.mark.slow
def test_clip_text_vitl14_exact_config_parity():
    """CLIP ViT-L/14's text tower at its REAL configuration (vocab 49408,
    width 768, 12 layers, proj 768) — the exact layout fusion/eval load —
    randomly initialized in HF transformers, converted, forward-diffed."""
    import torch
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    from semantic_gaussians_tpu.models.clip_text import (
        CLIPTextTower,
        params_from_torch_state_dict,
    )

    torch.manual_seed(2)
    cfg = CLIPTextConfig(
        vocab_size=49408,
        hidden_size=768,
        intermediate_size=3072,
        num_hidden_layers=12,
        num_attention_heads=12,
        max_position_embeddings=77,
        projection_dim=768,
        hidden_act="quick_gelu",
    )
    with torch.no_grad():
        model = CLIPTextModelWithProjection(cfg).eval()
        for p in model.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    tower = CLIPTextTower(
        vocab_size=49408, width=768, layers=12, heads=12, embed_dim=768
    )
    params = params_from_torch_state_dict(sd)

    rng_t = np.random.default_rng(3)
    ids = rng_t.integers(1, 49000, size=(2, 77)).astype(np.int32)
    ids[:, -1] = 49407  # EOT must be the argmax token position anchor
    with torch.no_grad():
        t_emb = model(input_ids=torch.from_numpy(ids.astype(np.int64)))
    t_np = t_emb.text_embeds.numpy()
    j_np = np.asarray(tower.apply(params, jnp.asarray(ids)))
    scale = np.abs(t_np).max()
    assert np.abs(j_np - t_np).max() / scale < 1e-4
