"""Image losses: L1, SSIM, PSNR, and the 3DGS photometric loss.

Parity: /root/reference/utils/loss_utils.py (11x11 Gaussian window, sigma 1.5,
per-channel depthwise convolution, C1=0.01^2, C2=0.03^2) and
utils/metric.py psnr. Images are [H, W, C] (channel-last, TPU-friendly);
the SSIM window conv maps to XLA depthwise conv which fuses well on TPU.
"""
from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-image PSNR, matching reference loss_utils.py:76-78 semantics."""
    mse = jnp.mean((pred - target) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse + 1e-12))


@functools.lru_cache(maxsize=None)
def _gaussian_window(window_size: int, sigma: float):
    # NumPy on purpose: jnp here would cache a tracer when first called
    # under jit (UnexpectedTracerError on reuse).
    xs = np.arange(window_size, dtype=np.float32) - window_size // 2
    g = np.exp(-(xs**2) / (2 * sigma**2))
    return g / g.sum()  # numpy constant; jnp.asarray here would cache tracers


def _depthwise_blur(img: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur on [H, W, C] with SAME padding.

    HIGHEST precision is LOAD-BEARING: TPU convs default to bf16 products,
    and SSIM's variance terms are computed as blur(x^2) - mu^2 — a
    catastrophic cancellation once the two blurs carry independent ~2^-9
    rounding. On hardware the default precision drove sigma^2 negative past
    the c2=9e-4 stabilizer, the SSIM map exploded (observed photometric
    losses of +-2 on renders with PSNR 25+), and — much worse — the SSIM
    BACKWARD injected garbage image cotangents that inflated the densify
    mean2D grad stats, cloning essentially every Gaussian each interval
    (x1.6/event runaway in the 30k parity harness). CPU runs (f32 convs)
    never saw it."""
    g = _gaussian_window(window_size, sigma)
    c = img.shape[-1]
    x = img[None]  # [1,H,W,C]
    kh = jnp.tile(g[:, None, None, None], (1, 1, 1, c))  # [K,1,1,C]
    kw = jnp.tile(g[None, :, None, None], (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "SAME", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "SAME", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    return x[0]


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over [H, W, C] images in [0,1].

    Same constants and window as reference loss_utils.py:26-69 (which uses
    SAME-padded conv, so border handling matches too).
    """
    c1 = 0.01**2
    c2 = 0.03**2
    blur = lambda x: _depthwise_blur(x, window_size, sigma)
    mu1, mu2 = blur(img1), blur(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = blur(img1 * img1) - mu1_sq
    sigma2_sq = blur(img2 * img2) - mu2_sq
    sigma12 = blur(img1 * img2) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


def photometric_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    lambda_dssim: float = 0.2,
) -> jnp.ndarray:
    """(1-l)*L1 + l*(1-SSIM): the 3DGS training loss (train.py:146-149)."""
    return (1.0 - lambda_dssim) * l1_loss(pred, target) + lambda_dssim * (
        1.0 - ssim(pred, target)
    )


def cosine_distill_loss(pred: jnp.ndarray, target: jnp.ndarray, mask=None):
    """1 - cosine similarity, averaged over valid rows (distill.py:111-124).

    sqrt(sum+eps) norms: jnp.linalg.norm has a NaN gradient at exactly 0,
    and masked-out (dead-voxel) rows are exactly 0 — 0 * NaN still poisons
    reverse-mode.
    """
    pn = pred / jnp.sqrt(jnp.sum(pred * pred, axis=-1, keepdims=True) + 1e-12)
    tn = target / jnp.sqrt(
        jnp.sum(target * target, axis=-1, keepdims=True) + 1e-12
    )
    per_row = 1.0 - jnp.sum(pn * tn, axis=-1)
    if mask is None:
        mask = jnp.linalg.norm(target, axis=-1) > 0
    mask = mask.astype(per_row.dtype)
    return jnp.sum(per_row * mask) / jnp.maximum(jnp.sum(mask), 1.0)
