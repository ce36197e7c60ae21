"""Point-cloud augmentations for distillation.

Parity: /root/reference/dataset/augmentation.py — only ElasticDistortion and
RandomHorizontalFlip are actually wired into the reference's FeatureDataset
(feature_dataset.py:56-57); both are host-side NumPy (data workers).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import scipy.ndimage
import scipy.interpolate


class ElasticDistortion:
    """Gaussian-noise displacement grid, blurred, trilinearly interpolated
    (augmentation.py:155-199). distortion_params: [(granularity, magnitude)]."""

    def __init__(self, distortion_params=((0.2, 0.4), (0.8, 1.6))):
        self.distortion_params = distortion_params

    @staticmethod
    def elastic_distortion(coords, granularity, magnitude, rng):
        blurx = np.ones((3, 1, 1, 1)).astype("float32") / 3
        blury = np.ones((1, 3, 1, 1)).astype("float32") / 3
        blurz = np.ones((1, 1, 3, 1)).astype("float32") / 3
        coords_min = coords.min(0)

        noise_dim = ((coords - coords_min).max(0) // granularity).astype(int) + 3
        noise = rng.standard_normal(size=(*noise_dim, 3)).astype(np.float32)
        for _ in range(2):
            noise = scipy.ndimage.convolve(noise, blurx, mode="constant", cval=0)
            noise = scipy.ndimage.convolve(noise, blury, mode="constant", cval=0)
            noise = scipy.ndimage.convolve(noise, blurz, mode="constant", cval=0)
        ax = [
            np.linspace(d_min, d_max, d)
            for d_min, d_max, d in zip(
                coords_min - granularity,
                coords_min + granularity * (noise_dim - 2),
                noise_dim,
            )
        ]
        interp = scipy.interpolate.RegularGridInterpolator(
            ax, noise, bounds_error=False, fill_value=0
        )
        return coords + interp(coords) * magnitude

    def __call__(self, coords, feats=None, labels=None, seed: Optional[int] = None):
        rng = np.random.default_rng(seed)
        if self.distortion_params is not None and rng.random() < 0.95:
            for granularity, magnitude in self.distortion_params:
                coords = self.elastic_distortion(
                    coords, granularity, magnitude, rng
                )
        return coords, feats, labels


class RandomHorizontalFlip:
    """Flip along upright-perpendicular axes with p=0.95*0.5
    (augmentation.py:135-152)."""

    def __init__(self, upright_axis: str = "z", is_temporal: bool = False):
        self.upright_axis = {"x": 0, "y": 1, "z": 2}[upright_axis.lower()]
        self.horz_axes = set(range(3)) - {self.upright_axis}

    def __call__(self, coords, feats=None, labels=None, seed: Optional[int] = None):
        rng = np.random.default_rng(seed)
        if rng.random() < 0.95:
            for axis in self.horz_axes:
                if rng.random() < 0.5:
                    coord_max = np.max(coords[:, axis])
                    coords = coords.copy()
                    coords[:, axis] = coord_max - coords[:, axis]
        return coords, feats, labels


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = transforms

    def __call__(self, coords, feats=None, labels=None, seed=None):
        for i, t in enumerate(self.transforms):
            coords, feats, labels = t(
                coords, feats, labels,
                seed=None if seed is None else seed + i,
            )
        return coords, feats, labels
