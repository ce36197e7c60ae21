"""Distillation dataset: (voxelized Gaussian params, fused 2D features).

Parity: /root/reference/dataset/feature_dataset.py:11-100 — one item per
(scene PLY, fused-feature file): load Gaussians -> 56-dim raw-parameter
features, optional ElasticDistortion (pre-voxelize) + RandomHorizontalFlip
(post-voxelize on voxel coords), voxelize at `voxel_size`, align GT features
to surviving voxels via the kept-index mapping, return capacity-padded
arrays ready for the jitted distill step.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from ..io.ply import load_gaussian_ply
from ..pipelines.fusion import load_fused_features
from .augmentation import Compose, ElasticDistortion, RandomHorizontalFlip
from .fusion_utils import Voxelizer


def _fold(seed: Optional[int], stream: int) -> Optional[int]:
    """Derive an independent RNG stream per augmentation stage."""
    if seed is None:
        return None
    return int(np.random.SeedSequence([seed, stream]).generate_state(1)[0])


@dataclasses.dataclass
class DistillItem:
    coords: np.ndarray  # [V, 3] int32 voxel coords (padded)
    feats: np.ndarray  # [V, 56] float32
    gt: np.ndarray  # [V, C] float32 fused features (0 where absent)
    gt_mask: np.ndarray  # [V] bool (voxels with supervision)
    mask: np.ndarray  # [V] bool alive voxels
    num_voxels: int


class FeatureDataset:
    """Host-side dataset over (gaussians_dir/<scene>, fusion_dir/<scene>)."""

    def __init__(
        self,
        scene_plys: List[str],
        fused_files: List[str],
        voxel_size: float = 0.02,
        aug: bool = True,
        feature_type: str = "all",
        voxel_budget: int = 200_000,
    ):
        assert len(scene_plys) == len(fused_files)
        self.scene_plys = scene_plys
        self.fused_files = fused_files
        self.voxel_size = voxel_size
        self.aug = aug
        self.feature_type = feature_type
        self.voxel_budget = voxel_budget
        self.voxelizer = Voxelizer(voxel_size=voxel_size)
        self.prevox_aug = Compose([ElasticDistortion()]) if aug else None
        self.postvox_aug = Compose([RandomHorizontalFlip("z")]) if aug else None
        self._raw_cache: dict = {}  # idx -> (locs, feats, gt, gt_mask)
        self._raw_cache_max = 4

    def __len__(self):
        return len(self.scene_plys)

    def _load_raw(self, idx: int):
        """Parse-once cache of the per-scene arrays. Epoch-loops call
        __getitem__ once per scene per epoch; re-reading the PLY + fused
        .pt (250 MB at a 205k-gaussian scene) dominated the distill epoch
        (~35 s host vs <1 s device step). Augmentations stay per-epoch —
        they operate on fresh arrays (ElasticDistortion returns
        coords + interp, never mutates). Bounded LRU so multi-hundred-scene
        datasets do not hold every scene in RAM."""
        if idx in self._raw_cache:
            return self._raw_cache[idx]
        from ..core.gaussians import packed_features

        params, alive = load_gaussian_ply(self.scene_plys[idx])
        n_alive = int(np.asarray(alive).sum())
        locs = np.asarray(params.means)[:n_alive].astype(np.float64)
        feats = np.asarray(packed_features(params, alive, self.feature_type))[
            :n_alive
        ]
        gt_feat, gt_mask = load_fused_features(
            self.fused_files[idx], capacity=params.capacity
        )
        out = (
            locs, feats,
            np.asarray(gt_feat)[:n_alive], np.asarray(gt_mask)[:n_alive],
        )
        if len(self._raw_cache) >= self._raw_cache_max:
            self._raw_cache.pop(next(iter(self._raw_cache)))
        self._raw_cache[idx] = out
        return out

    def __getitem__(self, idx: int, seed: Optional[int] = None) -> DistillItem:
        locs, feats, gt_feat, gt_mask = self._load_raw(idx)

        if self.prevox_aug is not None:
            # distinct stream from the post-voxelize aug: the same seed
            # would correlate the two apply-gates (flip fires iff elastic
            # fires) and alias their noise draws
            locs, _, _ = self.prevox_aug(locs, seed=_fold(seed, 1))

        vcoords, vfeats, _, inverse, first_idx = self.voxelizer.voxelize(
            locs, feats, seed=seed
        )
        # GT aligned to surviving voxels via their representative point
        vgt = gt_feat[first_idx]
        vgt_mask = gt_mask[first_idx] & (
            np.linalg.norm(vgt, axis=-1) > 0
        )

        if self.postvox_aug is not None:
            vcoords, _, _ = self.postvox_aug(
                vcoords.astype(np.float64), seed=_fold(seed, 2)
            )
            vcoords = vcoords.astype(np.int64)
            vcoords -= vcoords.min(0)

        v = len(vcoords)
        budget = self.voxel_budget
        if v > budget:
            # RANDOM subset, reseeded per epoch: voxelize's sorted-unique
            # order is spatial (x-major), so a prefix truncation would drop
            # the same wall of the room from supervision every epoch
            keep = np.random.default_rng(_fold(seed, 3)).choice(
                v, budget, replace=False
            )
            keep.sort()
            vcoords, vfeats = vcoords[keep], vfeats[keep]
            vgt, vgt_mask = vgt[keep], vgt_mask[keep]
            v = budget

        def pad(x, dtype):
            out = np.zeros((budget,) + x.shape[1:], dtype)
            out[:v] = x
            return out

        return DistillItem(
            coords=pad(vcoords, np.int32),
            feats=pad(vfeats, np.float32),
            gt=pad(vgt, np.float32),
            gt_mask=pad(vgt_mask, bool),
            mask=pad(np.ones(v, bool), bool),
            num_voxels=v,
        )
