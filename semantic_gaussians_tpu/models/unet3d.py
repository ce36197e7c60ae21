"""Sparse-voxel 3D UNet — TPU-native MinkowskiNet equivalent.

Replaces the reference's MinkowskiEngine MinkUNet
(/root/reference/model/mink_unet.py:44-256, model/resnet_base.py) — the 3D
semantic network distilled from fused 2D features (distill.py:61-64,
MinkUNet34A, in 56 / out 768).

TPU-first design (SURVEY.md §7.1): voxels live in a capacity-padded list
(coords [V,3] int32, mask [V]); all topology (kernel-offset neighbor maps,
stride-2 parent maps) is precomputed once per input by sort/searchsorted
joins (build_topology) — then every convolution is a scan over kernel
offsets of gather -> dense (V, Cin) x (Cin, Cout) matmul -> accumulate, i.e.
pure MXU work with static shapes. Stride-2 down/up convs use octant
decomposition: scatter-add (down) / gather (up) through the child->parent
map with one weight matrix per 2^3 octant.

Architecture parity (mink_unet.py): conv0 k=5 stem; 4 encoder levels of
(k=2 s=2 conv + BasicBlock x layers[i]); 4 decoder levels of (k=2 s=2
transpose conv + skip concat + BasicBlock x layers[4+i]); 1x1 final. Variant
table below mirrors MinkUNet14/18/34 A-D plane widths; default 34A
(PLANES (32,64,128,256,256,128,96,96), LAYERS (2,3,4,6,2,2,2,2)).
BatchNorm is masked over alive voxels (ME.MinkowskiBatchNorm analogue).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Topology
# ---------------------------------------------------------------------------
GRID_BITS = 10  # 1024^3 voxel grid (20m rooms at 2cm); keys fit int32
GRID_MAX = (1 << GRID_BITS) - 3  # max valid coord before the +2 key shift
_BIG = jnp.int32(2**31 - 1)


def validate_coords(coords, mask) -> None:
    """Host-side guard for the int32 key packing.

    _linearize clips coords to the 2**GRID_BITS grid, so distinct voxels
    beyond the bound would silently collide into one key (wrong neighbor
    joins / pooling with no error). Call this on concrete host data before
    feeding a jitted step; build_topology calls it automatically when its
    inputs are concrete."""
    c = np.asarray(coords)
    m = np.asarray(mask).astype(bool)
    if m.any():
        mn, mx = int(c[m].min()), int(c[m].max())
        if mx >= GRID_MAX or mn < -2:
            raise ValueError(
                f"voxel coords span [{mn}, {mx}] but the int32 key packing "
                f"supports [-2, {GRID_MAX}); shift coords to the voxel min "
                f"and/or reduce the random global shift (scene too large for "
                f"the {1 << GRID_BITS}^3 grid at this voxel size)"
            )


def _linearize(coords: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """[V,3] int32 -> sortable int32 keys; masked-out rows get +inf-ish.

    Coordinates must lie in [-2, 2**GRID_BITS - 3) after voxel-min shifting
    (the -2/+2 slack covers kernel-offset probes off the grid edge, which
    simply fail the join). x64 is disabled on TPU, hence the packed int32.
    """
    shifted = coords + 2
    in_range = mask & jnp.all(
        (shifted >= 0) & (shifted < (1 << GRID_BITS)), axis=-1
    )
    c = jnp.clip(shifted, 0, (1 << GRID_BITS) - 1)
    key = (
        (c[:, 0] << (2 * GRID_BITS)) | (c[:, 1] << GRID_BITS) | c[:, 2]
    ).astype(jnp.int32)
    # off-grid probes get the sentinel so the join FAILS (clipping alone
    # would alias a probe at -3 onto a real voxel at -2)
    return jnp.where(in_range, key, _BIG)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LevelTopology:
    coords: jnp.ndarray  # [V, 3] int32
    mask: jnp.ndarray  # [V] bool
    nbr: jnp.ndarray  # [K, V] int32 neighbor row (V = missing) for k=3 conv
    sorted_keys: jnp.ndarray  # [V] int32 packed keys (for joins)
    sorted_perm: jnp.ndarray  # [V] int32


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DownLink:
    """child level -> parent level."""

    parent_of: jnp.ndarray  # [V] int32 parent row (V = none)
    octant: jnp.ndarray  # [V] int32 in [0, 8): child offset within parent


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Topology:
    levels: Tuple[LevelTopology, ...]
    links: Tuple[DownLink, ...]  # len == len(levels) - 1


def _offsets(kernel_size: int) -> np.ndarray:
    r = range(-(kernel_size // 2), kernel_size // 2 + 1)
    return np.array([[i, j, k] for i in r for j in r for k in r], np.int32)


def _build_level(coords, mask, kernel_size=3) -> LevelTopology:
    v = coords.shape[0]
    keys = _linearize(coords, mask)
    perm = jnp.argsort(keys).astype(jnp.int32)
    sorted_keys = keys[perm]

    offs = _offsets(kernel_size)

    def find(offset):
        nk = _linearize(coords + offset[None, :], mask)
        pos = jnp.searchsorted(sorted_keys, nk).astype(jnp.int32)
        pos_c = jnp.clip(pos, 0, v - 1)
        # nk != _BIG: an off-grid probe's sentinel would otherwise MATCH a
        # masked-out padding row's sentinel key and join a live voxel to a
        # dead row (whose feature row is caller-controlled, not the
        # guaranteed-zero missing-row V)
        found = (sorted_keys[pos_c] == nk) & mask & (nk != _BIG)
        return jnp.where(found, perm[pos_c], v).astype(jnp.int32)

    nbr = jax.vmap(find)(jnp.asarray(offs))  # [K, V]
    return LevelTopology(coords, mask, nbr, sorted_keys, perm)


def _downsample(level: LevelTopology):
    """Parent coords (floor/2 dedupe) + child->parent link."""
    v = level.coords.shape[0]
    pcoords = jnp.where(
        level.mask[:, None], jnp.floor_divide(level.coords, 2), 0
    ).astype(jnp.int32)
    pkeys = _linearize(pcoords, level.mask)
    order = jnp.argsort(pkeys).astype(jnp.int32)
    sk = pkeys[order]
    is_first = jnp.concatenate(
        [jnp.array([True]), sk[1:] != sk[:-1]]
    ) & (sk != _BIG)
    # compact unique parents to the front
    dest = (jnp.cumsum(is_first.astype(jnp.int32)) - 1).astype(jnp.int32)
    n_parents = jnp.sum(is_first.astype(jnp.int32))
    # compact unique parents to the front; non-first rows scatter the
    # NEUTRAL (below any valid coord, which can be as low as -2) so max
    # never corrupts a negative parent coord
    neutral = jnp.int32(-(1 << 30))
    parent_coords = jnp.full((v, 3), neutral, jnp.int32).at[dest].max(
        jnp.where(is_first[:, None], pcoords[order], neutral)
    )
    parent_mask = jnp.arange(v) < n_parents
    parent_coords = jnp.where(parent_mask[:, None], parent_coords, 0)
    # each child's parent row: run-id of its sorted position
    run_of_sorted = dest  # [V] in sorted order
    parent_of = jnp.zeros((v,), jnp.int32).at[order].set(run_of_sorted)
    parent_of = jnp.where(level.mask, parent_of, v).astype(jnp.int32)
    oct_xyz = jnp.where(level.mask[:, None], level.coords - pcoords * 2, 0)
    octant = (oct_xyz[:, 0] * 4 + oct_xyz[:, 1] * 2 + oct_xyz[:, 2]).astype(
        jnp.int32
    )
    return parent_coords, parent_mask, DownLink(parent_of, octant)


def build_topology(
    coords: jnp.ndarray, mask: jnp.ndarray, num_levels: int = 5,
    stem_kernel: int = 5,
) -> Topology:
    """Precompute all neighbor/pooling maps for a voxel set.

    Level 0 uses `stem_kernel` for its neighbor map union with k=3 (we store
    the k=5 map at level 0 — it contains k=3 as a subset by construction of
    offsets; we build both maps lazily: level 0 gets k=5, others k=3; blocks
    at level 0 use the center 27 of the 125).
    """
    if not isinstance(coords, jax.core.Tracer):
        validate_coords(coords, mask)
    levels = []
    links = []
    cur_c, cur_m = coords.astype(jnp.int32), mask
    for li in range(num_levels):
        ks = stem_kernel if li == 0 else 3
        lvl = _build_level(cur_c, cur_m, kernel_size=ks)
        levels.append(lvl)
        if li < num_levels - 1:
            pc, pm, link = _downsample(lvl)
            links.append(link)
            cur_c, cur_m = pc, pm
    return Topology(tuple(levels), tuple(links))


def _center27_rows(stem_kernel: int) -> np.ndarray:
    """Row indices of the 3x3x3 offsets within the k=5 offset list."""
    offs5 = _offsets(stem_kernel)
    offs3 = _offsets(3)
    idx = []
    for o in offs3:
        idx.append(int(np.where((offs5 == o).all(axis=1))[0][0]))
    return np.array(idx, np.int32)


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------
@jax.custom_vjp
def _offset_conv(feats_pad, nbr, w):
    """sum_k feats_pad[nbr[k]] @ w[k] with a memory-flat backward.

    The plain lax.scan VJP saves each step's gathered rows — a (K, V, Cin)
    residual PER CONV (5.5 GB at K=27, V=200k, C=256; ~180 GB across
    MinkUNet34A's layers, measured via compile memory_analysis). The
    hand-written backward re-gathers from the saved (V+1, Cin) input
    instead: gathers are cheap to recompute, residual memory drops to the
    layer inputs XLA keeps anyway."""
    def body(acc, inp):
        idx, wk = inp
        g = feats_pad[idx]  # [V, Cin]; row V is zeros
        return acc + jnp.dot(g, wk, preferred_element_type=jnp.float32), None

    acc0 = jnp.zeros((nbr.shape[1], w.shape[2]), jnp.float32)
    out, _ = jax.lax.scan(body, acc0, (nbr, w))
    return out


def _offset_conv_fwd(feats_pad, nbr, w):
    return _offset_conv(feats_pad, nbr, w), (feats_pad, nbr, w)


def _offset_conv_bwd(res, dout):
    import numpy as _np
    from jax.dtypes import float0 as _float0

    feats_pad, nbr, w = res

    def body(dfp, inp):
        idx, wk = inp
        # d feats: scatter-add of dout @ wk^T (the same scatter the scan
        # VJP emitted); d w_k: re-gather + contract, no stored residual.
        dfp = dfp.at[idx].add(
            jnp.dot(dout, wk.T, preferred_element_type=jnp.float32)
        )
        dwk = jnp.dot(
            feats_pad[idx].T, dout, preferred_element_type=jnp.float32
        )
        return dfp, dwk

    dfp, dw = jax.lax.scan(body, jnp.zeros_like(feats_pad), (nbr, w))
    return dfp, _np.zeros(nbr.shape, _float0), dw


_offset_conv.defvjp(_offset_conv_fwd, _offset_conv_bwd)


class SparseConv(nn.Module):
    """k^3 sparse conv: scan over offsets of gather+matmul."""

    out_channels: int
    rows: Any = None  # optional subset of nbr rows (e.g. center 27 of 125)

    @nn.compact
    def __call__(self, feats, level: LevelTopology):
        v, cin = feats.shape
        nbr = level.nbr if self.rows is None else level.nbr[self.rows]
        k = nbr.shape[0]
        w = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (k, cin, self.out_channels),
        )
        feats_pad = jnp.concatenate(
            [feats, jnp.zeros((1, cin), feats.dtype)], axis=0
        )
        out = _offset_conv(feats_pad, nbr, w)
        return out * level.mask[:, None]


class SparseConvDown(nn.Module):
    """k=2 s=2 conv: octant-decomposed scatter-add into parents."""

    out_channels: int

    @nn.compact
    def __call__(self, feats, link: DownLink, parent_level: LevelTopology):
        v, cin = feats.shape
        w = self.param(
            "kernel", nn.initializers.he_normal(), (8, cin, self.out_channels)
        )
        # Per-child contribution with octant-specific weights. NOT
        # einsum('vc,vco->vo', feats, w[link.octant]): gathering w by octant
        # materializes a (V, Cin, Cout) tensor — 52 GB at the default
        # 200k-voxel budget with 256-wide layers, in forward AND weight-grad.
        # Eight octant-masked dense matmuls keep memory O(V*C) and the MXU
        # fully dense (a 4x FLOP overcount on average — each child hits one
        # octant — for a 300x memory cut).
        contrib = jnp.zeros((v, self.out_channels), jnp.float32)
        for o in range(8):
            sel = (link.octant == o)[:, None]
            contrib = contrib + jnp.dot(
                jnp.where(sel, feats, 0.0), w[o],
                preferred_element_type=jnp.float32,
            )
        out = (
            jnp.zeros((v + 1, self.out_channels), jnp.float32)
            .at[link.parent_of]
            .add(contrib)[:v]
        )
        return out * parent_level.mask[:, None]


class SparseConvUp(nn.Module):
    """k=2 s=2 transpose conv: children gather parent features."""

    out_channels: int

    @nn.compact
    def __call__(self, parent_feats, link: DownLink, child_level: LevelTopology):
        v, cin = parent_feats.shape
        w = self.param(
            "kernel", nn.initializers.he_normal(), (8, cin, self.out_channels)
        )
        pf = jnp.concatenate(
            [parent_feats, jnp.zeros((1, cin), parent_feats.dtype)], axis=0
        )
        g = pf[link.parent_of]  # [V, Cin]
        # octant-masked matmuls instead of einsum over w[link.octant] — see
        # SparseConvDown: the gathered-weight form materializes (V, Cin,
        # Cout) and blows memory at real voxel budgets.
        out = jnp.zeros((g.shape[0], self.out_channels), jnp.float32)
        for o in range(8):
            sel = (link.octant == o)[:, None]
            out = out + jnp.dot(
                jnp.where(sel, g, 0.0), w[o],
                preferred_element_type=jnp.float32,
            )
        return out * child_level.mask[:, None]


class MaskedBatchNorm(nn.Module):
    """BatchNorm over alive voxels (ME.MinkowskiBatchNorm analogue)."""

    momentum: float = 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(self, feats, mask, train: bool = False):
        c = feats.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,))
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,))
        )
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if train:
            m = mask.astype(feats.dtype)[:, None]
            n = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(feats * m, axis=0) / n
            var = jnp.sum(m * (feats - mean) ** 2, axis=0) / n
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        else:
            mean, var = ra_mean.value, ra_var.value
        out = (feats - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return out * mask[:, None]


class BasicBlock(nn.Module):
    """Residual block: conv-bn-relu-conv-bn + skip (resnet_base.py)."""

    channels: int
    rows: Any = None

    @nn.compact
    def __call__(self, x, level: LevelTopology, train: bool = False):
        identity = x
        y = SparseConv(self.channels, rows=self.rows)(x, level)
        y = MaskedBatchNorm()(y, level.mask, train)
        y = nn.relu(y)
        y = SparseConv(self.channels, rows=self.rows)(y, level)
        y = MaskedBatchNorm()(y, level.mask, train)
        if identity.shape[-1] != self.channels:
            identity = nn.Dense(self.channels, use_bias=False)(identity)
            identity = MaskedBatchNorm()(identity, level.mask, train)
        return nn.relu(y + identity) * level.mask[:, None]


_VARIANTS = {
    # name: (planes, layers) — mink_unet.py:169-231
    "MinkUNet14A": ((32, 64, 128, 256, 128, 128, 96, 96), (1, 1, 1, 1, 1, 1, 1, 1)),
    "MinkUNet14B": ((32, 64, 128, 256, 128, 128, 128, 128), (1, 1, 1, 1, 1, 1, 1, 1)),
    "MinkUNet14C": ((32, 64, 128, 256, 192, 192, 128, 128), (1, 1, 1, 1, 1, 1, 1, 1)),
    "MinkUNet14D": ((32, 64, 128, 256, 384, 384, 384, 384), (1, 1, 1, 1, 1, 1, 1, 1)),
    "MinkUNet18A": ((32, 64, 128, 256, 128, 128, 96, 96), (2, 2, 2, 2, 2, 2, 2, 2)),
    "MinkUNet18B": ((32, 64, 128, 256, 128, 128, 128, 128), (2, 2, 2, 2, 2, 2, 2, 2)),
    "MinkUNet18D": ((32, 64, 128, 256, 384, 384, 384, 384), (2, 2, 2, 2, 2, 2, 2, 2)),
    "MinkUNet34A": ((32, 64, 128, 256, 256, 128, 96, 96), (2, 3, 4, 6, 2, 2, 2, 2)),
    "MinkUNet34B": ((32, 64, 128, 256, 256, 128, 64, 32), (2, 3, 4, 6, 2, 2, 2, 2)),
    "MinkUNet34C": ((32, 64, 128, 256, 256, 128, 96, 96), (2, 3, 4, 6, 2, 2, 2, 2)),
}
_INIT_DIM = 32
_STEM_KERNEL = 5


class MinkUNet(nn.Module):
    """4-level sparse UNet over a precomputed Topology."""

    in_channels: int
    out_channels: int
    variant: str = "MinkUNet34A"

    @nn.compact
    def __call__(self, feats, topo: Topology, train: bool = False):
        planes, layers = _VARIANTS[self.variant]
        l0, l1, l2, l3, l4 = topo.levels
        d01, d12, d23, d34 = topo.links
        c27 = jnp.asarray(_center27_rows(_STEM_KERNEL))

        # stem: k=5 conv at level 0 (conv0p1s1)
        x = SparseConv(_INIT_DIM)(feats, l0)
        x = MaskedBatchNorm()(x, l0.mask, train)
        x0 = nn.relu(x)

        def enc(x, lvl_from, lvl_to, link, plane, n_blocks):
            y = SparseConvDown(x.shape[-1])(x, link, lvl_to)
            y = MaskedBatchNorm()(y, lvl_to.mask, train)
            y = nn.relu(y)
            for _ in range(n_blocks):
                y = BasicBlock(plane)(y, lvl_to, train)
            return y

        x1 = enc(x0, l0, l1, d01, planes[0], layers[0])
        x2 = enc(x1, l1, l2, d12, planes[1], layers[1])
        x3 = enc(x2, l2, l3, d23, planes[2], layers[2])
        x4 = enc(x3, l3, l4, d34, planes[3], layers[3])

        def dec(x, skip, link, lvl_to, plane, n_blocks, rows=None):
            y = SparseConvUp(plane)(x, link, lvl_to)
            y = MaskedBatchNorm()(y, lvl_to.mask, train)
            y = nn.relu(y)
            y = jnp.concatenate([y, skip], axis=-1)
            for _ in range(n_blocks):
                y = BasicBlock(plane, rows=rows)(y, lvl_to, train)
            return y

        y3 = dec(x4, x3, d34, l3, planes[4], layers[4])
        y2 = dec(y3, x2, d23, l2, planes[5], layers[5])
        y1 = dec(y2, x1, d12, l1, planes[6], layers[6])
        # level-0 decoder blocks are k=3 (the 3^3 center rows of the stem's
        # 5^3 neighbor map) — the stem conv alone is k=5 (mink_unet.py)
        y0 = dec(y1, x0, d01, l0, planes[7], layers[7], rows=c27)
        out = nn.Dense(self.out_channels, use_bias=True)(y0)
        return out * l0.mask[:, None]


def mink_unet(in_channels=3, out_channels=20, arch="MinkUNet34A") -> MinkUNet:
    """Factory, mirroring mink_unet.py:234-256."""
    return MinkUNet(
        in_channels=in_channels, out_channels=out_channels, variant=arch
    )
