"""Sparse-voxel UNet tests: topology joins, conv semantics, full net."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from semantic_gaussians_tpu.models.unet3d import (
    MinkUNet,
    SparseConv,
    Topology,
    build_topology,
    _build_level,
    _downsample,
    mink_unet,
)


def _pad_coords(coords, cap):
    v = np.zeros((cap, 3), np.int32)
    v[: len(coords)] = coords
    m = np.zeros(cap, bool)
    m[: len(coords)] = True
    return jnp.asarray(v), jnp.asarray(m)


def test_neighbor_map_correct():
    coords = np.array([[0, 0, 0], [1, 0, 0], [5, 5, 5]], np.int32)
    c, m = _pad_coords(coords, 8)
    lvl = _build_level(c, m, kernel_size=3)
    nbr = np.asarray(lvl.nbr)  # [27, V]
    # offset index of (+1, 0, 0) within 3x3x3 offsets: i=2? offsets are
    # ordered i in (-1,0,1) outer: (1,0,0) -> idx = 2*9 + 1*3 + 1 = 22
    assert nbr[22, 0] == 1  # (0,0,0)+(1,0,0) -> row 1
    assert nbr[4, 1] == 0  # (1,0,0)+(-1,0,0) -> row 0: idx = 0*9+1*3+1 = 4
    assert nbr[13, 2] == 2  # center offset maps to itself
    assert nbr[22, 2] == 8  # (5,5,5)+(1,0,0) missing -> V
    # padded rows have no neighbors
    assert (nbr[:, 3:] == 8).all()


def test_downsample_parents():
    coords = np.array(
        [[0, 0, 0], [1, 1, 1], [2, 0, 0], [3, 1, 0]], np.int32
    )
    c, m = _pad_coords(coords, 8)
    lvl = _build_level(c, m)
    pc, pm, link = _downsample(lvl)
    pc, pm = np.asarray(pc), np.asarray(pm)
    assert pm.sum() == 2  # parents (0,0,0) and (1,0,0)
    parents = {tuple(r) for r in pc[pm]}
    assert parents == {(0, 0, 0), (1, 0, 0)}
    po = np.asarray(link.parent_of)
    # children 0,1 share a parent; 2,3 share the other
    assert po[0] == po[1] and po[2] == po[3] and po[0] != po[2]
    oc = np.asarray(link.octant)
    assert oc[0] == 0 and oc[1] == 7  # (1,1,1) within parent
    assert (po[4:] == 8).all()


def test_sparse_conv_center_only():
    """A conv whose non-center taps see no neighbors == dense per-voxel matmul."""
    coords = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0]], np.int32)
    c, m = _pad_coords(coords, 8)
    lvl = _build_level(c, m, kernel_size=3)
    conv = SparseConv(out_channels=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 5)), jnp.float32)
    params = conv.init(jax.random.PRNGKey(0), x, lvl)
    out = conv.apply(params, x, lvl)
    w = params["params"]["kernel"]  # [27, 5, 4]
    want = x @ w[13]  # isolated voxels -> only center tap fires
    np.testing.assert_allclose(
        np.asarray(out)[:3], np.asarray(want)[:3], rtol=1e-5, atol=1e-5
    )
    assert (np.asarray(out)[3:] == 0).all()  # masked rows zero


@pytest.mark.slow
def test_full_unet_runs_and_masks():
    rng = np.random.default_rng(0)
    n, cap = 200, 256
    coords = rng.integers(0, 40, size=(n, 3)).astype(np.int32)
    c, m = _pad_coords(coords, cap)
    topo = build_topology(c, m)
    model = mink_unet(in_channels=8, out_channels=16, arch="MinkUNet14A")
    x = jnp.asarray(rng.normal(size=(cap, 8)), jnp.float32) * m[:, None]
    variables = model.init(jax.random.PRNGKey(0), x, topo)
    out = model.apply(variables, x, topo)
    out = np.asarray(out)
    assert out.shape == (cap, 16)
    assert np.isfinite(out).all()
    assert (out[~np.asarray(m)] == 0).all()
    assert np.abs(out[np.asarray(m)]).sum() > 0


@pytest.mark.slow
def test_unet_train_mode_updates_stats():
    rng = np.random.default_rng(0)
    cap = 128
    coords = rng.integers(0, 16, size=(100, 3)).astype(np.int32)
    c, m = _pad_coords(coords, cap)
    topo = build_topology(c, m)
    model = mink_unet(in_channels=4, out_channels=8, arch="MinkUNet14A")
    x = jnp.asarray(rng.normal(size=(cap, 4)), jnp.float32) * m[:, None]
    variables = model.init(jax.random.PRNGKey(0), x, topo)
    out, mutated = model.apply(
        variables, x, topo, train=True, mutable=["batch_stats"]
    )
    assert np.isfinite(np.asarray(out)).all()
    # running stats moved away from init
    leaf = jax.tree.leaves(mutated["batch_stats"])[0]
    assert np.abs(np.asarray(leaf)).sum() > 0


def test_offgrid_probe_never_joins_dead_row():
    """A live voxel at the grid edge probing OFF-grid must join the
    missing-sentinel row V, never a masked-out padding row (whose sentinel
    key equals the off-grid probe's sentinel; regression)."""
    from semantic_gaussians_tpu.models.unet3d import _build_level

    coords = jnp.asarray([[-2, 0, 0], [0, 0, 0], [0, 0, 0]], jnp.int32)
    mask = jnp.asarray([True, True, False])  # row 2 is dead padding
    lvl = _build_level(coords, mask, kernel_size=3)
    v = coords.shape[0]
    nbr = np.asarray(lvl.nbr)  # [27, V]
    # offset (-1,0,0) probes coord (-3,0,0): off-grid for row 0
    offs = [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)]
    k_minus_x = offs.index((-1, 0, 0))
    assert nbr[k_minus_x, 0] == v  # miss, NOT the dead row index 2
    # dead rows never join anything; nothing joins the dead row
    assert (nbr[:, 2] == v).all()
    assert not (nbr[:, :2] == 2).any()
    # sanity: the center offset joins each live row to itself
    k_center = offs.index((0, 0, 0))
    assert nbr[k_center, 0] == 0 and nbr[k_center, 1] == 1
