"""Pair-expand kernel: streamed (HBM-window DMA) vs VMEM-resident parity.

The streamed mode is what multi-M-gaussian scenes use (the 9-row table
exceeds the 12 MB VMEM budget above ~330k gaussians); it must produce
bit-identical (tile, g_key, owner) streams. Role parity target:
duplicateWithKeys, /root/reference/submodules/rgbd-rasterization/
cuda_rasterizer/rasterizer_impl.cu:70-111.
"""
import numpy as np
import pytest
import jax.numpy as jnp

import semantic_gaussians_tpu.ops.expand as E


def _case(seed, n, budget, max_count=8, with_cull=False):
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, max_count, n).astype(np.int32)
    # contiguity invariant: emitting gaussians occupy the depth-rank prefix
    # (zero-count rows sort to the end in ops.binning's depth sort)
    counts = counts[np.argsort(counts == 0, kind="stable")]
    offsets = np.minimum(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), budget + 1
    ).astype(np.int32)
    x0 = rng.integers(0, 20, n).astype(np.int32)
    y0 = rng.integers(0, 12, n).astype(np.int32)
    w = rng.integers(1, 5, n).astype(np.int32)
    cull = None
    if with_cull:
        # splat means inside their rects, mildly anisotropic support
        mx = (x0 * 32 + rng.uniform(0, 4 * 32, n)).astype(np.float32)
        my = (y0 * 16 + rng.uniform(0, 2 * 16, n)).astype(np.float32)
        e0 = rng.uniform(1e-4, 3e-3, n).astype(np.float32)
        e2 = rng.uniform(1e-4, 3e-3, n).astype(np.float32)
        e1 = (rng.uniform(-0.9, 0.9, n) * np.sqrt(e0 * e2)).astype(
            np.float32
        )
        cull = jnp.asarray(np.stack([mx, my, e0, e1, e2]))
    return (
        jnp.asarray(offsets),
        jnp.asarray((x0 << 16) | (y0 << 8) | w),
        jnp.asarray(rng.permutation(n).astype(np.int32)),
        cull,
        jnp.int32(min(int(counts.sum()), budget)),
        jnp.int32(int((counts > 0).sum())),
    )


@pytest.mark.slow
@pytest.mark.parametrize("with_cull", [False, True])
def test_streamed_matches_resident(monkeypatch, with_cull):
    args = _case(0, 1000, 2048, with_cull=with_cull)
    kw = dict(pair_budget=2048, ntx=32, num_tiles=512, n=1000,
              interpret=True)
    resident = [np.asarray(r) for r in E.expand_pairs(*args, **kw)]
    monkeypatch.setattr(E, "table_fits", lambda n: False)
    E.expand_pairs._clear_cache()
    streamed = [np.asarray(r) for r in E.expand_pairs(*args, **kw)]
    for a, b, name in zip(resident, streamed, ("tile", "g_key", "owner")):
        assert (a == b).all(), name
    if with_cull:  # the cull actually fired in this scene
        assert (resident[0] == 512).sum() > (
            2048 - int(args[-2])
        ), "expected some tight-culled pairs"
    E.expand_pairs._clear_cache()  # don't leak streamed traces to others
