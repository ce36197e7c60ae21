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


def _case(seed, n, budget, max_count=8):
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, max_count, n).astype(np.int32)
    # contiguity invariant: emitting gaussians occupy the depth-rank prefix
    # (zero-count rows sort to the end in ops.binning's depth sort)
    counts = counts[np.argsort(counts == 0, kind="stable")]
    offsets = np.minimum(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), budget + 1
    ).astype(np.int32)
    return (
        jnp.asarray(offsets),
        jnp.asarray(rng.integers(0, 20, n).astype(np.int32)),
        jnp.asarray(rng.integers(0, 12, n).astype(np.int32)),
        jnp.asarray(rng.integers(1, 5, n).astype(np.int32)),
        jnp.asarray(rng.permutation(n).astype(np.int32)),
        jnp.int32(min(int(counts.sum()), budget)),
        jnp.int32(int((counts > 0).sum())),
    )


@pytest.mark.slow
def test_streamed_matches_resident(monkeypatch):
    args = _case(0, 1000, 2048)
    kw = dict(pair_budget=2048, ntx=32, num_tiles=512, n=1000,
              interpret=True)
    resident = [np.asarray(r) for r in E.expand_pairs(*args, **kw)]
    monkeypatch.setattr(E, "table_fits", lambda n: False)
    E.expand_pairs._clear_cache()
    streamed = [np.asarray(r) for r in E.expand_pairs(*args, **kw)]
    for a, b, name in zip(resident, streamed, ("tile", "g_key", "owner")):
        assert (a == b).all(), name
    E.expand_pairs._clear_cache()  # don't leak streamed traces to others
