"""Direct unit tests for ops.segsum.segsum_contiguous (interpret mode).

The kernel is the deterministic replacement for the CUDA backward's
atomicAdd gradient scatter (channel-rasterization backward.cu:519-549); its
contract: owners NON-DECREASING with steps of <= 1 (generation-order pair
owners). Oracle: plain numpy bincount-style segment sum.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from semantic_gaussians_tpu.ops.segsum import CHUNK, segsum_contiguous


def _oracle(cot, owners, num_rows):
    out = np.zeros((cot.shape[0], num_rows), np.float32)
    np.add.at(out.T, owners, cot.T)
    return out


def _owners(p, num_rows, rng):
    """Random valid owner sequence: non-decreasing, steps of <= 1."""
    steps = (rng.uniform(size=p) < min(1.0, num_rows / p)).astype(np.int32)
    steps[0] = 0
    o = np.cumsum(steps)
    return np.minimum(o, num_rows - 1).astype(np.int32)


@pytest.mark.parametrize("d,p,rows", [(11, CHUNK, 300), (3, 4 * CHUNK, 1000),
                                      (8, 2 * CHUNK, 40)])
def test_matches_oracle(d, p, rows):
    rng = np.random.default_rng(d * p)
    cot = rng.normal(size=(d, p)).astype(np.float32)
    owners = _owners(p, rows, rng)
    out = segsum_contiguous(
        jnp.asarray(cot), jnp.asarray(owners), rows, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), _oracle(cot, owners, rows), rtol=1e-6, atol=2e-5
    )


def test_last_window_at_row_boundary():
    """Owners ending exactly at num_rows-1 exercise the clipped final
    window base (cols_pad headroom)."""
    rng = np.random.default_rng(0)
    p, rows = 2 * CHUNK, 129  # rows just past a 128 lane boundary
    cot = rng.normal(size=(4, p)).astype(np.float32)
    owners = np.minimum(np.arange(p) // 4, rows - 1).astype(np.int32)
    out = segsum_contiguous(
        jnp.asarray(cot), jnp.asarray(owners), rows, interpret=True
    )
    # atol covers f32 summation-order noise: the kernel accumulates three
    # split-component partials (ops.segsum._onehot_dot) in a different
    # order than the numpy oracle; a 512-pair segment drifts ~1e-5.
    np.testing.assert_allclose(
        np.asarray(out), _oracle(cot, owners, rows), rtol=1e-6, atol=2e-5
    )


def test_single_owner_all_pairs():
    """Degenerate: every pair owned by row 0 (one huge segment)."""
    rng = np.random.default_rng(1)
    p = CHUNK * 3
    cot = rng.normal(size=(5, p)).astype(np.float32)
    owners = np.zeros(p, np.int32)
    out = segsum_contiguous(
        jnp.asarray(cot), jnp.asarray(owners), 7, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out)[:, 0], cot.sum(axis=1), rtol=1e-5, atol=1e-5
    )
    assert np.abs(np.asarray(out)[:, 1:]).max() == 0.0


def test_panel_fallback_matches_oracle(monkeypatch):
    """Force the rolling-panel kernel (the multi-M-gaussian / wide-channel
    fallback) and check it against the oracle — the VMEM fast path covers
    every other test in this file."""
    import semantic_gaussians_tpu.ops.segsum as segsum_mod

    monkeypatch.setattr(segsum_mod, "VMEM_ACC_BYTES", 0)
    rng = np.random.default_rng(5)
    d, p, rows = 11, 4 * CHUNK, 700
    cot = rng.normal(size=(d, p)).astype(np.float32)
    owners = _owners(p, rows, rng)
    out = segsum_mod.segsum_contiguous.__wrapped__(
        jnp.asarray(cot), jnp.asarray(owners), rows, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), _oracle(cot, owners, rows), rtol=1e-6, atol=2e-5
    )


def test_panel_fallback_multiple_slides(monkeypatch):
    """Owner range spanning several PANELs forces repeated flush/shift
    slides (the panel kernel's new moving parts): every slide boundary,
    the shifted WIN-column overlap, and the final whole-panel flush must
    compose to the exact segment sum."""
    import semantic_gaussians_tpu.ops.segsum as segsum_mod

    monkeypatch.setattr(segsum_mod, "VMEM_ACC_BYTES", 0)
    rng = np.random.default_rng(7)
    p = 32 * CHUNK  # 16384 pairs
    rows = 14000  # ~0.85 owner steps/pair -> spans ~3.4 PANELs of 4096
    d = 7
    cot = rng.normal(size=(d, p)).astype(np.float32)
    owners = _owners(p, rows, rng)
    assert owners[-1] > 2 * segsum_mod.PANEL  # really crosses panels
    out = segsum_mod.segsum_contiguous.__wrapped__(
        jnp.asarray(cot), jnp.asarray(owners), rows, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), _oracle(cot, owners, rows), rtol=1e-6, atol=2e-5
    )


def test_panel_fallback_segment_straddles_slide(monkeypatch):
    """One long segment pinned across the first STRIDE boundary, so its
    partial sums split between a panel flush and the shifted tail; the
    total per-owner sum must still match the oracle."""
    import semantic_gaussians_tpu.ops.segsum as segsum_mod

    monkeypatch.setattr(segsum_mod, "VMEM_ACC_BYTES", 0)
    p = 24 * CHUNK
    stride = segsum_mod.STRIDE
    # owners: ramp at 1 step/pair to just short of STRIDE, hold that owner
    # for 6 chunks (one long segment pinned at the first slide boundary),
    # then ramp again.
    ramp = np.arange(p, dtype=np.int32)
    hold_at = stride - 64
    resume = hold_at + 6 * CHUNK
    owners = np.minimum(ramp, hold_at)
    owners = np.where(ramp >= resume, hold_at + (ramp - resume), owners)
    owners = owners.astype(np.int32)
    steps = np.diff(owners)
    assert ((steps >= 0) & (steps <= 1)).all()
    rows = int(owners[-1]) + 1
    rng = np.random.default_rng(11)
    cot = rng.normal(size=(5, p)).astype(np.float32)
    out = segsum_mod.segsum_contiguous.__wrapped__(
        jnp.asarray(cot), jnp.asarray(owners), rows, interpret=True
    )
    # atol: the 3.1k-pair pinned segment is summed as per-chunk partials
    # (some split across the flush/shift) in a different order than numpy's
    # sequential add — observed 1.4e-4 ordering noise on sums of ~3k unit
    # normals (rms ulp drift ~ 4e-6 * sqrt(3k)); a dropped or duplicated
    # contribution would show as O(1).
    np.testing.assert_allclose(
        np.asarray(out), _oracle(cot, owners, rows), rtol=1e-4, atol=5e-4
    )
