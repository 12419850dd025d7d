"""Unit tests for round-5 scan primitives: the tiled two-phase top_k
and the cumsum/searchsorted mask compaction must select EXACTLY what
the lax.top_k forms they replaced selected (including index
tie-breaking), and the danger fallback must keep the tiled form exact
under adversarial tie pile-ups."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from sybil_tpu.ops.scan import _mask_positions, _topk_rows  # noqa: E402


def _ref_topk_idx(score, k):
    return np.asarray(jax.lax.top_k(jnp.asarray(score), k)[1])


@pytest.mark.parametrize("seed,k", [(0, 100), (1, 1000), (2, 17)])
def test_topk_rows_matches_full_topk(seed, k):
    rng = np.random.default_rng(seed)
    R = 64 * 1024
    # heavy ties: scores drawn from a tiny range
    score = rng.integers(0, 50, R).astype(np.int32)
    live = score > 0
    score = np.where(live, score, -1).astype(np.int32)
    got = np.asarray(_topk_rows(jnp.asarray(score), jnp.asarray(live), k))
    want = _ref_topk_idx(score, k)
    assert np.array_equal(got, want)


def test_topk_rows_danger_fallback_exact():
    """>64 maximal ties packed into one 1024-row tile: the tile-top-m
    phase alone would drop deserving rows; the in-kernel danger check
    must fall back to the full top_k and stay exact."""
    R = 16 * 1024
    score = np.zeros(R, np.int32)
    score[:200] = 7          # 200 equal winners inside tile 0
    live = score > 0
    k = 150
    got = np.asarray(_topk_rows(jnp.asarray(score), jnp.asarray(live), k))
    want = _ref_topk_idx(score, k)
    assert np.array_equal(got, want)


def test_topk_rows_fewer_live_than_k():
    R = 8 * 1024
    score = np.full(R, -1, np.int32)
    score[[5, 999, 7000]] = [3, 9, 1]
    live = score > 0
    got = np.asarray(_topk_rows(jnp.asarray(score), jnp.asarray(live), 64))
    # winners first, by score desc then index
    assert list(got[:3]) == [999, 5, 7000]


@pytest.mark.parametrize("seed", [0, 3])
def test_mask_positions_matches_topk_selection(seed):
    rng = np.random.default_rng(seed)
    R = 32 * 1024
    mask = rng.random(R) < 0.01
    k = 256
    idx, live = _mask_positions(jnp.asarray(mask), k)
    idx, live = np.asarray(idx), np.asarray(live)
    true_rows = np.nonzero(mask)[0]
    n = min(len(true_rows), k)
    assert np.array_equal(idx[:n], true_rows[:n])
    assert live[:n].all() and not live[n:].any()


def test_mask_positions_true_last_row_padding():
    """Padding entries must read as dead even when the LAST row of the
    mask is True (the clip target)."""
    mask = np.zeros(4096, bool)
    mask[4095] = True
    idx, live = _mask_positions(jnp.asarray(mask), 8)
    idx, live = np.asarray(idx), np.asarray(live)
    assert idx[0] == 4095 and live[0]
    assert not live[1:].any()
