"""Index-math tests (reference pacmenMath.h semantics)."""
import numpy as np
import pytest

from pacmensl_tpu.sys import indexing


def test_sub2ind_roundtrip():
    nmax = np.array([3, 4, 5])
    rng = np.random.default_rng(0)
    states = np.stack([rng.integers(0, m + 1, size=50) for m in nmax], axis=1)
    keys = indexing.sub2ind(nmax, states)
    assert (keys >= 0).all()
    back = indexing.ind2sub(nmax, keys)
    np.testing.assert_array_equal(back, states)


def test_sub2ind_first_axis_fastest():
    nmax = np.array([2, 2])
    assert indexing.sub2ind(nmax, [[1, 0]])[0] == 1
    assert indexing.sub2ind(nmax, [[0, 1]])[0] == 3


def test_sub2ind_negative_codes():
    # Reference pacmenMath.h:41-55: -1 for negative coordinate,
    # -(i+2) for coordinate i over its max.
    nmax = np.array([3, 4])
    keys = indexing.sub2ind(nmax, [[-1, 0], [4, 0], [0, 5], [3, 4]])
    assert keys[0] == -1
    assert keys[1] == -2
    assert keys[2] == -3
    assert keys[3] == 3 + 4 * 4


def test_sub2ind_jax_matches_numpy():
    from pacmensl_tpu.sys.indexing import sub2ind_jax
    nmax = np.array([5, 6, 7])
    rng = np.random.default_rng(1)
    states = np.stack([rng.integers(0, m + 1, size=30) for m in nmax], axis=1)
    np.testing.assert_array_equal(
        np.asarray(sub2ind_jax(nmax, states)),
        indexing.sub2ind(nmax, states))


def test_unique_states():
    states = np.array([[0, 0], [1, 0], [0, 0], [2, 1], [1, 0]])
    uniq, inv = indexing.unique_states(states)
    assert uniq.shape == (3, 2)
    np.testing.assert_array_equal(uniq[inv], states)


def test_distribute_tasks():
    counts = indexing.distribute_tasks(10, 3)
    assert counts.sum() == 10 and counts.tolist() == [4, 3, 3]
    assert indexing.get_task_range(10, 3, 1) == (4, 7)
