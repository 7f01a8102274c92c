"""Native C++ state directory: build, semantics, and parity.

Mirrors the reference's raw Zoltan-DD scratch test (``tests/test_dd.cpp``)
plus the StateSet expansion oracle of ``tests/test_fss.cpp:104-130``: the
native directory must agree exactly with the pure-numpy indexing reference.
"""
import numpy as np
import pytest

from pacmensl_tpu.native import build
from pacmensl_tpu.native.fastset import FastSet, available, sub2ind_native
from pacmensl_tpu.sys import indexing


def test_native_library_builds():
    # g++ is part of the supported environment: the native path must be
    # real, not a permanently-dormant fallback.
    assert available(), f"native build failed: {build.load_error()}"


def test_insert_and_lookup_semantics():
    s = FastSet()
    new = s.insert([5, 7, 5, -1, 9, 7])
    assert new.tolist() == [True, True, False, False, True, False]
    assert len(s) == 3
    # ranks follow insertion order
    assert s.lookup([5, 7, 9, 11, -3]).tolist() == [0, 1, 2, -1, -1]
    # second batch continues ranks
    new = s.insert([9, 100])
    assert new.tolist() == [False, True]
    assert s.lookup([100])[0] == 3


def test_insert_growth_rehash():
    rng = np.random.default_rng(0)
    keys = rng.choice(10_000_000, size=50_000, replace=False)
    s = FastSet(capacity_hint=8)
    new = s.insert(keys)
    assert new.all() and len(s) == keys.size
    idx = s.lookup(keys)
    assert (idx == np.arange(keys.size)).all()
    # duplicates rejected wholesale
    assert not s.insert(keys).any()


def test_sub2ind_native_matches_numpy():
    rng = np.random.default_rng(1)
    nmax = np.array([7, 3, 11, 5])
    states = rng.integers(-2, 14, size=(1000, 4))
    np.testing.assert_array_equal(
        sub2ind_native(nmax, states), indexing.sub2ind(nmax, states))


@pytest.mark.skipif(not available(), reason="no native toolchain")
def test_numpy_fallback_parity():
    """The FastSet numpy fallback must implement identical semantics."""
    rng = np.random.default_rng(2)
    keys1 = rng.integers(-5, 5000, size=2000)
    keys2 = rng.integers(-5, 5000, size=2000)

    nat = FastSet()
    fb = FastSet()
    fb._lib = None          # force the numpy path
    fb._keys = np.zeros((0,), np.int64)
    fb._sorted = np.zeros((0,), np.int64)
    fb._rank = np.zeros((0,), np.int64)

    for ks in (keys1, keys2):
        np.testing.assert_array_equal(nat.insert(ks), fb.insert(ks))
    probe = rng.integers(-5, 6000, size=3000)
    np.testing.assert_array_equal(nat.lookup(probe), fb.lookup(probe))
    assert len(nat) == len(fb)


def test_state_set_uses_directory():
    """StateSet expansion oracle (reference test_fss.cpp): toggle model
    under the simplex constraint x0+x1 <= 3 enumerates exactly 10 states,
    each resolvable through state2index."""
    import pacmensl_tpu as pm
    from pacmensl_tpu.statespace.constraints import ConstraintSet
    from pacmensl_tpu.statespace.state_set import StateSet

    b = pm.models.toggle()

    def simplex(x):
        import jax.numpy as jnp
        return jnp.stack([x[:, 0], x[:, 1], x[:, 0] + x[:, 1]], axis=1)

    cs = ConstraintSet(simplex, [3, 3, 3], [0.5, 0.5, 0.5])
    ss = StateSet(b.model.stoichiometry, cs, init_states=[[0, 0]])
    ss.expand()
    assert ss.num_states == 10
    all_states = np.array([[i, j] for i in range(4) for j in range(4)
                           if i + j <= 3])
    idx = ss.state2index(all_states)
    assert (idx >= 0).all()
    assert np.unique(idx).size == 10
    # absent states resolve to -1
    assert (ss.state2index([[4, 0], [2, 2], [-1, 0]]) == -1).all()
