"""smFISH + PDO tests (reference test_smfish.cpp: hand-computable
likelihood oracle — uniform p = 0.1 over 10 states, 5 observations gives
ll = 5*log(0.1) exactly)."""
import numpy as np
import pytest

import pacmensl_tpu as pm
from pacmensl_tpu.fsp.distribution import DiscreteDistribution
from pacmensl_tpu.sensfsp.sens_distribution import SensDiscreteDistribution
from pacmensl_tpu.smfish.snapshot import (SmFishSnapshot,
                                          smfish_loglikelihood,
                                          smfish_gradient)
from pacmensl_tpu.pdo.pdo import Pdo


def test_loglikelihood_uniform_oracle():
    states = np.arange(10).reshape(-1, 1)
    dist = DiscreteDistribution(t=1.0, states=states, p=np.full(10, 0.1))
    data = SmFishSnapshot(np.array([[0], [2], [4], [6], [8]]))
    ll = smfish_loglikelihood(data, dist)
    assert ll == pytest.approx(5 * np.log(0.1))
    ll2 = smfish_loglikelihood(data, dist, use_base_2=True)
    assert ll2 == pytest.approx(5 * np.log2(0.1))


def test_repeated_observations_fold_into_frequencies():
    data = SmFishSnapshot(np.array([[1], [1], [2]]))
    assert data.num_observations == 2
    assert sorted(data.frequencies.tolist()) == [1, 2]


def test_unobserved_state_clamps():
    states = np.arange(3).reshape(-1, 1)
    dist = DiscreteDistribution(t=0.0, states=states, p=[1.0, 0.0, 0.0])
    data = SmFishSnapshot(np.array([[1]]))   # observed state has p=0
    ll = smfish_loglikelihood(data, dist)
    assert ll == pytest.approx(np.log(1e-16))


def test_marginalized_likelihood():
    """Likelihood over a measured subset of species."""
    states = np.array([[0, 0], [0, 1], [1, 0], [1, 1]])
    dist = DiscreteDistribution(t=0.0, states=states,
                                p=[0.1, 0.2, 0.3, 0.4])
    data = SmFishSnapshot(np.array([[0], [1]]))
    ll = smfish_loglikelihood(data, dist, measured_species=[0])
    assert ll == pytest.approx(np.log(0.3) + np.log(0.7))


def test_gradient_matches_finite_difference():
    """Gradient from sensitivities == FD of the likelihood in p along dp."""
    rng = np.random.default_rng(0)
    states = np.arange(6).reshape(-1, 1)
    p = rng.random(6); p /= p.sum()
    dp = rng.standard_normal((2, 6)) * 0.01
    dist = SensDiscreteDistribution(t=0.0, states=states, p=p, dp=dp)
    data = SmFishSnapshot(np.array([[0], [3], [5]]), [2, 1, 4])
    grad = smfish_gradient(data, dist)
    eps = 1e-7
    for j in range(2):
        dp_ = DiscreteDistribution(t=0.0, states=states, p=p + eps * dp[j])
        dm_ = DiscreteDistribution(t=0.0, states=states, p=p - eps * dp[j])
        fd = (smfish_loglikelihood(data, dp_) -
              smfish_loglikelihood(data, dm_)) / (2 * eps)
        assert grad[j] == pytest.approx(fd, rel=1e-6)


def test_pdo_identity_kernel_preserves_marginal():
    states = np.arange(5).reshape(-1, 1)
    p = np.array([0.1, 0.2, 0.3, 0.2, 0.2])
    dist = DiscreteDistribution(t=0.0, states=states, p=p)
    ident = Pdo(lambda y, x: (y == x).astype(float), y_max=4)
    np.testing.assert_allclose(ident.apply(dist), p)
    ll = ident.loglikelihood([2, 2, 4], dist)
    assert ll == pytest.approx(2 * np.log(0.3) + np.log(0.2))


def test_pdo_binomial_loss_kernel():
    """Binomial detection with efficiency 0.5: distorted mean halves."""
    from scipy.stats import binom
    states = np.arange(11).reshape(-1, 1)
    p = np.zeros(11); p[10] = 1.0
    dist = DiscreteDistribution(t=0.0, states=states, p=p)
    pdo = Pdo(lambda y, x: binom.pmf(y, x, 0.5), y_max=10)
    py = pdo.apply(dist)
    mean = np.arange(11) @ py
    assert mean == pytest.approx(5.0)
