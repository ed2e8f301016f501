"""GP-stack tests: kernel properties, exact GP vs sklearn/analytic oracle,
masked static shapes, sparse FITC/VFE vs exact, hyperparameter optimization,
structured residual GP round trip, ring buffers, residual collection.

Mirrors SURVEY.md §4 obligations: GP posterior vs exact O(N³) oracle,
FITC/VFE behavior (`sparse_gp.py:212-251`), novelty gating.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmpc_tpu.gp import (
    AtmosphereModel,
    DataBuffer,
    FastGPPredictor,
    Matern32,
    Matern52,
    OnlineGPUpdater,
    OnlineUpdateConfig,
    ResidualCollector,
    RingBuffer,
    Simple3DoFGP,
    SquaredExponentialARD,
    StructuredGPConfig,
    StructuredRocketGP,
    WhiteNoise,
    create_kernel,
    fit,
    fit_multi,
    fit_sparse,
    init_inducing_points,
    log_marginal_likelihood,
    optimize_hyperparameters,
    predict,
    predict_multi,
    predict_sparse,
    sample_posterior,
    sample_prior,
    sparse_lml,
    stack_kernels,
)
from gpmpc_tpu.gp.features import simple_3dof_features, translational_features


def toy_data(rng, n=40, d=2, noise=0.05):
    X = rng.uniform(-2, 2, size=(n, d)).astype(np.float32)
    y = (np.sin(X[:, 0]) * np.cos(X[:, 1]) + noise * rng.normal(size=n)).astype(np.float32)
    return jnp.asarray(X), jnp.asarray(y)


class TestKernels:
    def test_se_ard_psd_and_diag(self, rng):
        k = SquaredExponentialARD.create(3, variance=2.0, lengthscale=0.7)
        X = jnp.asarray(rng.normal(size=(20, 3)), jnp.float32)
        K = k(X, X)
        np.testing.assert_allclose(K, K.T, atol=1e-6)
        evals = np.linalg.eigvalsh(np.asarray(K, np.float64))
        assert evals.min() > -1e-5
        np.testing.assert_allclose(k.diagonal(X), 2.0, rtol=1e-5)

    def test_se_ard_matches_formula(self):
        k = SquaredExponentialARD.create(2, variance=1.5, lengthscale=0.5)
        x = jnp.array([[0.3, -0.2]])
        z = jnp.array([[-0.1, 0.4]])
        d2 = ((0.3 + 0.1) ** 2 + (-0.2 - 0.4) ** 2) / 0.25
        np.testing.assert_allclose(k(x, z)[0, 0], 1.5 * np.exp(-0.5 * d2), rtol=1e-5)

    @pytest.mark.parametrize("cls", [Matern32, Matern52])
    def test_matern_limits(self, cls, rng):
        k = cls.create(2)
        X = jnp.asarray(rng.normal(size=(10, 2)), jnp.float32)
        K = k(X, X)
        np.testing.assert_allclose(jnp.diagonal(K), 1.0, atol=1e-3)
        assert float(K.min()) > 0  # Matérn is positive

    def test_composition(self, rng):
        k1 = SquaredExponentialARD.create(2)
        k2 = WhiteNoise.create(0.1)
        X = jnp.asarray(rng.normal(size=(8, 2)), jnp.float32)
        Ks = (k1 + k2)(X, X)
        np.testing.assert_allclose(Ks, k1(X, X) + k2(X, X), atol=1e-6)
        Kp = (k1 * k1)(X, X)
        np.testing.assert_allclose(Kp, k1(X, X) ** 2, atol=1e-5)

    def test_param_roundtrip(self):
        k = SquaredExponentialARD.create(3, variance=2.0)
        theta = k.get_params()
        assert theta.shape == (4,)
        k2 = k.set_params(theta + 1.0)
        np.testing.assert_allclose(k2.get_params(), theta + 1.0, atol=1e-6)

    def test_factory(self):
        assert isinstance(create_kernel("rbf", 3), SquaredExponentialARD)
        assert isinstance(create_kernel("matern52", 3), Matern52)
        with pytest.raises(ValueError):
            create_kernel("nope", 3)


class TestExactGP:
    def test_interpolates_training_data(self, rng):
        X, y = toy_data(rng, n=30)
        k = SquaredExponentialARD.create(2, lengthscale=1.0)
        state = fit(k, X, y, noise=1e-4)
        pr = predict(state, X)
        np.testing.assert_allclose(pr.mean, y, atol=0.05)
        assert float(pr.variance.max()) < 0.05

    def test_matches_sklearn(self, rng):
        from sklearn.gaussian_process import GaussianProcessRegressor
        from sklearn.gaussian_process.kernels import RBF as SkRBF

        X, y = toy_data(rng, n=30)
        ls, var, noise = 0.8, 1.0, 1e-2
        k = SquaredExponentialARD.create(2, variance=var, lengthscale=ls)
        state = fit(k, X, y, noise=np.sqrt(noise))
        Xs = jnp.asarray(rng.uniform(-2, 2, size=(10, 2)), jnp.float32)
        pr = predict(state, Xs)

        gpr = GaussianProcessRegressor(
            kernel=SkRBF(length_scale=ls), alpha=noise, optimizer=None
        ).fit(np.asarray(X, np.float64), np.asarray(y, np.float64))
        mu_ref, std_ref = gpr.predict(np.asarray(Xs, np.float64), return_std=True)
        np.testing.assert_allclose(pr.mean, mu_ref, atol=2e-3)
        # sklearn return_std is the latent-f std (no observation noise)
        np.testing.assert_allclose(np.sqrt(np.asarray(pr.variance)), std_ref, atol=2e-2)

    @pytest.mark.slow  # demoted from the default tier (r5: <300 s budget)
    def test_masked_padding_equivalence(self, rng):
        """A capacity-padded fit must equal the unpadded one exactly."""
        X, y = toy_data(rng, n=25)
        k = SquaredExponentialARD.create(2)
        dense = predict(fit(k, X, y, noise=1e-2), X[:5])
        padded = predict(fit(k, X, y, noise=1e-2, capacity=64), X[:5])
        np.testing.assert_allclose(dense.mean, padded.mean, atol=1e-4)
        np.testing.assert_allclose(dense.variance, padded.variance, atol=1e-4)

    def test_lml_increases_with_fit_quality(self, rng):
        X, y = toy_data(rng, n=30)
        m = jnp.ones(30, bool)
        good = log_marginal_likelihood(
            SquaredExponentialARD.create(2, lengthscale=1.0), X, y, m,
            jnp.log(jnp.asarray(0.1)))
        bad = log_marginal_likelihood(
            SquaredExponentialARD.create(2, lengthscale=100.0), X, y, m,
            jnp.log(jnp.asarray(0.1)))
        assert float(good) > float(bad)

    def test_hyperparameter_optimization_improves_lml(self, rng):
        X, y = toy_data(rng, n=30)
        m = jnp.ones(30, bool)
        k0 = SquaredExponentialARD.create(2, lengthscale=5.0)
        ln0 = jnp.log(jnp.asarray(0.3))
        before = log_marginal_likelihood(k0, X, y, m, ln0)
        k1, ln1, _ = optimize_hyperparameters(k0, X, y, m, ln0, steps=150)
        after = log_marginal_likelihood(k1, X, y, m, ln1)
        assert float(after) > float(before)

    def test_sampling_shapes_and_consistency(self, rng):
        X, y = toy_data(rng, n=20)
        k = SquaredExponentialARD.create(2)
        state = fit(k, X, y, noise=1e-2)
        Xs = X[:7]
        s_prior = sample_prior(k, jax.random.PRNGKey(0), Xs, 5)
        s_post = sample_posterior(state, jax.random.PRNGKey(1), Xs, 200)
        assert s_prior.shape == (5, 7)
        pr = predict(state, Xs)
        np.testing.assert_allclose(s_post.mean(axis=0), pr.mean, atol=0.1)

    def test_multi_output(self, rng):
        X, y1 = toy_data(rng, n=25)
        y2 = -2.0 * y1 + 0.1
        Y = jnp.stack([y1, y2], axis=1)
        kernels = stack_kernels([SquaredExponentialARD.create(2) for _ in range(2)])
        state = fit_multi(kernels, X, Y, noise=1e-3)
        pr = predict_multi(state, X[:5])
        assert pr.mean.shape == (5, 2)
        np.testing.assert_allclose(pr.mean[:, 0], y1[:5], atol=0.05)
        np.testing.assert_allclose(pr.mean[:, 1], y2[:5], atol=0.12)


class TestSparseGP:
    @pytest.mark.slow  # demoted from the default tier (r5: <300 s budget)
    def test_fitc_close_to_exact_with_many_inducing(self, rng):
        X, y = toy_data(rng, n=60)
        k = SquaredExponentialARD.create(2, lengthscale=1.0)
        exact = predict(fit(k, X, y, noise=0.1), X[:10])
        Z = init_inducing_points(jax.random.PRNGKey(0), X, 40)
        for method in ("fitc", "vfe"):
            sp = predict_sparse(
                fit_sparse(k, X, y, Z, noise=0.1, method=method), X[:10]
            )
            np.testing.assert_allclose(sp.mean, exact.mean, atol=0.08)

    def test_sparse_lml_finite_and_ordered(self, rng):
        X, y = toy_data(rng, n=50)
        k = SquaredExponentialARD.create(2)
        Z = init_inducing_points(jax.random.PRNGKey(0), X, 20)
        m = jnp.ones(50, bool)
        ln = jnp.log(jnp.asarray(0.1))
        for method in ("fitc", "vfe"):
            val = sparse_lml(k, Z, X, y, m, ln, method)
            assert np.isfinite(float(val))
        # VFE ELBO lower-bounds the exact LML
        elbo = sparse_lml(k, Z, X, y, m, ln, "vfe")
        lml = log_marginal_likelihood(k, X, y, m, ln)
        assert float(elbo) <= float(lml) + 1e-3

    def test_masked_sparse(self, rng):
        X, y = toy_data(rng, n=30)
        k = SquaredExponentialARD.create(2)
        Z = init_inducing_points(jax.random.PRNGKey(0), X, 15)
        full = predict_sparse(fit_sparse(k, X, y, Z, noise=0.1), X[:5])
        padded = predict_sparse(
            fit_sparse(k, X, y, Z, noise=0.1, capacity=64), X[:5]
        )
        np.testing.assert_allclose(full.mean, padded.mean, atol=1e-4)


class TestFastGP:
    def test_fast_matches_exact(self, rng):
        X, y = toy_data(rng, n=30)
        k = SquaredExponentialARD.create(2)
        state = fit(k, X, y, noise=0.1)
        fp = FastGPPredictor.from_data(k, X, y, noise=0.01)
        exact = predict(state, X[:5])
        mean, var = fp.predict_batch(X[:5])
        # same model with matched noise convention
        fp2 = FastGPPredictor.from_data(k, X, y, noise=float(jnp.exp(2*state.log_noise)))
        mean2, _ = fp2.predict_batch(X[:5])
        np.testing.assert_allclose(mean2, exact.mean, atol=1e-3)


class TestStructuredGP:
    def _make_data(self, rng, n=64):
        X = np.zeros((n, 14), np.float32)
        X[:, 0] = 2.0
        X[:, 1] = rng.uniform(1, 30, n)
        X[:, 4:7] = rng.normal(size=(n, 3))
        X[:, 7] = 1.0
        X[:, 11:14] = 0.1 * rng.normal(size=(n, 3))
        U = np.abs(rng.normal(size=(n, 3))).astype(np.float32) + 0.5
        # synthetic residual: linear in velocity
        R = np.concatenate([0.1 * X[:, 4:7], 0.05 * X[:, 11:14]], axis=1).astype(np.float32)
        return jnp.asarray(X), jnp.asarray(U), jnp.asarray(R)

    @pytest.mark.slow

    def test_fit_predict_roundtrip(self, rng):
        X, U, R = self._make_data(rng)
        gp = StructuredRocketGP.create(StructuredGPConfig(max_data_points=64, n_inducing=32))
        gp = gp.add_data_batch(X, U, R)
        gp = gp.fit(jax.random.PRNGKey(0))
        mean, var = gp.predict_batch(X[:10], U[:10])
        assert mean.shape == (10, 6)
        err = np.abs(np.asarray(mean) - np.asarray(R[:10]))
        assert err.mean() < 0.1

    def test_residual_lift(self):
        r6 = jnp.arange(6.0) + 1
        lifted = StructuredRocketGP.lift_residual(r6, 14)
        np.testing.assert_allclose(lifted[4:7], r6[:3])
        np.testing.assert_allclose(lifted[11:14], r6[3:])
        assert float(jnp.sum(jnp.abs(lifted))) == float(jnp.sum(jnp.abs(r6)))

    def test_simple3dof_gp(self, rng):
        n = 48
        X = np.zeros((n, 7), np.float32)
        X[:, 0] = 2.0
        X[:, 1] = rng.uniform(1, 30, n)
        X[:, 4:7] = rng.normal(size=(n, 3))
        U = np.abs(rng.normal(size=(n, 3))).astype(np.float32) + 0.5
        R = (0.2 * X[:, 4:7]).astype(np.float32)
        gp = Simple3DoFGP.create(StructuredGPConfig(max_data_points=64, n_inducing=24))
        gp = gp.add_data_batch(jnp.asarray(X), jnp.asarray(U), jnp.asarray(R))
        gp = gp.fit(jax.random.PRNGKey(0))
        mean, var = gp.predict_batch(jnp.asarray(X[:8]), jnp.asarray(U[:8]))
        assert mean.shape == (8, 3)
        assert np.abs(np.asarray(mean) - R[:8]).mean() < 0.1

    @pytest.mark.slow

    def test_save_load(self, rng, tmp_path):
        X, U, R = self._make_data(rng, n=32)
        gp = StructuredRocketGP.create(StructuredGPConfig(max_data_points=32, n_inducing=16))
        gp = gp.add_data_batch(X, U, R).fit(jax.random.PRNGKey(0))
        path = str(tmp_path / "gp.npz")
        gp.save(path)
        gp2 = gp.load(path)
        m1, _ = gp.predict_batch(X[:4], U[:4])
        m2, _ = gp2.predict_batch(X[:4], U[:4])
        np.testing.assert_allclose(m1, m2, atol=1e-6)


class TestBuffersAndOnline:
    def test_ring_buffer_wraps(self):
        buf = RingBuffer.create(4, 2, 1)
        for i in range(6):
            buf = buf.add(jnp.full(2, float(i)), jnp.full(1, float(i)))
        assert int(buf.count) == 4
        # oldest entries overwritten: X contains 2,3,4,5 in some ring order
        vals = sorted(np.asarray(buf.X[:, 0]).tolist())
        assert vals == [2.0, 3.0, 4.0, 5.0]

    def test_data_buffer_novelty_gate(self):
        buf = DataBuffer.create(8, 2, 1)
        x = jnp.array([1.0, 1.0])
        buf = buf.add_if_novel(x, jnp.ones(1), 0.1)
        buf = buf.add_if_novel(x + 0.01, jnp.ones(1), 0.1)  # too close — rejected
        buf = buf.add_if_novel(x + 1.0, jnp.ones(1), 0.1)
        assert int(buf.count) == 2
        assert int(buf.n_rejected) == 1

    def test_online_updater_cadence(self):
        cfg = OnlineUpdateConfig(capacity=64, update_interval=3, refit_interval=6,
                                 min_distance=0.0)
        upd = OnlineGPUpdater.create(cfg, 2, 1)
        flags = []
        for i in range(7):
            upd, do_u, do_r = upd.observe(jnp.array([float(i), 0.0]), jnp.ones(1))
            flags.append((bool(do_u), bool(do_r)))
        do_us = [f[0] for f in flags]
        assert do_us.count(True) == 2  # at 3rd and 6th accepted point
        assert [f[1] for f in flags].count(True) == 1

    def test_residual_collector(self):
        from gpmpc_tpu.dynamics import Rocket3DoFParams, rocket3dof as r3

        p = Rocket3DoFParams()
        rc = ResidualCollector(dt=0.1)
        F = lambda x, u: r3.step(p, x, u, 0.1)
        x = jnp.array([2.0, 10.0, 0.0, 0.0, -1.0, 0.0, 0.0])
        u = jnp.array([2.0, 0.0, 0.0])
        # plant = nominal + constant acceleration offset 0.5 on v_x
        x_actual = F(x, u).at[4].add(0.05)
        r = rc.residual(F, x, u, x_actual)
        np.testing.assert_allclose(r, jnp.array([0.5, 0.0, 0.0]), atol=1e-4)


class TestFeatures:
    def test_feature_dims(self):
        atm = AtmosphereModel()
        x14 = jnp.concatenate([
            jnp.array([2.0, 10.0, 0.0, 0.0, -1.0, 0.5, 0.0]),
            jnp.array([1.0, 0.0, 0.0, 0.0]), jnp.zeros(3)])
        u = jnp.array([2.0, 0.1, 0.0])
        assert translational_features(x14, u, atm).shape == (13,)
        x7 = x14[:7]
        assert simple_3dof_features(x7, u, atm).shape == (11,)

    def test_atmosphere_decay(self):
        atm = AtmosphereModel(rho0=1.0, scale_height=10.0)
        assert float(atm.density(jnp.asarray(0.0))) == 1.0
        np.testing.assert_allclose(atm.density(jnp.asarray(10.0)), np.exp(-1), rtol=1e-5)
        assert float(atm.density(jnp.asarray(-5.0))) == 1.0  # clamped below ground
