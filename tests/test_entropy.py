"""Entropy-model tests: likelihood properties, quantile/aux loss, CDF tables."""
import jax
import jax.numpy as jnp
import numpy as np

from textmae_tpu.entropy import (
    EntropyBottleneck,
    build_eb_tables,
    build_gaussian_tables,
    gaussian_build_indexes,
    gaussian_likelihood,
    get_scale_table,
    pmf_to_quantized_cdf,
)
from textmae_tpu.entropy.gaussian import gaussian_dequantize, gaussian_quantize_symbols


class TestQuantizedCdf:
    def test_basic_properties(self):
        pmf = np.array([0.25, 0.5, 0.2, 0.05])
        cdf = pmf_to_quantized_cdf(pmf)
        assert cdf[0] == 0 and cdf[-1] == 1 << 16
        assert np.all(np.diff(cdf) > 0)
        # frequencies proportional to the pmf
        freqs = np.diff(cdf) / (1 << 16)
        np.testing.assert_allclose(freqs, pmf, atol=2 ** -15)

    def test_zero_mass_symbols_get_slots(self):
        pmf = np.array([1.0, 0.0, 0.0, 1e-12])
        cdf = pmf_to_quantized_cdf(pmf)
        assert np.all(np.diff(cdf) >= 1)


class TestGaussian:
    def test_likelihood_matches_normal_cdf_diff(self):
        y = jnp.array([0.0, 1.0, -2.0])
        scales = jnp.array([1.0, 1.0, 1.0])
        means = jnp.zeros(3)
        lik = gaussian_likelihood(y, scales, means)
        from scipy.stats import norm

        expected = norm.cdf(np.abs(np.asarray(y)) * -1 + 0.5) - norm.cdf(
            -np.abs(np.asarray(y)) - 0.5
        )
        np.testing.assert_allclose(lik, expected, rtol=1e-5)

    def test_likelihood_sums_near_one(self):
        # Sum over all integers of P(round(y)=k) should be ~1
        ks = jnp.arange(-30, 31, dtype=jnp.float32)
        lik = gaussian_likelihood(ks, jnp.full_like(ks, 2.5), jnp.zeros_like(ks))
        assert abs(float(lik.sum()) - 1.0) < 1e-4

    def test_scale_lower_bound(self):
        lik_small = gaussian_likelihood(jnp.array([0.0]), jnp.array([1e-6]), jnp.array([0.0]))
        lik_bound = gaussian_likelihood(jnp.array([0.0]), jnp.array([0.11]), jnp.array([0.0]))
        np.testing.assert_allclose(lik_small, lik_bound)

    def test_build_indexes(self):
        table = get_scale_table()
        idx = gaussian_build_indexes(jnp.array([0.0, 0.11, 0.25, 300.0]), table)
        assert int(idx[0]) == 0 and int(idx[1]) == 0
        assert int(idx[3]) == len(table) - 1
        s = float(table[int(idx[2])])
        assert s >= 0.25 and float(table[int(idx[2]) - 1]) < 0.25

    def test_quantize_roundtrip(self):
        y = jnp.array([1.4, -0.6, 3.2])
        mu = jnp.array([1.0, -1.0, 3.0])
        sym = gaussian_quantize_symbols(y, mu)
        np.testing.assert_allclose(sym, [0, 0, 0])
        deq = gaussian_dequantize(sym, mu)
        np.testing.assert_allclose(deq, mu)

    def test_gaussian_tables(self):
        table = get_scale_table()[:8]
        cdf_table = build_gaussian_tables(table)
        assert cdf_table.quantized_cdf.shape[0] == 8
        for i in range(8):
            ln = int(cdf_table.cdf_length[i])
            row = cdf_table.quantized_cdf[i, :ln]
            assert row[0] == 0 and row[-1] == 1 << 16
            assert np.all(np.diff(row) > 0)
            # symmetric pmf: symbol at center is the most likely
            freqs = np.diff(row)[:-1]  # drop tail slot
            assert freqs.argmax() == (ln - 3) // 2

    def test_likelihood_gradients_finite(self):
        def loss(y):
            return -jnp.log(gaussian_likelihood(y, jnp.full_like(y, 0.5), jnp.zeros_like(y))).sum()

        g = jax.grad(loss)(jnp.array([0.3, -1.7, 5.0]))
        assert np.all(np.isfinite(g))


class TestEntropyBottleneck:
    def _make(self, channels=8):
        eb = EntropyBottleneck(channels=channels)
        z = jnp.zeros((2, 3, 3, channels))
        variables = eb.init(jax.random.PRNGKey(0), z)
        return eb, variables

    def test_forward_shapes_and_bounds(self):
        eb, variables = self._make()
        z = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 3, 8)) * 3
        z_hat, lik = eb.apply(variables, z)
        assert z_hat.shape == z.shape and lik.shape == z.shape
        assert float(lik.min()) > 0 and float(lik.max()) <= 1.0 + 1e-6

    def test_noise_mode_needs_rng_and_is_bounded(self):
        eb, variables = self._make()
        z = jnp.zeros((1, 2, 2, 8))
        z_t, _ = eb.apply(variables, z, rng=jax.random.PRNGKey(2), training=True)
        assert float(jnp.abs(z_t).max()) <= 0.5

    def test_integer_likelihoods_sum_to_one(self):
        """sigmoid(logits(k+.5)) - sigmoid(logits(k-.5)) telescopes to ~1 over Z."""
        eb, variables = self._make()
        grid = jnp.arange(-60, 61, dtype=jnp.float32)
        z = jnp.tile(grid[None, :, None, None], (1, 1, 1, 8))
        lik = eb.apply(variables, z, method=EntropyBottleneck.likelihood)
        sums = np.asarray(lik[0, :, 0, :]).sum(axis=0)
        # at init the density has deliberately heavy tails (~0.5% beyond +-60)
        np.testing.assert_allclose(sums, 1.0, atol=1e-2)

    def test_aux_loss_decreases_under_gd(self):
        eb, variables = self._make(channels=4)

        def aux(v):
            return eb.apply(v, method=EntropyBottleneck.aux_loss)

        loss0 = float(aux(variables))
        params = variables["params"]
        for _ in range(50):
            g = jax.grad(lambda p: aux({"params": p}))(params)
            params = jax.tree.map(lambda p, gg: p - 0.1 * gg, params, g)
        loss1 = float(aux({"params": params}))
        assert loss1 < loss0

    def test_tables_build(self):
        eb, variables = self._make(channels=4)
        table = build_eb_tables(variables["params"])
        assert table.quantized_cdf.shape[0] == 4
        for i in range(4):
            ln = int(table.cdf_length[i])
            row = table.quantized_cdf[i, :ln]
            assert row[0] == 0 and row[-1] == 1 << 16 and np.all(np.diff(row) > 0)

    def test_bits_estimate_tracks_entropy(self):
        """Latent with bigger dynamic range must cost more bits."""
        eb, variables = self._make(channels=4)
        rng = jax.random.PRNGKey(3)
        z_small = jax.random.normal(rng, (1, 4, 4, 4)) * 0.5
        z_big = jax.random.normal(rng, (1, 4, 4, 4)) * 8.0
        _, lik_s = eb.apply(variables, z_small)
        _, lik_b = eb.apply(variables, z_big)
        bits_s = float(-jnp.log2(lik_s).sum())
        bits_b = float(-jnp.log2(lik_b).sum())
        assert bits_b > bits_s
