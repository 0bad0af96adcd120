"""Entropy model tests: likelihood sanity, CDF tables, coding round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from mlic_tpu.entropy import models as em
from mlic_tpu.entropy.rans import coder


def test_gaussian_likelihood_matches_scipy():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((2, 4, 4, 3)).astype(np.float32) * 3
    scales = (rng.random((2, 4, 4, 3)) * 2 + 0.2).astype(np.float32)
    means = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    lk = np.asarray(em.gaussian_likelihood(jnp.asarray(y), jnp.asarray(scales), jnp.asarray(means)))
    v = np.abs(y - means)
    want = stats.norm.cdf((0.5 - v) / scales) - stats.norm.cdf((-0.5 - v) / scales)
    np.testing.assert_allclose(lk, want, rtol=2e-4, atol=1e-7)


def test_gaussian_likelihood_scale_bound():
    lk = em.gaussian_likelihood(jnp.zeros((1, 1, 1, 1)), jnp.full((1, 1, 1, 1), 1e-6),
                                jnp.zeros((1, 1, 1, 1)))
    # bounded at scale 0.11 -> likelihood of 0 symbol is cdf window at scale .11
    want = stats.norm.cdf(0.5 / 0.11) - stats.norm.cdf(-0.5 / 0.11)
    np.testing.assert_allclose(np.asarray(lk)[0, 0, 0, 0], want, rtol=1e-5)


def test_build_indexes_reference_semantics():
    table = jnp.asarray(em.get_scale_table(), jnp.float32)
    scales = jnp.asarray([0.01, 0.11, 0.111, 1.0, 255.0, 256.0, 999.0], jnp.float32)
    idx = np.asarray(em.build_indexes(scales, table))
    # reference: index = count of table entries strictly below scale
    table_np = np.asarray(table)
    for s, i in zip(np.maximum(np.asarray(scales), 0.11), idx):
        if s <= table_np[-1]:
            assert table_np[i] >= s - 1e-6
        else:
            assert i == len(table_np) - 1  # clamp to the largest scale
        if i > 0:
            assert table_np[i - 1] < s + 1e-6
    assert idx[0] == 0 and idx[-1] == 63


def test_gaussian_tables_roundtrip():
    tables = em.GaussianConditionalTables.create()
    rng = np.random.default_rng(1)
    n = 20000
    scale_table = tables.scale_table
    idx = rng.integers(0, len(scale_table), size=n).astype(np.int32)
    symbols = np.round(rng.standard_normal(n) * scale_table[idx]).astype(np.int32)
    stream = coder.encode_with_indexes(symbols, idx, tables.quantized_cdf,
                                       tables.cdf_length, tables.offset)
    decoded = coder.decode_with_indexes(stream, idx, tables.quantized_cdf,
                                        tables.cdf_length, tables.offset)
    np.testing.assert_array_equal(decoded, symbols)
    # Rate should be near the Gaussian entropy for mid-range scales.
    mask = (idx > 20) & (idx < 50)
    bits = len(stream) * 8


class TestEntropyBottleneck:
    @pytest.fixture()
    def eb(self):
        module = em.EntropyBottleneck(channels=8)
        z = jnp.zeros((1, 4, 4, 8))
        params = module.init({"params": jax.random.key(0), "noise": jax.random.key(1)},
                             z, True)["params"]
        return module, params

    def test_forward_shapes_and_bounds(self, eb):
        module, params = eb
        z = jax.random.normal(jax.random.key(2), (2, 4, 4, 8)) * 5
        z_t, lk = module.apply({"params": params}, z, True, rngs={"noise": jax.random.key(3)})
        assert z_t.shape == z.shape and lk.shape == z.shape
        assert float(jnp.min(lk)) >= em.LIKELIHOOD_BOUND * 0.99
        assert float(jnp.max(lk)) <= 1.0

    def test_eval_mode_quantizes_to_integers_around_median(self, eb):
        module, params = eb
        z = jax.random.normal(jax.random.key(2), (1, 4, 4, 8)) * 5
        z_hat, _ = module.apply({"params": params}, z, False)
        med = np.asarray(module.apply({"params": params}, method=em.EntropyBottleneck.medians))
        got = np.asarray(z_hat) - med.reshape(1, 1, 1, -1)
        np.testing.assert_allclose(got, np.round(got), atol=1e-5)

    def test_ste_quantize_gradient_is_identity(self, eb):
        module, params = eb
        z = jax.random.normal(jax.random.key(4), (1, 2, 2, 8))
        g = jax.grad(lambda v: jnp.sum(module.apply({"params": params}, v,
                                                    method=em.EntropyBottleneck.ste_quantize)))(z)
        np.testing.assert_allclose(np.asarray(g), 1.0, rtol=1e-6)

    def test_aux_loss_trains_quantiles(self, eb):
        module, params = eb

        def loss_fn(p):
            return module.apply({"params": p}, method=em.EntropyBottleneck.aux_loss)

        loss0 = float(loss_fn(params))
        grad_fn = jax.jit(jax.grad(loss_fn))
        g = grad_fn(params)
        # only quantiles should receive gradient
        for k, v in g.items():
            if k != "quantiles":
                assert float(jnp.max(jnp.abs(v))) == 0.0, k

        @jax.jit
        def step(p):
            return jax.tree.map(lambda a, b: a - 0.1 * b, p, jax.grad(loss_fn)(p))

        p = params
        for _ in range(200):
            p = step(p)
        assert float(loss_fn(p)) < loss0

    def test_likelihood_integrates_to_one(self, eb):
        module, params = eb
        # Sum of pmf over a wide integer support should be ~1 per channel.
        xs = jnp.arange(-200, 201, dtype=jnp.float32)
        v = jnp.tile(xs[None, :], (8, 1))
        lk = module.apply({"params": params}, v,
                          method=em.EntropyBottleneck._likelihood)
        total = np.asarray(jnp.sum(lk, axis=1))
        np.testing.assert_allclose(total, 1.0, atol=1e-4)

    def test_tables_and_coding_roundtrip(self, eb):
        module, params = eb
        cdfs, lengths, offsets, medians = em.entropy_bottleneck_tables(params, 8)
        assert cdfs.shape[0] == 8
        rng = np.random.default_rng(5)
        z = (rng.standard_normal((2, 6, 6, 8)) * 4).astype(np.float32)
        symbols = np.round(z - medians.reshape(1, 1, 1, -1)).astype(np.int32)
        idx = np.broadcast_to(np.arange(8, dtype=np.int32), z.shape)
        stream = coder.encode_with_indexes(symbols.ravel(), idx.ravel(), cdfs, lengths, offsets)
        decoded = coder.decode_with_indexes(stream, idx.ravel(), cdfs, lengths, offsets)
        np.testing.assert_array_equal(decoded, symbols.ravel())
