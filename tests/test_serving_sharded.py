"""Data-parallel serving: ShardedCodec over the virtual 8-device CPU mesh.

The sharded codec must produce BYTE-IDENTICAL streams to the single-device
codec (the per-image stream layout — v4 by default — has no cross-image
state) and its decode must reproduce the single-device reconstruction
bit-exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlic_tpu.codec import Codec
from mlic_tpu.models.registry import get_model
from mlic_tpu.parallel.mesh import make_mesh
from mlic_tpu.parallel.serving import ShardedCodec


@pytest.fixture(scope="module")
def setup():
    model = get_model("MLICPP_TINY")
    x = np.asarray(jax.random.uniform(jax.random.key(0), (8, 64, 64, 3)),
                   np.float32)
    params = jax.jit(lambda r, v: model.init(r, v, True))(
        {"params": jax.random.key(1), "noise": jax.random.key(2)},
        jnp.asarray(x))["params"]
    return model, params, x


def test_sharded_streams_match_single_device(setup):
    model, params, x = setup
    mesh = make_mesh(4)
    ref = Codec(model, params, backend="device", n_lanes=16,
                encode_recon=True)
    ref.update()
    enc_ref = ref.compress(x)

    sc = ShardedCodec(model, params, mesh, n_lanes=16, encode_recon=True)
    sc.update()
    enc = sc.compress(x)
    assert enc["strings"][0] == enc_ref["strings"][0]
    assert enc["strings"][1] == enc_ref["strings"][1]
    # Cross-compilation (jit vs shard_map) float drift in g_s is expected
    # at ~1e-5; bit-exactness is required WITHIN a path, not across them.
    np.testing.assert_allclose(np.asarray(enc["x_hat"]),
                               np.asarray(enc_ref["x_hat"]), atol=1e-4)

    # The coding invariant: sharded decode reproduces the sharded encoder's
    # reconstruction BIT-EXACTLY (identical per-device programs).
    dec = sc.decompress(enc["strings"], enc["shape"])
    np.testing.assert_array_equal(np.asarray(dec["x_hat"]),
                                  np.asarray(enc["x_hat"]))
    # outputs really are sharded over the mesh
    assert len(dec["x_hat"].sharding.device_set) == 4


def test_sharded_roundtrip_stream_pipeline(setup):
    """The two-deep serving pipeline generator works over the mesh
    (compress_begin/end split inherited protocol) and stays bit-exact."""
    model, params, x = setup
    mesh = make_mesh(4)
    sc = ShardedCodec(model, params, mesh, n_lanes=16, encode_recon=True)
    sc.update()
    batches = [x, x[::-1]]
    outs = list(sc.roundtrip_stream(batches))
    assert len(outs) == 2
    for (enc, dec), xb in zip(outs, batches):
        ref = sc.compress(xb)
        assert enc["strings"][0] == ref["strings"][0]
        np.testing.assert_array_equal(np.asarray(dec["x_hat"]),
                                      np.asarray(enc["x_hat"]))


def test_sharded_batch_divisibility_guard(setup):
    model, params, x = setup
    mesh = make_mesh(4)
    sc = ShardedCodec(model, params, mesh, n_lanes=16)
    sc.update()
    with pytest.raises(AssertionError, match="divisible"):
        sc.compress(x[:6])
