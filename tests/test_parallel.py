"""Data-parallel training on the virtual 8-device CPU mesh.

The DDP-equivalence check the reference never had (SURVEY.md §4):
a sharded-batch train step must match the single-device step, and
parameters must stay replicated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlic_tpu.data.folder import synthetic_batches
from mlic_tpu.models.registry import get_model
from mlic_tpu.parallel import mesh as pmesh
from mlic_tpu.train.trainer import TrainConfig, create_train_state, make_train_step


def test_mesh_creation():
    mesh = pmesh.make_mesh()
    assert mesh.devices.size == 8


def test_sharded_train_step_matches_single_device():
    model = get_model("MLICPP_TINY")
    cfg = TrainConfig(lmbda=0.013, learning_rate=1e-4, seed=0)
    batch = next(synthetic_batches(8, 64, steps=1, seed=3))

    # single-device
    state1, tx = create_train_state(model, cfg, input_shape=(8, 64, 64, 3))
    step1 = make_train_step(model, tx, cfg)
    state1, m1 = step1(state1, jnp.asarray(batch))

    # 8-device data parallel (same init seed -> same params)
    mesh = pmesh.make_mesh()
    state8, tx8 = create_train_state(model, cfg, input_shape=(8, 64, 64, 3))
    state8 = pmesh.replicate(state8, mesh)
    step8 = make_train_step(model, tx8, cfg)
    sharded = pmesh.shard_batch(jnp.asarray(batch), mesh)
    state8, m8 = step8(state8, sharded)

    assert np.allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    # parameters agree after one update
    p1 = jax.tree.leaves(state1.params)
    p8 = jax.tree.leaves(jax.device_get(state8.params))
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)


def test_batch_sharding_layout():
    mesh = pmesh.make_mesh()
    batch = jnp.zeros((8, 16, 16, 3))
    sharded = pmesh.shard_batch(batch, mesh)
    assert len(sharded.sharding.device_set) == 8
