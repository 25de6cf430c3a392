"""ECAPA-TDNN alternative tower: shapes, determinism, SE/attention sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from zonos_tpu.models.speaker.ecapa import ecapa_forward, init_ecapa_params


def test_ecapa_embedding_shape():
    params = init_ecapa_params(jax.random.key(0), C=128)
    mel = jnp.asarray(np.random.default_rng(0).normal(size=(2, 80, 60)), jnp.float32)
    emb = ecapa_forward(params, mel)
    assert emb.shape == (2, 192)
    emb2 = ecapa_forward(params, mel)
    np.testing.assert_array_equal(np.asarray(emb), np.asarray(emb2))


def test_ecapa_time_invariance_of_shape():
    params = init_ecapa_params(jax.random.key(0), C=128)
    for T in (40, 100):
        mel = jnp.asarray(np.random.default_rng(1).normal(size=(1, 80, T)), jnp.float32)
        assert ecapa_forward(params, mel).shape == (1, 192)
