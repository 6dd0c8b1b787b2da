"""LlamaConfig.ring_attention: the decoder runs ring attention over the
"sp" mesh axis (sequence-sharded activations) and must match the plain
single-device forward."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimeditron_tpu.models.llama import (
    LlamaConfig,
    init_llama_params,
    llama_forward,
)
from multimeditron_tpu.parallel.mesh import make_mesh


def _cfg(**kw):
    return LlamaConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=2, num_kv_heads=2, dtype=jnp.float32,
        max_position_embeddings=1024, **kw,
    )


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_ring_attention_matches_plain_forward():
    cfg = _cfg(sequence_parallel=True, ring_attention=True)
    base = dataclasses.replace(cfg, sequence_parallel=False,
                               ring_attention=False)
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 128, (2, 512)), jnp.int32)

    ref, _ = llama_forward(params, base, input_ids=ids)

    mesh = make_mesh(dp=1, fsdp=1, tp=1, sp=4)
    with jax.set_mesh(mesh):
        out, _ = jax.jit(
            lambda p, i: llama_forward(p, cfg, input_ids=i)
        )(params, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-2)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_ring_attention_grads_match():
    cfg = _cfg(sequence_parallel=True, ring_attention=True)
    base = dataclasses.replace(cfg, sequence_parallel=False,
                               ring_attention=False)
    params = init_llama_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 128, (1, 512)), jnp.int32)

    def loss(p, c):
        logits, _ = llama_forward(p, c, input_ids=ids)
        return jnp.mean(jnp.square(logits.astype(jnp.float32)))

    g_ref = jax.grad(lambda p: loss(p, base))(params)
    mesh = make_mesh(dp=1, fsdp=1, tp=1, sp=4)
    with jax.set_mesh(mesh):
        g_ring = jax.jit(jax.grad(lambda p: loss(p, cfg)))(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_ring = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(g_ring))
    for key, ref_leaf in flat_ref:
        name = jax.tree_util.keystr(key)
        np.testing.assert_allclose(
            np.asarray(flat_ring[name], np.float32),
            np.asarray(ref_leaf, np.float32),
            atol=5e-3, rtol=5e-2, err_msg=name)


def test_ring_attention_falls_back_without_mesh():
    """No mesh in context: the ring path degrades to plain attention
    (same best-effort contract as the sp sharding constraints)."""
    cfg = _cfg(sequence_parallel=True, ring_attention=True)
    base = dataclasses.replace(cfg, sequence_parallel=False,
                               ring_attention=False)
    params = init_llama_params(jax.random.PRNGKey(2), cfg)
    ids = jnp.asarray(
        np.random.default_rng(3).integers(0, 128, (1, 64)), jnp.int32)
    out, _ = llama_forward(params, cfg, input_ids=ids)
    ref, _ = llama_forward(params, base, input_ids=ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-3)
