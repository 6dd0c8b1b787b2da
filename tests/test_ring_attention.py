"""Ring attention (ops/ring_attention.py) vs single-device flash.

Runs on the virtual CPU mesh (conftest forces 8 host devices): q/k/v are
sharded along the sequence over an "sp" ring, and forward + gradients
must match the unsharded flash kernel.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from multimeditron_tpu.ops.flash_attention import flash_attention
from multimeditron_tpu.ops.ring_attention import ring_attention

B, H, S, D = 1, 2, 512, 128
NDEV = 4


def _mesh():
    devs = jax.devices()[:NDEV]
    return Mesh(np.array(devs), ("sp",))


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(
        rng.normal(size=(B, H, S, D)) * 0.3, jnp.float32)
    return mk(), mk(), mk()


def _ring_fn(causal):
    @functools.partial(
        jax.shard_map,
        mesh=_mesh(),
        in_specs=(P(None, None, "sp", None),) * 3,
        out_specs=P(None, None, "sp", None),
        check_vma=False,
    )
    def f(q, k, v):
        return ring_attention(q, k, v, axis_name="sp", causal=causal,
                              interpret=True)
    return f


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_flash_forward(causal):
    q, k, v = _inputs()
    ref = flash_attention(q, k, v, causal=causal, interpret=True)
    out = _ring_fn(causal)(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-3, rtol=2e-2)


def test_ring_matches_flash_grads():
    q, k, v = _inputs(1)
    g = jnp.asarray(
        np.random.default_rng(2).normal(size=(B, H, S, D)) * 0.1,
        jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True,
                                       interpret=True) * g)

    ring = _ring_fn(True)

    def loss_ring(q, k, v):
        return jnp.sum(ring(q, k, v) * g)

    r_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    r_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(r_ring, r_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=5e-3, rtol=5e-2, err_msg=f"d{name}")


def test_ring_kv_mask_forward():
    """Padded keys travel the ring with their shard and stay masked."""
    q, k, v = _inputs(4)
    valid = S - 192  # last 192 keys padded
    kv_mask = (jnp.arange(S)[None, :] < valid).astype(jnp.int32)
    kv_mask = jnp.broadcast_to(kv_mask, (B, S))
    ref = flash_attention(q, k, v, kv_mask=kv_mask, causal=True,
                          interpret=True)

    @functools.partial(
        jax.shard_map,
        mesh=_mesh(),
        in_specs=(P(None, None, "sp", None),) * 3 + (P(None, "sp"),),
        out_specs=P(None, None, "sp", None),
        check_vma=False,
    )
    def f(q, k, v, m):
        return ring_attention(q, k, v, axis_name="sp", causal=True,
                              kv_mask=m, interpret=True)

    out = f(q, k, v, kv_mask)
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[:, :, :valid],
        np.asarray(ref, np.float32)[:, :, :valid],
        atol=2e-3, rtol=2e-2)


def test_ring_left_padded_forward_and_grads():
    """Left-padded causal batch: query rows with ZERO valid keys in every
    non-gated shard must output exactly 0 forward and contribute finite,
    reference-matching gradients (regression: gated partials used to
    enter the merge with weight exp2(0)=1, and the backward replay with
    global lse == MASK_VALUE produced 0*inf = NaN that the dk/dv ring
    spread to all devices)."""
    q, k, v = _inputs(5)
    pad = 160  # first 160 keys invalid -> causal rows 0..159 fully dead
    kv_mask = (jnp.arange(S)[None, :] >= pad).astype(jnp.int32)
    kv_mask = jnp.broadcast_to(kv_mask, (B, S))
    ref = flash_attention(q, k, v, kv_mask=kv_mask, causal=True,
                          interpret=True)

    @functools.partial(
        jax.shard_map,
        mesh=_mesh(),
        in_specs=(P(None, None, "sp", None),) * 3 + (P(None, "sp"),),
        out_specs=P(None, None, "sp", None),
        check_vma=False,
    )
    def f(q, k, v, m):
        return ring_attention(q, k, v, axis_name="sp", causal=True,
                              kv_mask=m, interpret=True)

    out = f(q, k, v, kv_mask)
    out_np = np.asarray(out, np.float32)
    # dead rows (no valid key reachable causally) are exactly zero
    np.testing.assert_array_equal(out_np[:, :, :pad], 0.0)
    ref_np = np.asarray(ref, np.float32)
    np.testing.assert_allclose(out_np[:, :, pad:], ref_np[:, :, pad:],
                               atol=2e-3, rtol=2e-2)

    g = jnp.asarray(
        np.random.default_rng(6).normal(size=(B, H, S, D)) * 0.1,
        jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_mask=kv_mask,
                                       causal=True, interpret=True) * g)

    def loss_ring(q, k, v):
        return jnp.sum(f(q, k, v, kv_mask) * g)

    r_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    r_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(r_ring, r_ref, "qkv"):
        a_np, b_np = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.isfinite(a_np).all(), f"d{name} has non-finite entries"
        np.testing.assert_allclose(a_np, b_np, atol=5e-3, rtol=5e-2,
                                   err_msg=f"d{name}")


def test_ring_gqa_forward():
    rng = np.random.default_rng(3)
    Hkv = 1
    q = jnp.asarray(rng.normal(size=(B, H, S, D)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)) * 0.3, jnp.float32)
    ref = flash_attention(q, k, v, causal=True, interpret=True)
    out = _ring_fn(True)(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-3, rtol=2e-2)
