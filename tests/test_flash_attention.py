import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimeditron_tpu.ops.attention import attention_xla
from multimeditron_tpu.ops.flash_attention import flash_attention


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=jnp.float32).astype(dtype)


def _make_qkv(B=2, H=4, Hkv=2, Sq=256, Skv=256, D=64, dtype=jnp.float32, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = _rand(k1, (B, H, Sq, D), dtype)
    k = _rand(k2, (B, Hkv, Skv, D), dtype)
    v = _rand(k3, (B, Hkv, Skv, D), dtype)
    return q, k, v


FA = functools.partial(flash_attention, interpret=True)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("gqa", [False, True])
def test_forward_matches_reference(causal, gqa):
    q, k, v = _make_qkv(Hkv=2 if gqa else 4)
    out = FA(q, k, v, causal=causal)
    ref = attention_xla(q, k, v, causal=causal)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_forward_kv_mask():
    q, k, v = _make_qkv()
    B, _, Skv, _ = k.shape
    kv_mask = (jnp.arange(Skv)[None, :] >= 64).astype(jnp.int32)
    kv_mask = jnp.broadcast_to(kv_mask, (B, Skv))  # left-padding style
    out = FA(q, k, v, kv_mask=kv_mask, causal=True)
    ref = attention_xla(q, k, v, kv_mask=kv_mask, causal=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_fully_masked_rows_zero():
    # Left-padded batch where causal+mask leaves early rows with no valid key.
    q, k, v = _make_qkv(B=1, H=2, Hkv=2, Sq=256, Skv=256)
    kv_mask = (jnp.arange(256)[None, :] >= 128).astype(jnp.int32)
    out = FA(q, k, v, kv_mask=kv_mask, causal=True)
    assert bool(jnp.isfinite(out).all())
    np.testing.assert_allclose(out[0, :, :128], 0.0, atol=1e-6)


def test_decode_shape_end_aligned():
    # Sq=8 query block at the END of a Skv=256 context (decode step).
    q, k, v = _make_qkv(Sq=8, Skv=256)
    out = FA(q, k, v, causal=True)
    ref = attention_xla(q, k, v, causal=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_unaligned_seq_lengths_padded():
    q, k, v = _make_qkv(Sq=200, Skv=200)
    out = FA(q, k, v, causal=True)
    ref = attention_xla(q, k, v, causal=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("gqa", [False, True])
def test_grads_match_reference(causal, gqa):
    q, k, v = _make_qkv(B=1, H=4, Hkv=2 if gqa else 4, Sq=256, Skv=256, D=64)

    def loss_fa(q, k, v):
        return jnp.sum(FA(q, k, v, causal=causal) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_xla(q, k, v, causal=causal) ** 2)

    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fa, g_ref, "qkv"):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=5e-4, err_msg=f"d{name}")


def test_grads_with_kv_mask():
    q, k, v = _make_qkv(B=2, H=2, Hkv=2, Sq=256, Skv=256)
    kv_mask = (jnp.arange(256)[None, :] >= 32).astype(jnp.int32)
    kv_mask = jnp.broadcast_to(kv_mask, (2, 256))

    def loss_fa(q, k, v):
        return jnp.sum(FA(q, k, v, kv_mask=kv_mask, causal=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_xla(q, k, v, kv_mask=kv_mask, causal=True) ** 2)

    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fa, g_ref, "qkv"):
        assert bool(jnp.isfinite(a).all()), f"d{name} has non-finite values"
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=5e-4, err_msg=f"d{name}")
    # masked kv positions receive zero grad
    np.testing.assert_allclose(g_fa[1][:, :, :32], 0.0, atol=1e-6)
    np.testing.assert_allclose(g_fa[2][:, :, :32], 0.0, atol=1e-6)


def test_bfloat16_forward():
    q, k, v = _make_qkv(dtype=jnp.bfloat16)
    out = FA(q, k, v, causal=True)
    ref = attention_xla(q, k, v, causal=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        out.astype(np.float32), ref.astype(np.float32), atol=2e-2, rtol=2e-2
    )
