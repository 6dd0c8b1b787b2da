"""Parity tests for the fused encoder-attention kernel (ops/encoder_attention.py).

The kernel is validated in Pallas interpret mode on CPU against both the
layout-preserving XLA twin and the repo-wide `attention_xla` reference
(head-split layout), so the model-layout contract (B, S, H*Dh) is checked
end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimeditron_tpu.ops.attention import attention_xla
from multimeditron_tpu.ops.encoder_attention import (
    _encoder_attention_xla,
    encoder_attention,
)


def _make(B, S, H, Dh, seed=0):
    rng = np.random.default_rng(seed)
    D = H * Dh
    q = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("B,S,H,Dh", [(2, 17, 4, 8), (1, 65, 2, 16)])
def test_interpret_matches_xla_reference(B, S, H, Dh):
    q, k, v = _make(B, S, H, Dh)
    out = encoder_attention(q, k, v, H, interpret=True)

    def split(x):
        return x.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)

    ref = attention_xla(split(q), split(k), split(v), causal=False)
    ref = ref.transpose(0, 2, 1, 3).reshape(B, S, H * Dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_cpu_fallback_matches_reference():
    q, k, v = _make(2, 33, 4, 8, seed=1)
    out = encoder_attention(q, k, v, 4)  # CPU -> XLA fallback
    ref = _encoder_attention_xla(q, k, v, 4, 8 ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_jit_and_grad_compile():
    q, k, v = _make(1, 9, 2, 4, seed=2)

    @jax.jit
    def f(q, k, v):
        return encoder_attention(q, k, v, 2).sum()

    g = jax.grad(f)(q, k, v)
    assert g.shape == q.shape and np.isfinite(np.asarray(g)).all()


def test_grad_through_pallas_forward_matches_xla():
    """custom_vjp: Pallas (interpret) forward, XLA-recompute backward —
    the path END2END training takes through a vision tower on TPU."""
    q, k, v = _make(2, 16, 2, 8, seed=3)

    def f_pallas(q, k, v):
        return (encoder_attention(q, k, v, 2, interpret=True) ** 2).sum()

    def f_xla(q, k, v):
        return (_encoder_attention_xla(q, k, v, 2, 8 ** -0.5) ** 2).sum()

    g_p = jax.grad(f_pallas, argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
