"""Paged attention: XLA fallback vs dense ground truth, Pallas interpret
vs XLA fallback, edge cases (empty slots, single token, full pages)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimeditron_tpu.ops.attention import attention_xla
from multimeditron_tpu.ops.paged_attention import (
    paged_attention_pallas,
    paged_attention_xla,
)


def _random_paged(key, B, H, Hkv, D, P, pm, lengths, dtype=jnp.float32):
    """Build a pool + table where slot b's tokens live in shuffled pages."""
    n_pages = 1 + B * pm  # page 0 = trash
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (B, H, D), dtype)
    k_pages = jax.random.normal(k2, (Hkv, n_pages, P, D), dtype)
    v_pages = jax.random.normal(k3, (Hkv, n_pages, P, D), dtype)
    rng = np.random.default_rng(0)
    ids = rng.permutation(np.arange(1, n_pages))
    table = np.zeros((B, pm), np.int32)
    pos = 0
    for b in range(B):
        used = -(-int(lengths[b]) // P) if lengths[b] else 0
        table[b, :used] = ids[pos : pos + used]
        pos += used
    return q, k_pages, v_pages, jnp.asarray(table), jnp.asarray(lengths, jnp.int32)


def _dense_reference(q, k_pages, v_pages, table, lengths):
    """Gather each slot's KV contiguously and run the dense reference."""
    B, H, D = q.shape
    Hkv, _, P, _ = k_pages.shape
    pm = table.shape[1]
    k = jnp.take(k_pages, table, axis=1).transpose(1, 0, 2, 3, 4)
    v = jnp.take(v_pages, table, axis=1).transpose(1, 0, 2, 3, 4)
    k = k.reshape(B, Hkv, pm * P, D)
    v = v.reshape(B, Hkv, pm * P, D)
    kv_mask = jnp.arange(pm * P)[None, :] < lengths[:, None]
    out = attention_xla(q[:, :, None, :], k, v, kv_mask=kv_mask, causal=False)
    return out[:, :, 0, :]


@pytest.mark.parametrize("lengths", [[7, 129, 0, 256], [1, 1, 1, 1]])
@pytest.mark.parametrize("group", [1, 4])
def test_xla_paged_matches_dense(lengths, group):
    Hkv, D, P, pm = 2, 64, 128, 2
    H = Hkv * group
    q, kp, vp, table, lens = _random_paged(
        jax.random.PRNGKey(0), len(lengths), H, Hkv, D, P, pm, lengths
    )
    got = paged_attention_xla(q, kp, vp, table, lens)
    want = _dense_reference(q, kp, vp, table, lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # inactive slots return zeros
    for b, L in enumerate(lengths):
        if L == 0:
            assert np.all(np.asarray(got)[b] == 0)


@pytest.mark.parametrize("lengths", [[5, 128, 0, 200]])
@pytest.mark.parametrize("group,D", [(1, 64), (4, 64), (2, 128), (3, 80)])
def test_pallas_interpret_matches_xla(lengths, group, D):
    Hkv, P, pm = 2, 128, 2
    H = Hkv * group
    q, kp, vp, table, lens = _random_paged(
        jax.random.PRNGKey(1), len(lengths), H, Hkv, D, P, pm, lengths
    )
    got = paged_attention_pallas(q, kp, vp, table, lens, interpret=True)
    want = paged_attention_xla(q, kp, vp, table, lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_pallas_interpret_bf16():
    Hkv, D, P, pm = 2, 64, 64, 4
    lengths = [66, 3, 250, 0]
    q, kp, vp, table, lens = _random_paged(
        jax.random.PRNGKey(2), 4, 4, Hkv, D, P, pm, lengths, dtype=jnp.bfloat16
    )
    got = paged_attention_pallas(q, kp, vp, table, lens, interpret=True)
    want = paged_attention_xla(q, kp, vp, table, lens)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=3e-2,
    )
