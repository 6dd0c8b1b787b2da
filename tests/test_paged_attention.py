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


# ----------------------------------------------------------------------
# Ring decode attention (paged prompt KV + in-chunk ring) + fold.
# ----------------------------------------------------------------------
from multimeditron_tpu.ops.paged_attention import (  # noqa: E402
    fold_ring_into_pages,
    fold_ring_into_pages_pallas,
    ring_decode_attention_pallas,
    ring_decode_attention_xla,
)


def _random_ring(key, B, H, Hkv, D, P, pm, pages_len, gen, T=8,
                 n_layers=2, dtype=jnp.float32):
    """Pool + ring where slot b has ``pages_len[b]`` tokens in pages and
    ``gen[b]`` in-chunk ring tokens (the query attends over
    pages_len+gen+1 keys: ring row ``gen`` holds this step's token)."""
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (B, H, D), dtype)
    n_pages = 1 + B * pm
    kp = jax.random.normal(ks[1], (n_layers, Hkv, n_pages, P, D), dtype)
    vp = jax.random.normal(ks[2], (n_layers, Hkv, n_pages, P, D), dtype)
    rk = jax.random.normal(ks[3], (n_layers, B, Hkv, T, D), dtype)
    rv = jax.random.normal(jax.random.fold_in(key, 9),
                           (n_layers, B, Hkv, T, D), dtype)
    rng = np.random.default_rng(3)
    ids = rng.permutation(np.arange(1, n_pages))
    table = np.zeros((B, pm), np.int32)
    pos = 0
    for b in range(B):
        used = -(-int(pages_len[b]) // P) if pages_len[b] else 0
        table[b, :used] = ids[pos:pos + used]
        pos += used
    lengths = np.asarray(pages_len) + np.asarray(gen)
    return (q, kp, vp, rk, rv, jnp.asarray(table),
            jnp.asarray(pages_len, jnp.int32), jnp.asarray(lengths, jnp.int32))


def _ring_dense_reference(q, kp, vp, rk, rv, table, plen, lens, li):
    """Dense reference: gather pages + ring into one masked attention."""
    B, H, D = q.shape
    Hkv, _, P, _ = kp[li].shape
    pm = table.shape[1]
    T = rk.shape[3]
    k = jnp.take(kp[li], table, axis=1).transpose(1, 0, 2, 3, 4)
    v = jnp.take(vp[li], table, axis=1).transpose(1, 0, 2, 3, 4)
    k = jnp.concatenate([k.reshape(B, Hkv, pm * P, D), rk[li]], axis=2)
    v = jnp.concatenate([v.reshape(B, Hkv, pm * P, D), rv[li]], axis=2)
    page_mask = jnp.arange(pm * P)[None, :] < plen[:, None]
    ring_mask = jnp.arange(T)[None, :] <= (lens - plen)[:, None]
    kv_mask = jnp.concatenate([page_mask, ring_mask], axis=1)
    out = attention_xla(q[:, :, None, :], k, v, kv_mask=kv_mask, causal=False)
    return out[:, :, 0, :]


@pytest.mark.parametrize("pages_len,gen", [
    ([0, 5, 127, 256], [0, 3, 7, 1]),
    ([0, 0, 0, 0], [0, 0, 0, 0]),     # first decode step everywhere
])
@pytest.mark.parametrize("group", [1, 2])
def test_ring_xla_matches_dense(pages_len, gen, group):
    Hkv, D, P, pm = 2, 64, 128, 3
    H = Hkv * group
    q, kp, vp, rk, rv, table, plen, lens = _random_ring(
        jax.random.PRNGKey(0), len(pages_len), H, Hkv, D, P, pm,
        pages_len, gen)
    li = jnp.int32(1)
    got = ring_decode_attention_xla(q, kp, vp, rk, rv, table, plen, lens, li)
    want = _ring_dense_reference(q, kp, vp, rk, rv, table, plen, lens, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("pages_len,gen", [
    ([0, 5, 127, 256], [0, 3, 7, 1]),
    ([512, 1, 0, 300], [2, 0, 5, 6]),
])
@pytest.mark.parametrize("group,D", [(2, 128), (1, 64), (4, 128)])
def test_ring_pallas_interpret_matches_xla(pages_len, gen, group, D):
    Hkv, P, pm = 2, 128, 4
    H = Hkv * group
    q, kp, vp, rk, rv, table, plen, lens = _random_ring(
        jax.random.PRNGKey(1), len(pages_len), H, Hkv, D, P, pm,
        pages_len, gen)
    li = jnp.int32(0)
    got = ring_decode_attention_pallas(
        q, kp, vp, rk, rv, table, plen, lens, li, interpret=True)
    want = ring_decode_attention_xla(q, kp, vp, rk, rv, table, plen, lens, li)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("pages_group", [1, 2])
def test_ring_pallas_streamed_groups_match_xla(pages_group):
    """Multi-group streaming (pages_group < pm) must agree with the
    single-pass result: the online-softmax accumulator across page
    groups is exercised, including groups that are skipped (slot with
    plen=0) and partially used."""
    Hkv, P, pm, group, D = 2, 128, 4, 2, 128
    H = Hkv * group
    pages_len, gen = [0, 5, 127, 400], [0, 3, 7, 1]
    q, kp, vp, rk, rv, table, plen, lens = _random_ring(
        jax.random.PRNGKey(2), len(pages_len), H, Hkv, D, P, pm,
        pages_len, gen)
    li = jnp.int32(1)
    got = ring_decode_attention_pallas(
        q, kp, vp, rk, rv, table, plen, lens, li, interpret=True,
        pages_group=pages_group)
    want = ring_decode_attention_xla(q, kp, vp, rk, rv, table, plen, lens, li)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_fold_ring_into_pages_roundtrip():
    """Ring rows land at pages_len + r of each slot; a follow-up paged
    read (gather) sees exactly the ring contents."""
    B, Hkv, D, P, pm, T, L = 3, 2, 16, 32, 4, 8, 2
    pages_len = jnp.asarray([0, 33, 64], jnp.int32)
    key = jax.random.PRNGKey(5)
    kp = jnp.zeros((L, Hkv, 1 + B * pm, P, D))
    vp = jnp.zeros_like(kp)
    rk = jax.random.normal(key, (L, B, Hkv, T, D))
    rv = jax.random.normal(jax.random.fold_in(key, 1), (L, B, Hkv, T, D))
    table = np.zeros((B, pm), np.int32)
    nxt = 1
    for b in range(B):
        need = -(-(int(pages_len[b]) + T) // P)
        table[b, :need] = range(nxt, nxt + need)
        nxt += need
    table = jnp.asarray(table)
    rows = 5
    kp2, vp2 = fold_ring_into_pages(kp, vp, rk, rv, table, pages_len, rows)
    for b in range(B):
        for r in range(rows):
            p = int(pages_len[b]) + r
            pid = int(table[b, p // P])
            np.testing.assert_allclose(
                np.asarray(kp2[:, :, pid, p % P, :]),
                np.asarray(rk[:, b, :, r, :]), rtol=1e-6)
            np.testing.assert_allclose(
                np.asarray(vp2[:, :, pid, p % P, :]),
                np.asarray(rv[:, b, :, r, :]), rtol=1e-6)
    # rows >= ``rows`` not folded
    p = int(pages_len[0]) + rows
    pid = int(table[0, p // P])
    assert np.all(np.asarray(kp2[:, :, pid, p % P, :]) == 0)


def test_fold_pallas_matches_xla():
    """Page-RMW Pallas fold == XLA scatter fold, including: page-boundary
    crossings, a mid-chunk-deactivated slot (lengths < pages_len + rows),
    an inactive slot (lengths == pages_len), and untouched pages
    preserved. D=128 per the kernel's lane constraint."""
    B, Hkv, D, P, pm, T, L = 4, 2, 128, 128, 4, 8, 2
    pages_len = jnp.asarray([0, 5, 250, 384], jnp.int32)
    gen = jnp.asarray([8, 3, 8, 0], jnp.int32)  # slot 2 crosses a page
    lengths = pages_len + gen
    key = jax.random.PRNGKey(7)
    kp = jax.random.normal(key, (L, Hkv, 1 + B * pm, P, D), jnp.float32)
    vp = jax.random.normal(jax.random.fold_in(key, 1), kp.shape, jnp.float32)
    rk = jax.random.normal(jax.random.fold_in(key, 2), (L, B, Hkv, T, D))
    rv = jax.random.normal(jax.random.fold_in(key, 3), (L, B, Hkv, T, D))
    table = np.zeros((B, pm), np.int32)
    ids = np.random.default_rng(0).permutation(np.arange(1, 1 + B * pm))
    for b in range(B):
        table[b] = ids[b * pm:(b + 1) * pm]
    table = jnp.asarray(table)

    want_k, want_v = fold_ring_into_pages(
        kp, vp, rk, rv, table, pages_len, T, lengths=lengths, impl="xla")
    got_k, got_v = fold_ring_into_pages_pallas(
        kp, vp, rk, rv, table, pages_len, T, lengths, interpret=True)
    # the XLA fold writes dropped rows to the trash page; the pallas fold
    # skips them — compare everything EXCEPT page 0
    np.testing.assert_allclose(np.asarray(got_k)[:, :, 1:],
                               np.asarray(want_k)[:, :, 1:], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_v)[:, :, 1:],
                               np.asarray(want_v)[:, :, 1:], rtol=1e-6)


# ----------------------------------------------------------------------
# Speculative verify block (multi-query)
# ----------------------------------------------------------------------
from multimeditron_tpu.ops.paged_attention import (  # noqa: E402
    ring_verify_attention_pallas,
    ring_verify_attention_xla,
)


def _verify_setup(key, B, H, Hkv, D, P, pm, pages_len, S, T=16):
    """Verify-contract state: pages_len == lengths (the engine folds the
    ring before every verify), the S block rows live at ring rows
    [0, S)."""
    gen = [0] * B
    q1, kp, vp, rk, rv, table, plen, lens = _random_ring(
        key, B, H, Hkv, D, P, pm, pages_len, gen, T=T)
    q = jax.random.normal(jax.random.fold_in(key, 77), (B, H, S, D),
                          q1.dtype)
    return q, kp, vp, rk, rv, table, plen, lens


def _verify_dense_reference(q, kp, vp, rk, rv, table, plen, lens, li):
    """Per-query dense reference: query i attends pages (< plen) and
    ring rows j <= (lens - plen) + i."""
    B, H, S, D = q.shape
    outs = []
    for i in range(S):
        Hkv, _, P, _ = kp[li].shape
        pm = table.shape[1]
        T = rk.shape[3]
        k = jnp.take(kp[li], table, axis=1).transpose(1, 0, 2, 3, 4)
        v = jnp.take(vp[li], table, axis=1).transpose(1, 0, 2, 3, 4)
        k = jnp.concatenate([k.reshape(B, Hkv, pm * P, D), rk[li]], axis=2)
        v = jnp.concatenate([v.reshape(B, Hkv, pm * P, D), rv[li]], axis=2)
        page_mask = jnp.arange(pm * P)[None, :] < plen[:, None]
        ring_mask = jnp.arange(T)[None, :] <= (lens - plen)[:, None] + i
        kv_mask = jnp.concatenate([page_mask, ring_mask], axis=1)
        out = attention_xla(q[:, :, i:i + 1, :], k, v, kv_mask=kv_mask,
                            causal=False)
        outs.append(out)
    return jnp.concatenate(outs, axis=2)


@pytest.mark.parametrize("pages_len", [[0, 5, 127, 256], [384, 1, 0, 300]])
@pytest.mark.parametrize("group,S", [(2, 5), (4, 3), (1, 4)])
def test_verify_xla_matches_dense(pages_len, group, S):
    Hkv, D, P, pm = 2, 64, 128, 3
    H = Hkv * group
    q, kp, vp, rk, rv, table, plen, lens = _verify_setup(
        jax.random.PRNGKey(2), len(pages_len), H, Hkv, D, P, pm,
        pages_len, S)
    li = jnp.int32(1)
    got = ring_verify_attention_xla(q, kp, vp, rk, rv, table, plen, lens,
                                    li)
    want = _verify_dense_reference(q, kp, vp, rk, rv, table, plen, lens, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("pages_len", [[0, 5, 127, 256], [512, 1, 0, 300]])
@pytest.mark.parametrize("group,S,D", [(2, 5, 128), (4, 3, 128)])
def test_verify_pallas_interpret_matches_xla(pages_len, group, S, D):
    Hkv, P, pm = 2, 128, 4
    H = Hkv * group
    q, kp, vp, rk, rv, table, plen, lens = _verify_setup(
        jax.random.PRNGKey(3), len(pages_len), H, Hkv, D, P, pm,
        pages_len, S)
    li = jnp.int32(0)
    got = ring_verify_attention_pallas(
        q, kp, vp, rk, rv, table, plen, lens, li, interpret=True)
    want = ring_verify_attention_xla(q, kp, vp, rk, rv, table, plen, lens,
                                     li)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_verify_pallas_streamed_groups(capsys):
    """pages_group < pm exercises the cross-group online softmax with
    multi-row blocks."""
    Hkv, P, pm, group, S, D = 2, 128, 4, 2, 4, 128
    H = Hkv * group
    pages_len = [512, 130, 0, 256]
    q, kp, vp, rk, rv, table, plen, lens = _verify_setup(
        jax.random.PRNGKey(4), len(pages_len), H, Hkv, D, P, pm,
        pages_len, S)
    li = jnp.int32(1)
    got = ring_verify_attention_pallas(
        q, kp, vp, rk, rv, table, plen, lens, li, interpret=True,
        pages_group=2)
    want = ring_verify_attention_xla(q, kp, vp, rk, rv, table, plen, lens,
                                     li)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
