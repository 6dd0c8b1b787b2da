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


# ----------------------------------------------------------------------
# Zigzag layout
# ----------------------------------------------------------------------
SZ = 1024  # per-device L = 256 -> chunk C = 128 (zigzag-eligible)


def _zig_fn(kv_mask=False, zigzag=None):
    specs = (P(None, None, "sp", None),) * 3
    in_specs = specs + ((P(None, "sp"),) if kv_mask else ())

    @functools.partial(
        jax.shard_map, mesh=_mesh(), in_specs=in_specs,
        out_specs=P(None, None, "sp", None), check_vma=False,
    )
    def f(q, k, v, *m):
        return ring_attention(q, k, v, axis_name="sp", causal=True,
                              kv_mask=(m[0] if m else None),
                              interpret=True, zigzag=zigzag)
    return f


def _zinputs(seed=0, Hkv=None):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, SZ, D)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv or H, SZ, D)) * 0.3,
                    jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv or H, SZ, D)) * 0.3,
                    jnp.float32)
    return q, k, v


def test_zigzag_matches_flash_forward():
    q, k, v = _zinputs(10)
    ref = flash_attention(q, k, v, causal=True, interpret=True)
    out = _zig_fn(zigzag=True)(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-3, rtol=2e-2)


def test_zigzag_auto_selected_and_halves_kernel_flops():
    """zigzag=None auto-picks the balanced layout for even causal rings;
    kernel-call accounting shows the ~2x FLOP reduction vs the plain
    ring (the gated-future-shard waste reclaimed)."""
    import multimeditron_tpu.ops.flash_attention as fa
    import multimeditron_tpu.ops.ring_attention as ra

    q, k, v = _zinputs(11)
    calls = []
    real = ra._fwd

    def spy(q_, k_, *a, **kw):
        calls.append(q_.shape[2] * k_.shape[2])  # per-pair score area
        return real(q_, k_, *a, **kw)

    ra._fwd = spy
    try:
        out_auto = _zig_fn()(q, k, v)          # auto -> zigzag
        zig_area = sum(calls)
        calls.clear()
        out_plain = _zig_fn(zigzag=False)(q, k, v)
        plain_area = sum(calls)
    finally:
        ra._fwd = real
    # Trace-level accounting (scan bodies trace once; lax.cond traces
    # BOTH branches but executes exactly one): zigzag traces 3 chunk
    # pairs at step 0 + (1 unconditional + 2 cond branches) per scanned
    # step = 6 C^2; at RUNTIME each scanned step executes 2 C^2, so the
    # per-device executed score area is (3 + 2(n-1)) C^2 = 9 C^2 at
    # n=4 versus the plain ring's n * 4 C^2 = 16 C^2 — the reclaimed
    # gated-future-shard FLOPs (ratio -> 2x as n grows).
    n = NDEV
    C2 = (SZ // n // 2) ** 2
    assert zig_area == (3 + 1 + 2) * C2, zig_area
    assert plain_area == 2 * 4 * C2, plain_area   # step0 + scanned step
    zig_executed = (3 + 2 * (n - 1)) * C2
    plain_executed = n * 4 * C2
    assert plain_executed / zig_executed > 1.7
    ref = flash_attention(q, k, v, causal=True, interpret=True)
    for o in (out_auto, out_plain):
        np.testing.assert_allclose(
            np.asarray(o, np.float32), np.asarray(ref, np.float32),
            atol=2e-3, rtol=2e-2)


def test_zigzag_matches_flash_grads():
    q, k, v = _zinputs(12)
    g = jnp.asarray(
        np.random.default_rng(13).normal(size=(B, H, SZ, D)) * 0.1,
        jnp.float32)
    zig = _zig_fn(zigzag=True)

    def loss_ref(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True,
                                       interpret=True) * g)

    def loss_zig(q, k, v):
        return jnp.sum(zig(q, k, v) * g)

    r_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    r_zig = jax.grad(loss_zig, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(r_zig, r_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=5e-3, rtol=5e-2, err_msg=f"d{name}")


def test_zigzag_gqa_forward():
    q, k, v = _zinputs(14, Hkv=1)
    ref = flash_attention(q, k, v, causal=True, interpret=True)
    out = _zig_fn(zigzag=True)(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-3, rtol=2e-2)


def test_zigzag_left_padded_forward_and_grads():
    q, k, v = _zinputs(15)
    pad = 320
    kv_mask = (jnp.arange(SZ)[None, :] >= pad).astype(jnp.int32)
    kv_mask = jnp.broadcast_to(kv_mask, (B, SZ))
    ref = flash_attention(q, k, v, kv_mask=kv_mask, causal=True,
                          interpret=True)
    f = _zig_fn(kv_mask=True, zigzag=True)
    out = f(q, k, v, kv_mask)
    out_np = np.asarray(out, np.float32)
    np.testing.assert_array_equal(out_np[:, :, :pad], 0.0)
    np.testing.assert_allclose(out_np[:, :, pad:],
                               np.asarray(ref, np.float32)[:, :, pad:],
                               atol=2e-3, rtol=2e-2)
    g = jnp.asarray(
        np.random.default_rng(16).normal(size=(B, H, SZ, D)) * 0.1,
        jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_mask=kv_mask,
                                       causal=True, interpret=True) * g)

    def loss_zig(q, k, v):
        return jnp.sum(f(q, k, v, kv_mask) * g)

    r_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    r_zig = jax.grad(loss_zig, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(r_zig, r_ref, "qkv"):
        a_np = np.asarray(a, np.float32)
        assert np.isfinite(a_np).all(), f"d{name} non-finite"
        np.testing.assert_allclose(a_np, np.asarray(b, np.float32),
                                   atol=5e-3, rtol=5e-2,
                                   err_msg=f"d{name}")
