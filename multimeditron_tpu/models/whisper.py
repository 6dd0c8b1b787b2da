"""Functional Whisper audio encoder.

Audio-modality tower for mixed-modality batches (BASELINE.json config #4:
"Whisper audio + image attachments interleaved in one conversation").
Host side computes log-mel features (numpy STFT matching HF's
WhisperFeatureExtractor numerics); the device side is conv1d x2 + a
sinusoidal-position transformer encoder, imported from HF
``WhisperModel.encoder`` state dicts.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from multimeditron_tpu.models.common import layer_norm
from multimeditron_tpu.ops.attention import attention

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    num_mel_bins: int = 80
    hidden_size: int = 384          # whisper-tiny d_model
    num_layers: int = 4
    num_heads: int = 6
    intermediate_size: int = 1536
    max_source_positions: int = 1500
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @staticmethod
    def from_hf_dict(d: dict) -> "WhisperConfig":
        return WhisperConfig(
            num_mel_bins=d["num_mel_bins"],
            hidden_size=d["d_model"],
            num_layers=d["encoder_layers"],
            num_heads=d["encoder_attention_heads"],
            intermediate_size=d["encoder_ffn_dim"],
            max_source_positions=d.get("max_source_positions", 1500),
        )


# ----------------------------------------------------------------------
# Host feature extraction (log-mel spectrogram)
# ----------------------------------------------------------------------
def mel_filterbank(n_mels: int = 80, n_fft: int = 400, sr: int = 16000) -> np.ndarray:
    """Slaney-style mel filterbank matching HF WhisperFeatureExtractor."""
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sr / 2, n_freqs)

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        mels = 3.0 * f / 200.0
        log_region = f >= 1000.0
        mels = np.where(
            log_region, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) * (27.0 / np.log(6.4)), mels
        )
        return mels

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = 200.0 * m / 3.0
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp(np.log(6.4) * (m - 15.0) / 27.0), f)
        return f

    mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fb = np.zeros((n_mels, n_freqs))
    for i in range(n_mels):
        lower = (fft_freqs - hz_pts[i]) / max(hz_pts[i + 1] - hz_pts[i], 1e-10)
        upper = (hz_pts[i + 2] - fft_freqs) / max(hz_pts[i + 2] - hz_pts[i + 1], 1e-10)
        fb[i] = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney normalization
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    fb *= enorm[:, None]
    return fb.astype(np.float32)


def log_mel_spectrogram(
    audio: np.ndarray,
    n_fft: int = 400,
    hop: int = 160,
    n_mels: int = 80,
    target_frames: int = 3000,
) -> np.ndarray:
    """16 kHz mono float audio -> (n_mels, target_frames) log-mel features,
    HF WhisperFeatureExtractor numerics (pad/trim to 30 s, log10, clamp to
    max-8, scale)."""
    target_samples = target_frames * hop
    audio = np.asarray(audio, np.float32)
    if len(audio) < target_samples:
        audio = np.pad(audio, (0, target_samples - len(audio)))
    else:
        audio = audio[:target_samples]

    window = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    frames = np.lib.stride_tricks.sliding_window_view(
        np.pad(audio, (n_fft // 2, n_fft // 2), mode="reflect"), n_fft
    )[::hop]
    stft = np.fft.rfft(frames * window, axis=-1)
    power = np.abs(stft[: target_frames]) ** 2  # drop the trailing frame

    mel = mel_filterbank(n_mels, n_fft) @ power.T
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


# ----------------------------------------------------------------------
# Device encoder
# ----------------------------------------------------------------------
def sinusoidal_positions(length: int, dim: int) -> np.ndarray:
    """Whisper's sinusoid table (half sin, half cos, log-spaced)."""
    log_timescale = np.log(10000.0) / (dim // 2 - 1)
    inv_timescales = np.exp(-log_timescale * np.arange(dim // 2))
    scaled = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def init_whisper_encoder(key: jax.Array, cfg: WhisperConfig) -> Params:
    D, F, L, M = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers, cfg.num_mel_bins
    ks = iter(jax.random.split(key, 8))

    def dense(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) / fan_in ** 0.5).astype(cfg.dtype)

    return {
        "conv1_w": dense(next(ks), (3, M, D), 3 * M),   # (k, in, out)
        "conv1_b": jnp.zeros((D,), cfg.dtype),
        "conv2_w": dense(next(ks), (3, D, D), 3 * D),
        "conv2_b": jnp.zeros((D,), cfg.dtype),
        "layers": {
            "ln1_w": jnp.ones((L, D), cfg.dtype),
            "ln1_b": jnp.zeros((L, D), cfg.dtype),
            "q_proj": dense(next(ks), (L, D, D), D),
            "q_bias": jnp.zeros((L, D), cfg.dtype),
            "k_proj": dense(next(ks), (L, D, D), D),
            "v_proj": dense(next(ks), (L, D, D), D),
            "v_bias": jnp.zeros((L, D), cfg.dtype),
            "o_proj": dense(next(ks), (L, D, D), D),
            "o_bias": jnp.zeros((L, D), cfg.dtype),
            "ln2_w": jnp.ones((L, D), cfg.dtype),
            "ln2_b": jnp.zeros((L, D), cfg.dtype),
            "fc1": dense(next(ks), (L, D, F), D),
            "fc1_bias": jnp.zeros((L, F), cfg.dtype),
            "fc2": dense(next(ks), (L, F, D), F),
            "fc2_bias": jnp.zeros((L, D), cfg.dtype),
        },
        "post_ln_w": jnp.ones((D,), cfg.dtype),
        "post_ln_b": jnp.zeros((D,), cfg.dtype),
    }


def whisper_encode(
    params: Params,
    cfg: WhisperConfig,
    features: jax.Array,  # (B, n_mels, frames)
    attn_impl=None,
) -> jax.Array:
    """(B, n_mels, 3000) log-mel -> (B, 1500, D) encoder states."""
    x = features.astype(cfg.dtype).transpose(0, 2, 1)  # (B, T, M)

    def conv1d(x, w, b, stride):
        out = jax.lax.conv_general_dilated(
            x, w, (stride,), [(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return out + b

    x = jax.nn.gelu(conv1d(x, params["conv1_w"], params["conv1_b"], 1), approximate=False)
    x = jax.nn.gelu(conv1d(x, params["conv2_w"], params["conv2_b"], 2), approximate=False)

    B, S, D = x.shape
    pos = jnp.asarray(sinusoidal_positions(cfg.max_source_positions, D), x.dtype)
    x = x + pos[:S]

    Hn = cfg.num_heads
    Dh = D // Hn

    def layer(x, lp):
        h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        q = (h @ lp["q_proj"] + lp["q_bias"]).reshape(B, S, Hn, Dh).transpose(0, 2, 1, 3)
        k = (h @ lp["k_proj"]).reshape(B, S, Hn, Dh).transpose(0, 2, 1, 3)
        v = (h @ lp["v_proj"] + lp["v_bias"]).reshape(B, S, Hn, Dh).transpose(0, 2, 1, 3)
        o = attention(q, k, v, causal=False, impl=attn_impl)
        o = o.transpose(0, 2, 1, 3).reshape(B, S, D)
        x = x + (o @ lp["o_proj"] + lp["o_bias"])
        h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
        h = jax.nn.gelu((h @ lp["fc1"] + lp["fc1_bias"]).astype(jnp.float32),
                        approximate=False).astype(x.dtype)
        return x + (h @ lp["fc2"] + lp["fc2_bias"]), None

    x, _ = jax.lax.scan(layer, x, params["layers"])
    return layer_norm(x, params["post_ln_w"], params["post_ln_b"], cfg.layer_norm_eps)


def whisper_params_from_state_dict(state, cfg: WhisperConfig, prefix="encoder.", dtype=None) -> Params:
    """HF WhisperModel/WhisperEncoder state dict -> our pytree."""
    from multimeditron_tpu.models.hf_import import _np

    dtype = dtype or cfg.dtype
    g = lambda k: _np(state[prefix + k])
    t = lambda w: np.ascontiguousarray(w.T)
    ident = lambda w: w
    L = cfg.num_layers

    def stack(fmt, transform):
        return jnp.asarray(
            np.stack([transform(g(fmt.format(i))) for i in range(L)]), dtype=dtype
        )

    # torch conv1d weight (out, in, k) -> (k, in, out)
    conv = lambda k: jnp.asarray(g(k).transpose(2, 1, 0), dtype)
    return {
        "conv1_w": conv("conv1.weight"),
        "conv1_b": jnp.asarray(g("conv1.bias"), dtype),
        "conv2_w": conv("conv2.weight"),
        "conv2_b": jnp.asarray(g("conv2.bias"), dtype),
        "layers": {
            "ln1_w": stack("layers.{}.self_attn_layer_norm.weight", ident),
            "ln1_b": stack("layers.{}.self_attn_layer_norm.bias", ident),
            "q_proj": stack("layers.{}.self_attn.q_proj.weight", t),
            "q_bias": stack("layers.{}.self_attn.q_proj.bias", ident),
            "k_proj": stack("layers.{}.self_attn.k_proj.weight", t),
            "v_proj": stack("layers.{}.self_attn.v_proj.weight", t),
            "v_bias": stack("layers.{}.self_attn.v_proj.bias", ident),
            "o_proj": stack("layers.{}.self_attn.out_proj.weight", t),
            "o_bias": stack("layers.{}.self_attn.out_proj.bias", ident),
            "ln2_w": stack("layers.{}.final_layer_norm.weight", ident),
            "ln2_b": stack("layers.{}.final_layer_norm.bias", ident),
            "fc1": stack("layers.{}.fc1.weight", t),
            "fc1_bias": stack("layers.{}.fc1.bias", ident),
            "fc2": stack("layers.{}.fc2.weight", t),
            "fc2_bias": stack("layers.{}.fc2.bias", ident),
        },
        "post_ln_w": jnp.asarray(g("layer_norm.weight"), dtype),
        "post_ln_b": jnp.asarray(g("layer_norm.bias"), dtype),
    }
