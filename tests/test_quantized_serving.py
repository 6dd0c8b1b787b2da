import jax
import jax.numpy as jnp
import numpy as np

from multimeditron_tpu.models.multimodal import MultimodalModel
from tests.test_multimodal import tiny_mm_config


def test_quantized_modality_encode_in_forward():
    """int8-quantized image tower drops into the multimodal forward."""
    model = MultimodalModel(tiny_mm_config())
    params = model.init_params(jax.random.PRNGKey(0))
    mod = model.modalities["image"]

    values = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    ref = np.asarray(mod.encode(params["modalities"]["image"], values), np.float32)

    qmod = mod.quantize_params(
        params["modalities"]["image"], calibration_values=values
    )
    got = np.asarray(mod.encode(qmod, values), np.float32)
    assert got.shape == ref.shape
    a, b = ref.reshape(-1, ref.shape[-1]), got.reshape(-1, got.shape[-1])
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-8
    )
    assert cos.mean() > 0.99, cos.mean()

    # full multimodal forward with the quantized tower
    params_q = {
        "llm": params["llm"],
        "modalities": {"image": qmod},
    }
    B, S = 2, 32
    n_emb = mod.num_embeddings
    batch = {
        "input_ids": jnp.zeros((B, S), jnp.int32),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.zeros((B, S), jnp.int32),
        "mm_inputs": {
            "image": {
                "values": values,
                "batch_idx": jnp.repeat(jnp.arange(2), n_emb).astype(jnp.int32),
                "token_pos": jnp.tile(jnp.arange(4, 4 + n_emb), 2).astype(jnp.int32),
            }
        },
    }
    logits, loss = model.forward(params_q, batch)
    assert bool(jnp.isfinite(loss))
