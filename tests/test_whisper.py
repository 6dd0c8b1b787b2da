import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimeditron_tpu.models.whisper import (
    WhisperConfig,
    init_whisper_encoder,
    log_mel_spectrogram,
    whisper_encode,
    whisper_params_from_state_dict,
)

TINY = WhisperConfig(
    num_mel_bins=80, hidden_size=32, num_layers=2, num_heads=4,
    intermediate_size=64, max_source_positions=1500,
)


def test_log_mel_matches_hf_feature_extractor():
    transformers = pytest.importorskip("transformers")
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor()
    rng = np.random.default_rng(0)
    audio = rng.normal(size=16000 * 3).astype(np.float32) * 0.1
    ref = fe(audio, sampling_rate=16000, return_tensors="np")["input_features"][0]
    ours = log_mel_spectrogram(audio)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


def test_encoder_shapes():
    params = init_whisper_encoder(jax.random.PRNGKey(0), TINY)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 80, 3000))
    out = whisper_encode(params, TINY, feats)
    assert out.shape == (2, 1500, 32)
    assert bool(jnp.isfinite(out).all())


def test_hf_whisper_encoder_parity():
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperModel

    hf_cfg = HFWhisperConfig(
        num_mel_bins=80,
        d_model=32,
        encoder_layers=2,
        encoder_attention_heads=4,
        encoder_ffn_dim=64,
        decoder_layers=1,
        decoder_attention_heads=4,
        decoder_ffn_dim=64,
        max_source_positions=1500,
    )
    torch.manual_seed(0)
    hf = WhisperModel(hf_cfg).eval()

    cfg = WhisperConfig.from_hf_dict(hf_cfg.to_dict())
    params = whisper_params_from_state_dict(hf.state_dict(), cfg, prefix="encoder.")

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(1, 80, 3000)).astype(np.float32)
    with torch.no_grad():
        ref = hf.encoder(torch.tensor(feats)).last_hidden_state.numpy()
    ours = whisper_encode(params, cfg, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4, rtol=5e-4)


def test_audio_modality_mixed_batch():
    """Audio + image attachments interleaved in one conversation
    (BASELINE config #4)."""
    from multimeditron_tpu.data.chat_template import ChatTemplate
    from multimeditron_tpu.data.collator import DataCollatorForMultimodal
    from multimeditron_tpu.modalities.audio_whisper import WhisperAudioConfig
    from multimeditron_tpu.models.multimodal import MultimodalConfig, MultimodalModel
    from tests.test_multimodal import ATTACH, _img, tiny_image_config
    from tests.fixtures.toy_tokenizer import ToyTokenizer
    from multimeditron_tpu.data.loaders import AutoModalityLoader, BaseModalityLoader

    class PassthroughAudioLoader(BaseModalityLoader):
        def load(self, modality):
            return modality["value"]

    audio_cfg = WhisperAudioConfig(
        model_type="whisper_audio",
        hidden_size=64,
        downsample=150,  # 1500 -> 10 tokens, test-friendly
        audio_hidden_size=32,
        audio_layers=1,
        audio_heads=4,
        audio_intermediate_size=64,
        param_dtype="float32",
    )
    from multimeditron_tpu.models.llama import LlamaConfig

    llm = LlamaConfig(vocab_size=4096, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, dtype=jnp.float32)
    model = MultimodalModel(
        MultimodalConfig(llm=llm, modalities=[tiny_image_config(), audio_cfg])
    )
    params = model.init_params(jax.random.PRNGKey(0))

    collator = DataCollatorForMultimodal(
        tokenizer=ToyTokenizer(),
        modality_processors=model.processors(),
        modality_loaders={
            "image": AutoModalityLoader.create("raw-image"),
            "audio": PassthroughAudioLoader(),
        },
        attachment_token=ATTACH,
        chat_template=ChatTemplate.llama(),
        pad_to_multiple=16,
    )
    audio = np.sin(np.linspace(0, 400, 16000)).astype(np.float32)
    sample = {
        "conversations": [
            {"role": "user",
             "content": f"image {ATTACH} and audio {ATTACH} together"},
            {"role": "assistant", "content": "both received"},
        ],
        "modalities": [
            {"type": "image", "value": _img((5, 5, 200))},
            {"type": "audio", "value": audio},
        ],
    }
    batch = collator([sample])
    assert set(batch["mm_inputs"]) == {"image", "audio"}
    assert batch["mm_inputs"]["audio"]["values"].shape == (1, 80, 3000)
    logits, loss = model.forward(params, jax.tree.map(jnp.asarray, batch))
    assert bool(jnp.isfinite(loss))
