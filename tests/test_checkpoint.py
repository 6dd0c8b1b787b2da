import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimeditron_tpu.models.hf_export import (
    export_multimodal,
    import_multimodal,
    llama_state_dict,
)
from multimeditron_tpu.models.multimodal import MultimodalModel
from tests.test_multimodal import tiny_mm_config


@pytest.fixture(scope="module")
def model_params():
    cfg = tiny_mm_config()
    model = MultimodalModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_hf_export_roundtrip(tmp_path, model_params):
    model, params = model_params
    out = str(tmp_path / "export")
    export_multimodal(model, params, out, dtype=jnp.float32)
    assert os.path.exists(os.path.join(out, "model.safetensors"))
    cfg_d = json.load(open(os.path.join(out, "config.json")))
    assert cfg_d["model_type"] == "multimodal"
    assert cfg_d["modalities"][0]["model_type"] == "meditron_clip"

    model2, params2 = import_multimodal(out)
    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(params2)[0]
    assert len(flat1) == len(flat2)
    d2 = dict(flat2)
    for path, leaf in flat1:
        np.testing.assert_allclose(
            np.asarray(leaf, np.float32), np.asarray(d2[path], np.float32),
            atol=1e-6, err_msg=str(path),
        )


def test_exported_llm_loads_into_hf_llama(model_params):
    """The exported LLM subtree must be loadable by HF LlamaForCausalLM and
    reproduce our logits — checkpoint fidelity both directions."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    model, params = model_params
    cfg = model.config.llm
    sd = llama_state_dict(params["llm"], cfg, prefix="")
    torch_sd = {
        k: torch.tensor(np.asarray(v, np.float32)) for k, v in sd.items()
    }
    hf_cfg = HFLlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_norm_eps,
        tie_word_embeddings=cfg.tie_word_embeddings,
    )
    hf_model = LlamaForCausalLM(hf_cfg).eval()
    missing, unexpected = hf_model.load_state_dict(torch_sd, strict=False)
    assert not unexpected, unexpected
    # rotary inv_freq buffers may be "missing" — they're recomputed
    assert all("rotary" in m or "inv_freq" in m for m in missing), missing

    ids = np.array([[1, 5, 9, 20, 33, 2, 7, 11]])
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    from multimeditron_tpu.models.llama import llama_forward

    ours, _ = llama_forward(params["llm"], cfg, input_ids=jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)


def test_orbax_save_restore(tmp_path, model_params):
    from multimeditron_tpu.train.checkpoint import Checkpointer

    model, params = model_params
    ckpt = Checkpointer(str(tmp_path / "orbax"))
    ckpt.save(5, params)
    assert ckpt.latest_step() == 5
    restored = ckpt.restore(templates={"params": params})
    r = restored["params"]
    np.testing.assert_array_equal(
        np.asarray(r["llm"]["embed_tokens"]), np.asarray(params["llm"]["embed_tokens"])
    )
    ckpt.close()


# ----------------------------------------------------------------------
# Hub-aware checkpoint resolution (reference from_pretrained pulls from
# the HF hub, model/model.py:253)
# ----------------------------------------------------------------------
def test_resolve_checkpoint_local_dir(tmp_path):
    from multimeditron_tpu.models.hf_import import resolve_checkpoint

    assert resolve_checkpoint(str(tmp_path)) == str(tmp_path)


def test_resolve_checkpoint_bad_path_raises():
    import pytest

    from multimeditron_tpu.models.hf_import import resolve_checkpoint

    with pytest.raises(FileNotFoundError, match="does not exist"):
        resolve_checkpoint("/no/such/dir/at/all")


def test_resolve_checkpoint_hub_id_uses_cache(monkeypatch, tmp_path):
    """A hub id resolves through snapshot_download, cache-first."""
    import huggingface_hub

    calls = []

    def fake_snapshot_download(repo_id, local_files_only=False, **kw):
        calls.append(local_files_only)
        if local_files_only:
            return str(tmp_path)  # simulated cache hit
        raise AssertionError("network path must not be reached on cache hit")

    monkeypatch.setattr(huggingface_hub, "snapshot_download",
                        fake_snapshot_download)
    from multimeditron_tpu.models.hf_import import resolve_checkpoint

    assert resolve_checkpoint("openai/clip-vit-large-patch14") == str(tmp_path)
    assert calls == [True]


def test_resolve_checkpoint_hub_id_offline_error(monkeypatch):
    import huggingface_hub
    import pytest

    def fail(*a, **kw):
        raise OSError("offline")

    monkeypatch.setattr(huggingface_hub, "snapshot_download", fail)
    from multimeditron_tpu.models.hf_import import resolve_checkpoint

    with pytest.raises(FileNotFoundError, match="could not be downloaded"):
        resolve_checkpoint("org/this-model-does-not-exist")
