import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from multimeditron_tpu.experts.config_maker import Configurations, expand_configurations
from multimeditron_tpu.experts.train_clip import ExpertCLIPTrainer, ExpertTrainConfig
from multimeditron_tpu.models.clip_text import (
    CLIPDualConfig,
    CLIPTextConfig,
    clip_contrastive_loss,
    clip_dual_forward,
    clip_text_forward,
    clip_text_params_from_state_dict,
    init_clip_dual_params,
)
from multimeditron_tpu.models.vit import ViTConfig
from tests.fixtures.toy_tokenizer import ToyTokenizer


def test_clip_text_hf_parity():
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig as HFCLIPTextConfig
    from transformers import CLIPTextModel

    hf_cfg = HFCLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, eos_token_id=98, bos_token_id=97,
    )
    torch.manual_seed(0)
    hf = CLIPTextModel(hf_cfg).eval()
    cfg = CLIPTextConfig.from_hf_dict(hf_cfg.to_dict())
    params = clip_text_params_from_state_dict(hf.state_dict(), cfg)

    ids = np.array([[97, 5, 8, 31, 98, 0, 0, 0]], dtype=np.int64)
    mask = np.array([[1, 1, 1, 1, 1, 0, 0, 0]], dtype=np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask))
    last, pooled = clip_text_forward(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
    )
    valid = mask[0].astype(bool)
    np.testing.assert_allclose(
        np.asarray(last)[0][valid], ref.last_hidden_state.numpy()[0][valid],
        atol=3e-4, rtol=3e-4,
    )
    np.testing.assert_allclose(
        np.asarray(pooled), ref.pooler_output.numpy(), atol=3e-4, rtol=3e-4
    )


def test_clip_dual_hf_parity():
    torch = pytest.importorskip("torch")
    from transformers import CLIPConfig, CLIPModel

    hf_cfg = CLIPConfig.from_text_vision_configs = None  # silence lints
    from transformers import CLIPTextConfig as HFText, CLIPVisionConfig as HFVision

    hf_cfg = CLIPConfig(
        text_config=HFText(
            vocab_size=99, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=16, eos_token_id=98,
        ).to_dict(),
        vision_config=HFVision(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8,
        ).to_dict(),
        projection_dim=24,
    )
    torch.manual_seed(1)
    hf = CLIPModel(hf_cfg).eval()

    from multimeditron_tpu.models.hf_import import vit_params_from_state_dict

    cfg = CLIPDualConfig(
        vision=ViTConfig.clip_from_hf_dict(hf_cfg.vision_config.to_dict()),
        text=CLIPTextConfig.from_hf_dict(hf_cfg.text_config.to_dict()),
        projection_dim=24,
    )
    sd = hf.state_dict()
    params = {
        "vision": vit_params_from_state_dict(sd, cfg.vision, prefix="vision_model."),
        "text": clip_text_params_from_state_dict(sd, cfg.text, prefix="text_model."),
        "visual_projection": jnp.asarray(sd["visual_projection.weight"].numpy().T),
        "text_projection": jnp.asarray(sd["text_projection.weight"].numpy().T),
        "logit_scale": jnp.asarray(sd["logit_scale"].numpy()),
    }

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    ids = np.array([[5, 8, 98, 0], [7, 98, 0, 0]], dtype=np.int64)
    mask = np.array([[1, 1, 1, 0], [1, 1, 0, 0]], dtype=np.int64)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(pixels),
        )
    out = clip_dual_forward(
        params, cfg,
        jnp.asarray(pixels.transpose(0, 2, 3, 1)),
        jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(out["logits_per_image"]), ref.logits_per_image.numpy(),
        atol=1e-3, rtol=1e-3,
    )


def _toy_rows(n=8):
    rows = []
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
    names = ["red", "green", "blue", "yellow"]
    for i in range(n):
        rows.append({
            "image": Image.new("RGB", (20, 20), colors[i % 4]),
            "caption": f"a {names[i % 4]} image",
        })
    return rows


def test_expert_trainer_overfits():
    cfg = ExpertTrainConfig(
        image_size=16, patch_size=8,
        vision_hidden_size=32, vision_layers=1, vision_heads=4,
        vision_intermediate_size=64,
        text_vocab_size=4096, text_hidden_size=32, text_layers=1,
        text_heads=4, text_intermediate_size=64,
        projection_dim=16, max_text_len=8,
        learning_rate=1e-3, batch_size=8, num_steps=12,
        output_dir="/tmp/mmt_expert_test", save_every=0,
    )
    tok = ToyTokenizer()
    trainer = ExpertCLIPTrainer(cfg, tok)
    rows = _toy_rows()
    batch = trainer.collate(rows)
    losses = []
    for _ in range(12):
        trainer.params, trainer.opt_state, loss = trainer._train_step(
            trainer.params, trainer.opt_state,
            jnp.asarray(batch["pixel_values"]),
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]),
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_expert_save_resume(tmp_path):
    cfg = ExpertTrainConfig(
        image_size=16, patch_size=8, vision_hidden_size=32, vision_layers=1,
        vision_heads=4, vision_intermediate_size=64, text_vocab_size=4096,
        text_hidden_size=32, text_layers=1, text_heads=4,
        text_intermediate_size=64, projection_dim=16, max_text_len=8,
        output_dir=str(tmp_path), num_steps=1,
    )
    trainer = ExpertCLIPTrainer(cfg, ToyTokenizer())
    trainer.step = 7
    out = trainer.save()
    assert ExpertCLIPTrainer.latest_checkpoint(str(tmp_path)) == out

    trainer2 = ExpertCLIPTrainer(cfg, ToyTokenizer())
    trainer2.resume(out)
    assert trainer2.step == 7
    np.testing.assert_array_equal(
        np.asarray(trainer.params["visual_projection"]),
        np.asarray(trainer2.params["visual_projection"]),
    )


def test_config_maker_grid():
    spec = Configurations(
        output_dir="/tmp/mmt_cfgs",
        base_configs=[{"learning_rate": 1e-4}],
        datamixes=[
            {"name": "xray", "datasets": [{"path": "a"}]},
            {"name": "ct", "datasets": [{"path": "b"}]},
        ],
        param_ranges=[
            {"name": "learning_rate", "values": [1e-4, 5e-5]},
            {"name": "batch_size", "values": [32]},
        ],
    )
    configs = expand_configurations(spec)
    assert len(configs) == 4  # 1 base x 2 mixes x 2 lrs x 1 bs
    names = {c["run_name"] for c in configs}
    assert len(names) == 4
    assert all("datasets" in c for c in configs)


def test_router_trainer_smoke():
    from multimeditron_tpu.experts.train_router import RouterTrainConfig, RouterTrainer

    cfg = RouterTrainConfig(
        class_names=["a", "b"], resnet_depth=18, image_size=32,
        batch_size=4, num_steps=2, output_dir="/tmp/mmt_router_test",
        learning_rate=1e-3,
    )
    trainer = RouterTrainer(cfg)
    rows = [
        {"image": Image.new("RGB", (20, 20), (255, 0, 0)), "label": 0},
        {"image": Image.new("RGB", (20, 20), (0, 0, 255)), "label": 1},
    ] * 2
    metrics = trainer.train(rows)
    assert np.isfinite(metrics["loss"])
    # saved in GatingNetwork format
    from multimeditron_tpu.modalities.moe.gating import GatingNetwork

    net, params = GatingNetwork.from_pretrained("/tmp/mmt_router_test")
    assert net.config.class_names == ["a", "b"]
