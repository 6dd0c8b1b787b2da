import json
import os

import numpy as np
import pytest
import yaml
from click.testing import CliRunner
from PIL import Image

from tests.fixtures.hf_tokenizer import make_tiny_hf_tokenizer


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cliwork")
    tok_dir = make_tiny_hf_tokenizer(str(root / "tokenizer"))

    img_path = root / "img.jpg"
    Image.new("RGB", (24, 24), (200, 30, 30)).save(img_path)

    samples = [
        {
            "conversations": [
                {"role": "user",
                 "content": "<|reserved_special_token_0|> what is in this image"},
                {"role": "assistant", "content": "a red square picture"},
            ],
            "modalities": [{"type": "image", "value": str(img_path)}],
        },
        {
            "conversations": [
                {"role": "user", "content": "hello world how are you"},
                {"role": "assistant", "content": "the patient shows signs"},
            ],
            "modalities": [],
        },
    ] * 4
    data_path = root / "train.jsonl"
    with open(data_path, "w") as f:
        for s in samples:
            f.write(json.dumps(s) + "\n")

    config = {
        "base_llm": tok_dir,
        "attachment_token": "<|reserved_special_token_0|>",
        "tokenizer_type": "llama",
        "token_size": 64,
        "llm": {
            "vocab_size": 128,
            "hidden_size": 64,
            "intermediate_size": 128,
            "num_layers": 2,
            "num_heads": 4,
            "num_kv_heads": 2,
            "dtype": "float32",
        },
        "loaders": [{"loader_type": "fs-image", "modality_type": "image"}],
        "modalities": [
            {
                "model_type": "meditron_clip",
                "hidden_size": 64,
                "image_size": 16,
                "patch_size": 8,
                "vision_hidden_size": 32,
                "vision_layers": 1,
                "vision_heads": 4,
                "vision_intermediate_size": 64,
                "param_dtype": "float32",
            }
        ],
        "training_mode": "ALIGNMENT",
        "datasets": [{"packed_path": str(data_path)}],
        "collator": {"pad_to_multiple": 16, "modality_budgets": {"image": 4}},
        "training_args": {
            "output_dir": str(root / "out"),
            "learning_rate": 1e-3,
            "per_device_train_batch_size": 2,
            "max_steps": 2,
            "logging_steps": 1,
            "gradient_checkpointing": True,
        },
        "mesh": {"dp": 1, "fsdp": 1, "tp": 1},
    }
    cfg_path = root / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(config))
    return root, cfg_path, config


def test_cli_train_smoke(workdir):
    root, cfg_path, config = workdir
    from multimeditron_tpu.cli import main_cli

    # vocab_size in llm config must cover the tokenizer+specials; the CLI
    # passes tokenizer vocab through, so this exercises resize too.
    runner = CliRunner()
    result = runner.invoke(main_cli, ["train", "-c", str(cfg_path)],
                           catch_exceptions=False)
    assert result.exit_code == 0, result.output
    out_dir = root / "out"
    assert (out_dir / "metrics.jsonl").exists()
    metrics = [json.loads(l) for l in open(out_dir / "metrics.jsonl")]
    assert len(metrics) >= 2
    assert np.isfinite(metrics[-1]["loss"])
    # HF export written
    assert (out_dir / "hf_export" / "model.safetensors").exists()
    # orbax checkpoint written
    assert (out_dir / "ckpt").exists()


def test_cli_train_process_workers(workdir):
    # same smoke, but collation runs in spawned worker processes
    # (training_args.dataloader_worker_mode: the reference's num_workers
    # processes, cli/train.py:200-201 torchrun ranks each with 16 workers)
    root, cfg_path, config = workdir
    from multimeditron_tpu.cli import main_cli

    result = CliRunner().invoke(
        main_cli,
        ["train", "-c", str(cfg_path),
         "training_args.dataloader_worker_mode=process",
         "training_args.max_steps=2"],
        catch_exceptions=False)
    assert result.exit_code == 0, result.output
    metrics = [json.loads(l) for l in open(root / "out" / "metrics.jsonl")]
    assert np.isfinite(metrics[-1]["loss"])


def test_cli_train_pipeline_mesh(workdir):
    # mesh.pp reaches the trainer: 2 decoder layers as a 2-stage GPipe
    # pipeline (parallel/pipeline.py) composed with fsdp over the
    # virtual 8-device mesh.
    root, cfg_path, config = workdir
    from multimeditron_tpu.cli import main_cli

    result = CliRunner().invoke(
        main_cli,
        ["train", "-c", str(cfg_path),
         "mesh.pp=2", "mesh.fsdp=4", "training_args.max_steps=2"],
        catch_exceptions=False)
    assert result.exit_code == 0, result.output
    metrics = [json.loads(l) for l in open(root / "out" / "metrics.jsonl")]
    assert np.isfinite(metrics[-1]["loss"])


def test_cli_train_resume(workdir):
    """--resume restores params/opt_state/step from the latest orbax
    checkpoint (reference resume_from_checkpoint parity)."""
    root, cfg_path, config = workdir
    from multimeditron_tpu.cli import main_cli

    runner = CliRunner()
    result = runner.invoke(
        main_cli,
        ["train", "-c", str(cfg_path), "--resume", "training_args.max_steps=3"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    metrics = [json.loads(l) for l in open(root / "out" / "metrics.jsonl")]
    # first run logged steps 1..2; resumed run continues from 3
    assert metrics[-1]["step"] == 3
    steps = [m["step"] for m in metrics]
    assert steps.count(3) == 1


def test_cli_preprocess_ds(workdir, tmp_path):
    root, _, _ = workdir
    from multimeditron_tpu.cli import main_cli

    src = tmp_path / "src.jsonl"
    with open(src, "w") as f:
        for i in range(8):
            f.write(json.dumps({"prompt": f"p{i}", "response": f"r{i}"}) + "\n")
    out = tmp_path / "out.parquet"
    cfg = {
        "source": {"type": "jsonl", "kwargs": {"path": str(src)}},
        "output": str(out),
        "num_processes": 0,
        "processes": [
            {"type": "python-filter", "kwargs": {"func": "idx < 5"}},
            {"type": "shuffle", "kwargs": {"seed": 3}},
        ],
    }
    cfg_path = tmp_path / "prep.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    runner = CliRunner()
    # without --allow-code the python-filter stage must refuse
    result = runner.invoke(main_cli, ["preprocess-ds", "-c", str(cfg_path)])
    assert result.exit_code != 0

    result = runner.invoke(
        main_cli, ["preprocess-ds", "-c", str(cfg_path), "--allow-code"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    import datasets

    ds = datasets.load_dataset("parquet", data_files=str(out))["train"]
    assert len(ds) == 5


def test_cli_preprocess_display_and_head(workdir, tmp_path):
    from multimeditron_tpu.cli import main_cli

    src = tmp_path / "s.jsonl"
    with open(src, "w") as f:
        for i in range(10):
            f.write(json.dumps({"text": f"row {i}"}) + "\n")
    cfg_path = tmp_path / "p.yaml"
    cfg_path.write_text(yaml.safe_dump({
        "source": {"type": "jsonl", "kwargs": {"path": str(src)}},
        "output": str(tmp_path / "never.parquet"),
        "num_processes": 0,
    }))
    runner = CliRunner()
    result = runner.invoke(
        main_cli,
        ["preprocess-ds", "-c", str(cfg_path), "--head", "3", "--display"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    assert "row 2" in result.output
    assert not (tmp_path / "never.parquet").exists()


def test_cli_generate(workdir, tmp_path):
    root, cfg_path, config = workdir
    from multimeditron_tpu.cli import main_cli

    prompts = tmp_path / "prompts.jsonl"
    with open(prompts, "w") as f:
        f.write(json.dumps({
            "conversations": [{"role": "user", "content": "hello world"}],
            "modalities": [],
        }) + "\n")
    out = tmp_path / "gen.jsonl"
    runner = CliRunner()
    result = runner.invoke(
        main_cli,
        ["generate", "-c", str(cfg_path), "-i", str(prompts), "-o", str(out),
         "--max-new-tokens", "4", "--greedy"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 1 and "generated" in rows[0]


def test_cli_rlhf_dryrun(workdir, tmp_path):
    root, cfg_path, config = workdir
    import yaml
    from multimeditron_tpu.cli import main_cli

    cfg = dict(config)
    cfg["training_mode"] = "LM_ONLY"
    cfg["rlhf"] = {"group_size": 2, "prompts_per_step": 1, "max_new_tokens": 4,
                   "seq_bucket": 64, "max_slots": 2,
                   "prompt_dataset": "unused.jsonl"}
    p = tmp_path / "rl.yaml"
    p.write_text(yaml.safe_dump(cfg))
    result = CliRunner().invoke(main_cli, ["rlhf", "-c", str(p), "--dryrun"],
                                catch_exceptions=False)
    assert result.exit_code == 0, result.output
    assert "dryrun OK" in result.output


def test_cli_rlhf_dryrun_dapo(workdir, tmp_path):
    """algorithm: dapo selects the DAPOTrainer (clip-higher + dynamic
    sampling) and defaults kl_coef to 0 / reward_manager to dapo."""
    root, cfg_path, config = workdir
    import yaml
    from multimeditron_tpu.cli import main_cli

    cfg = dict(config)
    cfg["training_mode"] = "LM_ONLY"
    cfg["rlhf"] = {"algorithm": "dapo", "group_size": 2,
                   "prompts_per_step": 1, "max_new_tokens": 4,
                   "seq_bucket": 64, "max_slots": 2,
                   "prompt_dataset": "unused.jsonl"}
    p = tmp_path / "rl_dapo.yaml"
    p.write_text(yaml.safe_dump(cfg))
    result = CliRunner().invoke(main_cli, ["rlhf", "-c", str(p), "--dryrun"],
                                catch_exceptions=False)
    assert result.exit_code == 0, result.output
    assert "dryrun OK" in result.output
    assert "algorithm=dapo" in result.output
    assert "reward_manager=dapo" in result.output


def test_engine_config_from_cfg():
    """Every EngineConfig knob is reachable from the YAML serve: section
    (quantize_llm, kv_mode, decode_chunk, ...); CLI overrides win;
    unknown keys raise instead of silently no-opping."""
    from multimeditron_tpu.cli.common import engine_config_from_cfg

    cfg = {
        "max_sequence_length": 4096,
        "serve": {
            "max_slots": 16,
            "quantize_llm": True,
            "kv_mode": "paged",
            "decode_chunk": 16,
            "top_p": 0.9,
            "prefill_buckets": [128, 512],
        },
    }
    ec = engine_config_from_cfg(cfg, temperature=0.3, max_new_tokens=None)
    assert ec.max_seq_len == 4096
    assert ec.max_slots == 16
    assert ec.quantize_llm is True
    assert ec.decode_chunk == 16
    assert ec.top_p == 0.9
    assert ec.prefill_buckets == (128, 512)
    assert ec.temperature == 0.3          # override wins
    assert ec.max_new_tokens == 512       # None override = keep default

    with pytest.raises(ValueError, match="quantize_lm"):
        engine_config_from_cfg({"serve": {"quantize_lm": True}})
