"""Build a tiny local HF fast tokenizer for CLI smoke tests (offline)."""

from __future__ import annotations

CORPUS = [
    "what is in this image here",
    "a red square picture",
    "describe the xray scan",
    "hello world how are you today",
    "the patient shows signs of pneumonia",
    "tell me a story about a cat",
]

SPECIALS = [
    "<unk>", "<pad>", "<bos>", "<eos>",
    "<|reserved_special_token_0|>",
    "<|start_header_id|>system<|end_header_id|>",
    "<|start_header_id|>user<|end_header_id|>",
    "<|start_header_id|>assistant<|end_header_id|>",
    "<|eot_id|>",
]


def make_tiny_hf_tokenizer(out_dir: str) -> str:
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.WordLevel(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.WordLevelTrainer(special_tokens=SPECIALS)
    tok.train_from_iterator(CORPUS, trainer)

    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        unk_token="<unk>",
        pad_token="<pad>",
        bos_token="<bos>",
        eos_token="<eos>",
        additional_special_tokens=SPECIALS[5:],
    )
    fast.save_pretrained(out_dir)
    return out_dir
