from multimeditron_tpu.data.chat_template import ChatTemplate
from multimeditron_tpu.data.prompt_tokenizer import PromptTokenizer

__all__ = ["ChatTemplate", "PromptTokenizer"]
