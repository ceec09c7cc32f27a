"""Text front-end: SentencePiece tokenization (via HF ``tokenizers``), prompt
preparation, and token-budgeted sentence chunking.

Semantics follow the Python reference as canonical
(python-reference/pocket_tts/models/tts_model.py:638-715); the tokenizer.json is
the same Unigram+Metaspace model the reference embeds for WASM
(crates/pocket-tts/src/conditioners/text.rs uses it as the primary loader).
"""

from __future__ import annotations

import functools
import os
from pathlib import Path

import numpy as np

_ASSET_TOKENIZER = Path(__file__).parent / "assets" / "tokenizer.json"

# ≤ 50 tokens per chunk keeps attention cost linear in text length
# (tts_model.py:694, tts_model.rs:605).
MAX_TOKENS_PER_CHUNK = 50


class TextTokenizer:
    """Thin wrapper over ``tokenizers.Tokenizer``."""

    def __init__(self, path: str | Path | None = None):
        from tokenizers import Tokenizer

        path = Path(path or os.environ.get("POCKET_TTS_TOKENIZER", _ASSET_TOKENIZER))
        self._tk = Tokenizer.from_file(str(path))

    @property
    def vocab_size(self) -> int:
        return self._tk.get_vocab_size()

    def encode(self, text: str) -> list[int]:
        return self._tk.encode(text).ids

    def decode(self, ids: list[int]) -> str:
        return self._tk.decode(ids)

    def count_tokens(self, text: str) -> int:
        return len(self.encode(text))


@functools.lru_cache(maxsize=4)
def load_tokenizer(path: str | None = None) -> TextTokenizer:
    return TextTokenizer(path)


def prepare_text_prompt(text: str) -> tuple[str, int]:
    """Normalize a prompt and guess frames_after_eos
    (python-reference tts_model.py:638-663)."""
    text = text.strip()
    if text == "":
        raise ValueError("Text prompt cannot be empty")
    text = text.replace("\n", " ").replace("\r", " ").replace("  ", " ")
    number_of_words = len(text.split())
    frames_after_eos_guess = 3 if number_of_words <= 4 else 1

    if not text[0].isupper():
        text = text[0].upper() + text[1:]
    if text[-1].isalnum():
        text = text + "."
    # the model underperforms on very short prompts; pad with leading spaces
    if len(text.split()) < 5:
        text = " " * 8 + text
    return text, frames_after_eos_guess


def split_into_best_sentences(tokenizer: TextTokenizer, text_to_generate: str) -> list[str]:
    """Token-budgeted sentence chunking (canonical token-based definition,
    tts_model.py:666-715)."""
    text_to_generate, _ = prepare_text_prompt(text_to_generate)
    text_to_generate = text_to_generate.strip()
    tokens = tokenizer.encode(text_to_generate)

    # first id is the bare metaspace prefix — skip it, as the reference does
    end_of_sentence_tokens = set(tokenizer.encode(".!...?")[1:])

    end_indices = [0]
    prev_was_eos = False
    for idx, token in enumerate(tokens):
        if token in end_of_sentence_tokens:
            prev_was_eos = True
        else:
            if prev_was_eos:
                end_indices.append(idx)
            prev_was_eos = False
    end_indices.append(len(tokens))

    sentences = []
    for start, end in zip(end_indices[:-1], end_indices[1:]):
        # A sentence with no internal punctuation can exceed the chunk budget
        # on its own (the reference's dynamic shapes tolerate this; static
        # buckets must not) — hard-split it at the token level.
        for s in range(start, end, MAX_TOKENS_PER_CHUNK):
            e = min(s + MAX_TOKENS_PER_CHUNK, end)
            sentences.append((e - s, tokenizer.decode(tokens[s:e])))

    # NOTE: budgets use the ORIGINAL token counts, but each emitted chunk is
    # decode+join+re-encoded downstream (prepare_text_prompt adds <s> and the
    # joins add spaces), so real chunks re-encode to up to ~54 tokens against
    # the 50 budget.  This matches the oracle's algorithm exactly (parity
    # hard-part #6) and is absorbed by the headroom to the largest text
    # bucket (64, RuntimeConfig.text_buckets) — pinned by
    # tests/test_host_modules.py::test_chunk_reencode_fits_largest_bucket.
    chunks: list[str] = []
    current = ""
    current_tokens = 0
    for n_tokens, sentence in sentences:
        if current == "":
            current, current_tokens = sentence, n_tokens
            continue
        if current_tokens + n_tokens > MAX_TOKENS_PER_CHUNK:
            chunks.append(current.strip())
            current, current_tokens = sentence, n_tokens
        else:
            current += " " + sentence
            current_tokens += n_tokens
    if current != "":
        chunks.append(current.strip())
    return chunks


def max_generation_frames(text: str) -> int:
    """Heuristic generation budget: (words + 2 s) * 12.5 frames/s
    (tts_model.py:487-488)."""
    return int((len(text.split()) + 2.0) * 12.5)


def tokens_array(tokenizer: TextTokenizer, text: str, bucket: int | None = None
                 ) -> tuple[np.ndarray, int]:
    """Encode to a right-padded int32 array of length ``bucket`` (pad id 0 —
    padded positions are never attended)."""
    ids = tokenizer.encode(text)
    n = len(ids)
    if bucket is None:
        bucket = n
    if n > bucket:
        raise ValueError(f"{n} tokens exceed bucket {bucket}")
    out = np.zeros((1, bucket), np.int32)
    out[0, :n] = ids
    return out, n
