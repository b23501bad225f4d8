"""CLIP BPE tokenizer, pure python (parity: reference
data/text_tokenizer/clip_tokenizer.py:17, which wraps torchtext's CLIPTokenizer).

Implements the standard CLIP BPE: byte→unicode table, lowercased regex word split,
merge-ranked BPE with </w> end-of-word markers, ``<|startoftext|>``/``<|endoftext|>``
specials, fixed context length. The merges file (bpe_simple_vocab_16e6.txt) ships
with released checkpoints; pass it via --text-tokenizer.clip.merges-path. Without a
merges file a deterministic hash-bucket fallback keeps the pipeline runnable (tests,
dummy training)."""

from __future__ import annotations

import argparse
import gzip
import html
import os
import re
from functools import lru_cache
from typing import Dict, List, Optional

import numpy as np

from cvnets_tpu.data.text_tokenizer import TOKENIZER_REGISTRY


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word) -> set:
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


def basic_clean(text: str) -> str:
    return html.unescape(html.unescape(text)).strip()


def whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class BaseTokenizer:
    def __init__(self, opts, *args, **kwargs) -> None:
        self.opts = opts

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        return parser


@TOKENIZER_REGISTRY.register(name="clip")
class ClipTokenizer(BaseTokenizer):
    def __init__(self, opts, *args, **kwargs) -> None:
        super().__init__(opts)
        self.context_length = (
            getattr(opts, "dataset.multi_modal_img_text.context_length", None)
            or getattr(opts, "model.text.context_length", 77))
        merges_path = getattr(opts, "text_tokenizer.clip.merges_path", None)
        self.vocab_size = getattr(opts, "model.text.vocab_size", 49408)
        # ASCII approximation of CLIP's \p{L}/\p{N} pattern (stdlib `re` has no
        # unicode property classes; the BPE byte-encoder handles non-ASCII)
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
            r"[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+",
            re.IGNORECASE,
        )
        self.byte_encoder = bytes_to_unicode()
        self._bpe_available = bool(merges_path and os.path.isfile(merges_path))
        if self._bpe_available:
            opener = gzip.open if merges_path.endswith(".gz") else open
            with opener(merges_path, "rt", encoding="utf-8") as f:
                merges = f.read().split("\n")
            merges = [tuple(m.split()) for m in merges[1: 49152 - 256 - 2 + 1]
                      if m.strip()]
            vocab = list(bytes_to_unicode().values())
            vocab = vocab + [v + "</w>" for v in vocab]
            vocab += ["".join(m) for m in merges]
            vocab += ["<|startoftext|>", "<|endoftext|>"]
            self.encoder = {v: i for i, v in enumerate(vocab)}
            # reference flag: an explicit token->id json wins over the derived
            # vocab (exact ids for released CLIP checkpoints)
            enc_json = getattr(opts, "text_tokenizer.clip.encoder_json_path",
                               None)
            if enc_json and os.path.isfile(enc_json):
                import json as _json

                with open(enc_json, encoding="utf-8") as f:
                    self.encoder = _json.load(f)
            self.bpe_ranks = dict(zip(merges, range(len(merges))))
            self.cache: Dict[str, str] = {}
            self.sot = self.encoder["<|startoftext|>"]
            self.eot = self.encoder["<|endoftext|>"]
        else:
            # hash-bucket fallback: deterministic, reversible enough for training
            # plumbing and tests; not checkpoint-compatible with released CLIP
            self.sot = self.vocab_size - 2
            self.eot = self.vocab_size - 1

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--text-tokenizer.clip.merges-path", type=str,
                           default=None)
        group.add_argument("--text-tokenizer.clip.encoder-json-path", type=str,
                           default=None,
                           help="Optional token->id json (reference "
                                "clip_tokenizer.py); wins over the vocab "
                                "derived from the merges file")
        return parser

    def get_vocab_size(self) -> int:
        return self.vocab_size

    def get_sot_token(self) -> int:
        return self.sot

    def get_eot_token(self) -> int:
        return self.eot

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def _encode_text(self, text: str) -> List[int]:
        text = whitespace_clean(basic_clean(text)).lower()
        ids: List[int] = []
        for token in re.findall(self.pat, text):
            if self._bpe_available:
                tok = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
                ids.extend(self.encoder[t] for t in self.bpe(tok).split(" "))
            else:
                ids.append(hash(token) % (self.vocab_size - 3) + 1)
        return ids

    def __call__(self, input_sentence: str) -> np.ndarray:
        tokens = [self.sot] + self._encode_text(input_sentence) + [self.eot]
        tokens = tokens[: self.context_length]
        if tokens[-1] != self.eot:
            tokens[-1] = self.eot
        out = np.zeros(self.context_length, np.int64)
        out[: len(tokens)] = tokens
        return out
