"""Self-contained CLIP BPE tokenizer.

The reference tokenizes the fixed prompt "A pathological slide" via the HF
tokenizer shipped inside the SD checkpoint directory (``ldiffusion.py:213``).
This implementation reads the same ``tokenizer/vocab.json`` +
``tokenizer/merges.txt`` files, applies CLIP's lowercasing + whitespace
cleanup + byte-level BPE with the ``</w>`` end-of-word convention, and pads
to 77 tokens with the end-of-text id (CLIP pad == eos).
"""
from __future__ import annotations

import functools
import gzip
import json
import os
import re
from typing import Dict, List


@functools.lru_cache()
def _bytes_to_unicode() -> Dict[int, str]:
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


_PAT = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
) if hasattr(re, "Pattern") and False else re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+""",
    re.IGNORECASE,
)


class CLIPTokenizer:
    def __init__(self, vocab: Dict[str, int], merges: List[str], max_length: int = 77):
        self.encoder = vocab
        self.decoder = {v: k for k, v in vocab.items()}
        self.byte_encoder = _bytes_to_unicode()
        self.bpe_ranks = {tuple(m.split()): i for i, m in enumerate(merges)}
        self.max_length = max_length
        self.bos = vocab.get("<|startoftext|>", 49406)
        self.eos = vocab.get("<|endoftext|>", 49407)
        self._cache: Dict[str, str] = {}

    @classmethod
    def from_pretrained(cls, model_dir: str, max_length: int = 77) -> "CLIPTokenizer":
        tok_dir = os.path.join(model_dir, "tokenizer")
        if not os.path.isdir(tok_dir):
            tok_dir = model_dir
        vocab = json.load(open(os.path.join(tok_dir, "vocab.json"), encoding="utf-8"))
        merges_path = os.path.join(tok_dir, "merges.txt")
        if os.path.exists(merges_path):
            lines = open(merges_path, encoding="utf-8").read().split("\n")
        else:  # original CLIP gzip format
            lines = gzip.open(os.path.join(tok_dir, "bpe_simple_vocab_16e6.txt.gz"),
                              "rt", encoding="utf-8").read().split("\n")
        merges = [l for l in lines if l and not l.startswith("#version")]
        return cls(vocab, merges, max_length)

    def _bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1 << 30))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and word[i] == first
                    and word[i + 1] == second
                ):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        out = " ".join(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        text = re.sub(r"\s+", " ", text.strip()).lower()
        ids: List[int] = []
        for token in _PAT.findall(text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(token).split(" "))
        return ids

    def __call__(self, texts, padding: bool = False):
        """Returns input_ids [[bos, ..., eos]].

        Defaults to no padding, matching the reference's bare
        ``tokenizer(prompts)["input_ids"]`` call (``ldiffusion.py:213``) —
        the fixed prompt gives a fixed (static) sequence length anyway.
        With ``padding=True`` pads to 77 with eos (CLIP pad == eos).
        """
        if isinstance(texts, str):
            texts = [texts]
        out = []
        for t in texts:
            ids = [self.bos] + self.encode(t)[: self.max_length - 2] + [self.eos]
            if padding:
                ids = ids + [self.eos] * (self.max_length - len(ids))
            out.append(ids)
        return {"input_ids": out}
