"""CLIP byte-pair-encoding tokenizer (vocab 49408).

Functional parity with the reference's SimpleTokenizer
(reference: enhancing/utils/tokenizer.py:51-151), implemented from the BPE
algorithm: byte->unicode table, greedy lowest-rank merge loop, and
``tokenize`` producing fixed-length int sequences (no SOT/EOT wrapping —
the reference's tokenize() emits bare caption tokens, tokenizer.py:136-151).

Token-split pattern is CLIP's exact one (letters-only runs, per-character
digits): ``[\\p{L}]+|[\\p{N}]|[^\\s\\p{L}\\p{N}]+`` via the ``regex`` module,
so token IDs match the reference byte-for-byte (reference tokenizer.py:74-76).

The merges vocabulary is the standard public CLIP
``bpe_simple_vocab_16e6.txt`` (OpenAI CLIP repo); a gzipped copy is vendored
at assets/vocab/bpe_simple_vocab_16e6.txt.gz.
"""
from __future__ import annotations

import gzip
import html
import os
from functools import lru_cache
from pathlib import Path
from typing import List, Optional, Union

import numpy as np
import regex as re

def fix_mojibake(text: str) -> str:
    """Vendored minimal ftfy equivalent: repair UTF-8 text that was
    mis-decoded as cp1252/latin-1 (classic mojibake, e.g. ``Ã©`` -> ``é``).

    The reference cleans captions with ``ftfy.fix_text`` (reference
    enhancing/utils/tokenizer.py:41-44), whose core job on web-scraped
    captions (CC3M/COCO) is exactly this inversion: re-encode with the
    wrong codec and decode the recovered bytes as UTF-8. Applied
    iteratively so double-encoded text also recovers. Plain ASCII and
    legitimately-accented text round-trip unchanged (their cp1252 bytes
    are not valid UTF-8 multi-byte sequences).
    """
    for _ in range(3):
        fixed = None
        for enc in ("cp1252", "latin-1"):
            try:
                candidate = text.encode(enc).decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                continue
            if candidate != text:
                fixed = candidate
                break
        if fixed is None:
            return text
        text = fixed
    return text


try:  # prefer real ftfy when installed (not in this image)
    import ftfy

    def _fix_text(text: str) -> str:
        return ftfy.fix_text(text)
except ImportError:
    _fix_text = fix_mojibake

DEFAULT_BPE_PATHS = (
    "assets/vocab/bpe_simple_vocab_16e6.txt",
    "assets/vocab/bpe_simple_vocab_16e6.txt.gz",
)


@lru_cache()
def bytes_to_unicode():
    """Reversible byte -> printable-unicode map (standard GPT-2/CLIP table)."""
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
    return dict(zip(bs, (chr(c) for c in cs)))


def get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def basic_clean(text: str) -> str:
    text = _fix_text(text)
    text = html.unescape(html.unescape(text))
    return text.strip()


def whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


def _find_bpe_file(path: Optional[str]) -> str:
    repo_root = Path(__file__).resolve().parents[2]
    candidates = [path] if path else []
    candidates += [str(Path(os.getcwd()) / p) for p in DEFAULT_BPE_PATHS]
    candidates += [str(repo_root / p) for p in DEFAULT_BPE_PATHS]
    for c in candidates:
        if c and Path(c).is_file():
            return c
    raise FileNotFoundError(
        "CLIP BPE vocab not found. Pass bpe_path= or place "
        "bpe_simple_vocab_16e6.txt under assets/vocab/.")


class SimpleTokenizer:
    def __init__(self, bpe_path: Optional[str] = None,
                 text_length: int = 256,
                 truncate_captions: bool = True) -> None:
        self.context_length = text_length
        self.truncate_text = truncate_captions
        bpe_path = _find_bpe_file(bpe_path)
        if bpe_path.endswith(".gz"):
            merges = gzip.open(bpe_path, "rt", encoding="utf-8").read()
        else:
            merges = open(bpe_path, encoding="utf-8").read()
        merges = merges.split("\n")
        merges = merges[1:49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]

        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])

        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        # CLIP's exact token-split pattern (reference tokenizer.py:74-76):
        # letter runs stay whole, digits split per character.
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+", re.IGNORECASE)
        self.vocab_size = len(self.encoder)

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
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (word[i] == first and i < len(word) - 1
                        and word[i + 1] == second):
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

    def encode(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        text = whitespace_clean(basic_clean(text)).lower()
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b]
                            for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t]
                              for t in self.bpe(token).split(" "))
        return bpe_tokens

    def decode(self, tokens) -> str:
        tokens = [int(t) for t in np.asarray(tokens).reshape(-1)]
        text = "".join(self.decoder.get(t, "") for t in tokens)
        text = bytearray(self.byte_decoder.get(c, 32) for c in text).decode(
            "utf-8", errors="replace").replace("</w>", " ")
        for special in ("<|startoftext|>", "<|endoftext|>"):
            text = text.replace(special, "")
        return text.strip()

    def tokenize(self, texts: Union[str, List[str]],
                 context_length: Optional[int] = None,
                 truncate_text: Optional[bool] = None) -> np.ndarray:
        """Fixed-length int32 token matrix — bare caption tokens, no SOT/EOT
        wrapping, zero-padded (reference tokenizer.py:136-151)."""
        single = isinstance(texts, str)
        if single:
            texts = [texts]
        context_length = (self.context_length if context_length is None
                          else context_length)
        truncate_text = (self.truncate_text if truncate_text is None
                         else truncate_text)
        result = np.zeros((len(texts), context_length), np.int32)
        for i, text in enumerate(texts):
            tokens = self.encode(text)
            if len(tokens) > context_length:
                if truncate_text:
                    tokens = tokens[:context_length]
                else:
                    raise RuntimeError(
                        f"Input {text!r} is too long for context length "
                        f"{context_length}")
            result[i, :len(tokens)] = tokens
        return result[0] if single else result
