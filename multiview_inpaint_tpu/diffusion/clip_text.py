"""CLIP text encoder (flax) + byte-pair-encoding tokenizer.

Completes the conditioning stack natively: SDS text embeddings
(``get_text_embeds`` in the reference guidance, sdi_utils.py:121-129) and
the CLIP text side of the metrics (text-image / directional similarity)
can be computed in-framework once weights are imported — no torch/HF
runtime needed.

- :class:`CLIPTextTower`: token embedding + learned positional embedding
  + pre-LN causal transformer + final LN; returns both the full token
  sequence (SD-style ``last_hidden_state`` conditioning) and the pooled
  eot projection (similarity metrics).
- :class:`SimpleTokenizer`: the standard CLIP BPE (lowercase, bytes-to-
  unicode, merges) reading a user-supplied ``bpe_simple_vocab`` merges
  file (zero-egress containers must provide it alongside the weights).
"""

from __future__ import annotations

import dataclasses
import gzip
import html
import re
from functools import lru_cache
from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 1024        # SD2 / OpenCLIP-H text width
    layers: int = 23
    heads: int = 16
    output_dim: int = 1024


class _Block(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(name="ln_1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.width,
            name="attn")(h, h, mask=mask)
        x = x + h
        h = nn.LayerNorm(name="ln_2")(x)
        h = nn.Dense(self.width * 4, name="mlp_c_fc")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.width, name="mlp_c_proj")(h)
        return x + h


class CLIPTextTower(nn.Module):
    cfg: TextConfig = TextConfig()

    @nn.compact
    def __call__(self, tokens: jnp.ndarray):
        """tokens [B, L] int32 -> (hidden [B, L, W], pooled [B, D])."""
        cfg = self.cfg
        b, l = tokens.shape
        emb = nn.Embed(cfg.vocab_size, cfg.width,
                       name="token_embedding")(tokens)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (cfg.context_length, cfg.width))
        x = emb + pos[None, :l]
        causal = jnp.tril(jnp.ones((l, l), bool))[None, None]
        for i in range(cfg.layers):
            x = _Block(cfg.width, cfg.heads, name=f"resblocks_{i}")(
                x, causal)
        hidden = nn.LayerNorm(name="ln_final")(x)
        proj = self.param("text_projection", nn.initializers.normal(0.01),
                          (cfg.width, cfg.output_dim))
        eot = jnp.argmax(tokens, axis=-1)  # highest id = eot token
        pooled = hidden[jnp.arange(b), eot] @ proj
        return hidden, pooled


@lru_cache()
def _bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: Tuple[str, ...]):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


class SimpleTokenizer:
    """CLIP BPE tokenizer; ``bpe_path`` is the standard merges file
    (``bpe_simple_vocab_16e6.txt[.gz]``)."""

    def __init__(self, bpe_path: str, context_length: int = 77):
        self.context_length = context_length
        self.byte_encoder = _bytes_to_unicode()
        if bpe_path.endswith(".gz"):
            merges = gzip.open(bpe_path, "rt", encoding="utf-8").read()
        else:
            merges = open(bpe_path, encoding="utf-8").read()
        merges = merges.split("\n")[1:49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges if m]
        vocab = list(_bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
            r"[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"
            if False else
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
            r"[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+", re.IGNORECASE)

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs,
                         key=lambda p: self.bpe_ranks.get(p, float("inf")))
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
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        text = html.unescape(html.unescape(text))
        text = re.sub(r"\s+", " ", text).strip().lower()
        bpe_tokens: List[int] = []
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b]
                            for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t]
                              for t in self._bpe(token).split(" "))
        return bpe_tokens

    def __call__(self, texts) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        sot = self.encoder["<|startoftext|>"]
        eot = self.encoder["<|endoftext|>"]
        out = np.zeros((len(texts), self.context_length), np.int32)
        for i, t in enumerate(texts):
            toks = [sot] + self.encode(t)[:self.context_length - 2] + [eot]
            out[i, :len(toks)] = toks
        return out
