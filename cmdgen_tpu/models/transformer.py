"""Pre-norm transformer encoder/decoder with an explicit KV-cache decode.

Behavioral equivalent of GCPG's fairseq-based wrappers
(GCPG/model/transformer_blocks.py:10-133): pre-norm TransformerEncoder/
DecoderLayer stacks with a final LayerNorm, sinusoidal positional encodings,
and a single-step incremental decode path. Rebuilt batch-first in flax with
the fairseq incremental_state replaced by a fixed-shape KV cache
``[L, B, T_max, D]`` written at a dynamic index, so the whole autoregressive
loop runs in one ``lax.scan`` on device (see models/gcpg.py).

Mask convention: ``valid`` masks are 1.0 for attendable positions (the
reference uses inverted key_padding_masks; flipped here once at the
boundary).
"""
from __future__ import annotations

import dataclasses
import math

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e9


def sinusoidal_positions(max_len: int, dim: int) -> jnp.ndarray:
    """Standard sin/cos table [max_len, dim] (transformer_blocks.py:27-38)."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * (-math.log(10000.0) / dim)
    )
    pe = jnp.zeros((max_len, dim))
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div))
    return pe


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    dim: int = 384
    ff_dim: int = 1024
    n_head: int = 8
    n_layers: int = 8
    dropout: float = 0.1
    attention_dropout: float = 0.1


class MHA(nn.Module):
    """Multi-head attention with optional KV-cache single-step path."""

    dim: int
    n_head: int
    dropout: float = 0.0

    def setup(self):
        assert self.dim % self.n_head == 0
        self.q_proj = nn.Dense(self.dim, name="q")
        self.k_proj = nn.Dense(self.dim, name="k")
        self.v_proj = nn.Dense(self.dim, name="v")
        self.out_proj = nn.Dense(self.dim, name="out")
        self.attn_drop = nn.Dropout(rate=self.dropout)

    def _heads(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.n_head, self.dim // self.n_head).transpose(
            0, 2, 1, 3
        )

    def _attend(self, q, k, v, bias, deterministic):
        hd = self.dim // self.n_head
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
        if bias is not None:
            logits = logits + bias
        w = jax.nn.softmax(logits, axis=-1)
        if self.dropout > 0.0 and not deterministic:
            w = self.attn_drop(w, deterministic=False)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        b, _, s, _ = out.shape
        return self.out_proj(out.transpose(0, 2, 1, 3).reshape(b, s, self.dim))

    def __call__(self, x_q, x_kv, valid_kv=None, causal=False,
                 deterministic=True):
        """Full attention. x_q: [B,Sq,D], x_kv: [B,Sk,D],
        valid_kv: [B,Sk] 1=attendable."""
        q = self._heads(self.q_proj(x_q))
        k = self._heads(self.k_proj(x_kv))
        v = self._heads(self.v_proj(x_kv))
        bias = None
        if valid_kv is not None:
            bias = (1.0 - valid_kv[:, None, None, :]) * NEG_INF
        if causal:
            sq, sk = x_q.shape[1], x_kv.shape[1]
            cm = jnp.tril(jnp.ones((sq, sk)))
            cbias = (1.0 - cm)[None, None] * NEG_INF
            bias = cbias if bias is None else bias + cbias
        return self._attend(q, k, v, bias, deterministic)

    def decode_step(self, x_q, cache_k, cache_v, index):
        """Single-token self-attention against a KV cache.

        x_q: [B,1,D]; cache_k/v: [B,T_max,D] (raw projections, pre-head
        split); index: current position (scalar). Returns (out [B,1,D],
        new_cache_k, new_cache_v).
        """
        k_new = self.k_proj(x_q)
        v_new = self.v_proj(x_q)
        cache_k = jax.lax.dynamic_update_slice_in_dim(cache_k, k_new, index, axis=1)
        cache_v = jax.lax.dynamic_update_slice_in_dim(cache_v, v_new, index, axis=1)
        q = self._heads(self.q_proj(x_q))
        k = self._heads(cache_k)
        v = self._heads(cache_v)
        t_max = cache_k.shape[1]
        pos = jnp.arange(t_max)
        bias = jnp.where(pos <= index, 0.0, NEG_INF)[None, None, None, :]
        return self._attend(q, k, v, bias, True), cache_k, cache_v


class FeedForward(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.Dense(self.cfg.ff_dim)(x)
        h = nn.relu(h)
        if self.cfg.dropout > 0 and not deterministic:
            h = nn.Dropout(rate=self.cfg.dropout, deterministic=False)(h)
        h = nn.Dense(self.cfg.dim)(h)
        return h


class EncoderLayer(nn.Module):
    cfg: TransformerConfig

    def setup(self):
        c = self.cfg
        self.ln1 = nn.LayerNorm()
        self.ln2 = nn.LayerNorm()
        self.attn = MHA(c.dim, c.n_head, c.attention_dropout)
        self.ff = FeedForward(c)

    def __call__(self, x, valid=None, deterministic=True):
        h = self.ln1(x)
        x = x + self.attn(h, h, valid_kv=valid, deterministic=deterministic)
        x = x + self.ff(self.ln2(x), deterministic=deterministic)
        return x


class TransformerEncoder(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(self, x, valid=None, deterministic=True):
        for i in range(self.cfg.n_layers):
            x = EncoderLayer(self.cfg, name=f"layer_{i}")(
                x, valid, deterministic
            )
        return nn.LayerNorm(name="final_ln")(x)


class DecoderLayer(nn.Module):
    cfg: TransformerConfig

    def setup(self):
        c = self.cfg
        self.ln1 = nn.LayerNorm()
        self.ln2 = nn.LayerNorm()
        self.ln3 = nn.LayerNorm()
        self.self_attn = MHA(c.dim, c.n_head, c.attention_dropout)
        self.cross_attn = MHA(c.dim, c.n_head, c.attention_dropout)
        self.ff = FeedForward(c)

    def __call__(self, x, mem, mem_valid=None, deterministic=True):
        h = self.ln1(x)
        x = x + self.self_attn(h, h, causal=True, deterministic=deterministic)
        x = x + self.cross_attn(
            self.ln2(x), mem, valid_kv=mem_valid, deterministic=deterministic
        )
        x = x + self.ff(self.ln3(x), deterministic=deterministic)
        return x

    def decode_step(self, x, mem, cache_k, cache_v, index, mem_valid=None):
        h = self.ln1(x)
        attn, cache_k, cache_v = self.self_attn.decode_step(
            h, cache_k, cache_v, index
        )
        x = x + attn
        x = x + self.cross_attn(self.ln2(x), mem, valid_kv=mem_valid)
        x = x + self.ff(self.ln3(x))
        return x, cache_k, cache_v


class TransformerDecoder(nn.Module):
    cfg: TransformerConfig

    def setup(self):
        self.layers = [
            DecoderLayer(self.cfg, name=f"layer_{i}")
            for i in range(self.cfg.n_layers)
        ]
        self.final_ln = nn.LayerNorm(name="final_ln")

    def __call__(self, x, mem, mem_valid=None, deterministic=True):
        for layer in self.layers:
            x = layer(x, mem, mem_valid, deterministic)
        return self.final_ln(x)

    def init_cache(self, batch: int, t_max: int):
        c = self.cfg
        shape = (c.n_layers, batch, t_max, c.dim)
        return jnp.zeros(shape), jnp.zeros(shape)

    def decode_step(self, x, mem, cache_k, cache_v, index, mem_valid=None):
        """One token through all layers with the stacked KV cache.

        x: [B,1,D]; cache_k/v: [L,B,T_max,D]. Equivalent of
        TransformerDecoder.forward_one (transformer_blocks.py:122-133).
        """
        new_k, new_v = [], []
        for i, layer in enumerate(self.layers):
            x, ck, cv = layer.decode_step(
                x, mem, cache_k[i], cache_v[i], index, mem_valid
            )
            new_k.append(ck)
            new_v.append(cv)
        return self.final_ln(x), jnp.stack(new_k), jnp.stack(new_v)
