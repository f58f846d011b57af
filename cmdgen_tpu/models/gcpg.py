"""GCPG: pharmacophore-graph + property-conditioned CVAE SMILES generator.

Behavioral equivalent of the reference GCPG model (GCPG/model/gcpg.py:21-324):
a CVAE whose posterior encoder reads [condition ‖ pp-graph nodes ‖ SMILES
tokens], pools tokens with a ones-query attention, reparameterizes a single
latent z, fuses [condition ‖ pp nodes ‖ z] with a second encoder into the
decoder memory, and decodes SMILES autoregressively with an atom↔pharmacophore
mapping head on the decoder states.

TPU-native differences:
- batch-first tensors; DGL graphs replaced by dense [B, 8, ·] pp tensors
  (models/ppencoder.py); fairseq incremental decode replaced by a
  fixed-shape KV cache driven from one lax.scan (``generate``).
- the reference marks its condition token as *padding* in every attention
  mask (gcpg.py:208-210: cond_mask = ones = masked in fairseq), so the
  property conditions could never influence generation — a bug, per the
  survey's guidance on quirks. Here conditions are attendable.
- the pp-node pad value -999 (gcpg.py:177-183) is replaced by a proper
  validity mask.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cmdgen_tpu.config import GCPGModelConfig
from cmdgen_tpu.models.transformer import (
    MHA,
    TransformerConfig,
    TransformerDecoder,
    TransformerEncoder,
    sinusoidal_positions,
)


class MLPBlock(nn.Module):
    """Dense → PReLU → LayerNorm → Dense (the reference's little heads)."""

    dim: int
    out: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim)(x)
        x = nn.PReLU()(x)
        x = nn.LayerNorm()(x)
        return nn.Dense(self.out or self.dim)(x)


class ReluMLP(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim)(x)
        x = nn.relu(x)
        return nn.Dense(self.dim)(x)


class GCPG(nn.Module):
    cfg: GCPGModelConfig
    vocab_size: int
    sos_value: int = 0
    eos_value: int = 1
    pad_value: int = 2

    def setup(self):
        c = self.cfg
        h = c.hidden_dim
        tcfg = TransformerConfig(
            dim=h, ff_dim=c.ff_dim, n_head=c.n_head, n_layers=c.n_layers,
            dropout=c.dropout, attention_dropout=c.dropout,
        )
        self.cond_embedding = MLPBlock(h, name="cond_embedding")
        self.pp_v_init = nn.Dense(h, name="pp_v_init")
        self.pp_e_init = nn.Dense(h, name="pp_e_init")
        from cmdgen_tpu.models.ppencoder import PPEncoder

        self.pp_encoder = PPEncoder(
            h, n_layers=c.pp_encoder_n_layer, num_heads=8, name="pp_encoder"
        )
        self.encoder = TransformerEncoder(tcfg, name="encoder")
        self.pool_attention = MHA(h, c.n_head, name="pool_attention")
        self.dencoder = TransformerEncoder(tcfg, name="dencoder")
        self.decoder = TransformerDecoder(tcfg, name="decoder")
        self.word_embed = nn.Embed(self.vocab_size, h, name="word_embed")
        self.word_pred = MLPBlock(h, self.vocab_size, name="word_pred")
        self.z_mean = ReluMLP(h, name="z_mean")
        self.z_var = ReluMLP(h, name="z_var")
        self.expand = ReluMLPWithLN(h, name="expand")
        self.pp_seg = self.param("pp_seg", nn.initializers.normal(1.0), (h,))
        self.zz_seg = self.param("zz_seg", nn.initializers.normal(1.0), (h,))
        self.mapping_v = PReLUMLP(h, name="mapping_v")
        self.mapping_p = PReLUMLP(h, name="mapping_p")
        self.pos = sinusoidal_positions(c.max_len + 1, h)

    # -------------------------------------------------------------- pieces

    def process_p(self, pp_h, pp_e, pp_mask, deterministic=True):
        """Encode pp graphs -> (vv [B,8,H], vvs with segment enc).
        (reference process_p, gcpg.py:170-185)"""
        v = self.pp_v_init(pp_h)
        e = self.pp_e_init(
            jnp.zeros_like(pp_e) if self.cfg.remove_pp_dis else pp_e
        )
        v = self.pp_encoder(v, e, pp_mask, deterministic=deterministic)
        vv = v * pp_mask[..., None]
        vvs = vv + self.pp_seg
        return vv, vvs

    def embed_cond(self, conditions):
        """[B, cond_dim] -> [B, 1, H] condition prefix token."""
        return self.cond_embedding(conditions)[:, None, :]

    def posterior_z(self, key, inputs, input_valid, vvs, pp_mask, cond_emb,
                    deterministic=True):
        """q(z | cond, pp, tokens): encoder + ones-query attention pooling +
        reparameterization (gcpg.py:129-168)."""
        x = self.word_embed(inputs)
        s = x.shape[1]
        x = x + self.pos[None, :s, :]
        seq = jnp.concatenate([cond_emb, vvs, x], axis=1)
        cond_valid = jnp.full(
            (x.shape[0], 1), 0.0 if self.cfg.mask_cond_token else 1.0
        )
        valid = jnp.concatenate([cond_valid, pp_mask, input_valid], axis=1)
        enc = self.encoder(seq, valid, deterministic=deterministic)
        tok = enc[:, 1 + self.cfg.n_pp_max :, :]
        ones_q = jnp.ones((tok.shape[0], 1, tok.shape[-1]))
        pooled = self.pool_attention(ones_q, tok, valid_kv=input_valid)[:, 0, :]

        if self.cfg.non_vae:
            z = jax.random.normal(key, pooled.shape)
            return z, jnp.zeros(())
        mean = self.z_mean(pooled)
        log_var = -jnp.abs(self.z_var(pooled))
        kl = -0.5 * jnp.sum(1 + log_var - mean**2 - jnp.exp(log_var)) / mean.shape[0]
        eps = jax.random.normal(key, mean.shape)
        z = mean + jnp.exp(log_var / 2.0) * eps
        return z, kl

    def fuse_memory(self, z, vvs, pp_mask, cond_emb, deterministic=True):
        """[cond ‖ pp ‖ z] -> decoder memory (gcpg.py:187-202).
        Returns (memory [B, 1+8+1, H], mem_valid)."""
        zz = self.expand(z)[:, None, :] + self.pos[None, :1, :]
        zzs = zz + self.zz_seg
        mem = jnp.concatenate([cond_emb, vvs, zzs], axis=1)
        cond_valid = jnp.full(
            (z.shape[0], 1), 0.0 if self.cfg.mask_cond_token else 1.0
        )
        valid = jnp.concatenate(
            [cond_valid, pp_mask, jnp.ones((z.shape[0], 1))], axis=1
        )
        mem = self.dencoder(mem, valid, deterministic=deterministic)
        return mem, valid

    # ------------------------------------------------------------ training

    def __call__(self, key, inputs, input_valid, pp_h, pp_e, pp_mask,
                 targets, conditions, deterministic=True):
        """Teacher-forced training forward (gcpg.py:205-240).

        Returns (logits [B,S,V], mapping_scores [B,S,8], lm_loss, kl_loss).
        """
        vv, vvs = self.process_p(pp_h, pp_e, pp_mask, deterministic)
        cond_emb = self.embed_cond(conditions)
        z, kl = self.posterior_z(
            key, inputs, input_valid, vvs, pp_mask, cond_emb, deterministic
        )
        mem, mem_valid = self.fuse_memory(z, vvs, pp_mask, cond_emb, deterministic)

        s = targets.shape[1]
        temb = self.word_embed(targets) + self.pos[None, :s, :]
        out = self.decoder(temb, mem, mem_valid, deterministic=deterministic)
        logits = self.word_pred(out)

        # atom <-> pharmacophore mapping head (gcpg.py:229-232)
        mxx = self.mapping_v(out)
        mvv = self.mapping_p(vv)
        mapping_scores = jax.nn.sigmoid(
            jnp.einsum("bsh,bph->bsp", mxx, mvv)
        )

        # token LM loss, shifted, ignoring pad (gcpg.py:234-238)
        shifted = logits[:, :-1, :]
        labels = targets[:, 1:]
        logp = jax.nn.log_softmax(shifted, axis=-1)
        # label pick as a one-hot contraction: integer gathers lower to
        # scalar loops on XLA:TPU (models/egnn.py gather_nodes lesson);
        # the one-hot product fuses into the log_softmax consumer
        nll = -jnp.sum(
            logp * jax.nn.one_hot(labels, logp.shape[-1], dtype=logp.dtype),
            axis=-1,
        )
        not_pad = (labels != self.pad_value).astype(jnp.float32)
        lm_loss = jnp.sum(nll * not_pad) / jnp.maximum(jnp.sum(not_pad), 1.0)

        return logits, mapping_scores, lm_loss, kl

    # ----------------------------------------------------------- inference

    def prior_memory(self, key, pp_h, pp_e, pp_mask, conditions):
        """z ~ N(0, I) + memory for prior-sampled generation (gcpg.py:307-318)."""
        vv, vvs = self.process_p(pp_h, pp_e, pp_mask)
        cond_emb = self.embed_cond(conditions)
        z = jax.random.normal(key, (pp_h.shape[0], self.cfg.hidden_dim))
        mem, mem_valid = self.fuse_memory(z, vvs, pp_mask, cond_emb)
        return mem, mem_valid

    def posterior_memory(self, key, inputs, input_valid, pp_h, pp_e, pp_mask,
                         conditions):
        """Posterior-conditioned memory (the reference's ag_forward path,
        gcpg.py:292-305)."""
        vv, vvs = self.process_p(pp_h, pp_e, pp_mask)
        cond_emb = self.embed_cond(conditions)
        z, kl = self.posterior_z(key, inputs, input_valid, vvs, pp_mask, cond_emb)
        mem, mem_valid = self.fuse_memory(z, vvs, pp_mask, cond_emb)
        return mem, mem_valid, kl

    def init_cache(self, batch: int):
        return self.decoder.init_cache(batch, self.cfg.max_len)

    def decode_one(self, tok, t, mem, mem_valid, cache_k, cache_v):
        """Embed token ids [B] at position t, run one decoder step, return
        (logits [B,V], new caches)."""
        x = self.word_embed(tok)[:, None, :] + self.pos[t][None, None, :]
        out, cache_k, cache_v = self.decoder.decode_step(
            x, mem, cache_k, cache_v, t, mem_valid
        )
        return self.word_pred(out[:, 0, :]), cache_k, cache_v


class ReluMLPWithLN(nn.Module):
    """Dense → ReLU → LayerNorm → Dense (the reference's ``expand`` head)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim)(x)
        x = nn.relu(x)
        x = nn.LayerNorm()(x)
        return nn.Dense(self.dim)(x)


class PReLUMLP(nn.Module):
    """Dense → PReLU → Dense (mapping_transform heads)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim)(x)
        x = nn.PReLU()(x)
        return nn.Dense(self.dim)(x)


@functools.partial(
    jax.jit, static_argnames=("module", "random_sample", "valence")
)
def generate(
    module: GCPG,
    params,
    rng: jax.Array,
    pp_h: jnp.ndarray,
    pp_e: jnp.ndarray,
    pp_mask: jnp.ndarray,
    conditions: jnp.ndarray,
    random_sample: bool = False,
    memory: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    temperature: float = 1.0,
    constraints: Optional[jnp.ndarray] = None,
    valence: bool = False,
) -> jnp.ndarray:
    """Batched autoregressive generation under one lax.scan
    (replaces the reference's Python token loop, gcpg.py:242-290).

    Jitted whole (the flax Module is a static arg): run eagerly, the
    prior/cache applies and the per-token scan dispatch separately and
    launch latency dominates decode time (~8x slower measured end-to-end).

    ``temperature`` scales the sampling logits (``random_sample=True``
    only; the reference samples at fixed T=1, gcpg.py:265). It is a
    traced scalar, so sweeping values does not recompile.

    ``constraints`` (``chem.tokenizer.syntax_tables(tok)``, [V, 6] int32)
    enables syntax-constrained decoding: per-sequence parenthesis depth
    and a ring-label toggle bitmask are carried through the scan and
    tokens that would make the string unclosable are masked to -1e9
    before sampling — ")" at depth 0, <eos> (or <pad>-stop) with open
    parens/rings, an <eos> first token, and opening a new paren/ring when
    the outstanding closures no longer fit in the remaining length
    budget. Lifts validity on out-of-distribution conditioning without
    retraining.

    ``valence=True`` (requires ``constraints``) additionally carries a
    per-sequence valence state machine through the scan: the remaining
    bond budget of the current attachment atom (``chem.mol``
    ``check_valence`` rules, via ``syntax_tables`` columns 4-5), a
    branch stack of saved attachment budgets, and the pending bond
    order. Masked: atoms/ring-labels/branches whose incoming bond
    exceeds either end's remaining budget, bond tokens without a
    bondable attachment or stacked on another bond token, and
    eos/branch-close with a dangling bond token. Budgets charge bonds
    at their written order (kekulization only raises them), so every
    masked token is one the validity checker would reject — the mask
    under-approximates invalidity, never blocks a valid continuation.

    Returns token ids [B, max_len-1] (without <sos>). Positions after the
    first <eos> in each row are forced to <pad>.
    """
    b = pp_h.shape[0]
    max_len = module.cfg.max_len
    k_z, k_scan = jax.random.split(rng)
    if memory is None:
        mem, mem_valid = module.apply(
            params, k_z, pp_h, pp_e, pp_mask, conditions,
            method=GCPG.prior_memory,
        )
    else:
        mem, mem_valid = memory
    cache_k, cache_v = module.apply(params, b, method=GCPG.init_cache)

    tokens0 = jnp.full((b,), module.sos_value, dtype=jnp.int32)
    finished0 = jnp.zeros((b,), dtype=bool)
    depth0 = jnp.zeros((b,), dtype=jnp.int32)
    rings0 = jnp.zeros((b,), dtype=jnp.int32)
    if constraints is not None:
        c_delta = constraints[:, 0]
        c_ring = constraints[:, 1]
        c_eos = constraints[:, 2] == 1
        c_special = constraints[:, 2] == 2
        c_start = constraints[:, 3]
        c_val = constraints[:, 4]
        c_bond = constraints[:, 5]
    STACK_D = 16  # branch-nesting cap under valence tracking
    # valence state: prev = remaining bond budget of the current
    # attachment atom (-1 = none: start / after "."), pend = pending
    # bond-token order, fresh = the attachment atom is also the top
    # stacked copy (between "(" and the first bond made inside the
    # branch) so consumption must mirror onto the stack, vstack = saved
    # attachment budgets at each open branch
    prev0 = jnp.full((b,), -1, dtype=jnp.int32)
    pend0 = jnp.zeros((b,), dtype=jnp.int32)
    fresh0 = jnp.zeros((b,), dtype=bool)
    vstack0 = jnp.zeros((b, STACK_D), dtype=jnp.int32)

    def step(carry, t):
        tok, ck, cv, finished, depth, rings, prev, pend, fresh, vstack, \
            key = carry
        key, sub = jax.random.split(key)
        logits, ck, cv = module.apply(
            params, tok, t - 1, mem, mem_valid, ck, cv,
            method=GCPG.decode_one,
        )
        if constraints is not None:
            # forbid tokens that make the string syntactically unclosable
            need = depth + jax.lax.population_count(rings)
            ring_hits = (rings[:, None] & c_ring[None, :]) != 0
            ring_open = (c_ring[None, :] != 0) & ~ring_hits
            closing = (c_delta[None, :] < 0) | ring_hits
            # after an opening token its closure must fit in the
            # max_len-1-t slots that remain; "(" additionally needs an
            # atom before its ")" (the empty-branch rule below would
            # otherwise dead-end the row with every token forbidden)
            rem = max_len - 1 - t
            over_budget = (
                (c_delta[None, :] > 0) & ((need[:, None] + 3) > rem)
            ) | (ring_open & ((need[:, None] + 1) > rem))
            # once the outstanding closures equal the remaining slots,
            # ONLY closing tokens keep the string finishable
            must_close = (need[:, None] > 0) & (
                need[:, None] >= (max_len - 1 - t)
            )
            closes_empty = (c_delta[None, :] < 0) & (depth[:, None] == 0)
            # ")" directly after "(" would emit an empty branch "()"
            empty_branch = (c_delta[None, :] < 0) & (
                (c_delta[tok] > 0)[:, None]
            )
            open_state = (depth > 0) | (rings != 0)
            bad_eos = c_eos[None, :] & (open_state[:, None] | (t == 1))
            bad_start = (c_start[None, :] > 0) & (t == 1)
            forbidden = (
                closes_empty | bad_eos | over_budget | (must_close & ~closing)
                | empty_branch | bad_start | c_special[None, :]
            )
            if valence:
                has_prev = (prev >= 0)[:, None]
                bmax = jnp.maximum(pend, 1)[:, None]
                pending = (pend != 0)[:, None]
                is_atom = (c_val >= 0)[None, :]
                is_bond = (c_bond > 0)[None, :]
                is_dot = (c_bond < 0)[None, :]
                is_open = (c_delta > 0)[None, :]
                is_close = (c_delta < 0)[None, :]
                is_ring = (c_ring != 0)[None, :]
                after_open = (c_delta[tok] > 0)[:, None]
                v_forbidden = (
                    # an atom's incoming bond must fit both ends
                    (is_atom & has_prev
                     & ((prev[:, None] < bmax) | (c_val[None, :] < bmax)))
                    # bond tokens: need a bondable attachment, no stacking
                    | (is_bond & (~has_prev | pending
                                  | (prev[:, None] < c_bond[None, :])))
                    # "(": the branch will bond to the attachment atom;
                    # also no "((" and the stack-depth cap
                    | (is_open & (~has_prev | (prev[:, None] < 1) | pending
                                  | after_open
                                  | (depth[:, None] >= STACK_D - 1)))
                    # ")" / <eos> / "." with a dangling bond token
                    | ((is_close | c_eos[None, :] | is_dot) & pending)
                    # ring labels bond the attachment atom at both events
                    | (is_ring & (~has_prev | (prev[:, None] < bmax)))
                    # liveness: with open rings and no branch to escape
                    # to, an atom whose incoming bond exhausts its budget
                    # (F, Cl, [O-], ...) leaves no way to ever close them
                    | (is_atom
                       & ((c_val[None, :] - bmax) < 1)
                       & ((rings != 0) & (depth == 0))[:, None])
                )
                forbidden = forbidden | v_forbidden
            logits = jnp.where(forbidden, -1e9, logits)
        if random_sample:
            nxt = jax.random.categorical(
                sub, logits / jnp.maximum(temperature, 1e-6), axis=-1
            )
        else:
            nxt = jnp.argmax(logits, axis=-1)
        nxt = jnp.where(finished, module.pad_value, nxt).astype(jnp.int32)
        finished = finished | (nxt == module.eos_value)
        if constraints is not None:
            # <pad> rows of the table are zero, so post-<eos> forced pads
            # leave the (now unused) counters unchanged
            depth = depth + c_delta[nxt]
            rings = rings ^ c_ring[nxt]
            if valence:
                t_val, t_bond = c_val[nxt], c_bond[nxt]
                t_push = c_delta[nxt] > 0
                t_pop = c_delta[nxt] < 0
                t_ring = c_ring[nxt] != 0
                t_atom = t_val >= 0
                bo = jnp.maximum(pend, 1)
                # bonds consumed from the attachment atom by this token
                consume = jnp.where(
                    (t_atom & (prev >= 0)) | t_ring, bo, 0
                )
                prev_c = prev - consume
                # mirror consumption onto the stacked copy while the
                # attachment atom is itself the stack top (post-"(")
                oh_top = jax.nn.one_hot(
                    jnp.clip(depth - c_delta[nxt] - 1, 0, STACK_D - 1),
                    STACK_D, dtype=jnp.int32,
                )
                vstack = jnp.where(
                    (fresh & (consume > 0))[:, None],
                    vstack - oh_top * consume[:, None], vstack,
                )
                # "(" pushes the attachment budget at the pre-push depth
                oh_push = jax.nn.one_hot(
                    jnp.clip(depth - 1, 0, STACK_D - 1), STACK_D,
                    dtype=jnp.int32,
                )
                vstack = jnp.where(
                    t_push[:, None],
                    vstack * (1 - oh_push) + oh_push * prev_c[:, None],
                    vstack,
                )
                # ")" restores the saved attachment (depth already
                # decremented: the popped slot is the new depth's)
                popped = jnp.sum(vstack * oh_top, axis=1)
                prev = jnp.where(
                    t_atom,
                    t_val - jnp.where(prev >= 0, bo, 0),
                    jnp.where(t_pop, popped, prev_c),
                )
                prev = jnp.where(t_bond < 0, -1, prev)  # "." disconnect
                pend = jnp.where(t_bond > 0, t_bond, 0)
                fresh = jnp.where(
                    t_push, True, jnp.where(t_bond > 0, fresh, False)
                )
        return (nxt, ck, cv, finished, depth, rings, prev, pend, fresh,
                vstack, key), nxt

    _, toks = jax.lax.scan(
        step,
        (tokens0, cache_k, cache_v, finished0, depth0, rings0, prev0,
         pend0, fresh0, vstack0, k_scan),
        jnp.arange(1, max_len),
    )
    return toks.T  # [B, max_len-1]
