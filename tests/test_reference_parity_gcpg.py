"""GCPG decode-path weight-transplant parity vs the reference's own code.

Loads the reference's ``GCPG/model/gcpg.py`` + ``transformer_blocks.py``
and runs them here (CPU torch) with pure-torch stand-ins for fairseq
0.10.2 (the pinned version, env/environment_gcpg.yml:24): fairseq's
``MultiheadAttention`` / ``TransformerEncoderLayer`` /
``TransformerDecoderLayer`` are thin wrappers over standard pre-norm MHA
math (same trick the suite already uses for torch_scatter). The DGL graph
encoders are constructor-only stubs: both sides are fed identical
post-pp-encoder ``vv`` tensors, scoping the comparison to
``gcpg.py:129-240`` — calculate_z (encoder + ones-query attention pooling),
resample (reparameterization + KL), expand_then_fusing (dencoder memory),
the teacher-forced decoder, word_pred, the mapping heads, and the LM loss.

The flax model runs with ``mask_cond_token=True`` to replicate the
reference's condition-mask bug (gcpg.py:208-210) for exact comparison;
production keeps it off (PARITY.md).

Causal-mask note: the reference's forward passes a *bool* triu mask as
``x_mask`` (gcpg.py:221-222), and fairseq 0.10.2's MultiheadAttention
*adds* attn_mask to the logits (multihead_attention.py: ``attn_weights +=
attn_mask``) — a bool mask therefore bumps future-position logits by +1.0
instead of masking them: the reference trains its teacher-forced decoder
with a future-token leak. Its *generation* path (forward_one with
incremental_state) never sees future tokens, so the deployed decode is
strictly causal. The stand-in below uses the intended/deployed causal
semantics (masked_fill -inf), which is what our decoder implements; the
leak is documented as a non-replicated reference quirk in PARITY.md.

Numerics: flax LayerNorm eps is 1e-6 vs torch's 1e-5 — sub-1e-4 relative
effect at these scales, covered by the tolerances.
"""
from __future__ import annotations

import importlib.util
import math
import pathlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

_REF_DIR = pathlib.Path("/root/reference/GCPG/model")

pytestmark = pytest.mark.skipif(
    not (_REF_DIR / "gcpg.py").exists(), reason="reference tree not present"
)

HID = 32
N_HEAD = 4
N_LAYERS = 2
FF = 64
VOCAB = 32
COND = 7
MAX_LEN = 24
N_PP = 8
B = 3
PP_SIZES = [3, 5, 8]
TOK_SIZES = [6, 9, 12]  # valid token counts (inputs)
SEQ = 12


# --------------------------------------------------- fairseq 0.10.2 stand-in


class _StandInMHA(tnn.Module):
    """fairseq.modules.MultiheadAttention stand-in (deployed semantics).

    Same parameterization (q/k/v/out_proj with bias) and math: q scaled by
    head_dim**-0.5, key_padding_mask masked_fill(-inf), softmax, out_proj.
    attn_mask uses masked_fill(-inf) for bool masks — see module docstring
    for why this deliberately differs from 0.10.2's ``+=``.
    """

    def __init__(self, embed_dim, num_heads, dropout=0.0, **_):
        super().__init__()
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.scaling = self.head_dim ** -0.5
        self.q_proj = tnn.Linear(embed_dim, embed_dim)
        self.k_proj = tnn.Linear(embed_dim, embed_dim)
        self.v_proj = tnn.Linear(embed_dim, embed_dim)
        self.out_proj = tnn.Linear(embed_dim, embed_dim)
        self.dropout_p = dropout

    def forward(self, query, key, value, key_padding_mask=None,
                attn_mask=None, incremental_state=None, static_kv=False,
                need_weights=True, **_):
        # (T, B, C) layout like fairseq
        tq, bsz, _ = query.shape
        h, hd = self.num_heads, self.head_dim
        q = self.q_proj(query) * self.scaling
        if incremental_state is not None:
            # fairseq's per-module saved-state protocol (keys scoped by
            # instance): static_kv caches the projected memory once;
            # self-attention appends the current step's k/v to the stored
            # prefix (multihead_attention.py _get/_set_input_buffer)
            st = incremental_state.setdefault(str(id(self)), {})
            if static_kv and "k" in st:
                k, v = st["k"], st["v"]
            else:
                k_new = self.k_proj(key)
                v_new = self.v_proj(value)
                if not static_kv and "k" in st:
                    k = torch.cat([st["k"], k_new], dim=0)
                    v = torch.cat([st["v"], v_new], dim=0)
                else:
                    k, v = k_new, v_new
                st["k"], st["v"] = k, v
        else:
            k = self.k_proj(key)
            v = self.v_proj(value)
        tk = k.shape[0]
        q = q.view(tq, bsz * h, hd).transpose(0, 1)
        k = k.view(tk, bsz * h, hd).transpose(0, 1)
        v = v.view(tk, bsz * h, hd).transpose(0, 1)
        w = torch.bmm(q, k.transpose(1, 2))  # (B*H, Tq, Tk)
        if attn_mask is not None:
            m = attn_mask.to(torch.bool)
            w = w.masked_fill(m.unsqueeze(0), float("-inf"))
        if key_padding_mask is not None:
            w = w.view(bsz, h, tq, tk).masked_fill(
                key_padding_mask.to(torch.bool).unsqueeze(1).unsqueeze(2),
                float("-inf"),
            ).view(bsz * h, tq, tk)
        w = tF.softmax(w, dim=-1)
        if self.training and self.dropout_p > 0:
            w = tF.dropout(w, p=self.dropout_p)
        out = torch.bmm(w, v).transpose(0, 1).contiguous().view(
            tq, bsz, self.embed_dim
        )
        return self.out_proj(out), None


class _StandInEncoderLayer(tnn.Module):
    """fairseq TransformerEncoderLayer, normalize_before=True, relu."""

    def __init__(self, args):
        super().__init__()
        dim = args.encoder_embed_dim
        assert args.encoder_normalize_before
        self.self_attn = _StandInMHA(
            dim, args.encoder_attention_heads, dropout=args.attention_dropout
        )
        self.self_attn_layer_norm = tnn.LayerNorm(dim)
        self.fc1 = tnn.Linear(dim, args.encoder_ffn_embed_dim)
        self.fc2 = tnn.Linear(args.encoder_ffn_embed_dim, dim)
        self.final_layer_norm = tnn.LayerNorm(dim)

    def forward(self, x, encoder_padding_mask=None, attn_mask=None):
        residual = x
        x = self.self_attn_layer_norm(x)
        x, _ = self.self_attn(x, x, x, key_padding_mask=encoder_padding_mask,
                              attn_mask=attn_mask)
        x = residual + x
        residual = x
        x = self.final_layer_norm(x)
        x = residual + self.fc2(tF.relu(self.fc1(x)))
        return x


class _StandInDecoderLayer(tnn.Module):
    """fairseq TransformerDecoderLayer, normalize_before=True, relu."""

    def __init__(self, args):
        super().__init__()
        dim = args.decoder_embed_dim
        assert args.decoder_normalize_before
        self.self_attn = _StandInMHA(
            dim, args.decoder_attention_heads, dropout=args.attention_dropout
        )
        self.self_attn_layer_norm = tnn.LayerNorm(dim)
        self.encoder_attn = _StandInMHA(
            dim, args.decoder_attention_heads, dropout=args.attention_dropout
        )
        self.encoder_attn_layer_norm = tnn.LayerNorm(dim)
        self.fc1 = tnn.Linear(dim, args.decoder_ffn_embed_dim)
        self.fc2 = tnn.Linear(args.decoder_ffn_embed_dim, dim)
        self.final_layer_norm = tnn.LayerNorm(dim)

    def forward(self, x, encoder_out=None, encoder_padding_mask=None,
                incremental_state=None, self_attn_mask=None,
                self_attn_padding_mask=None, **_):
        residual = x
        x = self.self_attn_layer_norm(x)
        x, _ = self.self_attn(x, x, x,
                              key_padding_mask=self_attn_padding_mask,
                              attn_mask=self_attn_mask,
                              incremental_state=incremental_state)
        x = residual + x
        residual = x
        x = self.encoder_attn_layer_norm(x)
        x, _ = self.encoder_attn(x, encoder_out, encoder_out,
                                 key_padding_mask=encoder_padding_mask,
                                 incremental_state=incremental_state,
                                 static_kv=incremental_state is not None)
        x = residual + x
        residual = x
        x = self.final_layer_norm(x)
        x = residual + self.fc2(tF.relu(self.fc1(x)))
        return x, None, None


class _StubGraphBlock(tnn.Module):
    """Constructor-only stub for the DGL pp-graph encoders (bypassed)."""

    def __init__(self, *a, **k):
        super().__init__()


def _load_reference_gcpg():
    """Import the reference GCPG model with the stand-ins installed."""
    names = [
        "fairseq", "fairseq.modules", "fairseq.models",
        "model", "model.ggcn_layers", "model.graphtransformer_layers",
        "model.egat_layers", "model.transformer_blocks",
        "utils", "utils.smiles2ppgraph",
    ]
    saved = {k: sys.modules.get(k) for k in names}

    fs = types.ModuleType("fairseq")
    fs_modules = types.ModuleType("fairseq.modules")
    fs_modules.MultiheadAttention = _StandInMHA
    fs_modules.TransformerEncoderLayer = _StandInEncoderLayer
    fs_modules.TransformerDecoderLayer = _StandInDecoderLayer
    fs_models = types.ModuleType("fairseq.models")
    fs_models.FairseqIncrementalDecoder = tnn.Module
    fs.modules, fs.models = fs_modules, fs_models

    model_pkg = types.ModuleType("model")
    ggcn = types.ModuleType("model.ggcn_layers")
    ggcn.GGCNEncoderBlock = _StubGraphBlock
    gtr = types.ModuleType("model.graphtransformer_layers")
    gtr.DGLGraphTransformerBlock = _StubGraphBlock
    egat = types.ModuleType("model.egat_layers")
    egat.EGATEncoderBlock = _StubGraphBlock
    uti = types.ModuleType("utils")
    s2pp = types.ModuleType("utils.smiles2ppgraph")
    s2pp.MAX_NUM_PP_GRAPHS = N_PP

    sys.modules.update({
        "fairseq": fs, "fairseq.modules": fs_modules,
        "fairseq.models": fs_models,
        "model": model_pkg, "model.ggcn_layers": ggcn,
        "model.graphtransformer_layers": gtr, "model.egat_layers": egat,
        "utils": uti, "utils.smiles2ppgraph": s2pp,
    })
    try:
        spec = importlib.util.spec_from_file_location(
            "model.transformer_blocks", _REF_DIR / "transformer_blocks.py"
        )
        tb = importlib.util.module_from_spec(spec)
        sys.modules["model.transformer_blocks"] = tb
        spec.loader.exec_module(tb)
        model_pkg.transformer_blocks = tb

        spec = importlib.util.spec_from_file_location(
            "ref_gcpg_model", _REF_DIR / "gcpg.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        for k in names:
            if saved[k] is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = saved[k]


class _Tok:
    s2i = {"<sos>": 0, "<eos>": 1, "<pad>": 2}

    def __len__(self):
        return VOCAB


@pytest.fixture(scope="module")
def refg():
    mod = _load_reference_gcpg()
    torch.manual_seed(7)
    m = mod.GCPG(
        {
            "max_len": MAX_LEN, "cond_dim": COND, "pp_v_dim": 8,
            "pp_e_dim": 1, "pp_encoder_n_layer": 2, "hidden_dim": HID,
            "n_layers": N_LAYERS, "ff_dim": FF, "n_head": N_HEAD,
            "non_vae": False, "remove_pp_dis": False,
        },
        _Tok(),
    )
    m.eval()
    return m


# ------------------------------------------------------- weight transplant


def _lin(tl):
    return {"kernel": jnp.asarray(tl.weight.detach().numpy().T),
            "bias": jnp.asarray(tl.bias.detach().numpy())}


def _ln(tl):
    return {"scale": jnp.asarray(tl.weight.detach().numpy()),
            "bias": jnp.asarray(tl.bias.detach().numpy())}


def _prelu(tp):
    return {"negative_slope": jnp.asarray(
        tp.weight.detach().numpy().reshape(()))}


def _mlp_block(seq):
    """torch Sequential(Linear, PReLU, LayerNorm, Linear) -> MLPBlock."""
    return {"Dense_0": _lin(seq[0]), "PReLU_0": _prelu(seq[1]),
            "LayerNorm_0": _ln(seq[2]), "Dense_1": _lin(seq[3])}


def _relu_mlp(seq):
    """torch Sequential(Linear, ReLU, Linear) -> ReluMLP."""
    return {"Dense_0": _lin(seq[0]), "Dense_1": _lin(seq[2])}


def _expand_mlp(seq):
    """torch Sequential(Linear, ReLU, LayerNorm, Linear, Rearrange)."""
    return {"Dense_0": _lin(seq[0]), "LayerNorm_0": _ln(seq[2]),
            "Dense_1": _lin(seq[3])}


def _prelu_mlp(seq):
    """torch Sequential(Linear, PReLU, Linear) -> PReLUMLP."""
    return {"Dense_0": _lin(seq[0]), "PReLU_0": _prelu(seq[1]),
            "Dense_1": _lin(seq[2])}


def _mha(tm):
    return {"q": _lin(tm.q_proj), "k": _lin(tm.k_proj),
            "v": _lin(tm.v_proj), "out": _lin(tm.out_proj)}


def _encoder(tenc):
    p = {"final_ln": _ln(tenc.layer_norm)}
    for i, lay in enumerate(tenc.layer):
        p[f"layer_{i}"] = {
            "ln1": _ln(lay.self_attn_layer_norm),
            "ln2": _ln(lay.final_layer_norm),
            "attn": _mha(lay.self_attn),
            "ff": {"Dense_0": _lin(lay.fc1), "Dense_1": _lin(lay.fc2)},
        }
    return p


def _decoder(tdec):
    p = {"final_ln": _ln(tdec.layer_norm)}
    for i, lay in enumerate(tdec.layer):
        p[f"layer_{i}"] = {
            "ln1": _ln(lay.self_attn_layer_norm),
            "ln2": _ln(lay.encoder_attn_layer_norm),
            "ln3": _ln(lay.final_layer_norm),
            "self_attn": _mha(lay.self_attn),
            "cross_attn": _mha(lay.encoder_attn),
            "ff": {"Dense_0": _lin(lay.fc1), "Dense_1": _lin(lay.fc2)},
        }
    return p


def _transplant(ref, params):
    """Overwrite the flax GCPG param tree with the reference's weights
    (pp_v_init / pp_e_init / pp_encoder stay — the pp encoder is bypassed)."""
    p = dict(params["params"])
    p["cond_embedding"] = _mlp_block(ref.cond_embedding)
    p["encoder"] = _encoder(ref.encoder)
    p["pool_attention"] = _mha(ref.attention)
    p["dencoder"] = _encoder(ref.dencoder)
    p["decoder"] = _decoder(ref.decoder)
    p["word_embed"] = {
        "embedding": jnp.asarray(ref.word_embed.weight.detach().numpy())}
    p["word_pred"] = _mlp_block(ref.word_pred)
    p["z_mean"] = _relu_mlp(ref.mean)
    p["z_var"] = _relu_mlp(ref.var)
    p["expand"] = _expand_mlp(ref.expand)
    p["mapping_v"] = _prelu_mlp(ref.mapping_transform_v)
    p["mapping_p"] = _prelu_mlp(ref.mapping_transform_p)
    p["pp_seg"] = jnp.asarray(ref.pp_seg_encoding.detach().numpy())
    p["zz_seg"] = jnp.asarray(ref.zz_seg_encoding.detach().numpy())
    return {"params": p}


# ----------------------------------------------------------------- fixtures


def _inputs(seed=11):
    rng = np.random.default_rng(seed)
    vv = rng.standard_normal((B, N_PP, HID)).astype(np.float32)
    pp_valid = np.zeros((B, N_PP), np.float32)
    for b, s in enumerate(PP_SIZES):
        pp_valid[b, :s] = 1.0
    tokens = rng.integers(3, VOCAB, size=(B, SEQ)).astype(np.int32)
    tokens[:, 0] = 0  # <sos>
    tok_valid = np.zeros((B, SEQ), np.float32)
    for b, s in enumerate(TOK_SIZES):
        tok_valid[b, :s] = 1.0
        tokens[b, s - 1] = 1  # <eos>
        tokens[b, s:] = 2  # <pad>
    cond = rng.standard_normal((B, COND)).astype(np.float32)
    eps = rng.standard_normal((B, HID)).astype(np.float32)
    return vv, pp_valid, tokens, tok_valid, cond, eps


def _ref_side(refg, vv, pp_valid, tokens, tok_valid, cond, eps):
    """Run the reference forward pieces (gcpg.py:129-240), bypassing
    process_p: vv padded with the reference's -999 sentinel."""
    vv_ref = np.where(pp_valid[..., None] > 0, vv, -999.0)
    vv_t = torch.from_numpy(np.ascontiguousarray(
        vv_ref.transpose(1, 0, 2)))  # (seq, B, H)
    vvs_t = vv_t + refg.pp_seg_encoding
    pp_mask_t = torch.from_numpy(pp_valid < 0.5)
    inputs_t = torch.from_numpy(tokens.astype(np.int64))
    input_mask_t = torch.from_numpy(tok_valid < 0.5)
    cond_t = torch.from_numpy(cond)
    eps_t = torch.from_numpy(eps)

    orig_randn_like = torch.randn_like
    torch.randn_like = lambda t, **k: eps_t.to(t.dtype)
    try:
        with torch.no_grad():
            cond_embedd = refg.cond_embedding(cond_t).unsqueeze(0)
            # the reference's bug: cond token marked as padding everywhere
            cond_mask = torch.ones(B, 1, dtype=torch.bool)
            z, kl = refg.calculate_z(
                inputs_t, input_mask_t, vvs_t, pp_mask_t, cond_embedd,
                cond_mask,
            )
            czzz, cond_full_mask = refg.expand_then_fusing(
                z, pp_mask_t, vvs_t, cond_mask, cond_embedd
            )
            # teacher-forced decode (gcpg.py:218-238) with the deployed
            # causal semantics: float -inf triu (see module docstring)
            tlen = tokens.shape[1]
            tmask = torch.zeros(tlen, tlen).masked_fill(
                torch.triu(torch.ones(tlen, tlen, dtype=torch.bool), 1),
                float("-inf"),
            )
            temb = refg.pos_encoding(
                refg.word_embed(inputs_t).permute(1, 0, 2).contiguous())
            out = refg.decoder(
                temb, czzz, x_mask=tmask, mem_padding_mask=cond_full_mask
            ).permute(1, 0, 2).contiguous()
            logits = refg.word_pred(out)
            mxx = refg.mapping_transform_v(out)
            mvv = refg.mapping_transform_p(vv_t)
            mapping = torch.sigmoid(
                torch.bmm(mxx, mvv.permute(1, 2, 0).contiguous()))
            lm = tF.cross_entropy(
                logits[:, :-1, :].reshape(-1, VOCAB),
                inputs_t[:, 1:].reshape(-1),
                ignore_index=2,
            )
    finally:
        torch.randn_like = orig_randn_like
    return {
        "z": z.numpy(), "kl": float(kl), "mem": czzz.numpy(),
        "logits": logits.numpy(), "mapping": mapping.numpy(),
        "lm": float(lm),
    }


def _our_side(refg, vv, pp_valid, tokens, tok_valid, cond, eps,
              monkeypatch):
    from cmdgen_tpu.config import GCPGModelConfig
    from cmdgen_tpu.models.gcpg import GCPG

    cfg = GCPGModelConfig(
        max_len=MAX_LEN, pp_v_dim=8, pp_e_dim=1, pp_encoder_n_layer=2,
        hidden_dim=HID, n_layers=N_LAYERS, ff_dim=FF, n_head=N_HEAD,
        cond_dim=COND, mask_cond_token=True,
    )
    model = GCPG(cfg, vocab_size=VOCAB, sos_value=0, eos_value=1,
                 pad_value=2)
    key = jax.random.PRNGKey(0)
    pp_h = jnp.zeros((B, N_PP, 8))
    pp_e = jnp.zeros((B, N_PP, N_PP, 1))
    params = model.init(
        key, key, jnp.asarray(tokens), jnp.asarray(tok_valid), pp_h, pp_e,
        jnp.asarray(pp_valid), jnp.asarray(tokens), jnp.asarray(cond),
    )
    params = _transplant(refg, params)

    # fixed posterior noise: same eps as the reference side
    monkeypatch.setattr(
        jax.random, "normal",
        lambda k, shape=None, dtype=jnp.float32: jnp.asarray(eps),
    )
    m = model.bind(params)
    vv_ours = jnp.asarray(vv) * jnp.asarray(pp_valid)[..., None]
    vvs = vv_ours + m.pp_seg
    cond_emb = m.embed_cond(jnp.asarray(cond))
    z, kl = m.posterior_z(
        key, jnp.asarray(tokens), jnp.asarray(tok_valid), vvs,
        jnp.asarray(pp_valid), cond_emb,
    )
    mem, mem_valid = m.fuse_memory(
        z, vvs, jnp.asarray(pp_valid), cond_emb)
    temb = m.word_embed(jnp.asarray(tokens)) + m.pos[None, :SEQ, :]
    out = m.decoder(temb, mem, mem_valid)
    logits = m.word_pred(out)
    mapping = jax.nn.sigmoid(
        jnp.einsum("bsh,bph->bsp", m.mapping_v(out), m.mapping_p(vv_ours)))

    shifted = logits[:, :-1, :]
    labels = jnp.asarray(tokens)[:, 1:]
    logp = jax.nn.log_softmax(shifted, axis=-1)
    nll = -jnp.sum(
        logp * jax.nn.one_hot(labels, VOCAB, dtype=logp.dtype), axis=-1)
    not_pad = (labels != 2).astype(jnp.float32)
    lm = jnp.sum(nll * not_pad) / jnp.maximum(jnp.sum(not_pad), 1.0)
    return {
        "z": np.asarray(z), "kl": float(kl), "mem": np.asarray(mem),
        "logits": np.asarray(logits), "mapping": np.asarray(mapping),
        "lm": float(lm),
    }


TOL = dict(rtol=2e-4, atol=5e-4)


@pytest.fixture(scope="module")
def both(refg):
    data = _inputs()
    ref_out = _ref_side(refg, *data)
    mp = pytest.MonkeyPatch()
    try:
        ours = _our_side(refg, *data, mp)
    finally:
        mp.undo()
    return ref_out, ours, data


def test_posterior_z_matches_reference(both):
    """calculate_z: encoder + ones-query pooling + reparameterized z and
    the KL term (gcpg.py:129-168), same posterior noise on both sides."""
    ref_out, ours, _ = both
    np.testing.assert_allclose(ours["z"], ref_out["z"], **TOL)
    np.testing.assert_allclose(ours["kl"], ref_out["kl"], rtol=2e-4)


def test_fused_memory_matches_reference(both):
    """expand_then_fusing (gcpg.py:187-202): compare the decoder memory at
    the cond token, valid pp rows, and the z row (padded pp rows carry the
    reference's -999 sentinel vs our zeros — both masked from attention)."""
    ref_out, ours, data = both
    _, pp_valid = data[0], data[1]
    mem_ref = ref_out["mem"].transpose(1, 0, 2)  # (B, 10, H)
    for b in range(B):
        rows = [0] + [1 + i for i in range(N_PP) if pp_valid[b, i] > 0] + [
            1 + N_PP]
        np.testing.assert_allclose(
            ours["mem"][b, rows], mem_ref[b, rows], **TOL)


def test_decoder_logits_and_loss_match_reference(both):
    """Teacher-forced decoder + word_pred + LM loss (gcpg.py:218-238)."""
    ref_out, ours, _ = both
    np.testing.assert_allclose(ours["logits"], ref_out["logits"], **TOL)
    np.testing.assert_allclose(ours["lm"], ref_out["lm"], rtol=2e-4)


def test_incremental_decode_matches_reference(refg, both):
    """The deployed decode path: the reference's forward_one incremental
    decoder (gcpg.py:246-285, transformer_blocks.py:122-133) vs our
    KV-cache decode_step, per-step word_pred logits over a FORCED token
    sequence (forced tokens avoid argmax-tiebreak chaos on an untrained
    model; our scan decode == full decode is covered in
    tests/test_gcpg_model.py)."""
    ref_out, ours_prev, data = both
    vv, pp_valid, tokens, tok_valid, cond, eps = data

    # --- reference side: incremental loop with forced tokens
    mem_t = torch.from_numpy(ref_out["mem"])  # (10, B, H)
    pp_mask_t = torch.from_numpy(pp_valid < 0.5)
    cond_mask = torch.ones(B, 1, dtype=torch.bool)
    full_mask = torch.cat(
        [cond_mask, pp_mask_t, torch.zeros(B, 1, dtype=torch.bool)], dim=1)
    forced = torch.from_numpy(tokens.astype(np.int64))
    steps = SEQ - 1
    ref_logits = []
    with torch.no_grad():
        inc = {}
        text_pos = refg.pos_encoding.pe
        emb = refg.word_embed(forced[:, 0]) + text_pos[0]
        emb = emb.unsqueeze(0)
        for t in range(1, steps + 1):
            one = refg.decoder.forward_one(
                emb, mem_t, inc, mem_padding_mask=full_mask).squeeze(0)
            ref_logits.append(refg.word_pred(one).numpy())
            emb = (refg.word_embed(forced[:, t]) + text_pos[t]).unsqueeze(0)
    ref_logits = np.stack(ref_logits, axis=1)  # [B, steps, V]

    # --- our side: decode_one over the same forced tokens
    from cmdgen_tpu.config import GCPGModelConfig
    from cmdgen_tpu.models.gcpg import GCPG

    cfg = GCPGModelConfig(
        max_len=MAX_LEN, pp_v_dim=8, pp_e_dim=1, pp_encoder_n_layer=2,
        hidden_dim=HID, n_layers=N_LAYERS, ff_dim=FF, n_head=N_HEAD,
        cond_dim=COND, mask_cond_token=True,
    )
    model = GCPG(cfg, vocab_size=VOCAB, sos_value=0, eos_value=1,
                 pad_value=2)
    key = jax.random.PRNGKey(0)
    pp_h = jnp.zeros((B, N_PP, 8))
    pp_e = jnp.zeros((B, N_PP, N_PP, 1))
    params = model.init(
        key, key, jnp.asarray(tokens), jnp.asarray(tok_valid), pp_h, pp_e,
        jnp.asarray(pp_valid), jnp.asarray(tokens), jnp.asarray(cond),
    )
    params = _transplant(refg, params)
    m = model.bind(params)
    mem = jnp.asarray(ours_prev["mem"])
    mem_valid = jnp.concatenate(
        [jnp.zeros((B, 1)), jnp.asarray(pp_valid), jnp.ones((B, 1))], axis=1)
    cache_k, cache_v = m.init_cache(B)
    our_logits = []
    for t in range(steps):
        lg, cache_k, cache_v = m.decode_one(
            jnp.asarray(tokens[:, t]), t, mem, mem_valid, cache_k, cache_v)
        our_logits.append(np.asarray(lg))
    our_logits = np.stack(our_logits, axis=1)

    np.testing.assert_allclose(our_logits, ref_logits, **TOL)


def test_mapping_head_matches_reference(both):
    """Atom<->pharmacophore mapping head (gcpg.py:229-232), valid pp
    columns only (padded columns see the -999 sentinel on the ref side)."""
    ref_out, ours, data = both
    pp_valid = data[1]
    for b in range(B):
        cols = [i for i in range(N_PP) if pp_valid[b, i] > 0]
        np.testing.assert_allclose(
            ours["mapping"][b][:, cols], ref_out["mapping"][b][:, cols],
            **TOL)
