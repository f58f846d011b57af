"""GCPG model: tokenizer round-trip, forward shapes, KV-cache decode parity,
tiny overfit."""
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cmdgen_tpu.chem.tokenizer import Tokenizer, gen_vocabs
from cmdgen_tpu.config import GCPGModelConfig
from cmdgen_tpu.models import gcpg as gcpg_mod
from cmdgen_tpu.models.gcpg import GCPG


def test_tokenizer_roundtrip():
    # the reference's pathological smoke-test string (dataset.py:91-95)
    smiles = "CCNC(=O)NInc1%225cpppcc2nc@@nc(N@c3ccc(O[C@@H+5]c4cccc(F)c4)c(Cl)c3)c2c1"
    tok = Tokenizer(gen_vocabs([smiles]))
    ids = tok.parse(smiles)
    assert ids[0] == tok.SOS and ids[-1] == tok.EOS
    text = tok.get_text([ids[1:]])[0]
    assert text == smiles


def test_tokenizer_unknown_to_mask():
    tok = Tokenizer(gen_vocabs(["CCO"]))
    ids = tok.parse("CCN")  # N unseen
    assert tok.MASK in ids


def test_tokenizer_atom_indices():
    tok = Tokenizer(gen_vocabs(["CC(=O)Cl"]))
    ids, atom_idx = tok.parse("CC(=O)Cl", return_atom_idx=True)
    # atoms: C C O Cl -> positions within [sos, C, C, (, =, O, ), Cl, eos]
    assert [ids[i] for i in atom_idx] == [
        tok.s2i["C"], tok.s2i["C"], tok.s2i["O"], tok.s2i["Cl"]
    ]


CFG = GCPGModelConfig(
    max_len=24, hidden_dim=32, n_layers=2, ff_dim=64, n_head=4,
    pp_encoder_n_layer=2, dropout=0.0,
)


@pytest.fixture(scope="module")
def model_setup():
    rng = np.random.RandomState(0)
    vocab = 40
    model = GCPG(CFG, vocab_size=vocab)
    b, s = 4, 16
    inputs = jnp.asarray(rng.randint(4, vocab, (b, s)))
    input_valid = jnp.ones((b, s))
    pp_h = jnp.asarray(rng.rand(b, 8, 8), dtype=jnp.float32)
    pp_e = jnp.asarray(rng.rand(b, 8, 8, 1), dtype=jnp.float32)
    pp_mask = jnp.asarray(
        (np.arange(8)[None] < rng.randint(3, 8, (b, 1))).astype(np.float32)
    )
    targets = jnp.asarray(rng.randint(4, vocab, (b, s)))
    conds = jnp.asarray(rng.rand(b, 7), dtype=jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1), inputs, input_valid,
        pp_h, pp_e, pp_mask, targets, conds,
    )
    return model, params, (inputs, input_valid, pp_h, pp_e, pp_mask, targets, conds)


def test_forward_shapes(model_setup):
    model, params, (inputs, iv, pp_h, pp_e, pp_mask, targets, conds) = model_setup
    logits, mapping, lm, kl = model.apply(
        params, jax.random.PRNGKey(2), inputs, iv, pp_h, pp_e, pp_mask,
        targets, conds,
    )
    assert logits.shape == (4, 16, 40)
    assert mapping.shape == (4, 16, 8)
    assert float(lm) > 0 and float(kl) >= 0
    assert np.isfinite(float(lm)) and np.isfinite(float(kl))


def test_kv_cache_decode_matches_full_decode(model_setup):
    """Incremental decode must produce the same logits as the full
    teacher-forced pass over the same prefix (SURVEY §4b)."""
    model, params, (inputs, iv, pp_h, pp_e, pp_mask, targets, conds) = model_setup
    b = 4
    mem, mem_valid = model.apply(
        params, jax.random.PRNGKey(3), pp_h, pp_e, pp_mask, conds,
        method=GCPG.prior_memory,
    )
    # full pass over a fixed token prefix
    prefix = targets[:, :6]
    s = prefix.shape[1]

    def full_logits(params, prefix):
        def f(mdl):
            temb = mdl.word_embed(prefix) + mdl.pos[None, :s, :]
            out = mdl.decoder(temb, mem, mem_valid)
            return mdl.word_pred(out)

        return model.apply(params, method=f)

    logits_full = full_logits(params, prefix)

    # incremental
    cache_k, cache_v = model.apply(params, b, method=GCPG.init_cache)
    logits_inc = []
    for t in range(s):
        lg, cache_k, cache_v = model.apply(
            params, prefix[:, t], t, mem, mem_valid, cache_k, cache_v,
            method=GCPG.decode_one,
        )
        logits_inc.append(lg)
    logits_inc = jnp.stack(logits_inc, axis=1)
    np.testing.assert_allclose(
        np.asarray(logits_full), np.asarray(logits_inc), atol=2e-4
    )


def test_generate_shapes_and_eos_padding(model_setup):
    model, params, (inputs, iv, pp_h, pp_e, pp_mask, targets, conds) = model_setup
    toks = gcpg_mod.generate(
        model, params, jax.random.PRNGKey(4), pp_h, pp_e, pp_mask, conds,
        random_sample=True,
    )
    assert toks.shape == (4, CFG.max_len - 1)
    t = np.asarray(toks)
    # after the first <eos> everything is <pad>
    for row in t:
        eos_pos = np.where(row == model.eos_value)[0]
        if len(eos_pos):
            assert (row[eos_pos[0] + 1 :] == model.pad_value).all()


def test_generate_low_temperature_matches_argmax(model_setup):
    """temperature -> 0 collapses categorical sampling onto argmax, so a
    very low temperature must reproduce the greedy decode exactly."""
    model, params, (inputs, iv, pp_h, pp_e, pp_mask, targets, conds) = model_setup
    # same rng: the prior-memory draw (k_z) must match between the runs
    greedy = gcpg_mod.generate(
        model, params, jax.random.PRNGKey(11), pp_h, pp_e, pp_mask, conds,
        random_sample=False,
    )
    cold = gcpg_mod.generate(
        model, params, jax.random.PRNGKey(11), pp_h, pp_e, pp_mask, conds,
        random_sample=True, temperature=1e-4,
    )
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(cold))


def test_overfit_lm_loss(model_setup):
    model, params, (inputs, iv, pp_h, pp_e, pp_mask, targets, conds) = model_setup
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            _, _, lm, kl = model.apply(
                p, key, inputs, iv, pp_h, pp_e, pp_mask, targets, conds
            )
            return lm + 1e-3 * kl

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    key = jax.random.PRNGKey(5)
    losses = []
    p = params
    for _ in range(25):
        p, opt_state, loss = step(p, opt_state, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses[:3] + losses[-3:]


def test_posterior_memory_generation(model_setup):
    """The ag_forward path: posterior-conditioned memory drives generation
    (reference gcpg.py:292-305)."""
    model, params, (inputs, iv, pp_h, pp_e, pp_mask, targets, conds) = model_setup
    mem, mem_valid, kl = model.apply(
        params, jax.random.PRNGKey(8), inputs, iv, pp_h, pp_e, pp_mask,
        conds, method=GCPG.posterior_memory,
    )
    assert mem.shape == (4, 1 + 8 + 1, 32)
    assert float(kl) >= 0
    toks = gcpg_mod.generate(
        model, params, jax.random.PRNGKey(9), pp_h, pp_e, pp_mask, conds,
        random_sample=False, memory=(mem, mem_valid),
    )
    assert toks.shape == (4, CFG.max_len - 1)


def test_condition_layout_matches_reference():
    """The train step must feed the model the reference's 7-condition
    layout [MW, logP, QED, SAS, RotaNumBonds, Score, Smi]
    (train_chembl33_baseline.py:148-151) — NOT the first 7 dataset
    property rows, whose positions 4-5 are HBA/HBD (carried in the batch
    but never conditioned on). Regression guard for a round-4 bug."""
    from cmdgen_tpu.data.dataset import PROPERTY_KEYS
    from cmdgen_tpu.train.gcpg_train import COND_IDX

    assert [PROPERTY_KEYS[i] for i in COND_IDX] == [
        "MW", "logP", "QED", "SAS", "RotaNumBonds", "Score", "Smi"
    ]


def test_constrained_decode_always_balanced():
    """Syntax-constrained generation: with syntax_tables passed, every
    decoded string has balanced parentheses, fully-closed ring labels,
    no literal special tokens, and is non-empty — even from RANDOM
    weights at temperature 3 (where unconstrained decoding emits
    unbalanced strings with near-certainty)."""
    import re

    from cmdgen_tpu.chem.tokenizer import (
        Tokenizer, gen_vocabs, syntax_tables,
    )

    tok = Tokenizer(gen_vocabs([
        "C1CC1(O)CC", "c1ccccc1C(=O)N", "C%10CC%10", "CC(C)(C)O",
    ]))
    model = GCPG(CFG, vocab_size=len(tok))
    rng = np.random.RandomState(0)
    b = 64
    pp_h = jnp.asarray(rng.rand(b, 8, 8), dtype=jnp.float32)
    pp_e = jnp.asarray(rng.rand(b, 8, 8, 1), dtype=jnp.float32)
    pp_mask = jnp.ones((b, 8))
    conds = jnp.asarray(rng.rand(b, 7), dtype=jnp.float32)
    s = 16
    params = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1),
        jnp.asarray(rng.randint(4, len(tok), (b, s))), jnp.ones((b, s)),
        pp_h, pp_e, pp_mask,
        jnp.asarray(rng.randint(4, len(tok), (b, s))), conds,
    )

    def violations(texts):
        n = 0
        for x in texts:
            depth, rings = 0, set()
            bad = "<" in x or x == ""
            for m in re.finditer(r"%\d{2}|\(|\)|\d", x):
                g = m.group()
                if g == "(":
                    depth += 1
                elif g == ")":
                    depth -= 1
                    bad = bad or depth < 0
                else:
                    rings ^= {g}
            n += bad or depth != 0 or bool(rings)
        return n

    key = jax.random.PRNGKey(9)
    free = gcpg_mod.generate(
        model, params, key, pp_h, pp_e, pp_mask, conds,
        random_sample=True, temperature=3.0,
    )
    con = gcpg_mod.generate(
        model, params, key, pp_h, pp_e, pp_mask, conds,
        random_sample=True, temperature=3.0,
        constraints=jnp.asarray(syntax_tables(tok)),
    )
    free_bad = violations(tok.get_text(np.asarray(free)))
    con_bad = violations(tok.get_text(np.asarray(con)))
    assert free_bad > 0          # random weights DO violate syntax
    assert con_bad == 0          # the mask removes every violation


# ---------------------------------------------------------- valence masking

def _sim_masks(tab, state, tok_prev, t, max_len):
    """Numpy mirror of the constrained-decode mask in
    models.gcpg.generate (structural + valence branches), for replaying
    real token streams: returns the boolean forbidden vector [V]."""
    depth, rings, prev, pend, fresh, stack = state
    c0, c1, c2, c3 = tab[:, 0], tab[:, 1], tab[:, 2], tab[:, 3]
    c_val, c_bond = tab[:, 4], tab[:, 5]
    need = depth + bin(rings).count("1")
    ring_hits = (rings & c1) != 0
    ring_open = (c1 != 0) & ~ring_hits
    closing = (c0 < 0) | ring_hits
    rem = max_len - 1 - t
    over = ((c0 > 0) & (need + 3 > rem)) | (ring_open & (need + 1 > rem))
    must_close = (need > 0) and (need >= max_len - 1 - t)
    forb = (
        ((c0 < 0) & (depth == 0))
        | ((c2 == 1) & ((depth > 0) or (rings != 0) or (t == 1)))
        | over
        | (must_close & ~closing)
        | ((c0 < 0) & (tab[tok_prev, 0] > 0))
        | ((c3 > 0) & (t == 1))
        | (c2 == 2)
    )
    has_prev = prev >= 0
    bmax = max(pend, 1)
    pending = pend != 0
    is_atom = c_val >= 0
    forb |= is_atom & has_prev & ((prev < bmax) | (c_val < bmax))
    forb |= (c_bond > 0) & (
        (not has_prev) | pending | (prev < c_bond)
    )
    forb |= (c0 > 0) & (
        (not has_prev) | (prev < 1) | pending
        | (tab[tok_prev, 0] > 0) | (depth >= 15)
    )
    forb |= ((c0 < 0) | (c2 == 1) | (c_bond < 0)) & pending
    forb |= (c1 != 0) & ((not has_prev) | (prev < bmax))
    forb |= is_atom & ((c_val - bmax) < 1) & (
        (rings != 0) and (depth == 0)
    )
    return forb


def _sim_update(tab, state, nxt):
    depth, rings, prev, pend, fresh, stack = state
    depth2 = int(depth + tab[nxt, 0])
    rings2 = int(rings ^ tab[nxt, 1])
    t_val, t_bond = int(tab[nxt, 4]), int(tab[nxt, 5])
    t_push, t_pop = tab[nxt, 0] > 0, tab[nxt, 0] < 0
    t_ring = tab[nxt, 1] != 0
    t_atom = t_val >= 0
    bo = max(pend, 1)
    consume = bo if ((t_atom and prev >= 0) or t_ring) else 0
    prev_c = prev - consume
    idx_top = min(max(depth2 - int(tab[nxt, 0]) - 1, 0), 15)
    stack = list(stack)
    if fresh and consume > 0:
        stack[idx_top] -= consume
    if t_push:
        stack[min(max(depth2 - 1, 0), 15)] = prev_c
    popped = stack[idx_top]
    if t_atom:
        prev2 = t_val - (bo if prev >= 0 else 0)
    elif t_pop:
        prev2 = popped
    else:
        prev2 = prev_c
    if t_bond < 0:
        prev2 = -1
    pend2 = t_bond if t_bond > 0 else 0
    fresh2 = True if t_push else (fresh if t_bond > 0 else False)
    return depth2, rings2, prev2, pend2, fresh2, stack


VALENCE_CORPUS = [
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
    "CC(=O)Oc1ccccc1C(=O)O",
    "Cn1cnc2c1c(=O)n(C)c(=O)n2C",
    "CC(C)(C)NCC(O)c1ccc(O)c(CO)c1",
    "c1ccc2c(c1)ccc3c2cccc3",
    "C1CC2CCC1CC2",
    "OC(=O)C1=CC(=O)c2ccccc2O1",
    "C[N+](C)(C)CCO",
    "CC(=O)[O-]",
    "c1ccc(cc1)S(=O)(=O)N",
    "C#Cc1ccccc1C#N",
    "FC(F)(F)c1ccccc1Cl",
    "O=C(NC1CC1)N2CCN(CC2)c3ncccn3",
    "C1=CC2=NC=C(C=C2C=C1)Br",
    "CC1(C)C2CCC1(C)C(=O)C2",
    "N#Cc1cc(ccc1F)[N+](=O)[O-]",
    "CCOP(=O)(OCC)SCCN",
    "c1cnc2[nH]ccc2c1",
    "CS(=O)(=O)Nc1ccc(I)cc1",
    "C/C=C/C=C/C(=O)O",
]


def test_valence_tables_mirror_checker():
    """Column-4 budgets reproduce chem.mol's check_valence limits."""
    from cmdgen_tpu.chem.tokenizer import syntax_tables

    tok = Tokenizer(gen_vocabs(
        VALENCE_CORPUS + ["[nH]c1ccccc1[C@@H](O)[13CH3]"]
    ))
    tab = syntax_tables(tok)
    expect = {
        "C": 4, "c": 4, "N": 5, "n": 5, "O": 2, "F": 1, "Cl": 1,
        "Br": 1, "I": 1, "S": 6, "P": 5,
        "[N+]": 6, "[O-]": 1, "[nH]": 4, "[C@@H]": 3, "[13CH3]": 1,
    }
    for s, budget in expect.items():
        if s in tok.s2i:
            assert tab[tok.s2i[s], 4] == budget, s
    assert tab[tok.s2i["="], 5] == 2
    assert tab[tok.s2i["#"], 5] == 3
    assert tab[tok.s2i["("], 4] == -1
    assert tab[tok.s2i["<pad>"], 4] == -1


def test_valence_mask_never_blocks_valid_smiles():
    """Replaying real valid SMILES through a numpy mirror of the
    constrained-decode mask: no actual next-token is ever forbidden (the
    mask under-approximates invalidity — over-masking would silently
    steer generation away from valid chemistry)."""
    from cmdgen_tpu.chem.mol import mol_from_smiles, random_smiles
    from cmdgen_tpu.chem.tokenizer import syntax_tables
    import random as _random

    rng = _random.Random(0)
    forms = []
    for s in VALENCE_CORPUS:
        assert mol_from_smiles(s) is not None, s
        forms.append(s)
        for _ in range(6):
            r = random_smiles(s, rng)
            if r and mol_from_smiles(r) is not None:
                forms.append(r)
    tok = Tokenizer(gen_vocabs(forms))
    tab = np.asarray(syntax_tables(tok))
    checked = 0
    for s in forms:
        ids = tok.parse(s)
        max_len = len(ids) + 8
        state = (0, 0, -1, 0, False, [0] * 16)
        tok_prev = ids[0]
        for t, nxt in enumerate(ids[1:], start=1):
            forb = _sim_masks(tab, state, tok_prev, t, max_len)
            assert not forb[nxt], (
                f"masked valid token {tok.i2s[nxt]!r} at {t} in {s!r}"
            )
            state = _sim_update(tab, state, nxt)
            tok_prev = nxt
            checked += 1
    assert checked > 1500


def test_valence_constrained_decode_reduces_valence_failures():
    """Random-weight decode at temperature 3: valence=True keeps every
    structural guarantee and reduces parser valence/connection failures
    vs the structural-only mask."""
    from cmdgen_tpu.chem.mol import parse_smiles, SmilesError
    from cmdgen_tpu.chem.tokenizer import syntax_tables

    tok = Tokenizer(gen_vocabs(VALENCE_CORPUS))
    model = GCPG(CFG, vocab_size=len(tok))
    rng = np.random.RandomState(0)
    b = 96
    pp_h = jnp.asarray(rng.rand(b, 8, 8), dtype=jnp.float32)
    pp_e = jnp.asarray(rng.rand(b, 8, 8, 1), dtype=jnp.float32)
    pp_mask = jnp.ones((b, 8))
    conds = jnp.asarray(rng.rand(b, 7), dtype=jnp.float32)
    s = 16
    params = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1),
        jnp.asarray(rng.randint(4, len(tok), (b, s))), jnp.ones((b, s)),
        pp_h, pp_e, pp_mask,
        jnp.asarray(rng.randint(4, len(tok), (b, s))), conds,
    )

    def valence_failures(texts):
        n = 0
        for x in texts:
            try:
                m = parse_smiles(x)
            except (SmilesError, KeyError, IndexError):
                continue  # syntax failure: not a valence case
            if m.n_atoms and not m.check_valence():
                n += 1
        return n

    tables = jnp.asarray(syntax_tables(tok))
    key = jax.random.PRNGKey(9)
    structural = gcpg_mod.generate(
        model, params, key, pp_h, pp_e, pp_mask, conds,
        random_sample=True, temperature=3.0, constraints=tables,
    )
    valence = gcpg_mod.generate(
        model, params, key, pp_h, pp_e, pp_mask, conds,
        random_sample=True, temperature=3.0, constraints=tables,
        valence=True,
    )
    s_texts = tok.get_text(np.asarray(structural))
    v_texts = tok.get_text(np.asarray(valence))
    s_fail = valence_failures(s_texts)
    v_fail = valence_failures(v_texts)
    assert s_fail > 5            # random weights DO overflow valences
    assert v_fail < s_fail / 2   # the mask removes (nearly) all of them
