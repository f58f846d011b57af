"""Overlapped end-to-end driver (pipeline/run_all.py): plumbing, stage
hand-offs, and the measured aligned-molecules/min stat, on tiny models."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmdgen_tpu.chem.tokenizer import Tokenizer, gen_vocabs
from cmdgen_tpu.config import GCPGModelConfig
from cmdgen_tpu.diffusion.cddpm import ConditionalDDPM, DDPMConfig
from cmdgen_tpu.models.dynamics import DynamicsConfig, EGNNDynamics
from cmdgen_tpu.models.egnn import EGNNConfig
from cmdgen_tpu.models.gcpg import GCPG
from cmdgen_tpu.pipeline import run_all


@pytest.fixture(scope="module")
def tiny_models():
    dyn = EGNNDynamics(
        DynamicsConfig(
            phar_nf=8, residue_nf=11, joint_nf=8, edge_cutoff=None,
            egnn=EGNNConfig(hidden_nf=16, n_layers=1, inv_sublayers=1),
        )
    )
    diff_model = ConditionalDDPM(DDPMConfig(timesteps=4), dyn)
    n_q = 12
    diff_params = dyn.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 4, 11)), jnp.zeros((2, n_q, 14)),
        jnp.zeros((2, 1)), jnp.ones((2, 4)), jnp.ones((2, n_q)),
    )
    tok = Tokenizer(gen_vocabs(["CCO", "OCC", "CO"]))
    gmodel = GCPG(
        GCPGModelConfig(max_len=12, hidden_dim=32, n_layers=1, ff_dim=32,
                        n_head=4, pp_encoder_n_layer=1, dropout=0.0),
        vocab_size=len(tok),
    )
    b = 2
    gparams = gmodel.init(
        jax.random.PRNGKey(2), jax.random.PRNGKey(3),
        jnp.zeros((b, 5), dtype=jnp.int32), jnp.ones((b, 5)),
        jnp.zeros((b, 8, 8)), jnp.zeros((b, 8, 8, 1)), jnp.ones((b, 8)),
        jnp.zeros((b, 5), dtype=jnp.int32), jnp.zeros((b, 7)),
    )
    rng = np.random.RandomState(0)
    pockets = [
        (rng.randn(n_q, 3).astype(np.float32) * 3.0,
         np.eye(11, dtype=np.float32)[rng.randint(0, 11, n_q)])
        for _ in range(2)
    ]
    return diff_model, diff_params, gmodel, gparams, tok, pockets


def test_run_pipeline_end_to_end(tiny_models, monkeypatch, tmp_path):
    diff_model, diff_params, gmodel, gparams, tok, pockets = tiny_models

    # deterministic consensus: a hypothesis the C/O-vocab decodes can match
    def fixed_consensus(coords, families, n_clusters=4, seed=0):
        c = np.asarray(coords).mean(0)
        return [("HYBL", c), ("HACC", c + np.asarray([2.5, 0, 0]))]

    monkeypatch.setitem(run_all._CONSENSUS, "gmm", fixed_consensus)

    # deterministic decode: the driver under test is the overlap machinery,
    # not GCPG sampling (tested in test_gcpg.py) — emit a fixed SMILES mix
    # (valid+invalid, duplicates) through the real tokenizer round-trip
    fake_pool = ["CCO", "OCCO", "CCOC", "CO", "C(", "CCO", "OCO", "CCCO"]

    def fake_generate(model, params, rng, pp_h, pp_e, pp_m, conds, **kw):
        b = pp_h.shape[0]
        out = np.full((b, 12), tok.s2i["<pad>"], dtype=np.int32)
        for i in range(b):
            ids = tok.parse(fake_pool[i % len(fake_pool)])[1:]  # drop <sos>
            ids = ids[: 12]
            out[i, : len(ids)] = ids
        return jnp.asarray(out)

    monkeypatch.setattr(run_all.gcpg_mod, "generate", fake_generate)

    cfg = run_all.PipelineConfig(
        n_clouds_per_pocket=4, diff_timesteps=4, n_phar_max=4,
        cluster_counts=(2,), smiles_per_hypothesis=32, decode_batch=16,
        n_conformers=2, refine_steps=40, num_keep=2, align_chunk=8,
        size_bucket=8,
        contact_filter=None,  # untrained diffusion emits diverged clouds
    )
    results, stats = run_all.run_pipeline(
        diff_model, diff_params, gmodel, gparams, tok, pockets,
        jax.random.PRNGKey(7), cfg,
    )
    assert stats["pockets"] == 2
    assert stats["hypotheses"] == 2          # one per pocket
    assert stats["raw_smiles"] == 64
    assert stats["unique_smiles"] >= 1       # C/O strings are mostly valid
    assert stats["matched"] >= 1
    assert stats["aligned"] == len(results) >= 1
    assert stats["aligned_mols_per_min"] > 0
    for r in results:
        assert np.isfinite(r.rmsd)
        assert r.hypothesis in (0, 1)
        assert 1 <= len(r.conformers) <= 2
        # coords are [n_atoms, 3] for the real (unpadded) molecule
        from cmdgen_tpu.chem.mol import mol_from_smiles

        assert r.conformers[0][1].shape == (
            mol_from_smiles(r.smiles).n_atoms, 3,
        )
    # no duplicate (smiles, hypothesis) results from chunk padding
    seen = [(r.smiles, r.hypothesis) for r in results]
    assert len(seen) == len(set(seen))

    # artifact writer: posed SDFs + results.json index
    import json

    out = run_all.write_pipeline_results(results, tmp_path / "out")
    index = json.loads(out.read_text())
    assert len(index) == len(results)
    from cmdgen_tpu.chem.sdf import read_sdf

    first = read_sdf(tmp_path / "out" / index[0]["file"])
    assert 1 <= len(first) <= 2  # num_keep conformers


def test_downstream_failure_does_not_deadlock(tiny_models, monkeypatch):
    """A dying align stage must drain its input queue so upstream put()
    never blocks on the bounded queue (the join would deadlock)."""
    diff_model, diff_params, gmodel, gparams, tok, pockets = tiny_models

    def fixed_consensus(coords, families, n_clusters=4, seed=0):
        c = np.asarray(coords).mean(0)
        return [("HYBL", c), ("HACC", c + np.asarray([2.5, 0, 0]))]

    monkeypatch.setitem(run_all._CONSENSUS, "gmm", fixed_consensus)

    def fake_generate(model, params, rng, pp_h, pp_e, pp_m, conds, **kw):
        b = pp_h.shape[0]
        out = np.full((b, 12), tok.s2i["<pad>"], dtype=np.int32)
        ids = tok.parse("CCO")[1:]
        for i in range(b):
            out[i, : len(ids)] = ids
        return jnp.asarray(out)

    monkeypatch.setattr(run_all.gcpg_mod, "generate", fake_generate)

    def boom(*a, **k):
        raise RuntimeError("align blew up")

    monkeypatch.setattr(run_all, "align_entries", boom)

    cfg = run_all.PipelineConfig(
        n_clouds_per_pocket=4, diff_timesteps=4, n_phar_max=4,
        cluster_counts=(2,), smiles_per_hypothesis=16, decode_batch=16,
        align_chunk=2, queue_depth=1,  # tiny queues force backpressure
        contact_filter=None,
    )
    with pytest.raises(RuntimeError, match="align blew up"):
        run_all.run_pipeline(
            diff_model, diff_params, gmodel, gparams, tok, pockets,
            jax.random.PRNGKey(7), cfg,
        )


def test_run_pipeline_propagates_errors(tiny_models):
    diff_model, diff_params, gmodel, gparams, tok, pockets = tiny_models
    cfg = run_all.PipelineConfig(
        n_clouds_per_pocket=4, diff_timesteps=4, n_phar_max=4,
        cluster_counts=(2,), consensus_method="nope",  # unknown method
    )
    with pytest.raises(KeyError):
        run_all.run_pipeline(
            diff_model, diff_params, gmodel, gparams, tok, pockets,
            jax.random.PRNGKey(7), cfg,
        )


def test_contact_filter_points():
    """Data-like points (in contact with the pocket) pass; diverged points
    are dropped; families stay aligned with coordinates."""
    rng = np.random.RandomState(0)
    pocket = rng.randn(20, 3).astype(np.float32) * 5.0
    near = pocket[:4] + rng.randn(4, 3).astype(np.float32) * 0.5
    far = pocket[:3] + 100.0
    pts = np.concatenate([near, far])
    fams = ["A", "B", "C", "D", "X", "Y", "Z"]
    kept, kf, dropped = run_all.contact_filter_points(pts, fams, pocket, 6.0)
    assert dropped == 3
    assert kf == ["A", "B", "C", "D"]
    np.testing.assert_allclose(kept, near)
    # no-op on fully-in-contact clouds
    kept2, kf2, d2 = run_all.contact_filter_points(near, fams[:4], pocket, 6.0)
    assert d2 == 0 and len(kept2) == 4


def test_keep_top_match_ranks_and_reports(tiny_models, monkeypatch):
    """keep_top_match_frac: the output set shrinks to the top fraction by
    match score, both the all-aligned and kept match means are reported,
    and the kept mean is >= the all-aligned mean (selection effect made
    explicit)."""
    diff_model, diff_params, gmodel, gparams, tok, pockets = tiny_models

    def fixed_consensus(coords, families, n_clusters=4, seed=0):
        c = np.asarray(coords).mean(0)
        return [("HYBL", c), ("HACC", c + np.asarray([2.5, 0, 0]))]

    monkeypatch.setitem(run_all._CONSENSUS, "gmm", fixed_consensus)
    fake_pool = ["CCO", "OCCO", "CCOC", "CO", "CCO", "OCO", "CCCO", "CCO"]

    def fake_generate(model, params, rng, pp_h, pp_e, pp_m, conds, **kw):
        b = pp_h.shape[0]
        out = np.full((b, 12), tok.s2i["<pad>"], dtype=np.int32)
        for i in range(b):
            ids = tok.parse(fake_pool[i % len(fake_pool)])[1:][:12]
            out[i, : len(ids)] = ids
        return jnp.asarray(out)

    monkeypatch.setattr(run_all.gcpg_mod, "generate", fake_generate)

    cfg = run_all.PipelineConfig(
        n_clouds_per_pocket=4, diff_timesteps=4, n_phar_max=4,
        cluster_counts=(2,), smiles_per_hypothesis=32, decode_batch=16,
        n_conformers=2, refine_steps=40, num_keep=2, align_chunk=8,
        size_bucket=8, contact_filter=None,
        keep_top_match_frac=0.5, match_workers=1,
    )
    results, stats = run_all.run_pipeline(
        diff_model, diff_params, gmodel, gparams, tok, pockets,
        jax.random.PRNGKey(7), cfg,
    )
    assert stats["aligned"] >= 1
    assert stats["kept"] == len(results) == max(1, int(stats["aligned"] * 0.5))
    assert "match_score_all_aligned" in stats
    assert "match_score_kept" in stats
    if stats["match_score_kept"] >= 0 and stats["match_score_all_aligned"] >= 0:
        assert stats["match_score_kept"] >= stats["match_score_all_aligned"]


def test_validity_gate_drops_bad_hypotheses(tiny_models, monkeypatch):
    """validity_gate: a hypothesis whose PROBE decode parses below the
    threshold ships nothing (no raw/valid counts, no aligned output); a
    passing hypothesis ships its full volume. Probe decodes are counted
    separately (gate_probe_smiles) and per-hypothesis probe validity is
    recorded in collect."""
    diff_model, diff_params, gmodel, gparams, tok, pockets = tiny_models

    def fixed_consensus(coords, families, n_clusters=4, seed=0):
        c = np.asarray(coords).mean(0)
        return [("HYBL", c), ("HACC", c + np.asarray([2.5, 0, 0]))]

    monkeypatch.setitem(run_all._CONSENSUS, "gmm", fixed_consensus)

    calls = {"n": 0}

    def fake_generate(model, params, rng, pp_h, pp_e, pp_m, conds, **kw):
        # call 0 = hypothesis 0's probe -> all invalid (gate drops it);
        # later calls (hypothesis 1 probe + its full batches) -> valid
        b = pp_h.shape[0]
        smi = "C(" if calls["n"] == 0 else "CCO"
        calls["n"] += 1
        out = np.full((b, 12), tok.s2i["<pad>"], dtype=np.int32)
        ids = tok.parse(smi)[1:][:12]
        for i in range(b):
            out[i, : len(ids)] = ids
        return jnp.asarray(out)

    monkeypatch.setattr(run_all.gcpg_mod, "generate", fake_generate)

    cfg = run_all.PipelineConfig(
        n_clouds_per_pocket=4, diff_timesteps=4, n_phar_max=4,
        cluster_counts=(2,), smiles_per_hypothesis=32, decode_batch=16,
        n_conformers=2, refine_steps=40, num_keep=2, align_chunk=8,
        size_bucket=8, contact_filter=None,
        validity_gate=0.5, validity_probe=8,
    )
    collect = {}
    results, stats = run_all.run_pipeline(
        diff_model, diff_params, gmodel, gparams, tok, pockets,
        jax.random.PRNGKey(7), cfg, collect=collect,
    )
    assert stats["hypotheses"] == 2
    assert stats["gate_dropped"] == 1
    assert stats["gate_probe_smiles"] == 16       # 2 probes x 8
    assert stats["raw_smiles"] == 32              # only the kept hypothesis
    assert stats["valid_smiles"] == 32
    assert all(r.hypothesis == 1 for r in results)
    pv = collect["probe_validity"]
    assert pv[0] == 0.0 and pv[1] == 1.0
    # shipped per-hypothesis validity recorded only for the kept one
    assert list(collect["hyp_validity"]) == [1]
