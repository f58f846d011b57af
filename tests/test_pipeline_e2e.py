"""Minimum end-to-end slice: PDB pocket -> sampled pharmacophores ->
consensus .posp -> GCPG SMILES generation (untrained weights; checks the
plumbing, shapes, and file formats, not chemistry quality)."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmdgen_tpu.chem import pdb as pdbmod
from cmdgen_tpu.chem.tokenizer import Tokenizer, gen_vocabs
from cmdgen_tpu.config import GCPGModelConfig
from cmdgen_tpu.diffusion.cddpm import ConditionalDDPM, DDPMConfig
from cmdgen_tpu.models.dynamics import DynamicsConfig, EGNNDynamics
from cmdgen_tpu.models.egnn import EGNNConfig
from cmdgen_tpu.models.gcpg import GCPG
from cmdgen_tpu.pipeline import generate_smiles, get_phar, sample_phars


def _pdb_line(serial, name, res, chain, resid, x, y, z, element, het=False):
    rec = "HETATM" if het else "ATOM  "
    return (
        f"{rec}{serial:>5} {name:<4}{'':1}{res:<3} {chain}{resid:>4}    "
        f"{x:8.3f}{y:8.3f}{z:8.3f}{1.0:6.2f}{0.0:6.2f}          {element:>2}"
    )


@pytest.fixture(scope="module")
def fake_pdb():
    rng = np.random.RandomState(0)
    lines = []
    serial = 1
    # 6 alanine residues around the origin
    for ri in range(1, 7):
        base = rng.randn(3) * 3.0
        for name, el in [("N", "N"), ("CA", "C"), ("C", "C"), ("O", "O")]:
            x, y, z = base + rng.randn(3) * 0.5
            lines.append(_pdb_line(serial, name, "ALA", "A", ri, x, y, z, el))
            serial += 1
    # ligand at origin
    for k, el in enumerate(["C", "C", "O"]):
        lines.append(
            _pdb_line(serial, f"C{k+1}", "LIG", "A", 101,
                      0.1 * k, 0.0, 0.0, el, het=True)
        )
        serial += 1
    return "\n".join(lines)


def test_pdb_parsing_and_pocket(fake_pdb):
    residues = pdbmod.parse_pdb(fake_pdb)
    assert len(residues) == 7  # 6 ALA + 1 LIG
    lig = pdbmod.ligand_atoms(residues, "A:101")
    assert len(lig) == 3
    lig_coords = np.stack([a.coord for a in lig])
    pocket = pdbmod.pocket_from_ligand(residues, lig_coords, cutoff=8.0)
    assert 1 <= len(pocket) <= 6
    coords, onehot = pdbmod.featurize_pocket(pocket, "full-atom", "crossdock_full")
    assert coords.shape[0] == onehot.shape[0] and onehot.shape[1] == 11
    ca_coords, aa_onehot = pdbmod.featurize_pocket(pocket, "CA", "crossdock")
    assert aa_onehot.shape[1] == 20
    # each residue is ALA
    assert (aa_onehot[:, 0] == 1).all()


def test_end_to_end_pipeline(fake_pdb, tmp_path):
    # ---------- stage 1: sample pharmacophore clouds for the pocket
    dyn = EGNNDynamics(
        DynamicsConfig(
            phar_nf=8, residue_nf=11, joint_nf=8, edge_cutoff=None,
            egnn=EGNNConfig(hidden_nf=16, n_layers=1, inv_sublayers=1),
        )
    )
    model = ConditionalDDPM(DDPMConfig(timesteps=5), dyn)
    coords, onehot = sample_phars.pocket_point_cloud(
        fake_pdb, "crossdock_full", "full-atom", ref_ligand="A:101"
    )
    params = dyn.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 4, 11)), jnp.zeros((2, coords.shape[0], 14)),
        jnp.zeros((2, 1)), jnp.ones((2, 4)), jnp.ones((2, coords.shape[0])),
    )
    cloud = sample_phars.sample_pharmacophores(
        model, params, jax.random.PRNGKey(1), coords, onehot,
        n_samples=24, num_nodes=np.full(24, 4), n_phar_max=4, batch_size=12,
    )
    assert len(cloud) == 24
    total_pts = sum(len(v) for mol in cloud.values() for v in mol.values())
    assert total_pts == 24 * 4
    json_path = tmp_path / "cloud.json"
    json_path.write_text(json.dumps(cloud))

    # bucketed pocket padding is mask-exact: same key, padded pocket =>
    # the same clouds (one jit shape per size bucket instead of one
    # remote compile per distinct pocket size)
    cloud_pad = sample_phars.sample_pharmacophores(
        model, params, jax.random.PRNGKey(1), coords, onehot,
        n_samples=24, num_nodes=np.full(24, 4), n_phar_max=4,
        batch_size=12, pocket_pad_bucket=16,
    )
    assert cloud_pad.keys() == cloud.keys()
    for mol in cloud:
        a = sorted(
            (f, tuple(p)) for f, pts in cloud[mol].items() for p in pts
        )
        b = sorted(
            (f, tuple(p)) for f, pts in cloud_pad[mol].items() for p in pts
        )
        assert [f for f, _ in a] == [f for f, _ in b]
        np.testing.assert_allclose(
            np.asarray([p for _, p in a]),
            np.asarray([p for _, p in b]),
            atol=2e-3,
        )

    # sampled clouds should sit near the pocket (same frame)
    allpts = np.array(
        [p for mol in cloud.values() for v in mol.values() for p in v]
    )
    assert np.abs(allpts.mean(0) - coords.mean(0)).max() < 20.0

    # ---------- stage 2: consensus clustering -> .posp
    pts, fams = get_phar.load_point_cloud_json(json_path)
    cons = get_phar.consensus_gmm(pts, fams, n_clusters=3, seed=0)
    posp = tmp_path / "hypothesis.posp"
    get_phar.write_consensus(posp, cons)
    assert posp.exists()

    # ---------- stage 3: GCPG generation from the .posp
    tok = Tokenizer(gen_vocabs(["CCO", "c1ccccc1", "CC(=O)O"]))
    gmodel = GCPG(
        GCPGModelConfig(max_len=16, hidden_dim=32, n_layers=1, ff_dim=32,
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
    out_file = generate_smiles.generate_to_file(
        gmodel, gparams, tok, jax.random.PRNGKey(4), posp, tmp_path,
        n_per_condition=4, batch_size=4, filter_valid=False,
    )
    lines = out_file.read_text().strip().split("\n")
    assert len(lines) == 4  # untrained: strings exist, validity not expected
