"""CLI plumbing, molecule builder, GammaNetwork, profiling, docking gating."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmdgen_tpu.chem import mol_build
from cmdgen_tpu.diffusion.gamma_net import GammaNetwork
from cmdgen_tpu.pipeline import docking
from cmdgen_tpu.utils.profiling import AverageMeter, StepTimer, time_since


def test_bond_order_from_distance():
    assert mol_build.get_bond_order("C", "C", 1.54) == 1
    assert mol_build.get_bond_order("C", "C", 1.34) == 2
    assert mol_build.get_bond_order("C", "C", 1.20) == 3
    assert mol_build.get_bond_order("C", "C", 3.0) == 0
    assert mol_build.get_bond_order("C", "O", 1.43) == 1


def test_make_mol_and_stability():
    # methane-like: C with 4 H at ~1.09 Å
    symbols = ["C", "H", "H", "H", "H"]
    d = 1.09
    coords = np.array(
        [[0, 0, 0], [d, 0, 0], [-d / 3, d, 0], [-d / 3, -d / 2, d / 2],
         [-d / 3, -d / 2, -d / 2]],
        dtype=np.float32,
    )
    mol = mol_build.make_mol(symbols, coords)
    assert len(mol.bonds) == 4
    stable, mol_ok = mol_build.check_stability(symbols, coords)
    assert stable >= 4


def test_process_molecule_largest_fragment():
    # ethane + far-away lone carbon -> keep ethane
    symbols = ["C", "C", "C"]
    coords = np.array([[0, 0, 0], [1.54, 0, 0], [50, 50, 50]], dtype=np.float32)
    out = mol_build.process_molecule(symbols, coords)
    assert out is not None
    mol, kept_coords, smiles = out
    assert mol.n_atoms == 2 and smiles == "CC"


def test_xyz_roundtrip(tmp_path):
    symbols = ["C", "O"]
    coords = np.array([[0.0, 0.0, 0.0], [1.2, 0.0, 0.0]])
    p = tmp_path / "m.xyz"
    mol_build.save_xyz(p, symbols, coords, comment="test")
    s2, c2 = mol_build.load_xyz(p)
    assert s2 == symbols
    np.testing.assert_allclose(c2, coords, atol=1e-5)


def test_gamma_network_monotone():
    net = GammaNetwork(hidden=64)
    t = jnp.linspace(0, 1, 21)[:, None]
    params = net.init(jax.random.PRNGKey(0), t)
    g = np.asarray(net.apply(params, t))[:, 0]
    assert np.all(np.diff(g) > -1e-5), "gamma must be monotone"
    assert g[0] == pytest.approx(-5.0, abs=1e-4)
    assert g[-1] == pytest.approx(10.0, abs=1e-4)


def test_profiling_utils():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0
    t = StepTimer()
    with t.phase("data"):
        pass
    with t.phase("step"):
        pass
    s = t.summary()
    assert set(s) == {"data", "step"}
    assert "remain" in time_since(__import__("time").time() - 10, 0.5)


def test_docking_gated():
    # binaries absent in this image: availability must be False and the
    # adapters must raise informative errors rather than crash
    if docking.docking_available():
        pytest.skip("docking binaries present")
    with pytest.raises(RuntimeError):
        docking.smina_score_only("r.pdbqt", "l.pdbqt")


def test_pdbqt_writer(tmp_path):
    from cmdgen_tpu.chem.mol import mol_from_smiles

    mol = mol_from_smiles("c1ccccc1N")
    coords = np.random.RandomState(0).randn(mol.n_atoms, 3)
    p = tmp_path / "lig.pdbqt"
    docking.write_pdbqt(p, mol, coords)
    text = p.read_text()
    assert "ROOT" in text and "TORSDOF 0" in text
    # aromatic carbons typed as A
    assert " A\n" in text or " A " in text.replace("\n", " \n")


def test_cli_help_and_getphar(tmp_path):
    from cmdgen_tpu import cli

    with pytest.raises(SystemExit):
        cli.main(["--help"])
    # get-phar end to end on a tiny synthetic cloud
    rng = np.random.RandomState(0)
    data = {
        f"Molecule_{i}": {
            "Donor": [(rng.randn(3) * 0.2).tolist()],
            "Aromatic": [(rng.randn(3) * 0.2 + [5, 0, 0]).tolist()],
        }
        for i in range(30)
    }
    cloud = tmp_path / "c.json"
    cloud.write_text(json.dumps(data))
    out = tmp_path / "o.posp"
    cli.main(["get-phar", str(cloud), str(out), "--n-clusters", "2"])
    assert out.exists()
    lines = out.read_text().strip().split("\n")
    assert len(lines) == 2


def test_isomorphic_rmsd():
    from cmdgen_tpu.chem.mol import mol_from_smiles
    from cmdgen_tpu.chem.rmsd import isomorphic_rmsd
    from cmdgen_tpu.ops.dgeom import embed_conformers

    # benzene: naive atom-order RMSD vs a rotated-index copy is large,
    # isomorphism matching must find the symmetry and report ~0
    mol = mol_from_smiles("c1ccccc1")
    conf = np.asarray(embed_conformers(mol, 1, jax.random.PRNGKey(0),
                                       refine_steps=300))[0]
    rolled = np.roll(conf, 2, axis=0)  # relabel atoms around the ring
    naive = float(np.sqrt(((conf - rolled) ** 2).sum(-1).mean()))
    matched = isomorphic_rmsd(mol, conf, mol, rolled)
    assert matched is not None and matched < 1e-4 < naive
    # different molecules -> None
    other = mol_from_smiles("CCO")
    assert isomorphic_rmsd(mol, conf, other, conf[:3]) is None


def test_render_chain_gif(tmp_path):
    """Chain renderer: GIF + optional PNG series from [F, N, 3] frames
    (visualization.py:343-369 equivalent)."""
    import numpy as np

    from cmdgen_tpu.utils.visualization import render_chain

    rng = np.random.RandomState(0)
    f, n = 12, 6
    target = rng.randn(n, 3) * 3
    frames = np.stack([
        target + rng.randn(n, 3) * (1.0 - t / (f - 1)) * 5 for t in range(f)
    ])
    mask = np.array([1, 1, 1, 1, 0, 0], dtype=np.float32)
    types = np.array([0, 1, 4, 5, 0, 0])
    pocket = rng.randn(20, 3) * 6
    out = tmp_path / "chain.gif"
    images = render_chain(
        out, frames, mask, types=types, pocket_coords=pocket,
        type_names=["A", "B", "C", "D", "E", "F", "G", "H"],
        max_frames=8, hold_last=2, save_pngs=True,
    )
    assert out.exists() and out.stat().st_size > 1000
    assert (tmp_path / "chain_0000.png").exists()
    # GIF header + frame count sanity
    assert out.read_bytes()[:6] in (b"GIF87a", b"GIF89a")
    assert len(images) >= 8


def test_render_chain_for_pocket(tmp_path):
    """End-to-end: tiny model, one sampled chain, GIF on disk."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cmdgen_tpu.diffusion.cddpm import ConditionalDDPM, DDPMConfig
    from cmdgen_tpu.models.dynamics import DynamicsConfig, EGNNDynamics
    from cmdgen_tpu.models.egnn import EGNNConfig
    from cmdgen_tpu.utils.visualization import render_chain_for_pocket

    cfg = DynamicsConfig(
        phar_nf=8, residue_nf=20, joint_nf=8, edge_cutoff=None,
        egnn=EGNNConfig(hidden_nf=16, n_layers=1, inv_sublayers=1),
    )
    dyn = EGNNDynamics(cfg)
    model = ConditionalDDPM(DDPMConfig(timesteps=6), dyn)
    rng = np.random.RandomState(1)
    nq = 12
    coords = rng.randn(nq, 3).astype(np.float32) * 4
    onehot = np.eye(20, dtype=np.float32)[rng.randint(0, 20, nq)]
    params = dyn.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, 11)), jnp.asarray(
            np.concatenate([coords, onehot], -1)
        )[None],
        jnp.zeros((1, 1)), jnp.ones((1, 4)), jnp.ones((1, nq)),
    )
    out = tmp_path / "pocket_chain.gif"
    render_chain_for_pocket(
        model, params, jax.random.PRNGKey(2), coords, onehot, out,
        n_phar=4, n_phar_max=4, keep_frames=6, max_frames=6, hold_last=1,
    )
    assert out.exists() and out.stat().st_size > 1000
