"""Joint-mode sampling through the pipeline + cluster report."""
import jax
import jax.numpy as jnp
import numpy as np

from cmdgen_tpu.containers import PointCloud
from cmdgen_tpu.diffusion.cddpm import DDPMConfig
from cmdgen_tpu.diffusion.joint import JointDDPM
from cmdgen_tpu.models.dynamics import DynamicsConfig, EGNNDynamics
from cmdgen_tpu.models.egnn import EGNNConfig
from cmdgen_tpu.pipeline import sample_phars
from cmdgen_tpu.pipeline.get_phar import cluster_report


def test_joint_mode_sampling_pipeline():
    dyn = EGNNDynamics(
        DynamicsConfig(
            phar_nf=8, residue_nf=11, joint_nf=8, edge_cutoff=None,
            update_pocket_coords=True,
            egnn=EGNNConfig(hidden_nf=16, n_layers=1, inv_sublayers=1),
        )
    )
    model = JointDDPM(DDPMConfig(timesteps=4), dyn)
    rng = np.random.RandomState(0)
    nq = 12
    coords = rng.randn(nq, 3).astype(np.float32) * 2
    onehot = np.eye(11, dtype=np.float32)[rng.randint(0, 11, nq)]
    params = dyn.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 4, 11)), jnp.zeros((2, nq, 14)), jnp.zeros((2, 1)),
        jnp.ones((2, 4)), jnp.ones((2, nq)),
    )
    cloud = sample_phars.sample_pharmacophores(
        model, params, jax.random.PRNGKey(1), coords, onehot,
        n_samples=6, num_nodes=np.full(6, 3), n_phar_max=4, batch_size=6,
    )
    assert len(cloud) == 6
    pts = [p for mol in cloud.values() for v in mol.values() for p in v]
    assert len(pts) == 18
    assert np.isfinite(np.asarray(pts)).all()


def test_cluster_report():
    rng = np.random.RandomState(1)
    coords = np.concatenate(
        [rng.randn(40, 3) * 0.3, rng.randn(40, 3) * 0.3 + 6]
    ).astype(np.float32)
    fams = ["Donor"] * 40 + ["Aromatic"] * 40
    rep = cluster_report(coords, fams, n_clusters=2, seed=0)
    assert len(rep) == 2
    tops = {r["top_family"] for r in rep}
    assert tops == {"Donor", "Aromatic"}
    for r in rep:
        assert sum(r["counts"].values()) > 0
