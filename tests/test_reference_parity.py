"""Weight-transplant forward parity vs the reference EGNN.

The strongest correctness check available in this image: the reference's
``equivariant_diffusion/egnn_new.py`` imports only ``torch`` + ``math`` and
therefore runs under the CPU torch present here. We instantiate the
reference ``EGNN`` (egnn_new.py:159-208), transplant its randomly
initialized weights into :class:`cmdgen_tpu.models.egnn.EGNN` (the
``_DenseParams`` checkpoint layout makes the mapping mechanical), run both
on identical inputs — a ragged batch flattened to the reference's edge-list
form, padded+masked for ours — and assert h and x agree to f32 tolerance.

Covered: dense and fixed-K neighbor-list engines; attention/tanh on and
off; sin_embedding; 'sum' and 'mean' aggregation; frozen-coordinate
update_coords_mask incl. the static ``update_rows`` slice; the plain GNN
fallback (egnn_new.py:211-243). This converts every "semantics preserved
exactly" docstring claim in models/egnn.py into a checked fact.
"""
from __future__ import annotations

import importlib.util
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from cmdgen_tpu.models.egnn import EGNN, EGNNConfig, GNN  # noqa: E402

_REF = pathlib.Path("/root/reference/DiffPhar/equivariant_diffusion/egnn_new.py")


def _load_reference_egnn():
    if not _REF.exists():
        pytest.skip("reference tree not present")
    spec = importlib.util.spec_from_file_location("ref_egnn_new", _REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    return _load_reference_egnn()


# ---------------------------------------------------------------- fixtures

B, N = 3, 8
SIZES = [5, 8, 4]
IN_NF, HID, OUT_NF = 10, 32, 10


def _batch(rng: np.random.Generator, cutoff: float | None):
    """Random padded batch + its flat reference-form twin.

    Returns (h_pad [B,N,IN], x_pad [B,N,3], node_mask [B,N],
    edge_mask [B,N,N], flat dict with h, x, edge_index rows/cols).
    """
    h = rng.standard_normal((B, N, IN_NF)).astype(np.float32)
    x = (2.0 * rng.standard_normal((B, N, 3))).astype(np.float32)
    node_mask = np.zeros((B, N), np.float32)
    for b, s in enumerate(SIZES):
        node_mask[b, :s] = 1.0
        h[b, s:] = 0.0
        x[b, s:] = 0.0
    edge_mask = node_mask[:, :, None] * node_mask[:, None, :]
    if cutoff is not None:
        d = np.linalg.norm(x[:, :, None, :] - x[:, None, :, :], axis=-1)
        # keep self-edges, like the reference adjacency (dynamics.py:141-147)
        within = (d <= cutoff) | np.eye(N, dtype=bool)[None]
        edge_mask = edge_mask * within.astype(np.float32)

    # flat twin: concatenate valid nodes, edge list from the same adjacency
    offs, h_flat, x_flat = [], [], []
    total = 0
    for b, s in enumerate(SIZES):
        offs.append(total)
        h_flat.append(h[b, :s])
        x_flat.append(x[b, :s])
        total += s
    rows, cols = [], []
    for b, s in enumerate(SIZES):
        for i in range(s):
            for j in range(s):
                if edge_mask[b, i, j] > 0:
                    rows.append(offs[b] + i)
                    cols.append(offs[b] + j)
    flat = dict(
        h=torch.tensor(np.concatenate(h_flat)),
        x=torch.tensor(np.concatenate(x_flat)),
        rows=torch.tensor(rows, dtype=torch.long),
        cols=torch.tensor(cols, dtype=torch.long),
        offs=offs,
    )
    return h, x, node_mask, edge_mask, flat


def _unpad(arr, sizes=SIZES):
    return np.concatenate([np.asarray(arr[b, :s]) for b, s in enumerate(sizes)])


# ------------------------------------------------------- weight transplant


def _lin(torch_lin):
    """nn.Linear -> (kernel [in,out], bias|None) in flax convention."""
    k = jnp.asarray(torch_lin.weight.detach().numpy().T)
    b = (
        jnp.asarray(torch_lin.bias.detach().numpy())
        if torch_lin.bias is not None
        else None
    )
    return k, b


def _split_pair_first(torch_lin, hid: int, has_e: bool):
    """Reference pair-MLP first Linear over [h_i ‖ h_j ‖ e] (egnn_new.py:15-16,
    78-79) -> our concat-free w_i/w_j/w_e split (models/egnn.py PairFirstLayer).
    Row order follows edge_model's cat([source, target, edge_attr]) where
    source = h[row] = the receiving node (egnn_new.py:31-35, 47-50)."""
    k, b = _lin(torch_lin)
    out = {
        "w_i": {"kernel": k[:hid]},
        "w_j": {"kernel": k[hid : 2 * hid], "bias": b},
    }
    if has_e:
        out["w_e"] = {"kernel": k[2 * hid :]}
    return out


def _gcl_params(tgcl, hid: int, attention: bool, has_e: bool = True):
    ek, eb = _lin(tgcl.edge_mlp[2])
    nk_in, nb_in = _lin(tgcl.node_mlp[0])
    nk_out, nb_out = _lin(tgcl.node_mlp[2])
    p = {
        "edge_in": _split_pair_first(tgcl.edge_mlp[0], hid, has_e),
        "edge_out": {"kernel": ek, "bias": eb},
        "node_in": {"kernel": nk_in, "bias": nb_in},
        "node_out": {"kernel": nk_out, "bias": nb_out},
    }
    if attention:
        ak, ab = _lin(tgcl.att_mlp[0])
        p["att"] = {"kernel": ak, "bias": ab}
    return p


def _transplant(tmodel, n_layers: int, inv_sublayers: int, attention: bool):
    """Reference EGNN state -> flax param tree for models/egnn.py:EGNN."""
    hid = tmodel.hidden_nf
    emb_k, emb_b = _lin(tmodel.embedding)
    out_k, out_b = _lin(tmodel.embedding_out)
    params = {
        "embedding": {"kernel": emb_k, "bias": emb_b},
        "embedding_out": {"kernel": out_k, "bias": out_b},
    }
    for i in range(n_layers):
        blk = tmodel._modules[f"e_block_{i}"]
        bp = {}
        for j in range(inv_sublayers):
            bp[f"gcl_{j}"] = _gcl_params(
                blk._modules[f"gcl_{j}"], hid, attention
            )
        eq = blk._modules["gcl_equiv"]
        gk, _ = _lin(eq.coord_mlp[4])
        mk, mb = _lin(eq.coord_mlp[2])
        bp["coord_update"] = {
            "coord_in": _split_pair_first(eq.coord_mlp[0], hid, True),
            "coord_mid": {"kernel": mk, "bias": mb},
            "coord_gate": {"kernel": gk},
        }
        params[f"e_block_{i}"] = bp
    return {"params": params}


# ------------------------------------------------------------------ tests


@pytest.mark.parametrize(
    "attention,tanh,sin_embedding,aggregation,cutoff",
    [
        (True, True, False, "sum", None),     # flagship config knobs
        (True, True, False, "sum", 4.0),      # nonuniform cutoff adjacency
        (False, False, False, "sum", None),
        (True, False, True, "sum", None),     # sin_embedding path
        (True, True, False, "mean", 4.0),     # mean aggregation
    ],
)
def test_egnn_forward_matches_reference(
    ref, attention, tanh, sin_embedding, aggregation, cutoff
):
    torch.manual_seed(0)
    n_layers, inv_sublayers = 2, 2
    tmodel = ref.EGNN(
        in_node_nf=IN_NF,
        in_edge_nf=1,
        hidden_nf=HID,
        n_layers=n_layers,
        inv_sublayers=inv_sublayers,
        attention=attention,
        tanh=tanh,
        sin_embedding=sin_embedding,
        normalization_factor=100.0,
        aggregation_method=aggregation,
        out_node_nf=OUT_NF,
        coords_range=15.0,
        norm_constant=1.0,
    )
    rng = np.random.default_rng(1)
    h, x, node_mask, edge_mask, flat = _batch(rng, cutoff)

    with torch.no_grad():
        h_ref, x_ref = tmodel(
            flat["h"], flat["x"], (flat["rows"], flat["cols"])
        )
    h_ref, x_ref = h_ref.numpy(), x_ref.numpy()

    cfg = EGNNConfig(
        hidden_nf=HID,
        n_layers=n_layers,
        inv_sublayers=inv_sublayers,
        attention=attention,
        tanh=tanh,
        sin_embedding=sin_embedding,
        normalization_factor=100.0,
        aggregation_method=aggregation,
    )
    variables = _transplant(tmodel, n_layers, inv_sublayers, attention)

    # dense [N,N] engine
    model = EGNN(cfg, out_node_nf=OUT_NF)
    h_out, x_out = model.apply(
        variables, jnp.asarray(h), jnp.asarray(x), jnp.asarray(edge_mask),
        jnp.asarray(node_mask),
    )
    np.testing.assert_allclose(_unpad(h_out), h_ref, rtol=1e-5, atol=5e-5)
    np.testing.assert_allclose(_unpad(x_out), x_ref, rtol=1e-5, atol=5e-5)

    # fixed-K neighbor-list engine (K = N bounds every row => exact)
    nb_model = EGNN(
        EGNNConfig(**{**cfg.__dict__, "neighbor_k": N}), out_node_nf=OUT_NF
    )
    h_nb, x_nb = nb_model.apply(
        variables, jnp.asarray(h), jnp.asarray(x), jnp.asarray(edge_mask),
        jnp.asarray(node_mask),
    )
    np.testing.assert_allclose(_unpad(h_nb), h_ref, rtol=1e-5, atol=5e-5)
    np.testing.assert_allclose(_unpad(x_nb), x_ref, rtol=1e-5, atol=5e-5)


def test_egnn_frozen_coords_matches_reference(ref):
    """update_coords_mask parity, incl. the static update_rows slice: the
    first 3 nodes of every sample are movable (the conditional model's
    pharmacophore block), the rest frozen (dynamics.py:105-107)."""
    torch.manual_seed(2)
    n_layers, inv_sublayers, movable = 2, 2, 3
    tmodel = ref.EGNN(
        in_node_nf=IN_NF, in_edge_nf=1, hidden_nf=HID, n_layers=n_layers,
        inv_sublayers=inv_sublayers, attention=True, tanh=True,
        normalization_factor=100.0, aggregation_method="sum",
        out_node_nf=OUT_NF, coords_range=15.0, norm_constant=1.0,
    )
    rng = np.random.default_rng(3)
    h, x, node_mask, edge_mask, flat = _batch(rng, None)
    ucm = np.zeros((B, N), np.float32)
    ucm[:, :movable] = 1.0
    ucm *= node_mask
    ucm_flat = torch.tensor(_unpad(ucm)[:, None])

    with torch.no_grad():
        h_ref, x_ref = tmodel(
            flat["h"], flat["x"], (flat["rows"], flat["cols"]),
            update_coords_mask=ucm_flat,
        )
    h_ref, x_ref = h_ref.numpy(), x_ref.numpy()

    cfg = EGNNConfig(
        hidden_nf=HID, n_layers=n_layers, inv_sublayers=inv_sublayers,
        attention=True, tanh=True, normalization_factor=100.0,
    )
    variables = _transplant(tmodel, n_layers, inv_sublayers, True)
    for neighbor_k in (None, N):
        model = EGNN(
            EGNNConfig(**{**cfg.__dict__, "neighbor_k": neighbor_k}),
            out_node_nf=OUT_NF,
        )
        for update_rows in (None, movable):
            h_out, x_out = model.apply(
                variables, jnp.asarray(h), jnp.asarray(x),
                jnp.asarray(edge_mask), jnp.asarray(node_mask),
                update_coords_mask=jnp.asarray(ucm),
                update_rows=update_rows,
            )
            np.testing.assert_allclose(
                _unpad(h_out), h_ref, rtol=1e-5, atol=5e-5
            )
            np.testing.assert_allclose(
                _unpad(x_out), x_ref, rtol=1e-5, atol=5e-5
            )


def test_gnn_fallback_matches_reference(ref):
    """Plain-GNN fallback (egnn_new.py:211-243): embed -> GCLs with no edge
    features -> out Dense."""
    torch.manual_seed(4)
    n_layers = 3
    tmodel = ref.GNN(
        in_node_nf=IN_NF, in_edge_nf=0, hidden_nf=HID, n_layers=n_layers,
        attention=True, normalization_factor=100.0,
        aggregation_method="sum", out_node_nf=OUT_NF,
    )
    rng = np.random.default_rng(5)
    h, x, node_mask, edge_mask, flat = _batch(rng, None)
    with torch.no_grad():
        h_ref = tmodel(flat["h"], (flat["rows"], flat["cols"])).numpy()

    params = {
        "embedding": dict(zip(("kernel", "bias"), _lin(tmodel.embedding))),
        "embedding_out": dict(
            zip(("kernel", "bias"), _lin(tmodel.embedding_out))
        ),
    }
    for i in range(n_layers):
        params[f"gcl_{i}"] = _gcl_params(
            tmodel._modules[f"gcl_{i}"], HID, attention=True, has_e=False
        )
    cfg = EGNNConfig(
        hidden_nf=HID, n_layers=n_layers, attention=True,
        normalization_factor=100.0,
    )
    model = GNN(cfg, out_node_nf=OUT_NF)
    h_out = model.apply(
        {"params": params}, jnp.asarray(h), jnp.asarray(edge_mask),
        jnp.asarray(node_mask),
    )
    np.testing.assert_allclose(_unpad(h_out), h_ref, rtol=1e-5, atol=5e-5)


# ------------------------------------------------- full-denoiser transplant


def _load_reference_dynamics():
    """Load the reference EGNNDynamics with stub torch_scatter/utils/rdkit
    deps (dynamics.py itself only needs scatter for the joint-mode
    remove_mean_batch, provided here in pure torch)."""
    import sys
    import types

    pkg_root = pathlib.Path("/root/reference/DiffPhar")
    if not pkg_root.exists():
        pytest.skip("reference tree not present")

    def scatter_mean(src, index, dim=0, dim_size=None):
        n = dim_size or int(index.max()) + 1
        out = src.new_zeros((n, *src.shape[1:]))
        cnt = src.new_zeros((n, *src.shape[1:]))
        idx = index.view(-1, *([1] * (src.dim() - 1))).expand_as(src)
        out.scatter_add_(0, idx, src)
        cnt.scatter_add_(0, idx, torch.ones_like(src))
        return out / cnt.clamp(min=1)

    def scatter_add(src, index, dim=0, dim_size=None):
        n = dim_size or int(index.max()) + 1
        out = src.new_zeros((n, *src.shape[1:]))
        idx = index.view(-1, *([1] * (src.dim() - 1))).expand_as(src)
        return out.scatter_add_(0, idx, src)

    stub_scatter = types.ModuleType("torch_scatter")
    stub_scatter.scatter_add = scatter_add
    stub_scatter.scatter_mean = scatter_mean
    saved = {
        k: sys.modules.get(k) for k in ("torch_scatter", "utils")
    }
    sys.modules["torch_scatter"] = stub_scatter
    sys.modules["utils"] = types.ModuleType("utils")
    sys.path.insert(0, str(pkg_root))
    try:
        spec = importlib.util.spec_from_file_location(
            "equivariant_diffusion.dynamics",
            pkg_root / "equivariant_diffusion" / "dynamics.py",
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(str(pkg_root))
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def _seq_mlp_params(seq):
    """nn.Sequential(Linear, act, Linear) -> flax TypeMLP param dict."""
    k0, b0 = _lin(seq[0])
    k1, b1 = _lin(seq[2])
    return {
        "Dense_0": {"kernel": k0, "bias": b0},
        "Dense_1": {"kernel": k1, "bias": b1},
    }


@pytest.mark.parametrize("update_pocket_coords", [False, True])
def test_dynamics_forward_matches_reference(ref, update_pocket_coords):
    """Weight-transplant parity for the FULL denoiser (dynamics.py:9-147):
    per-type MLPs, time conditioning, 6 Å-cutoff adjacency, EGNN, velocity
    split, per-type decoders — conditional (frozen pocket) and joint
    (CoM-projected velocities) modes."""
    dyn_mod = _load_reference_dynamics()
    from cmdgen_tpu.models.dynamics import DynamicsConfig, EGNNDynamics

    torch.manual_seed(7)
    phar_nf, residue_nf, joint_nf, hidden, n_layers = 5, 6, 16, 32, 2
    cutoff = 5.0
    tdyn = dyn_mod.EGNNDynamics(
        phar_nf=phar_nf, residue_nf=residue_nf, n_dims=3,
        joint_nf=joint_nf, hidden_nf=hidden, n_layers=n_layers,
        attention=True, condition_time=True, tanh=True,
        norm_constant=1.0, inv_sublayers=1, sin_embedding=False,
        normalization_factor=100.0, aggregation_method="sum",
        update_pocket_coords=update_pocket_coords, edge_cutoff=cutoff,
    )
    tdyn.eval()

    # padded batch: 2 samples, ragged phar/pocket sizes
    bs, n_p, n_q = 2, 4, 7
    sizes_p, sizes_q = [3, 4], [7, 5]
    rng = np.random.default_rng(11)
    x_p = (2.0 * rng.standard_normal((bs, n_p, 3))).astype(np.float32)
    h_p = rng.standard_normal((bs, n_p, phar_nf)).astype(np.float32)
    x_q = (2.0 * rng.standard_normal((bs, n_q, 3))).astype(np.float32)
    h_q = rng.standard_normal((bs, n_q, residue_nf)).astype(np.float32)
    m_p = np.zeros((bs, n_p), np.float32)
    m_q = np.zeros((bs, n_q), np.float32)
    for b_i in range(bs):
        m_p[b_i, : sizes_p[b_i]] = 1.0
        m_q[b_i, : sizes_q[b_i]] = 1.0
        x_p[b_i, sizes_p[b_i]:] = 0.0
        h_p[b_i, sizes_p[b_i]:] = 0.0
        x_q[b_i, sizes_q[b_i]:] = 0.0
        h_q[b_i, sizes_q[b_i]:] = 0.0
    t = rng.random((bs, 1)).astype(np.float32)

    # flat reference form: per sample phars first then residues, batch mask;
    # t stays [bs, 1] — the reference broadcasts it per node via t[mask]
    # (dynamics.py:92-99)
    xh_p_flat, xh_q_flat, mask_p_flat, mask_q_flat = [], [], [], []
    for b_i in range(bs):
        for i in range(sizes_p[b_i]):
            xh_p_flat.append(np.concatenate([x_p[b_i, i], h_p[b_i, i]]))
            mask_p_flat.append(b_i)
        for i in range(sizes_q[b_i]):
            xh_q_flat.append(np.concatenate([x_q[b_i, i], h_q[b_i, i]]))
            mask_q_flat.append(b_i)
    with torch.no_grad():
        eps_p_ref, eps_q_ref = tdyn.forward(
            torch.tensor(np.stack(xh_p_flat)),
            torch.tensor(np.stack(xh_q_flat)),
            torch.tensor(t),
            torch.tensor(mask_p_flat, dtype=torch.long),
            torch.tensor(mask_q_flat, dtype=torch.long),
        )
    eps_p_ref, eps_q_ref = eps_p_ref.numpy(), eps_q_ref.numpy()

    cfg = DynamicsConfig(
        phar_nf=phar_nf, residue_nf=residue_nf, joint_nf=joint_nf,
        condition_time=True, update_pocket_coords=update_pocket_coords,
        edge_cutoff=cutoff,
        egnn=EGNNConfig(
            hidden_nf=hidden, n_layers=n_layers, inv_sublayers=1,
            attention=True, tanh=True, normalization_factor=100.0,
        ),
    )
    egnn_params = _transplant(tdyn.egnn, n_layers, 1, True)["params"]
    params = {
        "params": {
            "phar_encoder": _seq_mlp_params(tdyn.phar_encoder),
            "residue_encoder": _seq_mlp_params(tdyn.residue_encoder),
            "phar_decoder": _seq_mlp_params(tdyn.phar_decoder),
            "residue_decoder": _seq_mlp_params(tdyn.residue_decoder),
            "egnn": egnn_params,
        }
    }
    model = EGNNDynamics(cfg)
    eps_p, eps_q = model.apply(
        params,
        jnp.asarray(np.concatenate([x_p, h_p], -1)),
        jnp.asarray(np.concatenate([x_q, h_q], -1)),
        jnp.asarray(t), jnp.asarray(m_p), jnp.asarray(m_q),
    )
    # unpad to the reference's flat layout
    eps_p_np = np.concatenate(
        [np.asarray(eps_p[b_i, : sizes_p[b_i]]) for b_i in range(bs)]
    )
    eps_q_np = np.concatenate(
        [np.asarray(eps_q[b_i, : sizes_q[b_i]]) for b_i in range(bs)]
    )
    np.testing.assert_allclose(eps_p_np, eps_p_ref, rtol=1e-5, atol=5e-5)
    np.testing.assert_allclose(eps_q_np, eps_q_ref, rtol=1e-5, atol=5e-5)


# ------------------------------------------------ full-DDPM transplant


def _load_reference_cddpm():
    """Import the reference ConditionalDDPM (conditional_model.py) with
    pure-torch stand-ins for its torch_scatter / utils deps. Returns the
    loaded ``conditional_model`` module."""
    import sys
    import types

    pkg_root = pathlib.Path("/root/reference/DiffPhar")
    if not pkg_root.exists():
        pytest.skip("reference tree not present")

    def scatter_mean(src, index, dim=0, dim_size=None):
        n = dim_size or int(index.max()) + 1
        out = src.new_zeros((n, *src.shape[1:]))
        cnt = src.new_zeros((n, *src.shape[1:]))
        idx = index.view(-1, *([1] * (src.dim() - 1))).expand_as(src)
        out.scatter_add_(0, idx, src)
        cnt.scatter_add_(0, idx, torch.ones_like(src))
        return out / cnt.clamp(min=1)

    def scatter_add(src, index, dim=0, dim_size=None):
        n = dim_size or int(index.max()) + 1
        if src.dim() == 1:
            out = src.new_zeros((n,))
            return out.scatter_add_(0, index, src)
        out = src.new_zeros((n, *src.shape[1:]))
        idx = index.view(-1, *([1] * (src.dim() - 1))).expand_as(src)
        return out.scatter_add_(0, idx, src)

    stub_scatter = types.ModuleType("torch_scatter")
    stub_scatter.scatter_add = scatter_add
    stub_scatter.scatter_mean = scatter_mean

    stub_utils = types.ModuleType("utils")

    def num_nodes_to_batch_mask(n_samples, num_nodes, device):
        return torch.repeat_interleave(
            torch.arange(n_samples, device=device), num_nodes
        )

    stub_utils.num_nodes_to_batch_mask = num_nodes_to_batch_mask

    saved = {k: sys.modules.get(k) for k in ("torch_scatter", "utils")}
    sys.modules["torch_scatter"] = stub_scatter
    sys.modules["utils"] = stub_utils
    sys.path.insert(0, str(pkg_root))
    try:
        import equivariant_diffusion.conditional_model as cm
    finally:
        sys.path.remove(str(pkg_root))
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return cm


@pytest.fixture(scope="module")
def refcm():
    return _load_reference_cddpm()


# DDPM fixture shapes
D_B = 3
D_PHAR_NF, D_RES_NF, D_JOINT, D_HID, D_LAYERS = 5, 6, 16, 32, 2
D_T = 50
D_SIZES_P, D_SIZES_Q = [2, 3, 4], [6, 4, 5]
D_NP, D_NQ = 4, 6
D_NORM = (2.0, 4.0)


def _ddpm_pair(refcm, seed=13):
    """Build a reference ConditionalDDPM and our ConditionalDDPM sharing
    transplanted dynamics weights, a noise schedule, and a size prior."""
    from cmdgen_tpu.diffusion.cddpm import ConditionalDDPM, DDPMConfig
    from cmdgen_tpu.diffusion.size_prior import SizePrior
    from cmdgen_tpu.models.dynamics import DynamicsConfig, EGNNDynamics

    dyn_mod = _load_reference_dynamics()
    torch.manual_seed(seed)
    tdyn = dyn_mod.EGNNDynamics(
        phar_nf=D_PHAR_NF, residue_nf=D_RES_NF, n_dims=3,
        joint_nf=D_JOINT, hidden_nf=D_HID, n_layers=D_LAYERS,
        attention=True, condition_time=True, tanh=True,
        norm_constant=1.0, inv_sublayers=1, sin_embedding=False,
        normalization_factor=100.0, aggregation_method="sum",
        update_pocket_coords=False, edge_cutoff=5.0,
    )
    tdyn.eval()

    rng = np.random.default_rng(17)
    hist = rng.integers(1, 50, size=(9, 12)).astype(np.float64)

    tddpm = refcm.ConditionalDDPM(
        dynamics=tdyn, phar_nf=D_PHAR_NF, residue_nf=D_RES_NF, n_dims=3,
        size_histogram=hist.tolist(), timesteps=D_T,
        parametrization="eps", noise_schedule="polynomial_2",
        noise_precision=1e-5, loss_type="vlb",
        norm_values=D_NORM, norm_biases=(None, 0.0),
    )

    cfg = DynamicsConfig(
        phar_nf=D_PHAR_NF, residue_nf=D_RES_NF, joint_nf=D_JOINT,
        condition_time=True, update_pocket_coords=False, edge_cutoff=5.0,
        egnn=EGNNConfig(
            hidden_nf=D_HID, n_layers=D_LAYERS, inv_sublayers=1,
            attention=True, tanh=True, normalization_factor=100.0,
        ),
    )
    params = {
        "params": {
            "phar_encoder": _seq_mlp_params(tdyn.phar_encoder),
            "residue_encoder": _seq_mlp_params(tdyn.residue_encoder),
            "phar_decoder": _seq_mlp_params(tdyn.phar_decoder),
            "residue_decoder": _seq_mlp_params(tdyn.residue_decoder),
            "egnn": _transplant(tdyn.egnn, D_LAYERS, 1, True)["params"],
        }
    }
    jddpm = ConditionalDDPM(
        DDPMConfig(
            timesteps=D_T, noise_schedule="polynomial_2",
            noise_precision=1e-5, loss_type="vlb",
            norm_x=D_NORM[0], norm_h=D_NORM[1], norm_bias_h=0.0,
        ),
        EGNNDynamics(cfg),
        size_prior=SizePrior(hist),
    )
    return tddpm, jddpm, params


def _ddpm_batch(seed=19):
    """Random padded phar/pocket clouds + the flat reference twin dicts."""
    from cmdgen_tpu.containers import PointCloud

    rng = np.random.default_rng(seed)
    x_p = (2.0 * rng.standard_normal((D_B, D_NP, 3))).astype(np.float32)
    x_q = (2.0 * rng.standard_normal((D_B, D_NQ, 3))).astype(np.float32)
    h_p = np.eye(D_PHAR_NF, dtype=np.float32)[
        rng.integers(0, D_PHAR_NF, (D_B, D_NP))
    ]
    h_q = np.eye(D_RES_NF, dtype=np.float32)[
        rng.integers(0, D_RES_NF, (D_B, D_NQ))
    ]
    m_p = np.zeros((D_B, D_NP), np.float32)
    m_q = np.zeros((D_B, D_NQ), np.float32)
    for b_i in range(D_B):
        m_p[b_i, : D_SIZES_P[b_i]] = 1.0
        m_q[b_i, : D_SIZES_Q[b_i]] = 1.0
    x_p *= m_p[..., None]
    h_p *= m_p[..., None]
    x_q *= m_q[..., None]
    h_q *= m_q[..., None]

    def flat(arr, sizes):
        return np.concatenate(
            [arr[b_i, : sizes[b_i]] for b_i in range(D_B)]
        )

    def bidx(sizes):
        return torch.tensor(
            np.repeat(np.arange(D_B), sizes), dtype=torch.long
        )

    ref_phar = {
        "x": torch.tensor(flat(x_p, D_SIZES_P)),
        "one_hot": torch.tensor(flat(h_p, D_SIZES_P)),
        "size": torch.tensor(D_SIZES_P, dtype=torch.long),
        "mask": bidx(D_SIZES_P),
    }
    ref_pocket = {
        "x": torch.tensor(flat(x_q, D_SIZES_Q)),
        "one_hot": torch.tensor(flat(h_q, D_SIZES_Q)),
        "size": torch.tensor(D_SIZES_Q, dtype=torch.long),
        "mask": bidx(D_SIZES_Q),
    }
    phar = PointCloud(
        x=jnp.asarray(x_p), h=jnp.asarray(h_p), mask=jnp.asarray(m_p)
    )
    pocket = PointCloud(
        x=jnp.asarray(x_q), h=jnp.asarray(h_q), mask=jnp.asarray(m_q)
    )
    return phar, pocket, ref_phar, ref_pocket


def _pad_noise(flat, sizes, n_pad):
    """[sum(sizes), F] standard-normal -> padded [B, n_pad, F] (zeros on
    padding, as loss_given_noise expects)."""
    out = np.zeros((D_B, n_pad, flat.shape[-1]), np.float32)
    off = 0
    for b_i, s in enumerate(sizes):
        out[b_i, :s] = flat[off : off + s]
        off += s
    return out


@pytest.mark.parametrize("training", [True, False])
def test_cddpm_loss_matches_reference(refcm, monkeypatch, training):
    """Weight-transplant parity for the FULL conditional-DDPM loss
    (conditional_model.py:198-320): identical dynamics weights, timesteps
    and noise draws through both implementations; every per-sample loss
    term must agree — error_t, SNR weighting, L0 (x and h), the L0
    constants, the KL prior, the size prior log p(N), and delta_log_px.
    Covers training mode (t=0 masking path) and eval mode (separate
    second t=0 forward pass)."""
    tddpm, jddpm, params = _ddpm_pair(refcm)
    phar, pocket, ref_phar, ref_pocket = _ddpm_batch()
    tddpm.train(training)

    nf = 3 + D_PHAR_NF
    rng = np.random.default_rng(23)
    n_tot_p = sum(D_SIZES_P)
    eps_t_flat = rng.standard_normal((n_tot_p, nf)).astype(np.float32)
    eps_0_flat = rng.standard_normal((n_tot_p, nf)).astype(np.float32)
    # include a t=0 row in training mode (exercises the t_is_zero masking);
    # eval mode draws from {1..T}
    t_fix = np.array([[0 if training else 1], [17], [D_T]], np.int64)

    draws = [torch.tensor(eps_t_flat), torch.tensor(eps_0_flat)]
    monkeypatch.setattr(
        refcm.ConditionalDDPM,
        "sample_gaussian",
        staticmethod(lambda size, device: draws.pop(0)),
    )
    monkeypatch.setattr(
        torch,
        "randint",
        lambda low, high, size, device=None: torch.tensor(t_fix),
    )
    with torch.no_grad():
        (
            delta_ref, error_t_ref, _, snr_ref, loss0x_ref, _, loss0h_ref,
            neg_const_ref, klp_ref, log_pn_ref, t_out_ref, _xh_hat,
        ) = tddpm.forward(
            {k: (v.clone() if torch.is_tensor(v) else v)
             for k, v in ref_phar.items()},
            {k: (v.clone() if torch.is_tensor(v) else v)
             for k, v in ref_pocket.items()},
        )

    nll, info = jddpm.loss_given_noise(
        params, phar, pocket,
        jnp.asarray(t_fix[:, 0], jnp.float32),
        jnp.asarray(_pad_noise(eps_t_flat, D_SIZES_P, D_NP)),
        jnp.asarray(_pad_noise(eps_0_flat, D_SIZES_P, D_NP)),
        training=training,
        return_terms=True,
    )
    terms = info["terms"]

    tol = dict(rtol=2e-4, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(terms["delta_log_px"]), delta_ref.numpy(), **tol
    )
    np.testing.assert_allclose(
        np.asarray(terms["error_t"]), error_t_ref.numpy(), **tol
    )
    # at t=0 the reference's gamma(s=-1/T) wraps its lookup table to
    # gamma_T while ours clamps to gamma_0; the term is only ever used
    # multiplied by error_t (zeroed at t=0), so compare where t > 0
    nz = t_fix[:, 0] > 0
    np.testing.assert_allclose(
        np.asarray(terms["snr_weight"])[nz], snr_ref.numpy()[nz], **tol
    )
    np.testing.assert_allclose(
        np.asarray(terms["loss0_x"]), loss0x_ref.numpy(), **tol
    )
    np.testing.assert_allclose(
        np.asarray(terms["loss0_h"]), loss0h_ref.numpy(), **tol
    )
    np.testing.assert_allclose(
        np.asarray(terms["neg_log_constants"]), neg_const_ref.numpy(), **tol
    )
    np.testing.assert_allclose(
        np.asarray(terms["kl_prior"]), klp_ref.numpy(), **tol
    )
    np.testing.assert_allclose(
        np.asarray(terms["log_pN"]), log_pn_ref.numpy(), **tol
    )
    # assembled vlb NLL (lightning_modules.py:188-239) from the REFERENCE
    # terms must equal our returned nll
    loss_t_ref = -D_T * 0.5 * snr_ref * error_t_ref
    loss_0_ref = loss0x_ref + loss0h_ref + neg_const_ref
    nll_ref = loss_t_ref + loss_0_ref + klp_ref - delta_ref - log_pn_ref
    np.testing.assert_allclose(np.asarray(nll), nll_ref.numpy(), **tol)


def test_cddpm_reverse_step_matches_reference(refcm, monkeypatch):
    """Weight-transplant parity for one reverse sampling step
    p(z_s | z_t) (conditional_model.py:342-374): same zt, same dynamics
    weights, same posterior noise draw -> identical z_s and re-centered
    pocket on both implementations."""
    tddpm, jddpm, params = _ddpm_pair(refcm, seed=29)
    phar, pocket, ref_phar, ref_pocket = _ddpm_batch(seed=31)
    tddpm.eval()

    nf = 3 + D_PHAR_NF
    rng = np.random.default_rng(37)
    n_tot_p = sum(D_SIZES_P)
    # a CoM-free noised state zt (the reference asserts zero phar CoM)
    zt_flat = rng.standard_normal((n_tot_p, nf)).astype(np.float32)
    xh0_pocket_flat = np.concatenate(
        [np.asarray(ref_pocket["x"]), np.asarray(ref_pocket["one_hot"])], -1
    ).astype(np.float32)
    noise_flat = rng.standard_normal((n_tot_p, nf)).astype(np.float32)

    with torch.no_grad():
        zt_t = torch.tensor(zt_flat)
        xh0_q_t = torch.tensor(xh0_pocket_flat)
        zt_t[:, :3], xh0_q_t[:, :3] = tddpm.remove_mean_batch(
            zt_t[:, :3], xh0_q_t[:, :3],
            ref_phar["mask"], ref_pocket["mask"],
        )
    zt_cent = zt_t.numpy()
    xh0_q_cent = xh0_q_t.numpy()

    s_int, t_int = 36, 37
    monkeypatch.setattr(
        refcm.ConditionalDDPM,
        "sample_gaussian",
        staticmethod(lambda size, device: torch.tensor(noise_flat)),
    )
    with torch.no_grad():
        zs_ref, xh_pocket_ref = tddpm.sample_p_zs_given_zt(
            torch.full((D_B, 1), s_int / D_T),
            torch.full((D_B, 1), t_int / D_T),
            torch.tensor(zt_cent), torch.tensor(xh0_q_cent),
            ref_phar["mask"], ref_pocket["mask"],
        )

    zs_j, xh_pocket_j = jddpm._denoise_step(
        params, None,
        jnp.asarray(_pad_noise(zt_cent, D_SIZES_P, D_NP)),
        jnp.asarray(_pad_noise(xh0_q_cent, D_SIZES_Q, D_NQ)),
        float(s_int), float(t_int),
        phar.mask, pocket.mask,
        noise=jnp.asarray(_pad_noise(noise_flat, D_SIZES_P, D_NP)),
    )

    def unpad(arr, sizes):
        return np.concatenate(
            [np.asarray(arr[b_i, : sizes[b_i]]) for b_i in range(D_B)]
        )

    tol = dict(rtol=2e-4, atol=5e-4)
    np.testing.assert_allclose(
        unpad(zs_j, D_SIZES_P), zs_ref.numpy(), **tol
    )
    np.testing.assert_allclose(
        unpad(xh_pocket_j, D_SIZES_Q), xh_pocket_ref.numpy(), **tol
    )


def test_cddpm_final_decode_matches_reference(refcm, monkeypatch):
    """Weight-transplant parity for the final p(x, h | z0) decode
    (conditional_model.py:107-131): same z0, same dynamics weights, same
    sigma_0 noise draw -> identical x (phar + re-centered pocket) and
    identical argmax one-hot types on both implementations."""
    tddpm, jddpm, params = _ddpm_pair(refcm, seed=43)
    phar, pocket, ref_phar, ref_pocket = _ddpm_batch(seed=47)
    tddpm.eval()

    nf = 3 + D_PHAR_NF
    rng = np.random.default_rng(53)
    n_tot_p = sum(D_SIZES_P)
    z0_flat = rng.standard_normal((n_tot_p, nf)).astype(np.float32)
    xh0_pocket_flat = np.concatenate(
        [np.asarray(ref_pocket["x"]), np.asarray(ref_pocket["one_hot"])], -1
    ).astype(np.float32)
    noise_flat = rng.standard_normal((n_tot_p, nf)).astype(np.float32)

    monkeypatch.setattr(
        refcm.ConditionalDDPM,
        "sample_gaussian",
        staticmethod(lambda size, device: torch.tensor(noise_flat)),
    )
    with torch.no_grad():
        x_p_ref, h_p_ref, x_q_ref, h_q_ref = tddpm.sample_p_xh_given_z0(
            torch.tensor(z0_flat), torch.tensor(xh0_pocket_flat),
            ref_phar["mask"], ref_pocket["mask"], D_B,
        )

    x_p, h_p, x_q, h_q = jddpm._final_decode(
        params, None,
        jnp.asarray(_pad_noise(z0_flat, D_SIZES_P, D_NP)),
        jnp.asarray(_pad_noise(xh0_pocket_flat, D_SIZES_Q, D_NQ)),
        phar.mask, pocket.mask,
        noise=jnp.asarray(_pad_noise(noise_flat, D_SIZES_P, D_NP)),
    )

    def unpad(arr, sizes):
        return np.concatenate(
            [np.asarray(arr[b_i, : sizes[b_i]]) for b_i in range(D_B)]
        )

    tol = dict(rtol=2e-4, atol=5e-4)
    np.testing.assert_allclose(unpad(x_p, D_SIZES_P), x_p_ref.numpy(), **tol)
    np.testing.assert_allclose(unpad(x_q, D_SIZES_Q), x_q_ref.numpy(), **tol)
    np.testing.assert_array_equal(
        unpad(h_p, D_SIZES_P), h_p_ref.numpy().astype(np.float32)
    )
    np.testing.assert_allclose(unpad(h_q, D_SIZES_Q), h_q_ref.numpy(), **tol)


# ------------------------------------------- joint-DDPM transplant


def _load_reference_joint():
    """Import the reference EnVariationalDiffusion (en_diffusion.py) with
    the same pure-torch torch_scatter / utils stand-ins as
    :func:`_load_reference_cddpm`."""
    import sys
    import types

    pkg_root = pathlib.Path("/root/reference/DiffPhar")
    if not pkg_root.exists():
        pytest.skip("reference tree not present")

    def scatter_mean(src, index, dim=0, dim_size=None):
        n = dim_size or int(index.max()) + 1
        out = src.new_zeros((n, *src.shape[1:]))
        cnt = src.new_zeros((n, *src.shape[1:]))
        idx = index.view(-1, *([1] * (src.dim() - 1))).expand_as(src)
        out.scatter_add_(0, idx, src)
        cnt.scatter_add_(0, idx, torch.ones_like(src))
        return out / cnt.clamp(min=1)

    def scatter_add(src, index, dim=0, dim_size=None):
        n = dim_size or int(index.max()) + 1
        if src.dim() == 1:
            out = src.new_zeros((n,))
            return out.scatter_add_(0, index, src)
        out = src.new_zeros((n, *src.shape[1:]))
        idx = index.view(-1, *([1] * (src.dim() - 1))).expand_as(src)
        return out.scatter_add_(0, idx, src)

    stub_scatter = types.ModuleType("torch_scatter")
    stub_scatter.scatter_add = scatter_add
    stub_scatter.scatter_mean = scatter_mean
    saved = {k: sys.modules.get(k) for k in ("torch_scatter", "utils")}
    sys.modules["torch_scatter"] = stub_scatter
    sys.modules["utils"] = types.ModuleType("utils")
    sys.path.insert(0, str(pkg_root))
    try:
        import equivariant_diffusion.en_diffusion as en
    finally:
        sys.path.remove(str(pkg_root))
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return en


@pytest.fixture(scope="module")
def refen():
    return _load_reference_joint()


def _joint_pair(refen, seed=41):
    """Reference EnVariationalDiffusion + our JointDDPM sharing transplanted
    joint-mode dynamics weights (update_pocket_coords=True)."""
    from cmdgen_tpu.diffusion.cddpm import DDPMConfig
    from cmdgen_tpu.diffusion.joint import JointDDPM
    from cmdgen_tpu.diffusion.size_prior import SizePrior
    from cmdgen_tpu.models.dynamics import DynamicsConfig, EGNNDynamics

    dyn_mod = _load_reference_dynamics()
    torch.manual_seed(seed)
    tdyn = dyn_mod.EGNNDynamics(
        phar_nf=D_PHAR_NF, residue_nf=D_RES_NF, n_dims=3,
        joint_nf=D_JOINT, hidden_nf=D_HID, n_layers=D_LAYERS,
        attention=True, condition_time=True, tanh=True,
        norm_constant=1.0, inv_sublayers=1, sin_embedding=False,
        normalization_factor=100.0, aggregation_method="sum",
        update_pocket_coords=True, edge_cutoff=5.0,
    )
    tdyn.eval()

    rng = np.random.default_rng(43)
    hist = rng.integers(1, 50, size=(9, 12)).astype(np.float64)

    tddpm = refen.EnVariationalDiffusion(
        dynamics=tdyn, phar_nf=D_PHAR_NF, residue_nf=D_RES_NF, n_dims=3,
        size_histogram=hist.tolist(), timesteps=D_T,
        parametrization="eps", noise_schedule="polynomial_2",
        noise_precision=1e-5, loss_type="vlb",
        norm_values=D_NORM, norm_biases=(None, 0.0),
    )

    cfg = DynamicsConfig(
        phar_nf=D_PHAR_NF, residue_nf=D_RES_NF, joint_nf=D_JOINT,
        condition_time=True, update_pocket_coords=True, edge_cutoff=5.0,
        egnn=EGNNConfig(
            hidden_nf=D_HID, n_layers=D_LAYERS, inv_sublayers=1,
            attention=True, tanh=True, normalization_factor=100.0,
        ),
    )
    params = {
        "params": {
            "phar_encoder": _seq_mlp_params(tdyn.phar_encoder),
            "residue_encoder": _seq_mlp_params(tdyn.residue_encoder),
            "phar_decoder": _seq_mlp_params(tdyn.phar_decoder),
            "residue_decoder": _seq_mlp_params(tdyn.residue_decoder),
            "egnn": _transplant(tdyn.egnn, D_LAYERS, 1, True)["params"],
        }
    }
    jddpm = JointDDPM(
        DDPMConfig(
            timesteps=D_T, noise_schedule="polynomial_2",
            noise_precision=1e-5, loss_type="vlb",
            norm_x=D_NORM[0], norm_h=D_NORM[1], norm_bias_h=0.0,
        ),
        EGNNDynamics(cfg),
        size_prior=SizePrior(hist),
    )
    return tddpm, jddpm, params


def _joint_noise(rng):
    """One draw of the reference's combined noise
    (en_diffusion.py:555-575): x jointly CoM-projected per sample across
    both clouds, h iid standard normal. Returns flat (eps_p, eps_q)."""
    n_tot_p, n_tot_q = sum(D_SIZES_P), sum(D_SIZES_Q)
    zx = rng.standard_normal((n_tot_p + n_tot_q, 3)).astype(np.float32)
    bidx = np.concatenate([
        np.repeat(np.arange(D_B), D_SIZES_P),
        np.repeat(np.arange(D_B), D_SIZES_Q),
    ])
    for b_i in range(D_B):
        sel = bidx == b_i
        zx[sel] -= zx[sel].mean(0)
    h_p = rng.standard_normal((n_tot_p, D_PHAR_NF)).astype(np.float32)
    h_q = rng.standard_normal((n_tot_q, D_RES_NF)).astype(np.float32)
    eps_p = np.concatenate([zx[:n_tot_p], h_p], -1)
    eps_q = np.concatenate([zx[n_tot_p:], h_q], -1)
    return eps_p, eps_q


@pytest.mark.parametrize("training", [True, False])
def test_joint_loss_matches_reference(refen, monkeypatch, training):
    """Weight-transplant parity for the FULL joint-DDPM loss
    (en_diffusion.py:332-465): identical joint-mode dynamics weights,
    timesteps and CoM-projected noise draws through both implementations;
    every per-sample loss term must agree. Covers training mode (t=0
    masking) and eval mode (separate second t=0 forward,
    en_diffusion.py:423-443)."""
    tddpm, jddpm, params = _joint_pair(refen)
    phar, pocket, ref_phar, ref_pocket = _ddpm_batch(seed=47)
    tddpm.train(training)

    rng = np.random.default_rng(53)
    eps_t = _joint_noise(rng)
    eps_0 = _joint_noise(rng)
    t_fix = np.array([[0 if training else 1], [17], [D_T]], np.int64)

    draws = [
        (torch.tensor(eps_t[0]), torch.tensor(eps_t[1])),
        (torch.tensor(eps_0[0]), torch.tensor(eps_0[1])),
    ]
    monkeypatch.setattr(
        refen.EnVariationalDiffusion,
        "sample_combined_position_feature_noise",
        lambda self, pi, qi: draws.pop(0),
    )
    monkeypatch.setattr(
        torch,
        "randint",
        lambda low, high, size, device=None: torch.tensor(t_fix),
    )
    with torch.no_grad():
        (
            delta_ref, err_p_ref, err_q_ref, snr_ref, loss0xp_ref,
            loss0xq_ref, loss0h_ref, neg_const_ref, klp_ref, log_pn_ref,
            _t_out, _xh_hat,
        ) = tddpm.forward(
            {k: (v.clone() if torch.is_tensor(v) else v)
             for k, v in ref_phar.items()},
            {k: (v.clone() if torch.is_tensor(v) else v)
             for k, v in ref_pocket.items()},
        )

    nll, info = jddpm.loss_given_noise(
        params, phar, pocket,
        jnp.asarray(t_fix[:, 0], jnp.float32),
        jnp.asarray(_pad_noise(eps_t[0], D_SIZES_P, D_NP)),
        jnp.asarray(_pad_noise(eps_t[1], D_SIZES_Q, D_NQ)),
        jnp.asarray(_pad_noise(eps_0[0], D_SIZES_P, D_NP)),
        jnp.asarray(_pad_noise(eps_0[1], D_SIZES_Q, D_NQ)),
        training=training,
        return_terms=True,
    )
    terms = info["terms"]

    tol = dict(rtol=2e-4, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(terms["delta_log_px"]), delta_ref.numpy(), **tol
    )
    np.testing.assert_allclose(
        np.asarray(terms["error_t_phar"]), err_p_ref.numpy(), **tol
    )
    np.testing.assert_allclose(
        np.asarray(terms["error_t_pocket"]), err_q_ref.numpy(), **tol
    )
    # same t=0 gamma(s=-1/T) table-wrap caveat as the conditional test:
    # the weight is only ever used multiplied by the (zeroed) error terms
    nz = t_fix[:, 0] > 0
    np.testing.assert_allclose(
        np.asarray(terms["snr_weight"])[nz], snr_ref.numpy()[nz], **tol
    )
    np.testing.assert_allclose(
        np.asarray(terms["loss0_x_p"]), loss0xp_ref.numpy(), **tol
    )
    np.testing.assert_allclose(
        np.asarray(terms["loss0_x_q"]), loss0xq_ref.numpy(), **tol
    )
    np.testing.assert_allclose(
        np.asarray(terms["loss0_h"]), loss0h_ref.numpy(), **tol
    )
    np.testing.assert_allclose(
        np.asarray(terms["neg_log_constants"]), neg_const_ref.numpy(), **tol
    )
    np.testing.assert_allclose(
        np.asarray(terms["kl_prior"]), klp_ref.numpy(), **tol
    )
    np.testing.assert_allclose(
        np.asarray(terms["log_pN"]), log_pn_ref.numpy(), **tol
    )
    # assembled vlb NLL (lightning_modules.py:196-231, both error terms)
    # from the REFERENCE terms must equal our returned nll
    loss_t_ref = -D_T * 0.5 * snr_ref * (err_p_ref + err_q_ref)
    loss_0_ref = loss0xp_ref + loss0xq_ref + loss0h_ref + neg_const_ref
    nll_ref = loss_t_ref + loss_0_ref + klp_ref - delta_ref - log_pn_ref
    np.testing.assert_allclose(np.asarray(nll), nll_ref.numpy(), **tol)


def test_joint_reverse_step_matches_reference(refen, monkeypatch):
    """Weight-transplant parity for one joint reverse step p(z_s | z_t)
    (en_diffusion.py:499-553): same jointly CoM-free zt over both clouds,
    same posterior noise draw -> identical z_s on both implementations,
    including the final joint CoM re-projection."""
    tddpm, jddpm, params = _joint_pair(refen, seed=59)
    phar, pocket, ref_phar, ref_pocket = _ddpm_batch(seed=61)
    tddpm.eval()

    rng = np.random.default_rng(67)
    n_tot_p, n_tot_q = sum(D_SIZES_P), sum(D_SIZES_Q)
    zt_p = rng.standard_normal((n_tot_p, 3 + D_PHAR_NF)).astype(np.float32)
    zt_q = rng.standard_normal((n_tot_q, 3 + D_RES_NF)).astype(np.float32)
    # the reference asserts a jointly mean-zero x part on entry
    zx = np.concatenate([zt_p[:, :3], zt_q[:, :3]])
    bidx = np.concatenate([
        np.repeat(np.arange(D_B), D_SIZES_P),
        np.repeat(np.arange(D_B), D_SIZES_Q),
    ])
    for b_i in range(D_B):
        sel = bidx == b_i
        zx[sel] -= zx[sel].mean(0)
    zt_p[:, :3] = zx[:n_tot_p]
    zt_q[:, :3] = zx[n_tot_p:]
    noise = _joint_noise(rng)

    s_int, t_int = 36, 37
    monkeypatch.setattr(
        refen.EnVariationalDiffusion,
        "sample_combined_position_feature_noise",
        lambda self, pi, qi: (
            torch.tensor(noise[0]), torch.tensor(noise[1])
        ),
    )
    with torch.no_grad():
        zs_p_ref, zs_q_ref = tddpm.sample_p_zs_given_zt(
            torch.full((D_B, 1), s_int / D_T),
            torch.full((D_B, 1), t_int / D_T),
            torch.tensor(zt_p), torch.tensor(zt_q),
            ref_phar["mask"], ref_pocket["mask"],
        )

    zs_p_j, zs_q_j = jddpm._denoise_step(
        params, None,
        jnp.asarray(_pad_noise(zt_p, D_SIZES_P, D_NP)),
        jnp.asarray(_pad_noise(zt_q, D_SIZES_Q, D_NQ)),
        float(s_int), float(t_int),
        phar.mask, pocket.mask,
        noise=(
            jnp.asarray(_pad_noise(noise[0], D_SIZES_P, D_NP)),
            jnp.asarray(_pad_noise(noise[1], D_SIZES_Q, D_NQ)),
        ),
    )

    def unpad(arr, sizes):
        return np.concatenate(
            [np.asarray(arr[b_i, : sizes[b_i]]) for b_i in range(D_B)]
        )

    tol = dict(rtol=2e-4, atol=5e-4)
    np.testing.assert_allclose(
        unpad(zs_p_j, D_SIZES_P), zs_p_ref.numpy(), **tol
    )
    np.testing.assert_allclose(
        unpad(zs_q_j, D_SIZES_Q), zs_q_ref.numpy(), **tol
    )


def test_joint_renoise_jump_matches_reference(refen, monkeypatch):
    """Weight-transplant parity for the RePaint renoise jump
    q(z_t | z_s) (en_diffusion.py:475-497): same z_s, same combined noise
    draw -> identical z_t incl. the final joint CoM re-projection. With
    the denoise-step and schedule tests this covers both primitives the
    inpaint scan is built from."""
    tddpm, jddpm, params = _joint_pair(refen, seed=97)
    phar, pocket, ref_phar, ref_pocket = _ddpm_batch(seed=101)
    tddpm.eval()

    rng = np.random.default_rng(103)
    n_tot_p, n_tot_q = sum(D_SIZES_P), sum(D_SIZES_Q)
    zs_p = rng.standard_normal((n_tot_p, 3 + D_PHAR_NF)).astype(np.float32)
    zs_q = rng.standard_normal((n_tot_q, 3 + D_RES_NF)).astype(np.float32)
    noise = _joint_noise(rng)

    s_int, t_int = 12, 22  # a jump_length=10 resample jump
    monkeypatch.setattr(
        refen.EnVariationalDiffusion,
        "sample_combined_position_feature_noise",
        lambda self, pi, qi: (torch.tensor(noise[0]), torch.tensor(noise[1])),
    )
    with torch.no_grad():
        gamma_s = tddpm.inflate_batch_array(
            tddpm.gamma(torch.full((D_B, 1), s_int / D_T)),
            ref_phar["x"],
        )
        gamma_t = tddpm.inflate_batch_array(
            tddpm.gamma(torch.full((D_B, 1), t_int / D_T)),
            ref_phar["x"],
        )
        zt_p_ref, zt_q_ref = tddpm.sample_p_zt_given_zs(
            torch.tensor(zs_p), torch.tensor(zs_q),
            ref_phar["mask"], ref_pocket["mask"], gamma_t, gamma_s,
        )

    zt_p_j, zt_q_j = jddpm._renoise_step(
        params, None,
        jnp.asarray(_pad_noise(zs_p, D_SIZES_P, D_NP)),
        jnp.asarray(_pad_noise(zs_q, D_SIZES_Q, D_NQ)),
        float(s_int), float(t_int),
        phar.mask, pocket.mask,
        noise=(
            jnp.asarray(_pad_noise(noise[0], D_SIZES_P, D_NP)),
            jnp.asarray(_pad_noise(noise[1], D_SIZES_Q, D_NQ)),
        ),
    )

    def unpad(arr, sizes):
        return np.concatenate(
            [np.asarray(arr[b_i, : sizes[b_i]]) for b_i in range(D_B)]
        )

    tol = dict(rtol=2e-4, atol=5e-4)
    np.testing.assert_allclose(
        unpad(zt_p_j, D_SIZES_P), zt_p_ref.numpy(), **tol
    )
    np.testing.assert_allclose(
        unpad(zt_q_j, D_SIZES_Q), zt_q_ref.numpy(), **tol
    )


def test_joint_finalize_matches_reference(refen, monkeypatch):
    """Weight-transplant parity for the joint final p(x, h | z0) decode
    (en_diffusion.py:259-285): same z0 over both clouds, same combined
    noise draw -> identical x and argmax one-hot types. Our _finalize adds
    the joint CoM projection the reference's sample() caller asserts
    instead; the test applies the same projection to the reference output
    before comparing."""
    tddpm, jddpm, params = _joint_pair(refen, seed=79)
    phar, pocket, ref_phar, ref_pocket = _ddpm_batch(seed=83)
    tddpm.eval()

    rng = np.random.default_rng(89)
    n_tot_p, n_tot_q = sum(D_SIZES_P), sum(D_SIZES_Q)
    z0_p = rng.standard_normal((n_tot_p, 3 + D_PHAR_NF)).astype(np.float32)
    z0_q = rng.standard_normal((n_tot_q, 3 + D_RES_NF)).astype(np.float32)
    noise = _joint_noise(rng)

    monkeypatch.setattr(
        refen.EnVariationalDiffusion,
        "sample_combined_position_feature_noise",
        lambda self, pi, qi: (torch.tensor(noise[0]), torch.tensor(noise[1])),
    )
    with torch.no_grad():
        x_p_ref, h_p_ref, x_q_ref, h_q_ref = tddpm.sample_p_xh_given_z0(
            torch.tensor(z0_p), torch.tensor(z0_q),
            ref_phar["mask"], ref_pocket["mask"], D_B,
        )
    # apply the joint CoM projection our _finalize bakes in
    x_p_ref, x_q_ref = x_p_ref.numpy().copy(), x_q_ref.numpy().copy()
    bidx = np.concatenate([
        np.repeat(np.arange(D_B), D_SIZES_P),
        np.repeat(np.arange(D_B), D_SIZES_Q),
    ])
    xcat = np.concatenate([x_p_ref, x_q_ref])
    for b_i in range(D_B):
        sel = bidx == b_i
        xcat[sel] -= xcat[sel].mean(0)
    x_p_ref, x_q_ref = xcat[:n_tot_p], xcat[n_tot_p:]

    phar_out, pocket_out = jddpm._finalize(
        params, None,
        jnp.asarray(_pad_noise(z0_p, D_SIZES_P, D_NP)),
        jnp.asarray(_pad_noise(z0_q, D_SIZES_Q, D_NQ)),
        phar.mask, pocket.mask,
        noise=(
            jnp.asarray(_pad_noise(noise[0], D_SIZES_P, D_NP)),
            jnp.asarray(_pad_noise(noise[1], D_SIZES_Q, D_NQ)),
        ),
    )

    def unpad(arr, sizes):
        return np.concatenate(
            [np.asarray(arr[b_i, : sizes[b_i]]) for b_i in range(D_B)]
        )

    tol = dict(rtol=2e-4, atol=5e-4)
    np.testing.assert_allclose(unpad(phar_out.x, D_SIZES_P), x_p_ref, **tol)
    np.testing.assert_allclose(unpad(pocket_out.x, D_SIZES_Q), x_q_ref, **tol)
    np.testing.assert_array_equal(
        unpad(phar_out.h, D_SIZES_P), h_p_ref.numpy().astype(np.float32)
    )
    np.testing.assert_array_equal(
        unpad(pocket_out.h, D_SIZES_Q), h_q_ref.numpy().astype(np.float32)
    )


# --------------------------------- schedules + learned gamma + size prior


@pytest.mark.parametrize(
    "schedule,timesteps,precision",
    [
        ("polynomial_2", 50, 1e-5),
        ("polynomial_2", 1000, 1e-5),   # the reference training config
        ("polynomial_3", 100, 1e-4),
        ("cosine", 100, 1e-4),
    ],
)
def test_gamma_table_matches_reference(refen, schedule, timesteps, precision):
    """ops/schedules.gamma_table vs the reference PredefinedNoiseSchedule
    (en_diffusion.py:1152-1188) over every t in the lookup, plus the
    round-to-index t -> gamma(t) access path."""
    from cmdgen_tpu.ops import schedules as sch_mod

    tsched = refen.PredefinedNoiseSchedule(schedule, timesteps, precision)
    ours = sch_mod.gamma_table(schedule, timesteps, precision)
    np.testing.assert_allclose(
        np.asarray(ours), tsched.gamma.numpy(), rtol=1e-6, atol=1e-6
    )
    t = torch.linspace(0, 1, 17)
    np.testing.assert_allclose(
        np.asarray(sch_mod.gamma_at(ours, jnp.asarray(t.numpy()))),
        tsched(t).numpy(), rtol=1e-6, atol=1e-6,
    )


def test_gamma_network_matches_reference(refen):
    """Weight-transplant parity for the learned monotone schedule
    (GammaNetwork + PositiveLinear, en_diffusion.py:1025-1096). The
    reference applies softplus to its raw weight; ours adds the -2 init
    offset inside the softplus, so the transplanted kernel is
    weight.T + 2."""
    from cmdgen_tpu.diffusion.gamma_net import GammaNetwork

    torch.manual_seed(71)
    tnet = refen.GammaNetwork()

    def _pos(torch_pl):
        return {
            "kernel": jnp.asarray(
                torch_pl.weight.detach().numpy().T + 2.0
            ),
            "bias": jnp.asarray(torch_pl.bias.detach().numpy()),
        }

    params = {
        "params": {
            "l1": _pos(tnet.l1),
            "l2": _pos(tnet.l2),
            "l3": _pos(tnet.l3),
            "gamma_0": jnp.asarray(tnet.gamma_0.detach().numpy()),
            "gamma_1": jnp.asarray(tnet.gamma_1.detach().numpy()),
        }
    }
    t = np.linspace(0.0, 1.0, 33, dtype=np.float32)[:, None]
    with torch.no_grad():
        g_ref = tnet(torch.tensor(t)).numpy()
    g_ours = GammaNetwork().apply(params, jnp.asarray(t))
    # f32 summation order differs across the 1024-wide hidden layer and
    # the endpoint normalization amplifies it; ~3e-4 abs is pure rounding
    np.testing.assert_allclose(np.asarray(g_ours), g_ref, rtol=1e-3, atol=1e-3)


def _load_reference_gcpg_dataset():
    """Import the reference GCPG ``utils/dataset.py`` (Tokenizer, _corrupt)
    with empty stubs for its dgl/rdkit imports — all rdkit/dgl usage in the
    module is inside functions we don't call. The Tokenizer itself is pure
    regex + torch."""
    import sys
    import types

    pkg_root = pathlib.Path("/root/reference/GCPG")
    if not pkg_root.exists():
        pytest.skip("reference tree not present")

    stub_names = [
        "dgl", "rdkit", "rdkit.Chem", "rdkit.RDConfig",
        "rdkit.Chem.ChemicalFeatures",
    ]
    stubs = {n: types.ModuleType(n) for n in stub_names}
    stubs["rdkit"].Chem = stubs["rdkit.Chem"]
    stubs["rdkit"].RDConfig = stubs["rdkit.RDConfig"]
    stubs["rdkit.RDConfig"].RDDataDir = ""
    stubs["rdkit.Chem"].ChemicalFeatures = stubs["rdkit.Chem.ChemicalFeatures"]

    saved = {
        k: sys.modules.get(k)
        for k in stub_names + ["utils", "utils.dataset", "utils.smiles2ppgraph"]
    }
    sys.modules.update(stubs)
    for k in ("utils", "utils.dataset", "utils.smiles2ppgraph"):
        sys.modules.pop(k, None)
    sys.path.insert(0, str(pkg_root))
    try:
        import utils.dataset as ds
    finally:
        sys.path.remove(str(pkg_root))
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return ds


TRICKY_SMILES = [
    # bracket atoms, isotopes/charges/stereo-H, two-char halogens,
    # two-digit ring closures, @@/@, aromatic subset, and junk chars
    # that must each become ONE unknown token
    "CCNC(=O)Nc1%22ccc2nc@@nc(N@c3ccc(O[C@@H]c4cccc(F)c4)c(Cl)c3)c2c1%22",
    "O=S(=O)([O-])c1ccc(B(O)O)cc1Br",
    "[13CH3][NH3+].[Cl-]",
    "c1cc[nH]c1CC%10CC%10",
    "C/C=C\\C#CCl",
    "X?=",  # unknowns
]


def test_tokenizer_matches_reference():
    """chem/tokenizer.py vs the reference GCPG Tokenizer
    (GCPG/utils/dataset.py:20-116): identical vocabulary extraction and
    ordering, token ids, atom-index positions, unknown-><mask> policy,
    and decode-until-<eos> round trip."""
    ds = _load_reference_gcpg_dataset()
    from cmdgen_tpu.chem.tokenizer import Tokenizer, gen_vocabs

    vocab_ref = ds.Tokenizer.gen_vocabs(TRICKY_SMILES[:-1])
    vocab_ours = gen_vocabs(TRICKY_SMILES[:-1])
    assert vocab_ours == set(vocab_ref)

    tref = ds.Tokenizer(vocab_ref)
    tours = Tokenizer(vocab_ours)
    assert tours.vocabs == tref.vocabs
    assert len(tours) == len(tref)

    for smi in TRICKY_SMILES:  # the last one is all-unknown tokens
        ids_ref, aidx_ref = tref.parse(smi, return_atom_idx=True)
        ids_ours, aidx_ours = tours.parse(smi, return_atom_idx=True)
        assert ids_ours == ids_ref, smi
        assert aidx_ours == aidx_ref, smi
        assert tours.get_text([ids_ours[1:]]) == tref.get_text([ids_ref[1:]])


def test_corrupt_tokens_matches_reference():
    """data/dataset.corrupt_tokens vs the reference's Poisson span
    infilling _corrupt (GCPG/utils/dataset.py:98-121): both draw
    choice-then-poisson from the same global numpy RNG, so seeding it
    identically must yield identical corrupted sequences."""
    ds = _load_reference_gcpg_dataset()
    from cmdgen_tpu.data.dataset import corrupt_tokens

    seq = list(range(100, 160))
    for seed in (0, 1, 2, 3, 4):
        np.random.seed(seed)
        ref = ds._corrupt(seq, mask_token=3)
        np.random.seed(seed)
        ours = corrupt_tokens(seq, mask_token=3, rng=np.random)
        assert ours == ref, seed


def test_repaint_schedule_matches_reference(refen):
    """diffusion/joint.get_repaint_schedule vs the reference's
    (en_diffusion.py:649-671) across resamplings x jump_length x timesteps
    grids — the static schedule the inpaint scan is flattened from."""
    from cmdgen_tpu.diffusion.joint import get_repaint_schedule

    class _Shell:
        get_repaint_schedule = refen.EnVariationalDiffusion.get_repaint_schedule

    shell = _Shell()
    for resamplings in (1, 2, 3, 5):
        for jump_length in (1, 2, 5, 10):
            for timesteps in (10, 25, 50, 100):
                ref = shell.get_repaint_schedule(
                    resamplings, jump_length, timesteps
                )
                ours = get_repaint_schedule(resamplings, jump_length, timesteps)
                assert ours == ref, (resamplings, jump_length, timesteps)


def test_posp_tables_match_reference():
    """chem/posp.py type/size tables and the Euclidean->bond-path distance
    map vs the reference GCPG/utils/file_utils.py:8-36 (imported with a
    dgl stub; only its module-level constants are read)."""
    import sys
    import types

    pkg_root = pathlib.Path("/root/reference/GCPG")
    if not pkg_root.exists():
        pytest.skip("reference tree not present")
    saved = {k: sys.modules.get(k) for k in ("dgl", "utils", "utils.file_utils")}
    sys.modules["dgl"] = types.ModuleType("dgl")
    for k in ("utils", "utils.file_utils"):
        sys.modules.pop(k, None)
    sys.path.insert(0, str(pkg_root))
    try:
        import utils.file_utils as fu
    finally:
        sys.path.remove(str(pkg_root))
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    from cmdgen_tpu.chem import posp

    assert posp.IDX2PHAR == fu.idx2phar
    assert posp.PHAR2IDX == fu.phar2idx
    for k, (sizes, probs) in fu.idx2size.items():
        s_ours, p_ours = posp.IDX2SIZE[k]
        assert tuple(sizes) == tuple(s_ours)
        np.testing.assert_allclose(p_ours, probs)
    for d in (0.0, 1.0, 3.7, 12.5):
        np.testing.assert_allclose(
            posp.edis2sdis(np.asarray(d)), fu.edis2sdis(d), rtol=1e-12
        )


def test_size_prior_conditional_matches_reference(refen, capsys):
    """SizePrior conditional log-probs and joint log_prob vs the reference
    DistributionNodes (en_diffusion.py:952-1022) on a random histogram.
    (The joint log_prob path is also exercised end-to-end by the DDPM loss
    transplant tests through the log_pN term.)"""
    from cmdgen_tpu.diffusion.size_prior import SizePrior

    rng = np.random.default_rng(73)
    hist = rng.integers(1, 50, size=(7, 11)).astype(np.float64)
    tdist = refen.DistributionNodes(hist.tolist())
    ours = SizePrior(hist)

    n1 = rng.integers(0, 7, size=16)
    n2 = rng.integers(0, 11, size=16)
    np.testing.assert_allclose(
        np.asarray(ours.log_prob(jnp.asarray(n1), jnp.asarray(n2))),
        tdist.log_prob(torch.tensor(n1), torch.tensor(n2)).numpy(),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(
            ours.log_prob_n1_given_n2(jnp.asarray(n1), jnp.asarray(n2))
        ),
        tdist.log_prob_n1_given_n2(
            torch.tensor(n1), torch.tensor(n2)
        ).numpy(),
        rtol=1e-5, atol=1e-5,
    )


# ------------------------------------------------- GCPG match scorer parity


class _RefBondType:
    __slots__ = ("name",)

    def __init__(self, name):
        self.name = name


class _RefBond:
    """RDKit Bond surface over a chem.mol Bond (what cal_dist reads)."""

    def __init__(self, b):
        self._b = b

    def GetBondType(self):
        if self._b.aromatic:
            return _RefBondType("AROMATIC")
        return _RefBondType({1: "SINGLE", 2: "DOUBLE", 3: "TRIPLE"}[self._b.order])

    def GetBeginAtomIdx(self):
        return self._b.a1

    def GetEndAtomIdx(self):
        return self._b.a2


class _RefAtom:
    def __init__(self, mol, idx):
        self._mol, self._idx = mol, idx

    def GetNeighbors(self):
        import types as _t

        return [
            _t.SimpleNamespace(GetIdx=(lambda j=nb: j))
            for nb, _bi in self._mol.neighbors(self._idx)
        ]


class _RefMolAdapter:
    """RDKit Mol surface over our from-scratch chem.mol Mol — exactly the
    methods the reference cal_dist BFS (smiles2ppgraph.py:38-82) walks.
    Same neighbor/bond iteration order on both sides, so the BFS
    parent-tree tie-breaking is identical by construction."""

    def __init__(self, mol):
        self._mol = mol

    def GetNumBonds(self):
        return len(self._mol.bonds)

    def GetNumAtoms(self):
        return self._mol.n_atoms

    def GetAtomWithIdx(self, i):
        return _RefAtom(self._mol, i)

    def GetBondWithIdx(self, i):
        return _RefBond(self._mol.bonds[i])

    def GetAtoms(self):
        import types as _t

        return [
            _t.SimpleNamespace(GetIdx=(lambda j=i: j))
            for i in range(self._mol.n_atoms)
        ]


class _RefGraph:
    """Duck-typed DGL graph for extract_dgl_info (match_eval.py:59-76)."""

    def __init__(self, pp_h, pp_e, pp_mask):
        k = int(np.asarray(pp_mask).sum())
        type_t = torch.tensor(np.asarray(pp_h[:k, :7], dtype=np.float32))
        # dict.get(key, default) evaluates the default eagerly, so the
        # reference's extract_dgl_info needs 'h' present even when it
        # reads 'type'/'dist' (match_eval.py:59-60)
        self.ndata = {
            "type": type_t,
            "h": torch.cat([type_t, torch.zeros((k, 1))], dim=1),
        }
        src, dst, dist = [], [], []
        for i in range(k):
            for j in range(k):
                if i != j:
                    src.append(i)
                    dst.append(j)
                    dist.append(float(pp_e[i, j, 0]))
        self.edata = {"dist": torch.tensor(dist), "h": torch.tensor(dist)}
        self._e = (torch.tensor(src), torch.tensor(dst))

    def edges(self):
        return self._e


def _load_reference_match_eval():
    """Import the reference GCPG ``utils/match_eval.py`` with rdkit replaced
    by adapters over OUR chemistry core: ``MolFromSmiles`` parses with
    chem.mol and wraps the result in :class:`_RefMolAdapter`; the feature
    factory returns chem.features perception with the reference family
    names. The reference's combinatorial scorer (match_score, max_match,
    cal_dist_all, __iter_product — match_eval.py:84-198) and its REAL
    weighted-BFS cal_dist (smiles2ppgraph.py:38-82) then run unmodified on
    identical perception output, so any score divergence isolates to our
    chem/match.py logic."""
    import sys
    import types

    pkg_root = pathlib.Path("/root/reference/GCPG")
    if not pkg_root.exists():
        pytest.skip("reference tree not present")

    from cmdgen_tpu.chem.features import get_features
    from cmdgen_tpu.chem.mol import mol_from_smiles

    def _mol_from_smiles(smiles):
        mol = mol_from_smiles(smiles)
        return None if mol is None else _RefMolAdapter(mol)

    class _Factory:
        def GetFeaturesForMol(self, refmol):
            feats = get_features(refmol._mol) or []
            return [
                types.SimpleNamespace(
                    GetFamily=(lambda f=fam: f),
                    GetAtomIds=(lambda a=atoms: a),
                )
                for fam, atoms in feats
            ]

    stub_names = [
        "dgl", "rdkit", "rdkit.Chem", "rdkit.RDConfig", "rdkit.RDLogger",
        "rdkit.Chem.ChemicalFeatures",
    ]
    stubs = {n: types.ModuleType(n) for n in stub_names}
    stubs["rdkit"].Chem = stubs["rdkit.Chem"]
    stubs["rdkit"].RDConfig = stubs["rdkit.RDConfig"]
    stubs["rdkit"].RDLogger = stubs["rdkit.RDLogger"]
    stubs["rdkit.RDConfig"].RDDataDir = ""
    stubs["rdkit.RDLogger"].DisableLog = lambda *a, **k: None
    stubs["rdkit.Chem"].ChemicalFeatures = stubs["rdkit.Chem.ChemicalFeatures"]
    stubs["rdkit.Chem"].MolFromSmiles = _mol_from_smiles
    stubs["rdkit.Chem.ChemicalFeatures"].BuildFeatureFactory = (
        lambda path: _Factory()
    )

    saved = {
        k: sys.modules.get(k)
        for k in stub_names
        + ["utils", "utils.match_eval", "utils.smiles2ppgraph"]
    }
    sys.modules.update(stubs)
    for k in ("utils", "utils.match_eval", "utils.smiles2ppgraph"):
        sys.modules.pop(k, None)
    sys.path.insert(0, str(pkg_root))
    try:
        import utils.match_eval as me
    finally:
        sys.path.remove(str(pkg_root))
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return me


@pytest.fixture(scope="module")
def refmatch():
    return _load_reference_match_eval()


MATCH_MOLS = [
    "CC(=O)Nc1ccc(O)cc1",            # paracetamol
    "CCOC(=O)c1ccc(N)cc1",           # benzocaine
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",    # ibuprofen
    "c1ccncc1",                       # pyridine
    "OCC1CCCCC1N",
    "CCN(CC)CCNC(=O)c1ccc(N)cc1",    # procainamide
    "Clc1ccccc1C(=O)NCCO",
    "CC1CCN(CC1)C(=O)COc1ccccc1",
    "Cc1cccc(C)c1NC(=O)CN",
    "O=C(O)CCc1ccc(O)c(O)c1",
]


def test_match_score_matches_reference(refmatch):
    """Weight-free transplant parity for the headline quality metric: for
    every (hypothesis graph, candidate SMILES) pair, the reference's
    match_score (match_eval.py:84-198) on our perception output equals
    chem.match.match_score. Covers the permutation/product assignment
    search, composite same-atom-set feature merging, the None placeholder
    branch, cal_dist_all's identical-set/overlap/disjoint cases (incl. the
    match-side max_size*0.2 rule for identical multi-atom sets, which
    differs from the corpus-side group distance), the weighted-BFS bond
    path, and the 1.21 tolerance arithmetic."""
    import random as _random

    from cmdgen_tpu.chem.match import match_score
    from cmdgen_tpu.chem.ppgraph import smiles_to_ppgraph

    hyps = []
    for i, s in enumerate(MATCH_MOLS):
        g = smiles_to_ppgraph(s, _random.Random(100 + i))
        if g is not None and 2 <= int(g[2].sum()) <= 5:
            hyps.append((s, g))
        if len(hyps) == 5:
            break
    assert len(hyps) >= 3, "fixture molecules must yield usable hypotheses"

    n_pairs = 0
    for hs, (pp_h, pp_e, pp_mask, _m) in hyps:
        ref_g = _RefGraph(pp_h, pp_e, pp_mask)
        for s in MATCH_MOLS:
            ours = match_score(s, pp_h, pp_e, pp_mask)
            theirs = refmatch.match_score(s, ref_g)
            assert ours == pytest.approx(float(theirs), abs=1e-9), (
                f"hypothesis from {hs!r}, candidate {s!r}: "
                f"ours={ours} ref={theirs}"
            )
            n_pairs += 1
    assert n_pairs >= 30
    # every score in [0, 1] and at least one non-trivial value on each side
    # would be vacuous if perception returned nothing — require spread
    scores = [
        match_score(s, *h[1][:3]) for h in hyps for s in MATCH_MOLS[:4]
    ]
    assert max(scores) > 0.0


def test_match_identical_multiatom_set_matches_reference(refmatch):
    """Targeted corner: two hypothesis nodes of DIFFERENT single types
    satisfied by the SAME multi-atom set (benzene's aromatic ring is both
    Aromatic and LumpedHydrophobe). The match-side reference scores that
    pair distance as max_size*0.2 = 1.2 (cal_dist_all, match_eval.py:36-39)
    — NOT 0 like the corpus-side group distance — so with ref_dist 1.3 the
    pair matches (|1.2-1.3| < 1.21) where a 0 distance would not."""
    from cmdgen_tpu.chem.match import match_score

    pp_h = np.zeros((8, 8), np.float32)
    pp_h[0, 0] = 1.0  # node 0: Aromatic (GCPG index 1)
    pp_h[1, 5] = 1.0  # node 1: LumpedHydrophobe (GCPG index 6)
    pp_e = np.zeros((8, 8, 1), np.float32)
    pp_e[0, 1, 0] = pp_e[1, 0, 0] = 1.3
    pp_mask = np.zeros(8, np.float32)
    pp_mask[:2] = 1.0

    smiles = "c1ccccc1"
    ours = match_score(smiles, pp_h, pp_e, pp_mask)
    theirs = refmatch.match_score(smiles, _RefGraph(pp_h, pp_e, pp_mask))
    assert ours == pytest.approx(float(theirs), abs=1e-9)
    assert ours == pytest.approx(1.0)  # the 1.2-vs-0 distinction is live


def _load_reference_smiles2ppgraph():
    """Import the reference ``utils/smiles2ppgraph.py`` with rdkit replaced
    by the same adapters over our chem core as the match-eval loader, and
    ``dgl.graph`` stubbed to a dict-holding record. The reference's full
    pp-graph construction — global-random shuffle, SUS node-count draw,
    same-atom-set pair merging, mean-atom-index sort, position-matrix
    distances, min-symmetrization, six_encoding, smiles_code_ mapping —
    then runs unmodified (smiles2ppgraph.py:84-236)."""
    import sys
    import types

    pkg_root = pathlib.Path("/root/reference/GCPG")
    if not pkg_root.exists():
        pytest.skip("reference tree not present")

    from cmdgen_tpu.chem.features import get_features
    from cmdgen_tpu.chem.mol import mol_from_smiles

    def _mol_from_smiles(smiles):
        mol = mol_from_smiles(smiles)
        if mol is None:
            return None
        adapter = _RefMolAdapter(mol)
        adapter._smiles = smiles
        return adapter

    class _Factory:
        def GetFeaturesForMol(self, refmol):
            feats = get_features(refmol._mol) or []
            return [
                types.SimpleNamespace(
                    GetFamily=(lambda f=fam: f),
                    GetAtomIds=(lambda a=atoms: a),
                    GetType=(lambda f=fam: f),
                )
                for fam, atoms in feats
            ]

    class _FakeDGLGraph:
        def __init__(self, edges):
            self._edges = edges
            self.ndata = {}
            self.edata = {}

        def edges(self):
            return self._edges

    stub_names = [
        "dgl", "rdkit", "rdkit.Chem", "rdkit.RDConfig",
        "rdkit.Chem.ChemicalFeatures",
    ]
    stubs = {n: types.ModuleType(n) for n in stub_names}
    stubs["dgl"].graph = lambda uv: _FakeDGLGraph(uv)
    stubs["rdkit"].Chem = stubs["rdkit.Chem"]
    stubs["rdkit"].RDConfig = stubs["rdkit.RDConfig"]
    stubs["rdkit.RDConfig"].RDDataDir = ""
    stubs["rdkit.Chem"].ChemicalFeatures = stubs["rdkit.Chem.ChemicalFeatures"]
    stubs["rdkit.Chem"].MolFromSmiles = _mol_from_smiles
    # the reference round-trips through RDKit canonical order
    # (smiles2ppgraph.py:114-116); both sides here share OUR parse order,
    # so the round-trip is made the identity
    stubs["rdkit.Chem"].MolToSmiles = lambda refmol: refmol._smiles
    stubs["rdkit.Chem.ChemicalFeatures"].BuildFeatureFactory = (
        lambda path: _Factory()
    )

    saved = {
        k: sys.modules.get(k)
        for k in stub_names + ["utils", "utils.smiles2ppgraph"]
    }
    sys.modules.update(stubs)
    for k in ("utils", "utils.smiles2ppgraph"):
        sys.modules.pop(k, None)
    sys.path.insert(0, str(pkg_root))
    try:
        import utils.smiles2ppgraph as sp
    finally:
        sys.path.remove(str(pkg_root))
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return sp


@pytest.fixture(scope="module")
def refsp():
    return _load_reference_smiles2ppgraph()


def test_sample_probability_matches_reference(refsp):
    """SUS node-count sampling: identical draws from a shared seed
    (smiles2ppgraph.py:14-27)."""
    import random as _random

    from cmdgen_tpu.chem.ppgraph import (
        NUM_PP_PROBS, NUM_PP_SUPPORT, sample_probability,
    )

    for seed in (0, 7, 123, 991):
        _random.seed(seed)
        theirs = refsp.sample_probability(NUM_PP_SUPPORT, NUM_PP_PROBS, 50)
        ours = sample_probability(
            NUM_PP_SUPPORT, NUM_PP_PROBS, 50, _random.Random(seed)
        )
        assert ours == theirs


def test_smiles_to_ppgraph_matches_reference(refsp):
    """Full corpus pp-graph construction transplant parity: same seed,
    same molecule -> identical node type one-hots, node sizes, pairwise
    bond-path distance matrix (to fp16, the reference's storage dtype),
    and atom->node mapping (smiles_code_). The reference consumes the
    global ``random`` stream exactly as ours consumes its Random(seed):
    one shuffle of the same-length feature list, then the SUS draw."""
    import random as _random

    from cmdgen_tpu.chem.ppgraph import smiles_to_ppgraph

    n_compared = 0
    for mi, smiles in enumerate(MATCH_MOLS):
        for seed in (11, 42):
            _random.seed(seed)
            try:
                g, smiles_code = refsp.smiles2ppgraph(smiles)
            except TypeError:
                # the reference pair-merge crashes when >=3 families share
                # one atom set (list-vs-int min at smiles2ppgraph.py:153);
                # its corpus loop catches and skips those molecules
                continue
            ours = smiles_to_ppgraph(smiles, _random.Random(seed))
            assert ours is not None
            pp_h, pp_e, pp_mask, mapping = ours
            k = int(pp_mask.sum())
            ref_type = g.ndata["type"].float().numpy()
            assert ref_type.shape[0] == k
            np.testing.assert_array_equal(pp_h[:k, :7], ref_type)
            np.testing.assert_allclose(
                pp_h[:k, 7], g.ndata["size"].float().numpy(), rtol=1e-3
            )
            src, dst = g._edges
            dist = g.edata["dist"].float().numpy()
            for e_i in range(len(dist)):
                u, v = int(src[e_i]), int(dst[e_i])
                assert pp_e[u, v, 0] == pytest.approx(
                    dist[e_i], rel=2e-3, abs=2e-3
                ), (smiles, seed, u, v)
            np.testing.assert_array_equal(
                mapping[:, :k], np.asarray(smiles_code)[:, :k]
            )
            np.testing.assert_array_equal(mapping[:, k:], 0.0)
            n_compared += 1
    assert n_compared >= 10
