"""Overlapped end-to-end driver: pockets -> aligned, posed molecules.

The reference runs this pipeline as separate scripts with files in between
(SURVEY.md §1: DiffPhar/generate_phars.py -> get_phar/GMM_json.py ->
GCPG/generate.py -> PharAlign/align_test_wrn.py). This module runs the same
four stages as ONE streaming driver: the three TPU stages (diffusion
sampling, GCPG decode, conformer embed+align) dispatch to the device from
their own threads, while host chemistry (consensus typing,
canonicalization, dedup, feature matching) runs concurrently on the
preparer thread — the chip never waits on the host and end-to-end
aligned-molecules/min is a measured number, not a per-stage estimate.

Stage hand-offs are bounded queues (backpressure instead of unbounded
buffering). Device work from multiple threads serializes on the one chip;
overlap hides the host time, and the TPU time per molecule is the sum of
the per-stage device costs (decode ~5 ms + align, with sampling amortized
over every molecule a hypothesis fans out into).
"""
from __future__ import annotations

import dataclasses
import queue
import random as _random
import threading
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cmdgen_tpu.chem.mol import mol_from_smiles, write_smiles
from cmdgen_tpu.chem.posp import points_to_graph
from cmdgen_tpu.chem.tokenizer import Tokenizer, syntax_tables
from cmdgen_tpu.models import gcpg as gcpg_mod
from cmdgen_tpu.pipeline.align import align_entries, prepare_align_entries
from cmdgen_tpu.pipeline.generate_smiles import condition_grid
from cmdgen_tpu.pipeline.get_phar import (
    consensus_dbscan,
    consensus_gmm,
    consensus_kmeans,
)
from cmdgen_tpu.pipeline.sample_phars import sample_pharmacophores

_SENTINEL = object()


def _drain(q: "queue.Queue") -> None:
    """Consume a queue until its sentinel. Called by a consumer thread
    after a fatal error so upstream ``put()`` on the bounded queue never
    blocks (which would deadlock the join)."""
    while True:
        if q.get() is _SENTINEL:
            return


@dataclasses.dataclass
class PipelineConfig:
    """Knobs of the overlapped driver (throughput/quality trade-offs)."""

    n_clouds_per_pocket: int = 64       # stage-1 samples per pocket
    diff_timesteps: Optional[int] = None  # None => model default (T)
    n_phar_max: int = 8
    cluster_counts: Sequence[int] = (4, 5, 6)  # one hypothesis per count
    consensus_method: str = "gmm"        # gmm | kmeans | dbscan
    # decode batch 512: ~1.65x the SMILES/min of 256 on a v5e (weight reads
    # amortize across the batch; flat beyond 512 — see PERF.md)
    smiles_per_hypothesis: int = 512
    decode_batch: int = 512
    # sampling-logit temperature for the decode stage; <1 sharpens the
    # token distribution (higher validity on out-of-distribution
    # consensus hypotheses, at some diversity cost). Traced scalar —
    # sweeping values does not recompile.
    decode_temperature: float = 1.0
    conditions: Optional[Dict[str, Sequence[float]]] = None
    n_conformers: int = 5
    refine_steps: int = 100
    num_keep: int = 3
    align_chunk: int = 64                # fixed M per align jit (no recompiles)
    size_bucket: int = 16                # atom-count padding granularity
    queue_depth: int = 8
    # pad pockets to this node-count granularity before stage-1 sampling:
    # one jit shape per size bucket instead of one REMOTE compile per
    # distinct pocket size (~19 s/pocket over the axon tunnel — the
    # measured stage-1 cost of the streaming run was compile, not math).
    # Mask-exact (padding is ignored by every reduction).
    pocket_pad_bucket: Optional[int] = 16
    # drop sampled points farther than this from the nearest pocket atom
    # before consensus pooling. Physically grounded: real pharmacophore
    # points sit in contact with the pocket (p99 nearest-CA distance
    # ~4.1 Å on the corpus; the reference's pocket definition is the <=8 Å
    # shell around the ligand, process_crossdock.py:67-75) — 6 Å keeps all
    # data-like points and removes diverged sampler output that would
    # otherwise pull GMM cluster centers to unattainable geometry.
    contact_filter: Optional[float] = 6.0
    # Rank-by-match output stage (opt-in): score every aligned molecule
    # against its hypothesis graph (chem.match, the reference
    # match_eval.py metric) and keep only the top fraction, best-first —
    # standard virtual-screening practice. stats records the mean match
    # of ALL aligned molecules and of the kept set, so the selection
    # effect is explicit, not hidden.
    keep_top_match_frac: Optional[float] = None
    match_workers: int = 8
    # Hypothesis validity gate (opt-in): decode a small probe batch per
    # consensus hypothesis first and skip the full decode volume for
    # hypotheses whose probe validity falls below the threshold. The
    # GCPG's validity is ~0.97 in-distribution but drops hypothesis-by-
    # hypothesis on out-of-distribution consensus geometry; gating ships
    # only from hypotheses the generator handles well. Probe decodes are
    # NOT shipped and NOT counted in raw/valid_smiles (the decision is
    # made on a separate draw); their cost stays in decode_busy_s and the
    # drop counts are reported (gate_dropped / gate_probe_smiles).
    validity_gate: Optional[float] = None
    validity_probe: int = 256
    # syntax-constrained decoding (models.gcpg.generate constraints=):
    # mask ring/paren-unclosable and special tokens during sampling —
    # removes the syntactic share of OOD invalidity without retraining
    constrain_decode: bool = False
    # additionally track per-atom bond budgets and mask valence-overflow
    # continuations (models.gcpg.generate valence=); implies the tables
    # of constrain_decode
    constrain_valence: bool = False


@dataclasses.dataclass
class PipelineResult:
    smiles: str
    hypothesis: int                      # hypothesis id
    rmsd: float                          # best feature-RMSD onto the points
    conformers: List[Tuple[float, np.ndarray]]  # (rmsd, coords) best-first
    # the parsed molecule the conformer coords are ordered by; carrying it
    # avoids a host re-parse per result in write_pipeline_results AND lets
    # the preparer parse each raw SMILES exactly once (the conformer atom
    # order must match the Mol the SDF writer uses)
    mol: Optional[object] = None


def _flatten_cloud_dict(clouds: Dict) -> Tuple[np.ndarray, List[str]]:
    coords, families = [], []
    for _mol, feats in clouds.items():
        for fam, pts in feats.items():
            for p in pts:
                coords.append(p)
                families.append(fam)
    return np.asarray(coords, dtype=np.float32), families


def contact_filter_points(
    pts: np.ndarray, fams: List[str], pocket_coords: np.ndarray,
    cutoff: float,
) -> Tuple[np.ndarray, List[str], int]:
    """Keep sampled points within ``cutoff`` of the nearest pocket atom.

    Real pharmacophore points sit in contact with the pocket (corpus p99
    nearest-CA distance ~4.1 Å; the reference defines the pocket as the
    <=8 Å shell around the ligand, process_crossdock.py:67-75), so the
    filter is a no-op on data-like clouds; it removes diverged sampler
    output before consensus pooling. Returns (pts, fams, n_dropped).
    """
    near = np.linalg.norm(
        pts[:, None, :] - pocket_coords[None, :, :], axis=-1
    ).min(axis=1) <= cutoff
    return (
        pts[near],
        [f for f, m in zip(fams, near) if m],
        int((~near).sum()),
    )


_CONSENSUS = {
    "gmm": consensus_gmm,
    "kmeans": consensus_kmeans,
    "dbscan": lambda coords, fams, n_clusters, seed: consensus_dbscan(
        coords, fams
    ),
}


def run_pipeline(
    diff_model,
    diff_params,
    gcpg_model,
    gcpg_params,
    tokenizer: Tokenizer,
    pockets: Sequence[Tuple[np.ndarray, np.ndarray]],  # (coords, onehot)
    rng: jax.Array,
    cfg: PipelineConfig = PipelineConfig(),
    collect: Optional[Dict] = None,
) -> Tuple[List[PipelineResult], Dict[str, float]]:
    """Run the full pocket->aligned-molecules pipeline, overlapped.

    Returns (results, stats). ``stats`` includes the end-to-end
    ``aligned_mols_per_min`` over the wall time of the whole call.
    ``collect``: an optional dict the driver fills with the consensus
    hypotheses ({hid: (types, coords)}) and per-hypothesis unique SMILES —
    quality evaluation (match scoring) reuses them after the run.
    """
    q_hyp: queue.Queue = queue.Queue(maxsize=cfg.queue_depth)
    q_raw: queue.Queue = queue.Queue(maxsize=cfg.queue_depth)
    q_prep: queue.Queue = queue.Queue(maxsize=cfg.queue_depth)
    results: List[PipelineResult] = []
    errors: List[BaseException] = []
    hyp_graphs: Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    stats = {
        "pockets": len(pockets), "hypotheses": 0, "raw_smiles": 0,
        "valid_smiles": 0, "unique_smiles": 0, "matched": 0, "aligned": 0,
        # per-stage busy seconds (threads overlap, so these can sum past
        # wall_s; the largest one is the pipeline's bottleneck)
        "sample_busy_s": 0.0, "consensus_busy_s": 0.0, "decode_busy_s": 0.0,
        "prep_busy_s": 0.0, "align_busy_s": 0.0,
    }
    k_sample, k_decode, k_align = jax.random.split(rng, 3)
    py_rng = _random.Random(0)
    grid = condition_grid(cfg.conditions)
    consensus_fn = _CONSENSUS[cfg.consensus_method]

    def sampler():
        try:
            key = k_sample
            for pi, (coords, onehot) in enumerate(pockets):
                key, sub = jax.random.split(key)
                t0 = time.perf_counter()
                clouds = sample_pharmacophores(
                    diff_model, diff_params, sub, coords, onehot,
                    cfg.n_clouds_per_pocket, n_phar_max=cfg.n_phar_max,
                    batch_size=cfg.n_clouds_per_pocket,
                    timesteps=cfg.diff_timesteps,
                    pocket_pad_bucket=cfg.pocket_pad_bucket,
                )
                stats["sample_busy_s"] += time.perf_counter() - t0
                pts, fams = _flatten_cloud_dict(clouds)
                if len(pts) == 0:
                    continue
                if cfg.contact_filter is not None:
                    pts, fams, dropped = contact_filter_points(
                        pts, fams, np.asarray(coords), cfg.contact_filter
                    )
                    stats["contact_filtered"] = stats.get(
                        "contact_filtered", 0
                    ) + dropped
                    if len(pts) < 2:
                        continue
                for nc in cfg.cluster_counts:
                    t0 = time.perf_counter()
                    cons = consensus_fn(pts, fams, n_clusters=nc, seed=nc)
                    stats["consensus_busy_s"] += time.perf_counter() - t0
                    if len(cons) < 2:
                        continue
                    types = [t for t, _ in cons]
                    ppc = np.stack([c for _, c in cons]).astype(np.float32)
                    pp_h, pp_e, pp_m = points_to_graph(types, ppc, py_rng)
                    hid = stats["hypotheses"]
                    stats["hypotheses"] += 1
                    if collect is not None:
                        collect.setdefault("hypotheses", {})[hid] = (
                            list(types), ppc.copy()
                        )
                    hyp_graphs[hid] = (
                        np.asarray(pp_h), np.asarray(pp_e), np.asarray(pp_m)
                    )
                    q_hyp.put((hid, types, ppc, pp_h, pp_e, pp_m))
        except BaseException as e:  # propagate to the main thread
            errors.append(e)
        finally:
            q_hyp.put(_SENTINEL)

    decode_tables = (
        jnp.asarray(syntax_tables(tokenizer))
        if cfg.constrain_decode or cfg.constrain_valence else None
    )

    def decoder():
        try:
            key = k_decode
            while True:
                item = q_hyp.get()
                if item is _SENTINEL:
                    break
                hid, types, ppc, pp_h, pp_e, pp_m = item
                b = cfg.decode_batch
                if cfg.validity_gate is not None:
                    # probe draw: same shapes as a full batch (no extra jit
                    # compile), validity parsed on this thread — the probe
                    # is a few hundred strings vs the preparer's thousands
                    key, sub = jax.random.split(key)
                    t0 = time.perf_counter()
                    toks = gcpg_mod.generate(
                        gcpg_model, gcpg_params, sub,
                        jnp.broadcast_to(jnp.asarray(pp_h), (b, *pp_h.shape)),
                        jnp.broadcast_to(jnp.asarray(pp_e), (b, *pp_e.shape)),
                        jnp.broadcast_to(jnp.asarray(pp_m), (b, *pp_m.shape)),
                        jnp.broadcast_to(
                            jnp.asarray(grid[0]), (b, len(grid[0]))
                        ),
                        random_sample=True,
                        temperature=cfg.decode_temperature,
                        constraints=decode_tables,
                        valence=cfg.constrain_valence,
                    )
                    probe = tokenizer.get_text(
                        np.asarray(toks)[: cfg.validity_probe]
                    )
                    n_ok = sum(
                        1 for s in probe if mol_from_smiles(s) is not None
                    )
                    stats["decode_busy_s"] += time.perf_counter() - t0
                    stats["gate_probe_smiles"] = stats.get(
                        "gate_probe_smiles", 0
                    ) + len(probe)
                    pv = n_ok / max(len(probe), 1)
                    if collect is not None:
                        collect.setdefault("probe_validity", {})[hid] = pv
                    if pv < cfg.validity_gate:
                        stats["gate_dropped"] = stats.get(
                            "gate_dropped", 0
                        ) + 1
                        continue
                raw: List[str] = []
                remaining = cfg.smiles_per_hypothesis
                ci = 0
                t0 = time.perf_counter()
                while remaining > 0:
                    cond = grid[ci % len(grid)]
                    ci += 1
                    key, sub = jax.random.split(key)
                    toks = gcpg_mod.generate(
                        gcpg_model, gcpg_params, sub,
                        jnp.broadcast_to(jnp.asarray(pp_h), (b, *pp_h.shape)),
                        jnp.broadcast_to(jnp.asarray(pp_e), (b, *pp_e.shape)),
                        jnp.broadcast_to(jnp.asarray(pp_m), (b, *pp_m.shape)),
                        jnp.broadcast_to(jnp.asarray(cond), (b, len(cond))),
                        random_sample=True,
                        temperature=cfg.decode_temperature,
                        constraints=decode_tables,
                        valence=cfg.constrain_valence,
                    )
                    raw.extend(tokenizer.get_text(np.asarray(toks)))
                    remaining -= b
                stats["decode_busy_s"] += time.perf_counter() - t0
                stats["raw_smiles"] += len(raw)
                q_raw.put((hid, types, ppc, raw))
        except BaseException as e:
            errors.append(e)
            _drain(q_hyp)
        finally:
            q_raw.put(_SENTINEL)

    def preparer():
        try:
            while True:
                item = q_raw.get()
                if item is _SENTINEL:
                    break
                hid, types, ppc, raw = item
                t0 = time.perf_counter()
                # parse each raw decode exactly once: the parsed Mol serves
                # canonicalization (dedupe key), feature matching, conformer
                # embedding AND the final SDF write (PipelineResult.mol), so
                # no stage re-parses — the host is single-core and parsing
                # is the dominant prep cost at large smiles_per_hypothesis
                mol_by_canon: Dict[str, object] = {}
                n_valid = 0
                for s in raw:
                    m = mol_from_smiles(s)
                    if m is None:
                        continue
                    n_valid += 1
                    mol_by_canon.setdefault(write_smiles(m), m)
                stats["valid_smiles"] += n_valid
                if collect is not None:
                    collect.setdefault("hyp_validity", {})[hid] = (
                        n_valid / max(len(raw), 1)
                    )
                uniq = list(mol_by_canon)
                stats["unique_smiles"] += len(uniq)
                if collect is not None:
                    collect.setdefault("uniq", {}).setdefault(
                        hid, []
                    ).extend(uniq)
                entries = prepare_align_entries(
                    [mol_by_canon[c] for c in uniq], types
                )
                stats["matched"] += len(entries)
                if not entries:
                    continue
                # fixed-size chunks per padded-size bucket => the align jit
                # compiles once per (chunk, n_pad) pair for the whole run
                buckets: Dict[int, list] = {}
                for idx, mol, groups in entries:
                    n_pad = -(-mol.n_atoms // cfg.size_bucket) * cfg.size_bucket
                    buckets.setdefault(n_pad, []).append((idx, mol, groups))
                for n_pad, ents in buckets.items():
                    for off in range(0, len(ents), cfg.align_chunk):
                        chunk = ents[off : off + cfg.align_chunk]
                        n_real = len(chunk)
                        while len(chunk) < cfg.align_chunk:
                            chunk.append(chunk[len(chunk) % n_real])
                        stats["prep_busy_s"] += time.perf_counter() - t0
                        q_prep.put((hid, ppc, uniq, chunk, n_real))
                        t0 = time.perf_counter()
                stats["prep_busy_s"] += time.perf_counter() - t0
        except BaseException as e:
            errors.append(e)
            _drain(q_raw)
        finally:
            q_prep.put(_SENTINEL)

    def aligner():
        try:
            key = k_align
            while True:
                item = q_prep.get()
                if item is _SENTINEL:
                    break
                hid, ppc, uniq, chunk, n_real = item
                key, sub = jax.random.split(key)
                t0 = time.perf_counter()
                res = align_entries(
                    chunk, ppc, sub, n_conformers=cfg.n_conformers,
                    num_keep=cfg.num_keep, refine_steps=cfg.refine_steps,
                    bucket=cfg.size_bucket,
                )
                stats["align_busy_s"] += time.perf_counter() - t0
                seen = set()
                for idx, mol, _ in chunk[:n_real]:
                    if idx in seen or idx not in res:
                        continue
                    seen.add(idx)
                    confs = res[idx]
                    results.append(PipelineResult(
                        smiles=uniq[idx], hypothesis=hid,
                        rmsd=confs[0][0], conformers=confs, mol=mol,
                    ))
                stats["aligned"] = len(results)
        except BaseException as e:
            errors.append(e)
            _drain(q_prep)

    threads = [
        threading.Thread(target=f, name=f.__name__, daemon=True)
        for f in (sampler, decoder, preparer, aligner)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errors:
        raise errors[0]
    stats["wall_s"] = round(wall, 2)
    stats["aligned_mols_per_min"] = round(len(results) / wall * 60.0, 1)
    if cfg.keep_top_match_frac is not None and results:
        # post-alignment rank-by-match selection (throughput above is the
        # pre-selection number; both match means are reported)
        from cmdgen_tpu.chem.match import get_match_scores

        t0 = time.perf_counter()
        scores = get_match_scores(
            [hyp_graphs[r.hypothesis] for r in results],
            [r.smiles for r in results],
            n_workers=cfg.match_workers,
        )
        ok = [s for s in scores if s >= 0]
        stats["match_score_all_aligned"] = (
            round(float(np.mean(ok)), 4) if ok else -1.0
        )
        keep = max(1, int(len(results) * cfg.keep_top_match_frac))
        order = sorted(
            range(len(results)),
            key=lambda i: (scores[i] if scores[i] >= 0 else -1.0),
            reverse=True,
        )[:keep]
        results = [results[i] for i in order]
        kept_ok = [scores[i] for i in order if scores[i] >= 0]
        stats["match_score_kept"] = (
            round(float(np.mean(kept_ok)), 4) if kept_ok else -1.0
        )
        stats["kept"] = len(results)
        stats["match_rank_busy_s"] = time.perf_counter() - t0
    for k in list(stats):
        if k.endswith("_busy_s"):
            stats[k] = round(stats[k], 2)
    return results, stats


def write_pipeline_results(results: Sequence[PipelineResult], out_dir):
    """Write each aligned molecule as a posed multi-conformer SDF
    (mol_<hyp>_<i>.sdf, best conformer first) plus results.json with the
    per-molecule best RMSD — the artifact layout of the reference's stage-4
    output directory (align_test_wrn.py)."""
    import json
    from pathlib import Path

    from cmdgen_tpu.chem.mol import mol_from_smiles
    from cmdgen_tpu.chem.sdf import write_sdf

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    index = []
    for i, r in enumerate(results):
        # the stored Mol's atom order is what the conformer coords follow;
        # re-parsing the canonical string is only the fallback for results
        # constructed without one
        mol = r.mol if r.mol is not None else mol_from_smiles(r.smiles)
        if mol is None:
            continue
        symbols = [a.symbol for a in mol.atoms]
        bonds = [(bd.a1, bd.a2, bd.order) for bd in mol.bonds]
        mols = [
            (symbols, coords, f"{r.smiles} rmsd={e:.3f}")
            for e, coords in r.conformers
        ]
        path = out_dir / f"mol_{r.hypothesis}_{i}.sdf"
        write_sdf(path, mols, bonds_list=[bonds] * len(mols))
        index.append({
            "file": path.name, "smiles": r.smiles,
            "hypothesis": r.hypothesis, "rmsd": round(r.rmsd, 4),
        })
    (out_dir / "results.json").write_text(json.dumps(index, indent=1))
    return out_dir / "results.json"
