"""cmdgen_tpu — a TPU-native molecular generation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of CMD-GEN
(hierarchical coarse-grained pharmacophore-driven molecule generation):

- ``cmdgen_tpu.diffusion``  E(3)-equivariant pocket-conditional DDPM over
  pharmacophore point clouds (reference: DiffPhar/equivariant_diffusion/).
- ``cmdgen_tpu.models``     EGNN denoiser and the pharmacophore-conditioned
  CVAE SMILES transformer (reference: GCPG/model/).
- ``cmdgen_tpu.ops``        masked dense kernels: segment-free reductions,
  noise schedules, Kabsch, clustering, attention.
- ``cmdgen_tpu.parallel``   mesh construction + sharded train/sample steps.
- ``cmdgen_tpu.chem``       host-side chemistry (pure-Python SMILES/PDB
  parsing, pharmacophore perception, metrics) emitting padded arrays.
- ``cmdgen_tpu.pipeline``   end-to-end stages: sample pharmacophores →
  consensus clustering → SMILES generation → conformer alignment.

Design: everything device-side operates on fixed-shape padded batches
``[B, N, ...]`` with boolean masks — no ragged graphs, no scatter ops —
so XLA can tile the hot loops onto the MXU and the whole reverse diffusion
chain runs in a single ``lax.scan`` without host round-trips.
"""

__version__ = "0.1.0"
