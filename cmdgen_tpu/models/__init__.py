"""Neural network modules: EGNN denoiser, CVAE SMILES transformer."""
