"""Equivariant diffusion over pharmacophore point clouds."""
