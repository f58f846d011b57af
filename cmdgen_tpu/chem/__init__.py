"""Host-side chemistry: SMILES/PDB parsing, features, metrics.

Pure-Python implementations (this image ships no RDKit/OpenBabel/BioPython);
modules prefer RDKit when importable and fall back to the built-in engine.
Everything here runs at the featurization boundary and emits fixed-shape
padded numpy arrays for the device side.
"""
