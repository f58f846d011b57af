"""Device meshes and sharded train/sample steps."""
