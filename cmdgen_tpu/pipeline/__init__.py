"""End-to-end pipeline stages: sample -> cluster -> generate -> align."""
