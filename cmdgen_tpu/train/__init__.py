"""Training loops, optimizer state, checkpointing."""
