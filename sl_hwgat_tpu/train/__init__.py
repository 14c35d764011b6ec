"""Training engine: losses, train-state, jit'd steps, checkpointing, reporting,
cross-framework weight import, CLI."""
