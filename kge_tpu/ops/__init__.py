"""Training/eval ops: losses, samplers, optimizers, ranking."""
