"""Training layer: optimizers, trainers, checkpoints, results artifacts."""
