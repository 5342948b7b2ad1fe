"""Training runtime: losses, optimizers, schedules, trainer, experiments."""
