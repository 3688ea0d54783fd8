"""Config, checkpoints, mesh export, editing."""
