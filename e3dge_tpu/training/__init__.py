"""Losses, perceptual nets, data, train steps, projector."""
