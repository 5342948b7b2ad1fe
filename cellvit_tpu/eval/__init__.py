"""Evaluation: panoptic-quality suite and detection scores."""
