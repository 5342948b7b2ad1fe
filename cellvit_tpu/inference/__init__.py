"""Inference pipelines: patch evaluation and WSI cell detection."""
