"""Compute ops: on-device postprocessing kernels and their host oracles."""
