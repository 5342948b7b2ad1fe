"""Command-line entry points (drop-in equivalents of the reference CLIs)."""
