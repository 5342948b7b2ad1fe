"""WSI patch extraction CLI (drop-in for the reference
`preprocessing/patch_extraction/main_extraction.py:27-36`).

Usage: python -m cellvit_tpu.cli.main_extraction --config preprocess.yaml
(YAML keys follow PreProcessingConfig; CLI flags override the file.)
"""

from __future__ import annotations

import argparse


def main() -> None:
    import yaml

    from cellvit_tpu.preprocessing.patch_extraction import (
        PreProcessingConfig,
        PreProcessor,
    )

    parser = argparse.ArgumentParser(
        description="Extract patches from whole-slide images."
    )
    parser.add_argument("--config", type=str, help="Path to a YAML config")
    parser.add_argument("--wsi_paths", type=str)
    parser.add_argument("--output_path", type=str)
    parser.add_argument("--patch_size", type=int)
    parser.add_argument("--patch_overlap", type=float)
    parser.add_argument("--target_mpp", type=float)
    parser.add_argument("--target_mag", type=float)
    parser.add_argument("--downsample", type=int)
    parser.add_argument("--min_intersection_ratio", type=float)
    parser.add_argument("--normalize_stains", action="store_true", default=None)
    parser.add_argument("--overwrite", action="store_true", default=None)
    parser.add_argument("--processes", type=int)
    parser.add_argument("--wsi_extension", type=str)
    args = parser.parse_args()

    cfg = {}
    if args.config:
        with open(args.config) as f:
            cfg = yaml.safe_load(f) or {}
    for key, val in vars(args).items():
        if key != "config" and val is not None:
            cfg[key] = val
    config = PreProcessingConfig(**cfg)
    PreProcessor(config).sample_patches_dataset()


if __name__ == "__main__":
    main()
