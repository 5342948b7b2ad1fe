"""WSI preprocessing: native tile reading, tissue masking, stain
normalization, patch extraction, storage."""
