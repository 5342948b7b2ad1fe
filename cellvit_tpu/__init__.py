"""cellvit_tpu — TPU-native gigapixel-pathology nuclei segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of TIO-IKIM/CellViT:
U-Net-shaped networks with ViT encoders (HIPT ViT-256/DINO, SAM-B/L/H) and
HoVer-Net/StarDist/CPP-Net decoder heads, trained on PanNuke/CoNIC patches and
deployed on whole-slide images via overlapping tiles with on-device watershed
postprocessing, cross-tile deduplication and QuPath GeoJSON export.

Design: NHWC layouts, bf16 matmuls on the MXU, `jax.jit`-compiled train and
inference steps, `jax.sharding.Mesh` data/model parallelism, and Pallas kernels
for the postprocessing pipeline that the reference ran on CPU (cv2/scipy).
"""

__version__ = "0.1.0"
