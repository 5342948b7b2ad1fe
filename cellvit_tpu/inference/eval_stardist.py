"""StarDist / CPP-Net patch evaluations.

Reference parity: `inference/inference_stardist_experiment_pannuke.py` and
`inference/inference_cpp_net_experiment_pannuke.py` — the PanNuke metric
suite of `eval_pannuke.InferenceCellViT` with NMS-based postprocessing
(sigmoid dist + polygon NMS; CPP uses the refined ray map).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from cellvit_tpu.inference.eval_pannuke import InferenceCellViT
from cellvit_tpu.ops.stardist_nms import StarDistPostProcessor


class InferenceCellViTStarDist(InferenceCellViT):
    model_family = "stardist"
    RAY_KEY = "stardist_map"

    def _postprocess_batch(self, out, *, object_size: int, ksize: int):
        nt_prob = jax.nn.softmax(out["nuclei_type_map"].astype(jnp.float32), -1)
        dist = np.asarray(jax.nn.sigmoid(out["dist_map"].astype(jnp.float32)))[..., 0]
        rays = np.asarray(out[self.RAY_KEY].astype(jnp.float32))
        nt_argmax = np.asarray(jnp.argmax(nt_prob, -1))
        proc = StarDistPostProcessor(
            nr_types=self.num_classes, image_shape=dist.shape[1:]
        )
        inst_np = np.zeros(dist.shape, np.int32)
        for i in range(dist.shape[0]):
            inst, _, _ = proc.post_proc_stardist(
                dist[i], rays[i], np.asarray(nt_prob[i])
            )
            inst_np[i] = inst
        np_argmax = (dist > 0.5).astype(np.int64)
        return inst_np, nt_argmax, np_argmax


class InferenceCellViTCPP(InferenceCellViTStarDist):
    model_family = "cpp"
    RAY_KEY = "stardist_map_refined"
