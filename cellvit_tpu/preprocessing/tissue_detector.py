"""Post-hoc deep-learning tissue filtering of extracted patches.

Reference parity (feature level): `patch_extraction.py:260-305, 376-419` —
after extraction, a small tissue classifier scores every stored patch and
non-tissue patches (folds, background, pen ink) are dropped from
`patch_metadata.json`. The reference wraps a torchvision MobileNetV3-small
with a 4-class head; here the detector is a compact flax CNN with the same
4-class contract (0=artifact, 1=background, 2=pen, 3=tissue) and a native
checkpoint hook — train it with `train_tissue_detector`.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import serialization

TISSUE_CLASSES = {0: "artifact", 1: "background", 2: "pen", 3: "tissue"}


class TissueClassifier(nn.Module):
    """Small CNN patch classifier (inverted-bottleneck stages + GAP head)."""

    num_classes: int = 4
    widths: Sequence[int] = (16, 32, 64, 128)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        for i, w in enumerate(self.widths):
            x = nn.Conv(w, (3, 3), strides=(2, 2), padding="SAME", name=f"conv{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, name=f"bn{i}"
            )(x)
            x = nn.swish(x)
            x = nn.Conv(w, (3, 3), padding="SAME", name=f"conv{i}b")(x)
            x = nn.swish(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(2 * self.widths[-1], name="head1")(x)
        x = nn.swish(x)
        return nn.Dense(self.num_classes, name="head2")(x)


class TissueDetectionDataset:
    """Iterates the stored patches of one preprocessed WSI
    (reference src/utils/patch_dataset.py)."""

    def __init__(self, patched_wsi_path: Union[str, Path]) -> None:
        self.root = Path(patched_wsi_path)
        entries = json.loads((self.root / "patch_metadata.json").read_text())
        self.names = [next(iter(e)) for e in entries]

    def __len__(self) -> int:
        return len(self.names)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, str]:
        from PIL import Image

        name = self.names[i]
        img = np.array(Image.open(self.root / "patches" / name), np.float32) / 255.0
        return img, name


def load_tissue_detector(model_path: Union[str, Path]):
    """(model, variables, preprocess) for a tissue-filter checkpoint.

    Dispatches on format: `.pt`/`.pth` loads the reference's shipped
    torchvision MobileNetV3-Small checkpoint (`patch_extraction.py:260-305`)
    via `preprocessing.mobilenet_v3` — its patches must go through the
    reference transforms (Resize 224 + ImageNet normalize), returned as
    `preprocess`. Anything else is a native msgpack TissueClassifier
    (identity preprocessing: raw [0, 1] patches).
    """
    path = Path(model_path)
    if path.suffix in (".pt", ".pth"):
        from cellvit_tpu.preprocessing.mobilenet_v3 import (
            load_torch_tissue_detector,
            preprocess_patch,
        )

        model, variables = load_torch_tissue_detector(path)
        return model, variables, preprocess_patch
    model = TissueClassifier()
    payload = serialization.msgpack_restore(path.read_bytes())
    variables = {
        "params": payload["params"], "batch_stats": payload["batch_stats"]
    }
    return model, variables, lambda img: img


def filter_patches(
    patched_wsi_path: Union[str, Path],
    model_path: Union[str, Path],
    batch_size: int = 64,
    keep_classes: Sequence[int] = (3,),
) -> Dict[str, int]:
    """Drop non-tissue patches from a preprocessed WSI directory.

    Rewrites patch_metadata.json keeping only patches whose argmax class is
    in `keep_classes`; filtered names are recorded in
    `filtered_patches.json`. Returns {kept, dropped}.
    """
    root = Path(patched_wsi_path)
    model, variables, preprocess = load_tissue_detector(model_path)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))

    ds = TissueDetectionDataset(root)
    keep: List[str] = []
    drop: List[str] = []
    for start in range(0, len(ds), batch_size):
        batch = [ds[i] for i in range(start, min(start + batch_size, len(ds)))]
        imgs = jnp.asarray(np.stack([preprocess(b[0]) for b in batch]))
        preds = np.asarray(jnp.argmax(fwd(variables, imgs), -1))
        for (_, name), cls in zip(batch, preds):
            (keep if int(cls) in keep_classes else drop).append(name)

    entries = json.loads((root / "patch_metadata.json").read_text())
    kept_entries = [e for e in entries if next(iter(e)) in set(keep)]
    (root / "patch_metadata.json").write_text(json.dumps(kept_entries, indent=2))
    (root / "filtered_patches.json").write_text(
        json.dumps({"dropped": drop}, indent=2)
    )
    return {"kept": len(keep), "dropped": len(drop)}


def train_tissue_detector(
    images: np.ndarray,
    labels: np.ndarray,
    output_path: Union[str, Path],
    epochs: int = 10,
    batch_size: int = 32,
    lr: float = 1e-3,
    seed: int = 0,
) -> float:
    """Train the classifier on (N, H, W, 3) float images + int labels;
    saves a msgpack checkpoint. Returns final accuracy."""
    import optax

    model = TissueClassifier()
    rng = jax.random.PRNGKey(seed)
    variables = model.init(rng, jnp.zeros((1, *images.shape[1:])), train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, x, y):
        def loss_fn(p):
            logits, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
            return loss, (mutated["batch_stats"], logits)

        (loss, (bs, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean(jnp.argmax(logits, -1) == y)
        return params, bs, opt_state, loss, acc

    n = images.shape[0]
    host = np.random.default_rng(seed)
    acc = 0.0
    for _ in range(epochs):
        order = host.permutation(n)
        for s in range(0, n - batch_size + 1, batch_size):
            idx = order[s : s + batch_size]
            params, batch_stats, opt_state, loss, acc = step(
                params, batch_stats, opt_state,
                jnp.asarray(images[idx]), jnp.asarray(labels[idx]),
            )
    payload = {"params": jax.device_get(params), "batch_stats": jax.device_get(batch_stats)}
    Path(output_path).write_bytes(serialization.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, payload)
    ))
    return float(acc)
