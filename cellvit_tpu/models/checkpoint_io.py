"""Torch-checkpoint ⇄ flax-variables conversion for CellViT models.

Loads the reference's `.pth` formats unchanged (constraint from BASELINE.json):

* full training checkpoints: dict with keys ``arch``, ``epoch``,
  ``model_state_dict``, ``optimizer_state_dict``, ``config`` (flattened),
  … (reference `base_ml/base_trainer.py:229-251`); the model is rebuilt from
  the embedded config exactly like `cell_detection.py:127-212`;
* pretrained DINO/HIPT ViT-256 encoders: ``["teacher"]`` key with
  ``module.`` / ``backbone.`` prefix strip (reference `cellvit.py:483-493`);
* pretrained SAM encoders: raw state dict, optional ``image_encoder.``
  prefix (reference `cellvit.py:574-584`).

Weight-layout transforms (torch → flax/NHWC):
  Linear     (O, I)        → kernel (I, O)            [transpose]
  Conv2d     (O, I, kh, kw)→ kernel (kh, kw, I, O)    [transpose 2,3,1,0]
  ConvT 2×2  (I, O, 2, 2)  → kernel (I, 2, 2, O)      [transpose 0,2,3,1]
  PatchEmbed (E, C, p, p)  → kernel (p·p·C, E)        [transpose 2,3,1,0 + reshape]
  BatchNorm  weight/bias → params.scale/bias; running_mean/var → batch_stats

The inverse (`export_torch_state_dict`) produces a torch-compatible state
dict so checkpoints trained here remain loadable by torch tooling; the pair
is round-trip tested.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

from cellvit_tpu.models.cellvit import CellViT, CellViT256, CellViTSAM

# --------------------------------------------------------------------------
# transforms
# --------------------------------------------------------------------------


def _t_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _t_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _t_deconv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(0, 2, 3, 1))


def _t_patch(w: np.ndarray) -> np.ndarray:
    e = w.shape[0]
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0).reshape(-1, e))


def _t_none(w: np.ndarray) -> np.ndarray:
    return np.asarray(w)


_INVERSE = {
    "linear": lambda w: np.ascontiguousarray(np.asarray(w).T),
    "conv": lambda w: np.ascontiguousarray(np.asarray(w).transpose(3, 2, 0, 1)),
    "deconv": lambda w: np.ascontiguousarray(np.asarray(w).transpose(0, 3, 1, 2)),
    "none": lambda w: np.asarray(w),
}

def _t_conv1x1_dense(w: np.ndarray) -> np.ndarray:
    # torch Conv2d(K_in, K_out, 1) weight (K_out, K_in, 1, 1) → Dense (K_in, K_out)
    return np.ascontiguousarray(w[:, :, 0, 0].T)


_TRANSFORMS: Dict[str, Callable[[np.ndarray], np.ndarray]] = {
    "linear": _t_linear,
    "conv": _t_conv,
    "deconv": _t_deconv,
    "patch": _t_patch,
    "none": _t_none,
    "conv1x1_dense": _t_conv1x1_dense,
}

_INVERSE["conv1x1_dense"] = lambda w: np.ascontiguousarray(
    np.asarray(w).T[:, :, None, None]
)


def _inverse_patch(w: Any, patch: int, in_ch: int) -> np.ndarray:
    w = np.asarray(w)  # (p·p·C, E)
    e = w.shape[-1]
    return np.ascontiguousarray(
        w.reshape(patch, patch, in_ch, e).transpose(3, 2, 0, 1)
    )


# --------------------------------------------------------------------------
# key mapping
# --------------------------------------------------------------------------

MapResult = Optional[Tuple[str, Tuple[str, ...], str]]  # (collection, path, transform)


def _map_block_sub(sub: str, sam: bool) -> MapResult:
    """Map the part of a transformer-block key after `blocks.{i}.`."""
    table = {
        "norm1.weight": (("norm1", "scale"), "none"),
        "norm1.bias": (("norm1", "bias"), "none"),
        "norm2.weight": (("norm2", "scale"), "none"),
        "norm2.bias": (("norm2", "bias"), "none"),
        "attn.qkv.weight": (("attn", "qkv", "kernel"), "linear"),
        "attn.qkv.bias": (("attn", "qkv", "bias"), "none"),
        "attn.proj.weight": (("attn", "proj", "kernel"), "linear"),
        "attn.proj.bias": (("attn", "proj", "bias"), "none"),
        "attn.rel_pos_h": (("attn", "rel_pos_h"), "none"),
        "attn.rel_pos_w": (("attn", "rel_pos_w"), "none"),
    }
    mlp_names = ("lin1", "lin2") if sam else ("fc1", "fc2")
    table[f"mlp.{mlp_names[0]}.weight"] = (("mlp", "fc1", "kernel"), "linear")
    table[f"mlp.{mlp_names[0]}.bias"] = (("mlp", "fc1", "bias"), "none")
    table[f"mlp.{mlp_names[1]}.weight"] = (("mlp", "fc2", "kernel"), "linear")
    table[f"mlp.{mlp_names[1]}.bias"] = (("mlp", "fc2", "bias"), "none")
    if sub not in table:
        return None
    path, tf = table[sub]
    return ("params", path, tf)


def _map_encoder_key(key: str, sam: bool) -> MapResult:
    """Map a torch encoder key (without the `encoder.` prefix)."""
    simple = {
        "cls_token": ("cls_token", "none"),
        "pos_embed": ("pos_embed", "none"),
        "patch_embed.proj.bias": (("patch_embed", "proj", "bias"), "none"),
        "norm.weight": (("norm", "scale"), "none"),
        "norm.bias": (("norm", "bias"), "none"),
        "head.weight": (("head", "kernel"), "linear"),
        "head.bias": (("head", "bias"), "none"),
    }
    if key == "patch_embed.proj.weight":
        return ("params", ("patch_embed", "proj", "kernel"), "patch")
    if key in simple:
        path, tf = simple[key]
        path = (path,) if isinstance(path, str) else path
        return ("params", path, tf)
    m = re.match(r"blocks\.(\d+)\.(.+)", key)
    if m:
        idx, sub = int(m.group(1)), m.group(2)
        r = _map_block_sub(sub, sam)
        if r is None:
            return None
        coll, path, tf = r
        return (coll, (f"blocks_{idx}",) + path, tf)
    # SAM neck: Sequential indices 0/2 are convs, 1/3 are LayerNorm2d
    neck = {
        "neck.0.weight": (("neck_conv1", "kernel"), "conv"),
        "neck.1.weight": (("neck_ln1", "scale"), "none"),
        "neck.1.bias": (("neck_ln1", "bias"), "none"),
        "neck.2.weight": (("neck_conv2", "kernel"), "conv"),
        "neck.3.weight": (("neck_ln2", "scale"), "none"),
        "neck.3.bias": (("neck_ln2", "bias"), "none"),
    }
    if key in neck:
        path, tf = neck[key]
        return ("params", path, tf)
    return None


def _map_conv_bn_block(sub: str, conv_first_idx: int = 0) -> MapResult:
    """Map `block.{j}.*` inside a reference Conv2DBlock (conv at index 0,
    BN at 1) to our ConvBNRelu {conv, bn}."""
    table = {
        f"block.{conv_first_idx}.weight": ("params", ("conv", "kernel"), "conv"),
        f"block.{conv_first_idx}.bias": ("params", ("conv", "bias"), "none"),
        f"block.{conv_first_idx + 1}.weight": ("params", ("bn", "scale"), "none"),
        f"block.{conv_first_idx + 1}.bias": ("params", ("bn", "bias"), "none"),
        f"block.{conv_first_idx + 1}.running_mean": (
            "batch_stats", ("bn", "mean"), "none"),
        f"block.{conv_first_idx + 1}.running_var": (
            "batch_stats", ("bn", "var"), "none"),
    }
    return table.get(sub)


def _map_deconv_block(sub: str) -> MapResult:
    """Reference Deconv2DBlock: block.0 ConvT, block.1 Conv, block.2 BN →
    our DeconvBlock {deconv, conv, bn}."""
    if sub == "block.0.weight":
        return ("params", ("deconv", "kernel"), "deconv")
    if sub == "block.0.bias":
        return ("params", ("deconv", "bias"), "none")
    return _map_conv_bn_block(sub, conv_first_idx=1)


_BRANCH_STAGES = {
    # torch Sequential name → (flax conv-list prefix, n_convs, flax upsampler)
    "decoder3_upsampler": ("d3_convs", 3, "d3_up"),
    "decoder2_upsampler": ("d2_convs", 2, "d2_up"),
    "decoder1_upsampler": ("d1_convs", 2, "d1_up"),
    "decoder0_header": ("d0_convs", 2, "header"),
}

_BRANCH_NAMES = (
    "nuclei_binary_map_decoder",
    "hv_map_decoder",
    "nuclei_type_maps_decoder",
    # StarDist / CPP-Net branch towers reuse the same stage layout
    "stardist_decoder",
    "dist_decoder",
)

# CPP-Net extras (reference cellvit_cpp_net.py:251-279): bias-free 1×1
# conv heads, and a per-ray K→K confidence mix that we implement as Dense
_CPP_SIMPLE = {
    "stardist_head.weight": (("stardist_head", "kernel"), "conv"),
    "dist_head.weight": (("dist_head", "kernel"), "conv"),
    "type_head.weight": (("type_head", "kernel"), "conv"),
    "conv_0_confidence.weight": (("conv_0_confidence", "kernel"), "conv"),
    "conv_1_confidence.weight": (("conv_1_confidence", "kernel"), "conv1x1_dense"),
    "conv_1_confidence.bias": (("conv_1_confidence", "bias"), "none"),
}


def map_torch_key(key: str, sam_encoder: bool) -> MapResult:
    """Map one torch state-dict key of a CellViT model to
    (collection, flax path, transform). Returns None for keys to skip
    (num_batches_tracked) and raises KeyError for unknown keys."""
    if key.endswith("num_batches_tracked"):
        return None

    if key.startswith("encoder."):
        r = _map_encoder_key(key[len("encoder."):], sam_encoder)
        if r is None:
            raise KeyError(key)
        coll, path, tf = r
        return (coll, ("encoder",) + path, tf)

    if key.startswith("classifier_head."):
        if key.endswith("weight"):
            return ("params", ("classifier_head", "kernel"), "linear")
        return ("params", ("classifier_head", "bias"), "none")

    if key in _CPP_SIMPLE:
        path, tf = _CPP_SIMPLE[key]
        return ("params", path, tf)

    # shared skip projections: decoder0 = Conv2DBlocks, decoder1..3 = Deconv2DBlocks
    m = re.match(r"decoder(\d)\.(\d+)\.(.+)", key)
    if m:
        d, j, sub = int(m.group(1)), int(m.group(2)), m.group(3)
        mapper = _map_conv_bn_block if d == 0 else _map_deconv_block
        r = mapper(sub)
        if r is None:
            raise KeyError(key)
        coll, path, tf = r
        return (coll, (f"decoder{d}_{j}",) + path, tf)

    # shared-decoder variants: single tower under `decoder.`
    m = re.match(r"decoder\.decoder(\d)_skip\.(\d+)\.(.+)", key)
    if m:
        d, j, sub = int(m.group(1)), int(m.group(2)), m.group(3)
        mapper = _map_conv_bn_block if d == 0 else _map_deconv_block
        r = mapper(sub)
        if r is None:
            raise KeyError(key)
        coll, path, tf = r
        return (coll, ("decoder", f"decoder{d}_skip_{j}") + path, tf)
    if key.startswith("decoder.bottleneck_upsampler."):
        if key.endswith("weight"):
            return ("params", ("decoder", "bottleneck_upsampler", "kernel"), "deconv")
        return ("params", ("decoder", "bottleneck_upsampler", "bias"), "none")
    m = re.match(r"decoder\.(\w+)\.(\d+)\.(.*)", key)
    if m and m.group(1) in _BRANCH_STAGES:
        stage, idx, rest = m.group(1), int(m.group(2)), m.group(3)
        convs, n_convs, up = _BRANCH_STAGES[stage]
        if idx < n_convs:
            r = _map_conv_bn_block(rest)
            if r is None:
                raise KeyError(key)
            coll, path, tf = r
            return (coll, ("decoder", f"{convs}_{idx}") + path, tf)
        tf = "conv" if up == "header" else "deconv"
        if rest == "weight":
            return ("params", ("decoder", up, "kernel"), tf)
        if rest == "bias":
            return ("params", ("decoder", up, "bias"), "none")
        raise KeyError(key)

    # shared StarDist heads
    shared_heads = {
        "stardist_header.0.weight": (("stardist_header", "kernel"), "conv"),
        "stardist_header.0.bias": (("stardist_header", "bias"), "none"),
        "dist_header.weight": (("dist_header", "kernel"), "conv"),
        "dist_header.bias": (("dist_header", "bias"), "none"),
        "nuclei_type_maps_header.weight": (
            ("nuclei_type_maps_header", "kernel"), "conv"),
        "nuclei_type_maps_header.bias": (
            ("nuclei_type_maps_header", "bias"), "none"),
    }
    if key in shared_heads:
        path, tf = shared_heads[key]
        return ("params", path, tf)

    # branch towers
    for branch in _BRANCH_NAMES:
        if not key.startswith(branch + "."):
            continue
        sub = key[len(branch) + 1:]
        # shared variants: the branch name is a bare 1×1 conv head
        if sub == "weight":
            return ("params", (branch, "kernel"), "conv")
        if sub == "bias":
            return ("params", (branch, "bias"), "none")
        if sub in ("bottleneck_upsampler.weight",):
            return ("params", (branch, "bottleneck_upsampler", "kernel"), "deconv")
        if sub in ("bottleneck_upsampler.bias",):
            return ("params", (branch, "bottleneck_upsampler", "bias"), "none")
        m = re.match(r"(\w+)\.(\d+)\.(.*)", sub)
        if not m:
            raise KeyError(key)
        stage, idx, rest = m.group(1), int(m.group(2)), m.group(3)
        if stage not in _BRANCH_STAGES:
            raise KeyError(key)
        convs, n_convs, up = _BRANCH_STAGES[stage]
        if idx < n_convs:
            r = _map_conv_bn_block(rest)
            if r is None:
                raise KeyError(key)
            coll, path, tf = r
            return (coll, (branch, f"{convs}_{idx}") + path, tf)
        # the trailing module: ConvTranspose (upsamplers) or 1×1 Conv (header)
        if up == "header":
            tf = "conv"
        else:
            tf = "deconv"
        if rest == "weight":
            return ("params", (branch, up, "kernel"), tf)
        if rest == "bias":
            return ("params", (branch, up, "bias"), "none")
        raise KeyError(key)

    raise KeyError(key)


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------


def _set_path(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_state_dict(
    state_dict: Dict[str, Any], sam_encoder: bool, strict: bool = True
) -> Dict[str, Dict]:
    """torch model state dict → flax variables {params, batch_stats}."""
    variables: Dict[str, Dict] = {"params": {}, "batch_stats": {}}
    unknown = []
    for key, val in state_dict.items():
        arr = np.asarray(val.numpy() if hasattr(val, "numpy") else val)
        try:
            r = map_torch_key(key, sam_encoder)
        except KeyError:
            unknown.append(key)
            continue
        if r is None:
            continue
        coll, path, tf = r
        _set_path(variables[coll], path, _TRANSFORMS[tf](arr).astype(np.float32))
    if unknown and strict:
        raise KeyError(f"unmapped torch keys: {unknown[:10]}{'…' if len(unknown) > 10 else ''}")
    if not variables["batch_stats"]:
        variables.pop("batch_stats")
    return variables


def convert_encoder_state_dict(
    state_dict: Dict[str, Any], sam_encoder: bool
) -> Dict[str, Dict]:
    """Pretrained-encoder state dict → flax variables for the `encoder`
    submodule, tolerant of extra keys (DINO heads, SAM prompt/mask decoders)
    like the reference's `load_state_dict(strict=False)`."""
    cleaned = {}
    for k, v in state_dict.items():
        k = k.replace("module.", "").replace("backbone.", "")
        if k.startswith("image_encoder."):
            k = k[len("image_encoder."):]
        cleaned[k] = v
    params: Dict = {}
    for key, val in cleaned.items():
        r = _map_encoder_key(key, sam_encoder)
        if r is None:
            continue
        _, path, tf = r
        arr = np.asarray(val.numpy() if hasattr(val, "numpy") else val)
        _set_path(params, path, _TRANSFORMS[tf](arr).astype(np.float32))
    return {"params": {"encoder": params}}


def load_dino_encoder(path: str) -> Dict[str, Dict]:
    """Load a HIPT/DINO ViT-256 teacher checkpoint (reference
    cellvit.py:483-493) into encoder variables."""
    import torch

    ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    state_dict = ckpt["teacher"] if "teacher" in ckpt else ckpt
    return convert_encoder_state_dict(state_dict, sam_encoder=False)


def load_sam_encoder(path: str) -> Dict[str, Dict]:
    """Load a SAM checkpoint (reference cellvit.py:574-584) into encoder
    variables."""
    import torch

    state_dict = torch.load(str(path), map_location="cpu", weights_only=False)
    return convert_encoder_state_dict(state_dict, sam_encoder=True)


def build_model_from_config(arch: str, run_conf: Dict[str, Any]) -> CellViT:
    """Rebuild the model from a checkpoint's embedded config, mirroring
    `cell_detection.py:142-212`."""
    data, mcfg = run_conf["data"], run_conf.get("model", {})
    common = dict(
        num_nuclei_classes=data["num_nuclei_classes"],
        num_tissue_classes=data["num_tissue_classes"],
        regression_loss=mcfg.get("regression_loss", False),
    )
    if arch == "CellViT":
        return CellViT(
            embed_dim=mcfg["embed_dim"],
            depth=mcfg["depth"],
            num_heads=mcfg["num_heads"],
            extract_layers=tuple(mcfg["extract_layers"]),
            encoder_type="histo",
            **common,
        )
    if arch == "CellViT256":
        return CellViT256(**common)
    if arch == "CellViTSAM":
        return CellViTSAM(vit_structure=mcfg["backbone"], **common)
    if arch.endswith("Shared"):
        from cellvit_tpu.models.shared import (
            CellViT256Shared,
            CellViTSAMShared,
            CellViTShared,
        )

        if arch == "CellViT256Shared":
            return CellViT256Shared(**common)
        if arch == "CellViTSAMShared":
            return CellViTSAMShared(vit_structure=mcfg["backbone"], **common)
        return CellViTShared(
            embed_dim=mcfg["embed_dim"],
            depth=mcfg["depth"],
            num_heads=mcfg["num_heads"],
            extract_layers=tuple(mcfg["extract_layers"]),
            encoder_type="histo",
            **common,
        )
    raise NotImplementedError(f"unknown arch {arch}")


def unflatten_dict(flat: Dict[str, Any], sep: str = ".") -> Dict[str, Any]:
    """'a.b.c': v → {'a': {'b': {'c': v}}} (reference utils/tools.py)."""
    out: Dict[str, Any] = {}
    for key, val in flat.items():
        node = out
        parts = key.split(sep)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out


def load_checkpoint(path: str) -> Tuple[CellViT, Dict[str, Dict], Dict[str, Any]]:
    """Load a full reference training checkpoint: returns
    (model, flax variables, run config)."""
    import torch

    ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    run_conf = unflatten_dict(ckpt["config"], ".")
    arch = ckpt["arch"]
    model = build_model_from_config(arch, run_conf)
    variables = convert_state_dict(
        ckpt["model_state_dict"], sam_encoder=model.encoder_type == "sam"
    )
    return model, variables, run_conf


# --------------------------------------------------------------------------
# export (flax → torch)
# --------------------------------------------------------------------------


def export_torch_state_dict(
    variables: Dict[str, Dict],
    sam_encoder: bool,
    patch_size: int = 16,
    in_chans: int = 3,
) -> Dict[str, np.ndarray]:
    """flax variables → torch-layout state dict (numpy arrays).

    Inverse of `convert_state_dict`; keys follow the reference module names so
    exported checkpoints load into torch CellViT implementations.
    """
    out: Dict[str, np.ndarray] = {}

    def walk(node: Dict, path: Tuple[str, ...], coll: str) -> None:
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + (k,), coll)
            else:
                out_key, arr = _export_leaf(path + (k,), v, coll)
                if out_key is not None:
                    out[out_key] = arr

    def _export_leaf(path: Tuple[str, ...], v: Any, coll: str):
        tk, tf = _flax_path_to_torch_key(path, coll, sam_encoder)
        if tk is None:
            return None, None
        if tf == "patch":
            return tk, _inverse_patch(v, patch_size, in_chans)
        return tk, _INVERSE[tf](v)

    walk(variables.get("params", {}), (), "params")
    walk(variables.get("batch_stats", {}), (), "batch_stats")
    return out


def _flax_path_to_torch_key(
    path: Tuple[str, ...], coll: str, sam: bool
) -> Tuple[Optional[str], str]:
    """Invert the key mapping for one flax leaf path."""
    parts = list(path)
    leaf = parts[-1]

    def leafname(kind: str) -> Tuple[str, str]:
        # kind: linear/conv/deconv/norm/bn_stat
        if kind == "norm":
            return ("weight" if leaf == "scale" else "bias"), "none"
        if kind == "bn_stat":
            return ("running_mean" if leaf == "mean" else "running_var"), "none"
        if leaf == "kernel":
            return "weight", kind
        return "bias", "none"

    if parts[0] == "encoder":
        sub = parts[1:]
        if sub == ["cls_token"] or sub == ["pos_embed"]:
            return "encoder." + sub[0], "none"
        if sub[0] == "patch_embed":
            if leaf == "kernel":
                return "encoder.patch_embed.proj.weight", "patch"
            return "encoder.patch_embed.proj.bias", "none"
        if sub[0] in ("norm",):
            n, tf = leafname("norm")
            return f"encoder.norm.{n}", tf
        if sub[0] == "head":
            n, tf = leafname("linear")
            return f"encoder.head.{n}", tf
        if sub[0].startswith("blocks_"):
            i = sub[0].split("_")[1]
            inner = sub[1]
            if inner in ("norm1", "norm2"):
                n, tf = leafname("norm")
                return f"encoder.blocks.{i}.{inner}.{n}", tf
            if inner == "attn":
                if sub[2] in ("rel_pos_h", "rel_pos_w"):
                    return f"encoder.blocks.{i}.attn.{sub[2]}", "none"
                n, tf = leafname("linear")
                return f"encoder.blocks.{i}.attn.{sub[2]}.{n}", tf
            if inner == "mlp":
                fc = sub[2]
                tname = {"fc1": "lin1" if sam else "fc1",
                         "fc2": "lin2" if sam else "fc2"}[fc]
                n, tf = leafname("linear")
                return f"encoder.blocks.{i}.mlp.{tname}.{n}", tf
        neck_map = {
            "neck_conv1": ("neck.0", "conv"),
            "neck_conv2": ("neck.2", "conv"),
            "neck_ln1": ("neck.1", "norm"),
            "neck_ln2": ("neck.3", "norm"),
        }
        if sub[0] in neck_map:
            tname, kind = neck_map[sub[0]]
            if kind == "norm":
                n, tf = leafname("norm")
            else:
                n, tf = leafname("conv")
            return f"encoder.{tname}.{n}", tf
        raise KeyError(f"unexportable path {path}")

    if parts[0] == "classifier_head":
        n, tf = leafname("linear")
        return f"classifier_head.{n}", tf

    cpp_export = {
        "stardist_head": "conv",
        "dist_head": "conv",
        "type_head": "conv",
        "conv_0_confidence": "conv",
        "conv_1_confidence": "conv1x1_dense",
    }
    if parts[0] in cpp_export:
        if leaf == "kernel":
            return f"{parts[0]}.weight", cpp_export[parts[0]]
        return f"{parts[0]}.bias", "none"

    m = re.match(r"decoder(\d)_(\d+)", parts[0])
    if m:
        d, j = m.group(1), m.group(2)
        inner = parts[1]
        if d == "0":  # Conv2DBlock: conv at block.0, bn at block.1
            idx = {"conv": 0, "bn": 1}
        else:  # Deconv2DBlock: deconv 0, conv 1, bn 2
            idx = {"deconv": 0, "conv": 1, "bn": 2}
        if inner == "bn":
            kind = "bn_stat" if coll == "batch_stats" else "norm"
            n, tf = leafname(kind)
        elif inner == "deconv":
            n, tf = leafname("deconv")
        else:
            n, tf = leafname("conv")
        return f"decoder{d}.{j}.block.{idx[inner]}.{n}", tf

    if parts[0] == "decoder":  # shared-decoder tower
        inner = parts[1]
        m2 = re.match(r"decoder(\d)_skip_(\d+)", inner)
        if m2:
            d_i, j = m2.group(1), m2.group(2)
            sub2 = parts[2]
            idx = {"conv": 0, "bn": 1} if d_i == "0" else {
                "deconv": 0, "conv": 1, "bn": 2}
            if sub2 == "bn":
                kind = "bn_stat" if coll == "batch_stats" else "norm"
                n, tf = leafname(kind)
            elif sub2 == "deconv":
                n, tf = leafname("deconv")
            else:
                n, tf = leafname("conv")
            return f"decoder.decoder{d_i}_skip.{j}.block.{idx[sub2]}.{n}", tf
        if inner == "bottleneck_upsampler":
            n, tf = leafname("deconv")
            return f"decoder.bottleneck_upsampler.{n}", tf
        for tname, (convs, n_convs, up) in _BRANCH_STAGES.items():
            if inner == up:
                n, tf = leafname("conv" if up == "header" else "deconv")
                return f"decoder.{tname}.{n_convs}.{n}", tf
            if inner.startswith(convs + "_"):
                j = inner.split("_")[-1]
                sub2 = parts[2]
                idx = {"conv": 0, "bn": 1}[sub2]
                if sub2 == "bn":
                    kind = "bn_stat" if coll == "batch_stats" else "norm"
                    n, tf = leafname(kind)
                else:
                    n, tf = leafname("conv")
                return f"decoder.{tname}.{j}.block.{idx}.{n}", tf
        raise KeyError(f"unexportable path {path}")

    shared_heads = {
        "stardist_header": "stardist_header.0",
        "dist_header": "dist_header",
        "nuclei_type_maps_header": "nuclei_type_maps_header",
    }
    if parts[0] in shared_heads:
        n, tf = leafname("conv")
        return f"{shared_heads[parts[0]]}.{n}", tf

    for branch in _BRANCH_NAMES:
        if parts[0] != branch:
            continue
        if len(parts) == 2:  # shared variants: bare 1×1 conv head
            n, tf = leafname("conv")
            return f"{branch}.{n}", tf
        inner = parts[1]
        if inner == "bottleneck_upsampler":
            n, tf = leafname("deconv")
            return f"{branch}.bottleneck_upsampler.{n}", tf
        for tname, (convs, n_convs, up) in _BRANCH_STAGES.items():
            if inner == up:
                n, tf = leafname("conv" if up == "header" else "deconv")
                return f"{branch}.{tname}.{n_convs}.{n}", tf
            if inner.startswith(convs + "_"):
                j = inner.split("_")[-1]
                sub2 = parts[2]
                idx = {"conv": 0, "bn": 1}[sub2]
                if sub2 == "bn":
                    kind = "bn_stat" if coll == "batch_stats" else "norm"
                    n, tf = leafname(kind)
                else:
                    n, tf = leafname("conv")
                return f"{branch}.{tname}.{j}.block.{idx}.{n}", tf
    raise KeyError(f"unexportable path {path}")


# --------------------------------------------------------------- RN50


def _map_rn50_bn(prefix_path: Tuple[str, ...], leaf: str) -> MapResult:
    if leaf == "weight":
        return ("params", prefix_path + ("scale",), "none")
    if leaf == "bias":
        return ("params", prefix_path + ("bias",), "none")
    if leaf == "running_mean":
        return ("batch_stats", prefix_path + ("mean",), "none")
    if leaf == "running_var":
        return ("batch_stats", prefix_path + ("var",), "none")
    return None


def map_rn50_torch_key(key: str) -> MapResult:
    """Map one StarDist-RN50 torch key (reference
    cpp_net_stardist_rn50.py:615-728) to (collection, flax path, transform)
    for `models.stardist_rn50.StarDistRN50`. Returns None for skips."""
    if key.endswith("num_batches_tracked"):
        return None
    if key.startswith("encoder.fc."):
        return None  # torchvision classifier head, unused by the model

    if key.startswith("encoder."):
        rest = key[len("encoder."):]
        if rest.startswith("conv1."):
            return ("params", ("encoder", "conv1", "kernel"), "conv")
        if rest.startswith("bn1."):
            return _map_rn50_bn(("encoder", "bn1"), rest.split(".")[-1])
        m = re.match(r"layer(\d)\.(\d+)\.(.+)", rest)
        if m:
            stage, block, sub = m.group(1), m.group(2), m.group(3)
            base = ("encoder", f"layer{stage}_{block}")
            m2 = re.match(r"conv(\d)\.weight", sub)
            if m2:
                return ("params", base + (f"conv{m2.group(1)}", "kernel"), "conv")
            m2 = re.match(r"bn(\d)\.(.+)", sub)
            if m2:
                return _map_rn50_bn(base + (f"bn{m2.group(1)}",), m2.group(2))
            if sub == "downsample.0.weight":
                return ("params", base + ("downsample_conv", "kernel"), "conv")
            m2 = re.match(r"downsample\.1\.(.+)", sub)
            if m2:
                return _map_rn50_bn(base + ("downsample_bn",), m2.group(1))
        raise KeyError(key)

    # decoder up blocks: up{N}[_seg].conv.conv.{0,1,3,4} — double_conv is
    # Sequential(Conv, GroupNorm, ELU, Conv, GroupNorm, ELU)
    m = re.match(r"(up\d(?:_seg)?)\.conv\.conv\.(\d)\.(.+)", key)
    if m:
        name, idx, leaf = m.group(1), int(m.group(2)), m.group(3)
        conv_n = {0: "conv1", 3: "conv2"}.get(idx)
        gn_n = {1: "gn1", 4: "gn2"}.get(idx)
        if conv_n:
            tf = "conv" if leaf == "weight" else "none"
            leafname = "kernel" if leaf == "weight" else "bias"
            return ("params", (name, conv_n, leafname), tf)
        if gn_n:
            return (
                "params",
                (name, gn_n, "scale" if leaf == "weight" else "bias"),
                "none",
            )
        raise KeyError(key)

    if key.startswith("features."):
        leaf = key.split(".")[-1]
        return (
            "params",
            ("features", "kernel" if leaf == "weight" else "bias"),
            "conv" if leaf == "weight" else "none",
        )
    m = re.match(r"(out_prob|out_ray|out_seg)\.conv\.(weight|bias)", key)
    if m:
        name, leaf = m.group(1), m.group(2)
        return (
            "params",
            (name, "kernel" if leaf == "weight" else "bias"),
            "conv" if leaf == "weight" else "none",
        )
    raise KeyError(key)


def convert_rn50_state_dict(
    state_dict: Dict[str, Any], strict: bool = True
) -> Dict[str, Dict]:
    """StarDist-RN50 torch state dict → flax variables (params, batch_stats)."""
    variables: Dict[str, Dict] = {"params": {}, "batch_stats": {}}
    unknown = []
    for key, val in state_dict.items():
        arr = np.asarray(val.numpy() if hasattr(val, "numpy") else val)
        try:
            r = map_rn50_torch_key(key)
        except KeyError:
            unknown.append(key)
            continue
        if r is None:
            continue
        coll, path, tf = r
        _set_path(variables[coll], path, _TRANSFORMS[tf](arr).astype(np.float32))
    if unknown and strict:
        raise KeyError(
            f"unmapped torch keys: {unknown[:10]}{'…' if len(unknown) > 10 else ''}"
        )
    return variables
