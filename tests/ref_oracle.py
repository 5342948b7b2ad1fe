"""Import harness for the reference torch implementation at /root/reference.

The reference models (models/segmentation/cell_segmentation/*.py) pull in
host-postprocessing modules whose third-party deps (torchvision, skimage,
stardist, numba) are not installed here. Only the nn.Module graphs are needed
for logits-parity oracles, so we stub those deps with inert modules before
adding /root/reference to sys.path.

Usage:
    ref = load_reference_models()      # models.segmentation.cell_segmentation
    ref.cellvit.CellViT256(...)        # torch modules, ready for forward
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub_module(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _njit(*args, **kwargs):
    """numba.njit stand-in: works bare and parameterized."""
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]

    def deco(fn):
        return fn

    return deco


def _unavailable(*_a, **_k):
    raise RuntimeError("stubbed dependency called during parity test")


def install_stubs() -> None:
    if "torchvision" not in sys.modules:
        tv = _stub_module("torchvision")
        tv.transforms = _stub_module("torchvision.transforms", Compose=_unavailable)
    if "skimage" not in sys.modules:
        sk = _stub_module("skimage")
        sk.segmentation = _stub_module("skimage.segmentation", watershed=_unavailable)
        sk.draw = _stub_module("skimage.draw", polygon=_unavailable)
    if "stardist" not in sys.modules:
        _stub_module(
            "stardist",
            non_maximum_suppression=_unavailable,
            polygons_to_label=_unavailable,
        )
    if "numba" not in sys.modules:
        _stub_module("numba", njit=_njit, prange=range)


def load_reference_models():
    """Return the reference's models.segmentation.cell_segmentation package."""
    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    import importlib

    pkg = importlib.import_module("models.segmentation.cell_segmentation")
    for sub in (
        "cellvit",
        "cellvit_shared",
        "cellvit_stardist",
        "cellvit_stardist_shared",
        "cellvit_cpp_net",
        "cpp_net_stardist_rn50",
    ):
        importlib.import_module(f"models.segmentation.cell_segmentation.{sub}")
    return pkg
