"""Model registry: name -> constructor.

Mirrors the reference CLI surface where `train.py --model <name>` selects
the model module by dynamic import (SURVEY.md L4/§5.6); here it's an
explicit registry instead of importlib.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

from transferable3d_tpu.core import bins as bins_lib

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def get_model(name: str, cfg: bins_lib.BinConfig, **kwargs):
    """Construct a model by registry name (e.g. 'frustum_pointnets_v1')."""
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown model '{name}'; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name](cfg=cfg, **kwargs)


def available() -> list:
    return sorted(_REGISTRY)


# --- registrations (import side effects kept local and explicit) ---------

def _register_builtin():
    from transferable3d_tpu.models import frustum_pointnet_v1 as v1

    _REGISTRY.setdefault("frustum_pointnets_v1", v1.FrustumPointNetV1)
    _REGISTRY.setdefault("box_estimation_v1", v1.BoxEstimationOnly)
    try:
        from transferable3d_tpu.models import frustum_pointnet_v2 as v2
        _REGISTRY.setdefault("frustum_pointnets_v2", v2.FrustumPointNetV2)
    except ImportError:
        pass
    try:
        from transferable3d_tpu.models import boxpc
        _REGISTRY.setdefault("boxpc_fit", boxpc.BoxPCFitNet)
    except ImportError:
        pass


_register_builtin()
