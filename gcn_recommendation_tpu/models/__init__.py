"""Model registry.

Mirrors the reference's dynamic-import registry semantics
(``get_model`` at main.py:42-50: name -> models.<name.lower()>.<name>)
with an explicit table — unknown names raise, like the reference's
ImportError path.
"""

from gcn_recommendation_tpu.models.lightgcn import LightGCN
from gcn_recommendation_tpu.models.lightgcn_fusion import LightGCN_Fusion

_REGISTRY = {
    "LightGCN": LightGCN,
    "LightGCN_Fusion": LightGCN_Fusion,
}


def get_model(model_name: str):
    """Look up a model class by its reference-compatible name."""
    try:
        return _REGISTRY[model_name]
    except KeyError:
        raise ImportError(
            f"Could not import model {model_name!r}; known models: "
            f"{sorted(_REGISTRY)}"
        ) from None


def register_model(name: str, cls) -> None:
    """Register a custom model class under ``name``."""
    _REGISTRY[name] = cls


__all__ = ["LightGCN", "LightGCN_Fusion", "get_model", "register_model"]
