"""Model zoo registry.

≡ the reference's reflective loading (`hwgat/utils.py:55-59` +
`configs.py:80-82`): a model is selected by name and configured from the
dataset registry entry + input dim. Names match the reference CLI exactly.
"""

from __future__ import annotations

from sl_hwgat_tpu.models.decoupled_gcn import DecoupledGCN, decoupled_gcn_from_dataset
from sl_hwgat_tpu.models.gate import GATE, gate_from_dataset
from sl_hwgat_tpu.models.hgate import HGATE, hgate_from_dataset
from sl_hwgat_tpu.models.hwgate import HWGATE, hwgate_from_dataset
from sl_hwgat_tpu.models.stgcn import STGCN, stgcn_from_dataset
from sl_hwgat_tpu.models.transformer import TransformerClassifier, transformer_from_dataset
from sl_hwgat_tpu.models.wgate import WGATE, wgate_from_dataset

MODEL_REGISTRY = {
    "HWGATE": hwgate_from_dataset,
    "HGATE": hgate_from_dataset,
    "WGATE": wgate_from_dataset,
    "GATE": gate_from_dataset,
    "STGCN": stgcn_from_dataset,
    "DecoupledGCN": decoupled_gcn_from_dataset,
    "Transformer": transformer_from_dataset,
}

# Number of canonical joints each model consumes (64 = windowed layout from
# WindowCreate; 29 = raw canonical skeleton).
MODEL_NUM_KPS = {
    "HWGATE": 64,
    "WGATE": 64,
    "HGATE": 29,
    "GATE": 29,
    "STGCN": 29,
    "DecoupledGCN": 29,
    "Transformer": 29,
}

# RNG streams each model consumes in train mode.
MODEL_RNG_STREAMS = {
    "HWGATE": ("dropout", "prune"),
    "HGATE": ("dropout",),
    "WGATE": ("dropout",),
    "GATE": ("dropout",),
    "STGCN": ("dropout",),
    "DecoupledGCN": ("dropout", "dropgraph"),
    "Transformer": ("dropout",),
}


def build_model(name: str, dataset_params: dict, input_dim: int, **overrides):
    """Instantiate a model by registry name. Raises KeyError on unknown names."""
    return MODEL_REGISTRY[name](dataset_params, input_dim, **overrides)


__all__ = [
    "MODEL_REGISTRY",
    "MODEL_NUM_KPS",
    "MODEL_RNG_STREAMS",
    "build_model",
    "HWGATE",
    "HGATE",
    "WGATE",
    "GATE",
    "STGCN",
    "DecoupledGCN",
    "TransformerClassifier",
]
