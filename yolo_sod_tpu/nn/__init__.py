"""Neural network layer: module vocabulary, graph compiler, model assembly."""

from yolo_sod_tpu.nn.tasks import (
    DetectionModel,
    LayerSpec,
    Network,
    ParsedGraph,
    make_divisible,
    parse_model,
    yaml_model_load,
)

__all__ = [
    "DetectionModel", "LayerSpec", "Network", "ParsedGraph",
    "make_divisible", "parse_model", "yaml_model_load",
]
