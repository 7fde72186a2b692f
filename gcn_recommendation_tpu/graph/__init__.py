from gcn_recommendation_tpu.graph.build import (
    Graph,
    build_normalized_adjacency,
    normalize_sym,
)

__all__ = ["Graph", "build_normalized_adjacency", "normalize_sym"]
