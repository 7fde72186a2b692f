from gcn_recommendation_tpu.core.mesh import (
    MeshSpec,
    create_mesh,
    data_sharding,
    replicated,
    row_sharding,
)

__all__ = [
    "MeshSpec",
    "create_mesh",
    "data_sharding",
    "replicated",
    "row_sharding",
]
