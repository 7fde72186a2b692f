"""gcn_recommendation_tpu — a TPU-native LightGCN recommendation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
Validation-m3sSAGE/GCN_Recommendation reference (PyTorch, single GPU):

* heterogeneous user-item-brand graph construction with symmetric
  normalization (reference: main.py:282-336),
* LightGCN / LightGCN_Fusion embedding propagation
  (reference: models/lightgcn.py, models/lightgcn_fusion.py),
* BPR training with L2 regularization and optional brand-preference loss
  (reference: main.py:366-402),
* leave-one-out full-catalog Recall@K / NDCG@K evaluation
  (reference: main.py:404-439),
* CSV/PNG training-history logging (reference: main.py:89-169).

The compute path is pure JAX (jit/pjit/shard_map + Pallas kernels); the
host-side graph ETL has a native C++ fast path (native/).
"""

__version__ = "0.1.0"

from gcn_recommendation_tpu.config import Config
from gcn_recommendation_tpu.models import get_model

__all__ = ["Config", "get_model", "__version__"]
