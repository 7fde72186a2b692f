from gcn_recommendation_tpu.ops.spmm import (
    DeviceGraph,
    propagate,
    propagate_coo,
    propagate_ell,
    to_device_graph,
)
from gcn_recommendation_tpu.ops.quant import (
    quantize_rows_int8,
    quantized_topk_scores,
)
from gcn_recommendation_tpu.ops.topk import (
    masked_topk,
    masked_topk_scores,
    topk_eval_batch,
    topk_eval_scan,
)

__all__ = [
    "DeviceGraph",
    "propagate",
    "propagate_coo",
    "propagate_ell",
    "to_device_graph",
    "masked_topk",
    "masked_topk_scores",
    "topk_eval_batch",
    "topk_eval_scan",
    "quantize_rows_int8",
    "quantized_topk_scores",
]
