from gcn_recommendation_tpu.data.loader import DataBundle, load_preprocessed_data
from gcn_recommendation_tpu.data.sampler import (
    epoch_batches,
    make_negative_sampler,
    membership_arrays,
    sample_negatives,
)

__all__ = [
    "DataBundle",
    "load_preprocessed_data",
    "epoch_batches",
    "make_negative_sampler",
    "membership_arrays",
    "sample_negatives",
]
