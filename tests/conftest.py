"""Test configuration: force CPU with 8 virtual devices.

SURVEY.md §4: multi-host simulation without a cluster —
``--xla_force_host_platform_device_count=8`` gives every test session an
8-device mesh so DP/TP/collective paths are exercised in CI.  Must run
before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var, so force the
# platform through the config API before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated (scan /
# shard_map programs on 8 virtual devices), and every large array is a
# jit *argument* (house rule), so HLO is stable across runs — repeat
# suite runs skip most of the compile cost.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def tiny_bundle(tmp_path_factory):
    """A small synthetic DataBundle shared across tests."""
    from gcn_recommendation_tpu.data.loader import load_preprocessed_data
    from gcn_recommendation_tpu.data.synthetic import generate_synthetic_dataset

    out = tmp_path_factory.mktemp("data") / "processed"
    generate_synthetic_dataset(
        str(out),
        num_users=300,
        num_items=200,
        num_brands=20,
        mean_degree=12.0,
        core=4,
        seed=0,
        embedding_dim=64,
    )
    return load_preprocessed_data(str(out), use_brand=True, verbose=False), str(out)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
