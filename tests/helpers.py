"""Shared test fixtures/helpers."""

import numpy as np


def dense_from_graph(g, dtype=np.float32):
    """Dense ground-truth adjacency from a Graph's *unpadded* COO prefix.

    Uses ``np.add.at`` over ``[:g.nnz]`` — never fancy-index ``+=``, which
    is last-write-wins on duplicate indices.  The COO pad sentinels all
    land on ``(n-1, 0)``, so a real edge there would be silently zeroed
    (the hazard documented at models/lightgcn.py::debug_diagnostics).
    """
    n = g.num_nodes
    dense = np.zeros((n, n), dtype)
    np.add.at(dense, (g.dst[: g.nnz], g.src[: g.nnz]), g.weight[: g.nnz])
    return dense
