"""Native C++ ETL vs numpy-reference parity.

Skipped automatically when the toolchain is unavailable (native_ext
builds the library on first use).
"""

import numpy as np
import pytest

from gcn_recommendation_tpu.data import native_ext
from gcn_recommendation_tpu.graph.build import _dedup_sum, normalize_sym

pytestmark = pytest.mark.skipif(
    not native_ext.available(), reason="native library not built"
)


def _reference_kcore(users, items, k):
    """The reference's fixpoint loop (prepare_data.py:39-48) on codes."""
    keep = np.ones(len(users), bool)
    if k <= 1:
        return keep
    idx = np.arange(len(users))
    u, it = users.copy(), items.copy()
    while True:
        uv, uc = np.unique(u, return_counts=True)
        iv, ic = np.unique(it, return_counts=True)
        weak_u = set(uv[uc < k].tolist())
        weak_i = set(iv[ic < k].tolist())
        if not weak_u and not weak_i:
            break
        m = ~(np.isin(u, list(weak_u)) | np.isin(it, list(weak_i)))
        u, it, idx = u[m], it[m], idx[m]
    out = np.zeros(len(users), bool)
    out[idx] = True
    return out


@pytest.mark.parametrize("k", [2, 3, 5])
def test_kcore_native_matches_reference_fixpoint(k):
    rng = np.random.default_rng(k)
    n = 3000
    users = rng.integers(0, 300, n)
    items = rng.integers(0, 200, n)
    native = native_ext.kcore_filter_native(users, items, k)
    ref = _reference_kcore(users, items, k)
    np.testing.assert_array_equal(native, ref)


def test_kcore_native_k1_keeps_all():
    users = np.array([0, 1, 2], np.int64)
    items = np.array([0, 1, 2], np.int64)
    assert native_ext.kcore_filter_native(users, items, 1).all()


def test_build_norm_edges_matches_numpy():
    rng = np.random.default_rng(0)
    nu, ni = 80, 60
    n_nodes = nu + ni
    u = rng.integers(0, nu, 700)
    i = rng.integers(0, ni, 700) + nu
    rows = np.concatenate([u, i])
    cols = np.concatenate([i, u])

    dst_n, src_n, w_n = native_ext.build_norm_edges_native(rows, cols, n_nodes)
    r_u, c_u, vals = _dedup_sum(rows, cols, n_nodes)
    w_ref = normalize_sym(r_u, c_u, vals, n_nodes)

    np.testing.assert_array_equal(dst_n, r_u)
    np.testing.assert_array_equal(src_n, c_u)
    np.testing.assert_allclose(w_n, w_ref, rtol=1e-6)


def test_prepare_kcore_uses_native_when_available():
    from gcn_recommendation_tpu.data.prepare import kcore_filter

    rng = np.random.default_rng(1)
    users = rng.integers(0, 50, 500)
    items = rng.integers(0, 40, 500)
    got = kcore_filter(users, items, 3)
    ref = _reference_kcore(users, items, 3)
    np.testing.assert_array_equal(got, ref)
