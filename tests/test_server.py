"""HTTP serving daemon tests (server.py).

All device work in the daemon happens on a single dispatcher thread
(axon client thread-safety rule, CLAUDE.md); these tests exercise the
in-process server on the CPU backend: correctness vs direct Retriever
calls, concurrent-request coalescing, and the error paths.
"""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from gcn_recommendation_tpu.config import Config
from gcn_recommendation_tpu.models import get_model
from gcn_recommendation_tpu.serve import Retriever
from gcn_recommendation_tpu.server import RecommendServer


@pytest.fixture(scope="module")
def server_setup(tiny_bundle):
    bundle, _ = tiny_bundle
    cfg = Config(embedding_dim=16, n_layers=2)
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    params = model.init(jax.random.PRNGKey(0))
    retriever = Retriever.from_params(model, params, bundle)
    server = RecommendServer(retriever, bundle.num_users, port=0)
    server.start_background()
    yield server, retriever, bundle
    server.shutdown()


def _post(port, payload, path="/recommend"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(port, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=30
    ) as r:
        return r.status, json.loads(r.read())


def test_health_and_stats(server_setup):
    server, _, _ = server_setup
    status, body = _get(server.port, "/health")
    assert status == 200 and body == {"status": "ok"}
    status, body = _get(server.port, "/stats")
    assert status == 200
    for key in ("requests", "users_served", "dispatches", "mean_latency_ms"):
        assert key in body


def test_recommend_matches_direct_retriever(server_setup):
    server, retriever, bundle = server_setup
    users = np.unique(bundle.train.user_idx)[:5].tolist()
    status, body = _post(server.port, {"users": users, "k": 7})
    assert status == 200
    sv, iv = retriever.recommend(np.asarray(users, np.int32), k=7)
    assert body["items"] == iv.tolist()
    np.testing.assert_allclose(
        np.asarray(body["scores"]), sv, atol=5e-5  # scores rounded to 4dp
    )


def test_filter_seen_toggle(server_setup):
    server, _, bundle = server_setup
    users = np.unique(bundle.train.user_idx)[:4].tolist()
    _, filt = _post(server.port, {"users": users, "k": 10})
    _, unfilt = _post(
        server.port, {"users": users, "k": 10, "filter_seen": False}
    )
    assert filt["items"] != unfilt["items"]


def test_concurrent_requests_coalesce_and_stay_correct(server_setup):
    server, retriever, bundle = server_setup
    uniq = np.unique(bundle.train.user_idx)
    reqs = [uniq[i::7][:3].tolist() for i in range(7)]
    results = [None] * len(reqs)

    def call(i):
        results[i] = _post(server.port, {"users": reqs[i], "k": 5})

    threads = [threading.Thread(target=call, args=(i,)) for i in range(len(reqs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, req in enumerate(reqs):
        status, body = results[i]
        assert status == 200
        _, iv = retriever.recommend(np.asarray(req, np.int32), k=5)
        assert body["items"] == iv.tolist()
    _, stats = _get(server.port, "/stats")
    assert stats["requests"] >= len(reqs)


def test_dispatcher_coalesces_queued_burst(server_setup):
    """Deterministic coalescing check: requests queued BEFORE the
    dispatcher thread starts must be served in ONE device dispatch
    (same (k, filter_seen) group), not one dispatch per request — the
    behavior the PERF.md micro-batching throughput claim depends on."""
    from gcn_recommendation_tpu.server import Dispatcher, _Pending

    _, retriever, bundle = server_setup
    d = Dispatcher(retriever, max_coalesce=16)
    uniq = np.unique(bundle.train.user_idx)
    pendings = [
        d.submit(_Pending(uniq[i : i + 2].astype(np.int32), 5, True))
        for i in range(5)
    ]
    d.start()
    for p in pendings:
        assert p.done.wait(timeout=60)
        assert p.error is None
        _, iv = retriever.recommend(p.users, k=5)
        np.testing.assert_array_equal(p.result[1], iv)
    with d.lock:
        stats = dict(d.stats)
    d.stop()
    assert stats["dispatches"] == 1 and stats["coalesced_requests"] == 5


def test_dispatcher_stop_fast_fails_queued(server_setup):
    """stop() must complete still-queued requests with an error instead
    of leaving their waiters to time out."""
    from gcn_recommendation_tpu.server import Dispatcher, _Pending

    _, retriever, bundle = server_setup
    d = Dispatcher(retriever, max_coalesce=16)
    p = d.submit(_Pending(np.asarray([0], np.int32), 5, True))
    d.stop()  # thread never started; stop must fail the queued request
    assert p.done.wait(timeout=5)
    assert p.error is not None


def test_error_paths(server_setup):
    server, _, bundle = server_setup
    status, body = _post(server.port, {"users": []})
    assert status == 400 and "error" in body
    status, body = _post(server.port, {"users": [bundle.num_users + 5]})
    assert status == 400 and "out of range" in body["error"]
    status, body = _post(server.port, {})
    assert status == 400
    status, body = _post(server.port, {"users": [0]}, path="/nope")
    assert status == 404
    # no reload_fn configured on the module fixture server
    status, body = _post(server.port, {}, path="/reload")
    assert status == 501 and "error" in body


def test_request_size_cap(tiny_bundle):
    """An oversized /recommend is rejected with 400 before it can occupy
    the single dispatcher thread (round-4 ADVICE)."""
    bundle, _ = tiny_bundle
    cfg = Config(embedding_dim=16, n_layers=2)
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    params = model.init(jax.random.PRNGKey(0))
    retriever = Retriever.from_params(model, params, bundle)
    server = RecommendServer(
        retriever, bundle.num_users, port=0, max_request_users=4
    )
    server.start_background()
    try:
        status, body = _post(server.port, {"users": [0, 1, 2, 3, 0], "k": 5})
        assert status == 400 and "too many users" in body["error"]
        status, _ = _post(server.port, {"users": [0, 1, 2, 3], "k": 5})
        assert status == 200
    finally:
        server.shutdown()


def test_reload_swaps_retriever(tiny_bundle):
    """POST /reload rebuilds the retriever (on the dispatcher thread)
    and served scores change to the new model without a restart — the
    daemon analogue of the reference's on-demand checkpoint load
    (main.py:571)."""
    bundle, _ = tiny_bundle
    cfg = Config(embedding_dim=16, n_layers=2)
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    params_v1 = model.init(jax.random.PRNGKey(0))
    params_v2 = model.init(jax.random.PRNGKey(7))
    versions = [params_v1]

    def reload_fn():
        # v2 "checkpoint" appears on the second build — stands in for a
        # newer checkpoint landing on disk between reloads
        return Retriever.from_params(model, versions[-1], bundle)

    retriever_v1 = Retriever.from_params(model, params_v1, bundle)
    server = RecommendServer(
        retriever_v1, bundle.num_users, port=0, reload_fn=reload_fn
    )
    server.start_background()
    try:
        users = np.unique(bundle.train.user_idx)[:4].tolist()
        _, before = _post(server.port, {"users": users, "k": 5})

        versions.append(params_v2)
        status, body = _post(server.port, {}, path="/reload")
        assert status == 200 and body["status"] == "reloaded"

        status, after = _post(server.port, {"users": users, "k": 5})
        assert status == 200
        # equality vs a directly built v2 retriever
        retriever_v2 = Retriever.from_params(model, params_v2, bundle)
        _, iv2 = retriever_v2.recommend(np.asarray(users, np.int32), k=5)
        assert after["items"] == iv2.tolist()
        assert after != before
        _, stats = _get(server.port, "/stats")
        assert stats["reloads"] == 1
    finally:
        server.shutdown()


def test_dispatcher_skips_abandoned_requests(server_setup):
    """A request whose handler already timed out (cancelled flag) is
    dropped without device work and counted as abandoned (round-4
    ADVICE)."""
    from gcn_recommendation_tpu.server import Dispatcher, _Pending

    _, retriever, bundle = server_setup
    d = Dispatcher(retriever, max_coalesce=16)
    dead = d.submit(_Pending(np.asarray([0], np.int32), 5, True))
    dead.cancelled = True
    live = d.submit(_Pending(np.asarray([1], np.int32), 5, True))
    d.start()
    assert live.done.wait(timeout=60) and live.error is None
    assert dead.done.wait(timeout=5)
    assert dead.result is None
    with d.lock:
        stats = dict(d.stats)
    d.stop()
    assert stats["abandoned"] == 1
    assert stats["requests"] == 1  # the abandoned one is not counted


def test_warm_ladder_compiles_coalesce_shapes(tiny_bundle):
    """warm=(batch, k) must pre-dispatch the coalesce ladder on the
    dispatcher thread before traffic (PERF.md: cold coalesce shapes
    compiled mid-traffic cost 4.4x daemon QPS), and normal requests
    must still serve afterwards."""
    import time

    bundle, _ = tiny_bundle
    cfg = Config(embedding_dim=16, n_layers=2)
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    params = model.init(jax.random.PRNGKey(1))
    retriever = Retriever.from_params(model, params, bundle)
    server = RecommendServer(retriever, bundle.num_users, port=0,
                             max_coalesce=4, warm=(8, 5))
    server.start_background()
    try:
        deadline = time.time() + 30
        st = {}
        while time.time() < deadline:
            _, st = _get(server.port, "/stats")
            if st.get("warm_dispatches", 0) >= 3:  # m = 1, 2, 4
                break
            time.sleep(0.2)
        assert st["warm_dispatches"] == 3
        # warm dispatches must not pollute request accounting
        assert st["requests"] == 0 and st["dispatches"] == 0
        status, out = _post(server.port, {"users": [0, 1], "k": 5})
        assert status == 200 and len(out["items"]) == 2
    finally:
        server.shutdown()
