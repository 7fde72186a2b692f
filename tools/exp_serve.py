"""Measure serving throughput/latency of serve.Retriever on the TPU.

The evaluator's 680k-QPS top-k number is a *batched, scanned* figure (one
device dispatch per tier); serving answers per-REQUEST, so each
recommend() call pays one dispatch + result fetch through the axon
tunnel.  This measures the end-to-end serving rate a client actually
sees, f32 vs int8 catalog, at books scale.

Timing per the PERF.md rules: np.asarray on the returned top-k forces
completion, so wall-clock across sequential calls is honest; the first
call per (batch, filter-width) ladder shape compiles and is excluded.

Usage: python tools/exp_serve.py [--users 50000 --items 20000 --batch 1024]
       python tools/exp_serve.py --daemon   # HTTP daemon under concurrent load
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_daemon_bench(args, model, params, bundle) -> None:
    """Hammer a live RecommendServer over real HTTP with N concurrent
    client threads (round-4 verdict #3: the daemon's end-to-end
    throughput existed nowhere in the record — PERF.md's serving table
    measured the Retriever APIs directly).

    The server runs in-process on the same catalog/params as the
    Retriever-level rows, so the two tables are directly comparable: the
    daemon's job is to materialize the ``recommend_many`` coalescing win
    through http.server + thread handoff + the single dispatcher thread.
    Coalescing factor achieved = coalesced_requests / dispatches from
    /stats deltas.
    """
    from gcn_recommendation_tpu.serve import Retriever
    from gcn_recommendation_tpu.server import RecommendServer

    def post(port, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/recommend",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    def get_stats(port):
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30
        ) as r:
            return json.loads(r.read())

    rng = np.random.default_rng(0)
    print(
        f"\ndaemon under concurrent HTTP load "
        f"({args.batch}-user requests, {args.daemon_reqs} per client):"
    )
    print(
        "  catalog  max_coal  clients |    QPS   users/s  mean_lat  coal.factor"
    )
    for quant in (False, True):
        r = Retriever.from_params(model, params, bundle, quantize=quant)
        r.recommend(rng.integers(0, args.users, args.batch).astype(np.int32),
                    k=args.k)  # compile the ladder shape
        for max_coalesce in args.daemon_coalesce:
            server = RecommendServer(
                r, bundle.num_users, port=0, max_coalesce=max_coalesce,
                timeout_s=120.0,
            )
            server.start_background()
            try:
                for n_clients in args.daemon_clients:
                    reqs_per_client = args.daemon_reqs
                    batches = [
                        [rng.integers(0, args.users, args.batch)
                         .astype(np.int32).tolist()
                         for _ in range(reqs_per_client)]
                        for _ in range(n_clients)
                    ]
                    # warm: one request through the daemon path
                    post(server.port, {"users": batches[0][0], "k": args.k})
                    s0 = get_stats(server.port)
                    lat_ms = []
                    lat_lock = threading.Lock()

                    def client(i):
                        for users in batches[i]:
                            t0 = time.perf_counter()
                            post(server.port, {"users": users, "k": args.k})
                            dt = (time.perf_counter() - t0) * 1e3
                            with lat_lock:
                                lat_ms.append(dt)

                    t0 = time.perf_counter()
                    threads = [
                        threading.Thread(target=client, args=(i,))
                        for i in range(n_clients)
                    ]
                    for t in threads:
                        t.start()
                    for t in threads:
                        t.join()
                    wall = time.perf_counter() - t0
                    s1 = get_stats(server.port)
                    n_req = n_clients * reqs_per_client
                    disp = max(1, s1["dispatches"] - s0["dispatches"])
                    coal = (
                        s1["coalesced_requests"] - s0["coalesced_requests"]
                    ) / disp
                    print(
                        f"  {'int8' if quant else 'f32 '}     "
                        f"{max_coalesce:7d}  {n_clients:7d} | "
                        f"{n_req / wall:6.1f}  {n_req * args.batch / wall:8,.0f}  "
                        f"{np.mean(lat_ms):7.1f}ms  {coal:6.2f}"
                    )
            finally:
                server.shutdown()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=50_000)
    ap.add_argument("--items", type=int, default=20_000)
    ap.add_argument("--brands", type=int, default=2_000)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--reqs", type=int, default=20)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--daemon", action="store_true",
                    help="Benchmark the HTTP daemon under concurrent load "
                         "instead of the Retriever APIs.")
    ap.add_argument("--daemon_clients", type=int, nargs="+",
                    default=[1, 4, 16])
    ap.add_argument("--daemon_coalesce", type=int, nargs="+",
                    default=[1, 16])
    ap.add_argument("--daemon_reqs", type=int, default=12,
                    help="Requests per client thread.")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )

    from gcn_recommendation_tpu.config import Config
    from gcn_recommendation_tpu.data.synthetic import synthetic_bundle
    from gcn_recommendation_tpu.models import get_model
    from gcn_recommendation_tpu.serve import Retriever

    print(f"devices: {jax.devices()}")
    bundle = synthetic_bundle(
        num_users=args.users, num_items=args.items, num_brands=args.brands,
        mean_degree=28.0, core=8, seed=42,
    )
    cfg = Config(embedding_dim=64, n_layers=3)
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    params = model.init(jax.random.PRNGKey(0))

    if args.daemon:
        run_daemon_bench(args, model, params, bundle)
        return 0

    rng = np.random.default_rng(0)
    batches = [
        rng.integers(0, args.users, args.batch).astype(np.int32)
        for _ in range(args.reqs + 1)
    ]

    # Tunnel RTT varies run to run; every timing below is the best of
    # REPS repetitions (least background interference), mirroring
    # bench.py's pinned-comparator protocol.
    REPS = 3

    def best_of(fn):
        return min(fn() for _ in range(REPS))

    for quant in (False, True):
        r = Retriever.from_params(model, params, bundle, quantize=quant)
        # warm the ladder shapes (compile) with the throwaway batch
        r.recommend(batches[0], k=args.k)

        def seq():
            t0 = time.perf_counter()
            for b in batches[1:]:
                scores, items = r.recommend(b, k=args.k)
            assert items.shape == (args.batch, args.k)
            return time.perf_counter() - t0

        dt = best_of(seq)
        per_req_ms = dt / args.reqs * 1e3
        qps = args.reqs * args.batch / dt
        print(
            f"catalog={'int8' if quant else 'f32 '}  "
            f"{per_req_ms:7.2f} ms / {args.batch}-user request  "
            f"{qps:10,.0f} users/s  (k={args.k}, {args.items} items)"
        )

    # --- past the tunnel RTT: pipelined and micro-batched request APIs ---
    # Sequential per-request serving is RTT-bound (~5 ms device compute
    # under ~80-90 ms round trip).  recommend_pipelined dispatches D
    # requests before fetching any result (overlapped RTTs);
    # recommend_many coalesces M requests into one dispatch.
    r = Retriever.from_params(model, params, bundle)
    r.recommend(batches[0], k=args.k)  # warm
    print("\npipelined (depth = requests in flight before any fetch):")
    for depth in (1, 4, 16, 64):
        reqs = [
            rng.integers(0, args.users, args.batch).astype(np.int32)
            for _ in range(depth)
        ]
        r.recommend_pipelined(reqs, k=args.k)  # warm any new shapes

        def piped():
            t0 = time.perf_counter()
            out = r.recommend_pipelined(reqs, k=args.k)
            assert len(out) == depth
            return time.perf_counter() - t0

        dt = best_of(piped)
        print(
            f"  depth {depth:3d}: {dt / depth * 1e3:7.2f} ms/req amortized "
            f"{depth * args.batch / dt:10,.0f} users/s"
        )
    print("micro-batched (M requests coalesced into one dispatch):")
    for m in (1, 4, 16, 64):
        reqs = [
            rng.integers(0, args.users, args.batch).astype(np.int32)
            for _ in range(m)
        ]
        r.recommend_many(reqs, k=args.k)  # warm the coalesced shape

        def many():
            t0 = time.perf_counter()
            out = r.recommend_many(reqs, k=args.k)
            assert len(out) == m and out[0][1].shape == (args.batch, args.k)
            return time.perf_counter() - t0

        dt = best_of(many)
        print(
            f"  M = {m:3d}: {dt / m * 1e3:7.2f} ms/req amortized "
            f"{m * args.batch / dt:10,.0f} users/s"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
