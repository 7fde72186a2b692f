"""Experiment: per-component decomposition of the single-chip train step.

Round-2 verdict: the bench step measures 38.8 ms against a ~29 ms
gather-issue speed-of-light estimate, and the ~25% residual was never
attributed.  This tool times each component of the step in isolation on
the real TPU (bench graph: 50k users / 20k items / 2k brands, dim 64,
3 layers, batch 2048 — the main.py:488-526 hot-loop shape) so PERF.md
can carry a per-op table, and measures the candidate fixes:

* ablation ladder: full step -> fixed negatives (sampler removed) ->
  SGD instead of Adam -> dot-loss (batch gather/scatter removed) ->
  fwd+bwd propagation only -> fwd only;
* micro timings: hub matmul, merge/restore gather, one propagation
  with/without hub rows;
* sampler variants: production rounds=6 sequential redraw loop vs a
  batched one-pass draw (all 6 candidates up front, ONE vectorized
  membership search over [B, 6], pick the first non-colliding — same
  distribution, 1/6th the sequential depth).

Timing per PERF.md: chain >= CHAIN iterations through a data dependency
inside one scan dispatch, fetch one scalar (block_until_ready is a no-op
on axon).  All large device arrays ride through jit as ARGUMENTS (the
pytree ``A``), never closure constants.

Run on the TPU host:  python tools/exp_step_profile.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NUM_USERS = 50_000
NUM_ITEMS = 20_000
NUM_BRANDS = 2_000
MEAN_DEGREE = 28.0
DIM = 64
LAYERS = 3
BATCH = 2048
CHAIN = 40


def main():
    import jax
    import jax.numpy as jnp
    import optax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from gcn_recommendation_tpu.config import Config
    from gcn_recommendation_tpu.data.sampler import (
        binary_search_iters,
        membership_arrays,
        sample_negatives,
    )
    from gcn_recommendation_tpu.data.synthetic import synthetic_bundle
    from gcn_recommendation_tpu.models import get_model
    from gcn_recommendation_tpu.ops.spmm import (
        _bucket_reduce,
        propagate_ell,
        to_device_graph,
    )
    from gcn_recommendation_tpu.train.loss import bpr_loss_reg

    bundle = synthetic_bundle(
        num_users=NUM_USERS,
        num_items=NUM_ITEMS,
        num_brands=NUM_BRANDS,
        mean_degree=MEAN_DEGREE,
        core=8,
        seed=42,
    )
    g = bundle.graph
    n = g.num_nodes
    dg = to_device_graph(g, fuse_layers=False)   # per-layer baseline
    dg_fused = to_device_graph(g, fuse_layers=True)  # merge-skip views
    cfg = Config(embedding_dim=DIM, n_layers=LAYERS, batch_size=BATCH)
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(cfg.learning_rate)
    opt_state = tx.init(params)

    user_ptr, flat_items = membership_arrays(
        bundle.train.user_idx, bundle.train.item_idx, bundle.num_users
    )
    n_iters = binary_search_iters(user_ptr)
    n_train = len(bundle.train)

    padded_rows = sum(b.nbr_idx.size for b in g.buckets)
    print(
        f"graph: nodes={n} nnz={g.nnz} buckets={len(g.buckets)} "
        f"padded_rows={padded_rows} hubs={len(g.dense_node_ids)} "
        f"sampler n_iters={n_iters}",
        flush=True,
    )

    rng = np.random.default_rng(0)
    batch_idx0 = jnp.asarray(
        rng.integers(0, n_train, (CHAIN, BATCH)).astype(np.int32)
    )
    # every big device array rides through jit as an ARGUMENT (never a
    # closure constant — closures bake them into the HLO; CLAUDE.md rule)
    A = dict(
        dg=dg,
        train_users=jnp.asarray(bundle.train.user_idx),
        train_items=jnp.asarray(bundle.train.item_idx),
        user_ptr=jnp.asarray(user_ptr),
        flat_items=jnp.asarray(flat_items),
    )
    A_fused = dict(A, dg=dg_fused)
    results = {}

    def timed(name, fn, *args, divisor=CHAIN):
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        _ = float(jfn(*args))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(jfn(*args))
            best = min(best, time.perf_counter() - t0)
        ms = best / divisor * 1e3
        results[name] = ms
        print(f"{name:34s} {ms:8.3f} ms/step   (compile+first {compile_s:.1f}s)",
              flush=True)
        return ms

    # ---------------- step-level ablation ladder ----------------
    def batch_loss(p, arrs, users, pos, neg):
        fu_all, fi_all, _, u0_all, i0_all = model.apply(p, arrs["dg"])
        fu = jnp.take(fu_all, users, axis=0)
        fp = jnp.take(fi_all, pos, axis=0)
        fn_ = jnp.take(fi_all, neg, axis=0)
        iu = jnp.take(u0_all, users, axis=0)
        ip = jnp.take(i0_all, pos, axis=0)
        in_ = jnp.take(i0_all, neg, axis=0)
        return bpr_loss_reg(fu, fp, fn_, iu, ip, in_, cfg.weight_decay)

    def full_step(params, opt_state, key, batches, arrs):
        def body(carry, bidx):
            params, opt_state, key = carry
            key, k1 = jax.random.split(key)
            users = jnp.take(arrs["train_users"], bidx)
            pos = jnp.take(arrs["train_items"], bidx)
            neg = sample_negatives(
                k1, users, arrs["user_ptr"], arrs["flat_items"],
                num_items=bundle.num_items, n_iters=n_iters,
            )
            loss, grads = jax.value_and_grad(
                lambda p: batch_loss(p, arrs, users, pos, neg)
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        (params, _, _), losses = jax.lax.scan(
            body, (params, opt_state, key), batches
        )
        return jnp.sum(losses)

    def step_fixed_neg(params, opt_state, neg0, batches, arrs):
        def body(carry, bidx):
            params, opt_state = carry
            users = jnp.take(arrs["train_users"], bidx)
            pos = jnp.take(arrs["train_items"], bidx)
            loss, grads = jax.value_and_grad(
                lambda p: batch_loss(p, arrs, users, pos, neg0)
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, _), losses = jax.lax.scan(body, (params, opt_state), batches)
        return jnp.sum(losses)

    def step_sgd(params, neg0, batches, arrs):
        def body(params, bidx):
            users = jnp.take(arrs["train_users"], bidx)
            pos = jnp.take(arrs["train_items"], bidx)
            loss, grads = jax.value_and_grad(
                lambda p: batch_loss(p, arrs, users, pos, neg0)
            )(params)
            params = jax.tree.map(lambda p, g_: p - 1e-3 * g_, params, grads)
            return params, loss

        params, losses = jax.lax.scan(body, params, batches)
        return jnp.sum(losses)

    def step_dotloss(params, opt_state, batches, arrs):
        """Adam step whose loss skips the batch gathers: a fixed linear
        functional of the three final tables.  The backward pass still
        runs all 6 propagations but no 2048-row gathers and no
        scatter-adds back into [N, d] cotangents."""

        def body(carry, bidx):
            params, opt_state = carry

            def loss_fn(p):
                fu_all, fi_all, fb_all, _, _ = model.apply(p, arrs["dg"])
                return jnp.mean(fu_all) + jnp.mean(fi_all) + jnp.mean(fb_all)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, _), losses = jax.lax.scan(body, (params, opt_state), batches)
        return jnp.sum(losses)

    key = jax.random.PRNGKey(7)
    neg0 = jnp.asarray(
        np.random.default_rng(1).integers(0, bundle.num_items, BATCH)
        .astype(np.int32)
    )
    timed("full_step (per-layer)", full_step, params, opt_state, key, batch_idx0, A)
    timed("full_step (fused merge-skip)", full_step, params, opt_state, key,
          batch_idx0, A_fused)
    timed("step fixed-neg", step_fixed_neg, params, opt_state, neg0,
          batch_idx0, A)
    timed("step fixed-neg+sgd", step_sgd, params, neg0, batch_idx0, A)
    timed("step dot-loss (no batch rows)", step_dotloss, params, opt_state,
          batch_idx0, A)

    # ---------------- propagation-only chains ----------------
    ego0 = jnp.concatenate(
        [params["user_embedding"], params["item_embedding"],
         params["brand_embedding"]]
    )

    def fwd_chain(ego, arrs):
        dg = arrs["dg"]

        def body(e, _):
            acc = e
            x = e
            for _ in range(LAYERS):
                x = propagate_ell(
                    x, dg.bucket_nbr_idx, dg.bucket_nbr_w, dg.gather_idx,
                    dg.dense_mat,
                )
                acc = acc + x
            return acc / (LAYERS + 1), None

        e, _ = jax.lax.scan(body, ego, None, length=CHAIN)
        return jnp.sum(e)

    def fwdbwd_chain(ego, arrs):
        dg = arrs["dg"]

        def loss(e):
            acc = e
            x = e
            for _ in range(LAYERS):
                x = propagate_ell(
                    x, dg.bucket_nbr_idx, dg.bucket_nbr_w, dg.gather_idx,
                    dg.dense_mat,
                )
                acc = acc + x
            return jnp.sum((acc / (LAYERS + 1)) ** 2)

        def body(e, _):
            return e - 1e-6 * jax.grad(loss)(e), None

        e, _ = jax.lax.scan(body, ego, None, length=CHAIN)
        return jnp.sum(e)

    timed("fwd 3-layer", fwd_chain, ego0, A)
    timed("fwd+bwd 3-layer", fwdbwd_chain, ego0, A)

    # single propagation, with and without the hub matmul / merge gather
    def prop1(e, arrs):
        dg = arrs["dg"]

        def body(x, _):
            return propagate_ell(
                x, dg.bucket_nbr_idx, dg.bucket_nbr_w, dg.gather_idx,
                dg.dense_mat,
            ), None

        x, _ = jax.lax.scan(body, e, None, length=CHAIN)
        return jnp.sum(x)

    def prop1_nohub(e, arrs):
        dg = arrs["dg"]

        def body(x, _):
            parts = [
                _bucket_reduce(x, idx, w).astype(x.dtype)
                for idx, w in zip(dg.bucket_nbr_idx, dg.bucket_nbr_w)
            ]
            parts.append(
                jnp.zeros((dg.dense_mat.shape[0] + 1, x.shape[1]), x.dtype)
            )
            return jnp.concatenate(parts, axis=0)[dg.gather_idx], None

        x, _ = jax.lax.scan(body, e, None, length=CHAIN)
        return jnp.sum(x)

    def buckets_only(e, arrs):
        """Bucket gathers+reduce only — result folded back elementwise
        (no merge gather, no hub)."""
        dg = arrs["dg"]

        def body(x, _):
            s = jnp.zeros((), jnp.float32)
            for idx, w in zip(dg.bucket_nbr_idx, dg.bucket_nbr_w):
                s = s + jnp.sum(_bucket_reduce(x, idx, w))
            return x * (1.0 + 0.0 * s), None

        x, _ = jax.lax.scan(body, e, None, length=CHAIN)
        return jnp.sum(x)

    def hub_only(e, arrs):
        dg = arrs["dg"]

        def body(x, _):
            h = jnp.dot(dg.dense_mat, x, preferred_element_type=jnp.float32)
            return x * (1.0 + 0.0 * jnp.sum(h)), None

        x, _ = jax.lax.scan(body, e, None, length=CHAIN)
        return jnp.sum(x)

    nrows = sum(b.nbr_idx.shape[0] for b in g.buckets) + dg.dense_mat.shape[0] + 1
    parts_tbl = jnp.asarray(
        rng.standard_normal((nrows, DIM)).astype(np.float32)
    )

    def merge_only(tbl, gidx):
        def body(carry, _):
            t, gi = carry
            out = t[gi]
            gi = gi + (0.0 * out[0, 0]).astype(jnp.int32)  # dependency
            return (t, gi), None

        (t, gi), _ = jax.lax.scan(body, (tbl, gidx), None, length=CHAIN)
        return jnp.sum(t) + jnp.sum(gi)

    timed("prop x1 (full)", prop1, ego0, A)
    timed("prop x1 no-hub", prop1_nohub, ego0, A)
    timed("prop x1 buckets-only", buckets_only, ego0, A)
    timed("hub matmul only", hub_only, ego0, A)
    timed("merge/restore gather only", merge_only, parts_tbl, dg.gather_idx)

    # ---------------- sampler variants ----------------
    users0 = jnp.asarray(bundle.train.user_idx[
        np.asarray(batch_idx0[0])
    ].astype(np.int32))

    def sampler_chain(key, users, arrs):
        def body(carry, _):
            key, users = carry
            key, k1 = jax.random.split(key)
            neg = sample_negatives(
                k1, users, arrs["user_ptr"], arrs["flat_items"],
                num_items=bundle.num_items, n_iters=n_iters,
            )
            users = users + 0 * neg  # data dependency
            return (key, users), None

        (key, users), _ = jax.lax.scan(body, (key, users), None, length=CHAIN)
        return jnp.sum(users)

    def _is_positive_b(user_ptr, flat_items, users_col, cands):
        lo = jnp.broadcast_to(user_ptr[users_col], cands.shape)
        hi = jnp.broadcast_to(user_ptr[users_col + 1], cands.shape)
        end = hi
        nfl = flat_items.shape[0]

        def body(_, lohi):
            lo, hi = lohi
            mid = (lo + hi) // 2
            v = flat_items[jnp.minimum(mid, nfl - 1)]
            go_right = v < cands
            return (
                jnp.where(go_right, mid + 1, lo),
                jnp.where(go_right, hi, mid),
            )

        lo, hi = jax.lax.fori_loop(0, n_iters, body, (lo, hi))
        found = flat_items[jnp.minimum(lo, nfl - 1)]
        return (lo < end) & (found == cands)

    def sample_batched(key, users, arrs, n_rounds=6):
        cands = jax.random.randint(
            key, users.shape + (n_rounds,), 0, bundle.num_items,
            dtype=jnp.int32,
        )
        pos = _is_positive_b(
            arrs["user_ptr"], arrs["flat_items"], users[:, None], cands
        )  # [B, R]
        ok = ~pos
        first = jnp.argmax(ok, axis=1).astype(jnp.int32)
        any_ok = jnp.any(ok, axis=1)
        idx = jnp.where(any_ok, first, n_rounds - 1)
        return jnp.take_along_axis(cands, idx[:, None], axis=1)[:, 0]

    def sampler_batched_chain(key, users, arrs):
        def body(carry, _):
            key, users = carry
            key, k1 = jax.random.split(key)
            neg = sample_batched(k1, users, arrs)
            users = users + 0 * neg
            return (key, users), None

        (key, users), _ = jax.lax.scan(body, (key, users), None, length=CHAIN)
        return jnp.sum(users)

    def step_batched_sampler(params, opt_state, key, batches, arrs):
        """The full production step with the batched one-pass sampler
        substituted — the end-to-end number for the candidate fix."""

        def body(carry, bidx):
            params, opt_state, key = carry
            key, k1 = jax.random.split(key)
            users = jnp.take(arrs["train_users"], bidx)
            pos = jnp.take(arrs["train_items"], bidx)
            neg = sample_batched(k1, users, arrs)
            loss, grads = jax.value_and_grad(
                lambda p: batch_loss(p, arrs, users, pos, neg)
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        (params, _, _), losses = jax.lax.scan(
            body, (params, opt_state, key), batches
        )
        return jnp.sum(losses)

    timed("sampler seq rounds=6 (prod)", sampler_chain, key, users0, A)
    timed("sampler batched one-pass", sampler_batched_chain, key, users0, A)
    timed("full_step fused + batch-samp", step_batched_sampler, params,
          opt_state, key, batch_idx0, A_fused)

    # batch index gathers (users/pos from the train arrays)
    def batchgather_chain(batches, arrs):
        def body(carry, bidx):
            users = jnp.take(arrs["train_users"], bidx)
            pos = jnp.take(arrs["train_items"], bidx)
            return carry + jnp.sum(users) + jnp.sum(pos), None

        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), batches)
        return s

    timed("batch idx gathers", batchgather_chain, batch_idx0, A)

    # ---------------- derived attribution ----------------
    print("\n--- attribution (ms/step) ---", flush=True)
    full = results.get("full_step (per-layer)", float("nan"))
    noneg = results.get("step fixed-neg", float("nan"))
    sgd = results.get("step fixed-neg+sgd", float("nan"))
    dot = results.get("step dot-loss (no batch rows)", float("nan"))
    fb = results.get("fwd+bwd 3-layer", float("nan"))
    print(f"sampler (ladder)        {full - noneg:8.3f}")
    print(f"adam - sgd (ladder)     {noneg - sgd:8.3f}")
    print(f"batch rows (ladder)     {sgd - dot + (noneg - sgd):8.3f}   [vs dot-loss, adam kept]")
    print(f"propagation fwd+bwd     {fb:8.3f}")
    print(f"residual (dot - fwdbwd) {dot - fb:8.3f}   [adam + layer-mean bwd + init concat]")
    print(f"sampler isolated        {results.get('sampler seq rounds=6 (prod)'):8.3f}")
    print(f"sampler batched         {results.get('sampler batched one-pass'):8.3f}")
    print(f"full step fused         {results.get('full_step (fused merge-skip)'):8.3f}")
    print(f"full step fused+bsamp   {results.get('full_step fused + batch-samp'):8.3f}")


if __name__ == "__main__":
    main()
