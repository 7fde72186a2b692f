"""Command-line entry point.

Mirrors the reference CLI (main.py:590-621):
``train`` / ``test`` modes, ``--model_name --core --epochs --model_path
--no_brand --brand_loss --debug --use_pretrained_emb``, seed 42, and the
checkpoint-name encoding of main.py:613-615 — plus fixes the reference's
hard-coded dataset dir (main.py:58) with ``--dataset`` / ``--data_root``
/ ``--processed_dir`` selectors and adds ``prepare`` (offline ETL,
reproducing all five dataset recipes), ``recommend`` (serving: masked
top-k from a trained checkpoint, optional int8 catalog), ``--resume``,
and ``--mesh DATA,MODEL`` / ``--schedule`` for sharded multi-chip
training (parallel/spmd.py, parallel/halo.py).

Run as ``python -m gcn_recommendation_tpu.cli <mode> ...`` or via the
package main (``python -m gcn_recommendation_tpu ...``).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Run GNN-based recommendation models (TPU-native).")
    sub = p.add_subparsers(dest="mode", required=True)

    def add_common(sp):
        sp.add_argument("--model_name", type=str, default="LightGCN",
                        help="The name of the model class.")
        sp.add_argument("--core", type=int, default=16,
                        help="K-core filtering threshold for data.")
        sp.add_argument("--dataset", type=str, default="steam_emb",
                        help="Dataset recipe name (see config.DATASET_DIR_TEMPLATES).")
        sp.add_argument("--data_root", type=str, default=".",
                        help="Prefix for dataset directories.")
        sp.add_argument("--processed_dir", type=str, default=None,
                        help="Explicit processed-data dir (overrides --dataset).")
        sp.add_argument("--no_brand", action="store_true",
                        help="Run ablation study without brand info.")
        sp.add_argument("--debug", action="store_true",
                        help="Enable debug mode for a quick run.")
        sp.add_argument("--use_pretrained_emb", action="store_true",
                        help="Initialize item embeddings with pretrained text embeddings.")
        sp.add_argument("--seed", type=int, default=42)
        sp.add_argument("--output_root", type=str, default=None,
                        help="Root for exp/ outputs (checkpoints + results); "
                             "default: current directory.")
        sp.add_argument("--debug_nans", action="store_true",
                        help="Enable jax_debug_nans (abort on NaN/Inf in any op).")
        sp.add_argument("--compute_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="Propagation storage dtype; bfloat16 halves the "
                             "propagated block's HBM footprint (f32 accumulate, "
                             "see PERF.md for measured accuracy impact).")
        sp.add_argument("--tile_spmm", action="store_true",
                        help="Pallas block-sparse tile propagation for the "
                             "dense row-block mass of heavy-tailed graphs "
                             "(graph/tiles.py; single-device only).")
        sp.add_argument("--tile_min_fill", type=int, default=64,
                        help="Break-even edge count per 128x128 tile.")
        sp.add_argument("--profile_dir", type=str, default=None,
                        help="Write jax.profiler traces (one per epoch) under "
                             "this dir for TensorBoard/xprof; equivalent to "
                             "setting GCN_TPU_TRACE_DIR.")
        sp.add_argument("--mesh", type=str, default=None,
                        help="DATA,MODEL device-mesh shape for sharded "
                             "execution (e.g. '2,4' = batch/eval users over "
                             "2-way data parallel, tables+catalog row-sharded "
                             "4-way). Default: single device.")
        sp.add_argument("--schedule", type=str, default="auto",
                        choices=["auto", "gspmd", "halo"],
                        help="Sharded propagation schedule: 'halo' (explicit "
                             "per-layer all-gather shard_map — parallel/halo.py, "
                             "~40x fewer collectives, the measured pod "
                             "recommendation in docs/SCALING.md) or 'gspmd' (XLA "
                             "places collectives). 'auto' (default) picks halo "
                             "whenever the model axis is sharded, gspmd for "
                             "pure data parallelism.")

    tr = sub.add_parser("train", help="Train a model.")
    add_common(tr)
    tr.add_argument("--epochs", type=int, default=150, help="Number of training epochs.")
    tr.add_argument("--brand_loss", action="store_true",
                    help="Enable author/brand preference loss.")
    tr.add_argument("--fusion_id_init", action="store_true",
                    help="LightGCN_Fusion: also initialize the trainable item "
                         "ID table from the pretrained matrix (the 'fusemb' "
                         "experiment variant; reference lightgcn_fusion.py:21).")
    tr.add_argument("--resume", action="store_true",
                    help="Resume from the rolling 'last' checkpoint.")
    tr.add_argument("--batch_size", type=int, default=None)
    tr.add_argument("--learning_rate", type=float, default=None)
    tr.add_argument("--val_interval", type=int, default=None,
                    help="Validate every N epochs (default 5, main.py:66).")
    te = sub.add_parser("test", help="Evaluate a trained checkpoint on the test split.")
    add_common(te)
    te.add_argument("--model_path", type=str, default=None,
                    help="Path to checkpoint dir for testing.")

    rc = sub.add_parser("recommend",
                        help="Serve top-k recommendations from a trained checkpoint.")
    add_common(rc)
    rc.add_argument("--model_path", type=str, default=None,
                    help="Path to checkpoint dir (default: the train-mode location).")
    rc.add_argument("--users", type=str, default=None,
                    help="Comma-separated user ids; default: a random sample.")
    rc.add_argument("--num_sample", type=int, default=8,
                    help="How many users to sample when --users is not given.")
    rc.add_argument("--k", type=int, default=None,
                    help="Top-k size (default: config top_k).")
    rc.add_argument("--int8", action="store_true",
                    help="Serve from the int8-quantized item catalog (Pallas "
                         "stochastic-rounding quantizer; ~98%% top-20 "
                         "agreement).  Composes with --mesh: the int8 table "
                         "is row-sharded and scored per item shard.")
    rc.add_argument("--include_seen", action="store_true",
                    help="Do not filter the user's train-seen items.")

    sv = sub.add_parser("serve",
                        help="Run the HTTP serving daemon (server.py): "
                             "micro-batched top-k over a trained checkpoint.")
    add_common(sv)
    sv.add_argument("--model_path", type=str, default=None,
                    help="Path to checkpoint dir (default: the train-mode location).")
    sv.add_argument("--int8", action="store_true",
                    help="Serve from the int8-quantized item catalog.")
    sv.add_argument("--host", type=str, default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8000,
                    help="TCP port (0 = pick a free one and print it).")
    sv.add_argument("--max_coalesce", type=int, default=16,
                    help="Max queued requests coalesced into one device "
                         "dispatch (PERF.md: M<=16 at books scale).")
    sv.add_argument("--max_request_users", type=int, default=8192,
                    help="Reject /recommend requests with more users than "
                         "this (400) — protects the single dispatcher "
                         "thread from one oversized device batch.")
    sv.add_argument("--warm_batch", type=int, default=0,
                    help="Warm the coalesced-dispatch compile ladder at "
                         "startup with dummy requests of this many users "
                         "(0 = off).  PERF.md: cold coalesce shapes "
                         "compiled mid-traffic cost 4.4x QPS on a fresh "
                         "process; set this to your typical request size "
                         "in production.")

    pr = sub.add_parser("prepare", help="Offline data preparation (ETL).")
    pr.add_argument("--recipe", type=str, required=True,
                    help="One of: amazon_books, amazon_books_emb, "
                         "amazon_books_senti, amazon_sport_emb, steam_emb, synthetic")
    pr.add_argument("--core", type=int, default=None, help="K-core threshold.")
    pr.add_argument("--review_path", type=str, default=None)
    pr.add_argument("--meta_path", type=str, default=None)
    pr.add_argument("--output_dir", type=str, default=None)
    # synthetic-recipe knobs
    pr.add_argument("--num_users", type=int, default=10000)
    pr.add_argument("--num_items", type=int, default=5000)
    pr.add_argument("--num_brands", type=int, default=200)
    pr.add_argument("--mean_degree", type=float, default=25.0)
    pr.add_argument("--embedding_dim", type=int, default=None)
    pr.add_argument("--style", type=str, default="popularity",
                    choices=["popularity", "latent"],
                    help="Synthetic data flavor (latent = learnable structure).")
    # latent-style regime knobs (see data/synthetic.py: temperature/dim set
    # how predictable taste is; emb_noise derives informative content
    # embeddings from the item factors; brand_style=latent clusters brands
    # in taste space)
    pr.add_argument("--latent_dim", type=int, default=16)
    pr.add_argument("--temperature", type=float, default=0.35)
    pr.add_argument("--pop_scale", type=float, default=0.5,
                    help="Popularity-bias scale (latent style) — high values "
                         "concentrate taste on globally popular items "
                         "(the dense steam-like regime).")
    pr.add_argument("--emb_noise", type=float, default=None,
                    help="If set (latent style), item_embeddings.npy is a "
                         "noisy projection of the true item factors instead "
                         "of pure noise.")
    pr.add_argument("--brand_style", type=str, default="random",
                    choices=["random", "latent"])
    # curve-shape knobs (round-5: reproduce the reference's rating-rank
    # split and late-climb training curves — data/synthetic.py)
    pr.add_argument("--split", type=str, default="random",
                    choices=["random", "rank"],
                    help="Leave-one-out mode: 'rank' holds out each user's "
                         "highest realized-preference item (the reference "
                         "recipes' rating-rank protocol).")
    pr.add_argument("--pop_df", type=float, default=None,
                    help="Student-t df for heavy-tailed popularity logits.")
    pr.add_argument("--pop_zipf", type=float, default=None,
                    help="Exact-Zipf popularity exponent (overrides "
                         "pop_df/pop_scale's distribution).")
    pr.add_argument("--deg_sigma", type=float, default=0.5,
                    help="Lognormal sigma of per-user degrees.")
    pr.add_argument("--spectrum", type=float, default=0.0,
                    help="Power-law decay of taste-factor variances.")
    pr.add_argument("--rank_key", type=str, default="full",
                    choices=["full", "taste"],
                    help="Rank-split ordering key: 'taste' ranks by the "
                         "taste score alone (rating-rank analogue; "
                         "popularity excluded), 'full' by the sampling "
                         "key.")
    pr.add_argument("--taste_style", type=str, default="gaussian",
                    choices=["gaussian", "cluster"],
                    help="Factor-loading distribution: 'cluster' gives "
                         "community-structured interactions (latent_dim = "
                         "community count) - the real-co-purchase curve-"
                         "shape mechanism, see REGIMES.md.")
    pr.add_argument("--clusters_per_user", type=int, default=3)
    pr.add_argument("--emb_style", type=str, default="informative",
                    choices=["informative", "mislead"],
                    help="'mislead' writes content embeddings that "
                         "conflict with taste (permuted factors).")
    pr.add_argument("--seed", type=int, default=42)
    return p


def _make_config(args):
    from gcn_recommendation_tpu.config import Config

    if getattr(args, "debug_nans", False):
        import jax

        jax.config.update("jax_debug_nans", True)
    if getattr(args, "profile_dir", None):
        # utils/profiling.trace picks this up around every epoch scan
        os.environ["GCN_TPU_TRACE_DIR"] = args.profile_dir
    kwargs = dict(
        model_name=args.model_name,
        dataset=args.dataset,
        core=args.core,
        data_root=args.data_root,
        processed_data_dir=args.processed_dir,
        use_brand=not args.no_brand,
        debug=args.debug,
        use_pretrained_emb=args.use_pretrained_emb,
        seed=args.seed,
        debug_nans=getattr(args, "debug_nans", False),
        compute_dtype=getattr(args, "compute_dtype", "float32"),
        tile_spmm=getattr(args, "tile_spmm", False),
        tile_min_fill=getattr(args, "tile_min_fill", 64),
    )
    if getattr(args, "output_root", None):
        kwargs["checkpoint_dir"] = os.path.join(
            args.output_root, "exp", "checkpoints", "checkpoints"
        )
        kwargs["results_dir"] = os.path.join(
            args.output_root, "exp", "results", "results"
        )
    if args.mode == "train":
        kwargs["epochs"] = args.epochs
        kwargs["brand_loss"] = args.brand_loss
        kwargs["fusion_id_init"] = getattr(args, "fusion_id_init", False)
        if args.batch_size is not None:
            kwargs["batch_size"] = args.batch_size
        if args.learning_rate is not None:
            kwargs["learning_rate"] = args.learning_rate
        if getattr(args, "val_interval", None) is not None:
            kwargs["val_interval"] = args.val_interval
    return Config(**kwargs)


def _load_everything(config):
    from gcn_recommendation_tpu.data.loader import load_preprocessed_data
    from gcn_recommendation_tpu.models import get_model
    import jax

    # device banner (parity with main.py:60 "Using device: ...")
    print(f"Using device: {jax.devices()[0]}")

    pretrained = None
    if config.use_pretrained_emb or config.model_name == "LightGCN_Fusion":
        if os.path.exists(config.pretrained_emb_path):
            print(f"Loading pretrained item embeddings from {config.pretrained_emb_path}")
            pretrained = np.load(config.pretrained_emb_path)
        elif config.use_pretrained_emb:
            print(
                f"WARNING: --use_pretrained_emb was set, but file not found at "
                f"{config.pretrained_emb_path}. Using random initialization."
            )

    bundle = load_preprocessed_data(
        config.data_dir, use_brand=config.use_brand, debug=config.debug
    )
    model_cls = get_model(config.model_name)
    model = model_cls(
        bundle.num_users,
        bundle.num_items,
        bundle.num_brands,
        config,
        pretrained_item_emb=pretrained,
    )
    return bundle, model


def _build_mesh(args):
    """('data','model') Mesh from --mesh, or None for single device."""
    mesh_arg = getattr(args, "mesh", None)
    if not mesh_arg:
        return None

    import jax

    from gcn_recommendation_tpu.core.distributed import initialize
    from gcn_recommendation_tpu.core.mesh import MeshSpec, create_mesh

    initialize()  # no-op single-host; jax.distributed on a pod
    try:
        data, model_par = (int(x) for x in mesh_arg.split(","))
    except ValueError:
        raise ValueError(f"--mesh must be 'DATA,MODEL', got {mesh_arg!r}") from None
    n = len(jax.devices())
    if data * model_par != n:
        raise ValueError(
            f"--mesh {data}x{model_par} needs {data * model_par} devices, "
            f"have {n}"
        )
    return create_mesh(MeshSpec(data=data, model=model_par))


def _pick_schedule(args, mesh):
    schedule = getattr(args, "schedule", "auto") or "auto"
    if schedule == "auto":
        # docs/SCALING.md: the halo schedule's static collective count is
        # ~40x lower than GSPMD's on the model axis; gspmd stays the pure-DP
        # path (model=1 has no halo to exchange)
        from gcn_recommendation_tpu.core.mesh import MODEL_AXIS

        schedule = "halo" if mesh.shape[MODEL_AXIS] > 1 else "gspmd"
    return schedule


def _make_trainer(config, model, bundle, logger, args):
    """Single-device Trainer, or a sharded one when --mesh is given."""
    from gcn_recommendation_tpu.train.trainer import Trainer

    mesh = _build_mesh(args)
    if mesh is None:
        return Trainer(config, model, bundle, logger=logger)
    schedule = _pick_schedule(args, mesh)
    print(f"Sharded execution: mesh {dict(mesh.shape)}, "
          f"schedule={schedule}")
    if schedule == "halo":
        from gcn_recommendation_tpu.parallel.halo import HaloTrainer

        return HaloTrainer(config, model, bundle, mesh, logger=logger)
    from gcn_recommendation_tpu.parallel.spmd import ShardedTrainer

    return ShardedTrainer(config, model, bundle, mesh, logger=logger)


def run_train(args) -> int:
    from gcn_recommendation_tpu.utils.logging import Logger

    config = _make_config(args)
    bundle, model = _load_everything(config)
    logger = Logger(config.results_dir, config.logger_name(), top_k=config.top_k)
    trainer = _make_trainer(config, model, bundle, logger, args)
    print("\nStep 2: Starting model training...")
    if config.use_brand:
        print(
            f"Author Loss Config: brand_loss={config.brand_loss}, "
            f"weight={config.brand_loss_weight}"
        )
    trainer.fit(resume=args.resume)
    print("Training finished.")
    return 0


def _restore_best_params(config, args, model):
    """Load the best checkpoint's params for test/recommend modes."""
    import jax
    import optax

    from gcn_recommendation_tpu.utils import checkpoint as ckpt

    ckpt_dir = args.model_path or os.path.join(
        config.checkpoint_dir, config.checkpoint_name()
    )
    params = model.init(jax.random.PRNGKey(config.seed))
    opt_state = optax.adam(config.learning_rate).init(params)
    restored = ckpt.load_best(ckpt_dir, params, opt_state)
    if restored is None:
        raise FileNotFoundError(f"Model checkpoint not found at '{ckpt_dir}'")
    print(f"Model loaded from '{ckpt_dir}'")
    return restored[0]


def run_test(args) -> int:
    from gcn_recommendation_tpu.data.loader import Interactions
    from gcn_recommendation_tpu.ops.spmm import to_device_graph_auto
    from gcn_recommendation_tpu.train.evaluate import evaluate
    import jax.numpy as jnp

    config = _make_config(args)
    bundle, model = _load_everything(config)
    params = _restore_best_params(config, args, model)

    print("Evaluating on the TEST set...")
    # test-time filter = train + val (main.py:576)
    filt = Interactions(
        np.concatenate([bundle.train.user_idx, bundle.val.user_idx]),
        np.concatenate([bundle.train.item_idx, bundle.val.item_idx]),
    )
    mesh = _build_mesh(args)
    if mesh is not None:
        # sharded test-time eval (round-2 VERDICT #5): forward through the
        # schedule's sharded propagation, items row-sharded over 'model',
        # eval users split over 'data' (parallel/spmd.py)
        from gcn_recommendation_tpu.parallel.spmd import evaluate_sharded

        trainer = _make_trainer(config, model, bundle, None, args)
        sp = trainer.model.pad_state_tree(params)
        sp, _ = trainer._place_state(sp, ())
        fu, fi, *_ = trainer._forward_eval(sp)
        recall, ndcg = evaluate_sharded(
            mesh, fu, fi, bundle.test, filt,
            bundle.num_users, bundle.num_items,
            config.top_k, config.eval_user_batch,
        )
    else:
        recall, ndcg = evaluate(
            model,
            params,
            to_device_graph_auto(
                bundle.graph,
                compute_dtype=jnp.dtype(config.compute_dtype),
                embedding_dim=config.embedding_dim,
            ),
            bundle.test,
            filt,
            bundle.num_users,
            bundle.num_items,
            config.top_k,
            config.eval_user_batch,
        )
    print("\n--- Final Test Results ---")
    print(f"Recall@{config.top_k}: {recall:.4f}")
    print(f"NDCG@{config.top_k}:   {ndcg:.4f}")
    print("--------------------------")
    return 0


def run_recommend(args) -> int:
    """Serving entry: checkpoint -> one propagation -> masked top-k.

    No reference counterpart (retrieval only exists inside evaluate(),
    main.py:404-439); this exposes serve.Retriever on the CLI.
    """
    from gcn_recommendation_tpu.serve import Retriever

    config = _make_config(args)
    bundle, model = _load_everything(config)

    # validate cheap inputs BEFORE the expensive restore + propagation
    k = config.top_k if args.k is None else args.k
    if not 0 < k <= bundle.num_items:
        raise ValueError(f"--k must be in [1, {bundle.num_items}], got {k}")
    if args.users:
        users = np.array([int(u) for u in args.users.split(",")], np.int32)
        bad = users[(users < 0) | (users >= bundle.num_users)]
        if len(bad):
            raise ValueError(f"user ids out of range [0, {bundle.num_users}): {bad.tolist()}")
    else:
        users = np.random.default_rng(config.seed).integers(
            0, bundle.num_users, args.num_sample
        ).astype(np.int32)

    params = _restore_best_params(config, args, model)
    mesh = _build_mesh(args)
    retriever = Retriever.from_params(
        model, params, bundle, quantize=args.int8, mesh=mesh
    )
    scores, items = retriever.recommend(
        users, k=k, filter_seen=not args.include_seen
    )
    catalog = "int8" if args.int8 else "f32"
    print(f"Top-{k} recommendations ({catalog} catalog, "
          f"{'seen items included' if args.include_seen else 'seen items filtered'}):")
    for u, s_row, i_row in zip(users, scores, items):
        pairs = " ".join(f"{i}:{v:.3f}" for i, v in zip(i_row, s_row))
        print(f"user {u}: {pairs}")
    return 0


def run_serve(args) -> int:
    """Serving daemon entry: checkpoint -> Retriever -> HTTP loop."""
    from gcn_recommendation_tpu.serve import Retriever
    from gcn_recommendation_tpu.server import RecommendServer

    config = _make_config(args)
    bundle, model = _load_everything(config)
    params = _restore_best_params(config, args, model)
    mesh = _build_mesh(args)
    retriever = Retriever.from_params(
        model, params, bundle, quantize=args.int8, mesh=mesh
    )
    # warm the common ladder shape so the first real request doesn't
    # pay a (slow, remote) compile
    retriever.recommend(np.zeros(1, np.int32), k=config.top_k)

    def reload_retriever():
        """POST /reload target: re-read the checkpoint from disk and
        rebuild.  Runs on the server's dispatcher thread — the only
        thread allowed to dispatch device work (axon rule); mirrors the
        reference's on-demand checkpoint load (main.py:571)."""
        new_params = _restore_best_params(config, args, model)
        return Retriever.from_params(
            model, new_params, bundle, quantize=args.int8, mesh=mesh
        )

    server = RecommendServer(
        retriever, bundle.num_users, host=args.host, port=args.port,
        max_coalesce=args.max_coalesce,
        max_request_users=args.max_request_users,
        reload_fn=reload_retriever,
        warm=(args.warm_batch, config.top_k) if args.warm_batch else None,
    )
    print(f"serving on http://{args.host}:{server.port} "
          f"({'int8' if args.int8 else 'f32'} catalog, "
          f"max_coalesce={args.max_coalesce})", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


def run_prepare(args) -> int:
    from gcn_recommendation_tpu.data import prepare

    return prepare.run_recipe(args)


def _enable_compile_cache():
    """Persistent XLA compilation cache — remote (axon) compiles are slow."""
    try:
        import jax

        cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main(argv=None) -> int:
    # CI/test hook: the axon TPU plugin ignores JAX_PLATFORMS, so honor an
    # explicit override through the config API before backend init
    forced = os.environ.get("GCN_TPU_FORCE_PLATFORM")
    if forced:
        import jax

        jax.config.update("jax_platforms", forced)
    args = build_parser().parse_args(argv)
    _enable_compile_cache()
    np.random.seed(args.seed if hasattr(args, "seed") else 42)  # main.py:607
    if args.mode == "train":
        return run_train(args)
    if args.mode == "test":
        return run_test(args)
    if args.mode == "recommend":
        return run_recommend(args)
    if args.mode == "serve":
        return run_serve(args)
    if args.mode == "prepare":
        return run_prepare(args)
    raise ValueError(args.mode)


if __name__ == "__main__":
    sys.exit(main())
