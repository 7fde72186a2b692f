"""Multi-PROCESS dryrun: jax.distributed across real OS processes on CPU.

The virtual 8-device CPU mesh used by the test suite exercises multi-chip
sharding inside ONE process; this tool additionally validates the
multi-HOST layer (core/distributed.initialize + cross-process collectives
— the thing a real pod slice needs) without TPU pod hardware:

* parent spawns N worker processes;
* each worker calls core.distributed.initialize(coordinator, N, pid)
  (the exact call a pod host makes) with 2 virtual CPU devices;
* workers build the global ('data','model') mesh from auto_mesh_spec,
  then run a psum + an all_gather through shard_map spanning processes,
  and a tiny sharded LightGCN forward over the global mesh;
* phases 1/2 run a sharded-checkpoint save -> kill -> resume drill;
* the halo phases run one HaloTrainer epoch + sharded validate on a
  2-process x 4-device (2,4) mesh and assert loss/recall equality with
  the SAME (2,4) mesh inside one 8-device process (round-4 verdict #5:
  halo is the `--schedule auto` pod default, so its process-boundary
  behavior must be exercised, not just the single-process virtual mesh);
* parent checks every worker exits 0 and prints the expected sums.

Usage: python tools/multiproc_dryrun.py [nprocs]   (default 2)

Reference has no counterpart (single-process, single-GPU — SURVEY.md
§2.2); this is the TPU-native framework's multi-host init path
(BASELINE.json north star: N>=2 hosts).
"""

from __future__ import annotations

import os
import subprocess
import sys

# repo root on sys.path (workers are launched by file path, so python only
# adds tools/; PYTHONPATH is avoided repo-wide — it breaks axon discovery)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOCAL_DEVICES = 2
PORT = 49731


def _halo_check(mesh, out_path: str, pid: int) -> None:
    """One HaloTrainer epoch + sharded validate on ``mesh``; pid 0
    writes {avg_loss, recall, ndcg} for the parent's equality check."""
    import json

    from gcn_recommendation_tpu.config import Config
    from gcn_recommendation_tpu.data.synthetic import synthetic_bundle
    from gcn_recommendation_tpu.models import get_model
    from gcn_recommendation_tpu.parallel.halo import HaloTrainer
    from gcn_recommendation_tpu.utils.logging import Logger

    # the checkpoint write is a COLLECTIVE Orbax operation: every process
    # must point at the SAME directory (a per-process mkdtemp deadlocks
    # process>0 waiting for the primary's staging dir under its own path)
    scratch = out_path + ".scratch"
    cfg = Config(
        embedding_dim=16, n_layers=2, batch_size=64, epochs=1,
        val_interval=1,
        checkpoint_dir=os.path.join(scratch, "ck"),
        results_dir=os.path.join(scratch, f"res{pid}"),
    )
    # same seed in both topologies -> identical data; non-divisible
    # brand count exercises the padded row-sharding across processes
    bundle = synthetic_bundle(
        num_users=90, num_items=70, num_brands=11, mean_degree=8.0, seed=1
    )
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    logger = Logger(os.path.join(scratch, f"log{pid}"), "halo",
                    top_k=cfg.top_k)
    trainer = HaloTrainer(cfg, model, bundle, mesh, logger=logger)
    trainer.fit()
    hist = logger.history
    assert hist["epoch"], "halo run produced no validation metrics"
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "avg_loss": hist["epoch_avg_loss"][-1],
                    "recall": hist["recall"][-1],
                    "ndcg": hist["ndcg"][-1],
                },
                f,
            )
        print(f"halo check: loss={hist['epoch_avg_loss'][-1]:.6f} "
              f"recall={hist['recall'][-1]:.6f} -> {out_path}")


def worker(nprocs: int, pid: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from gcn_recommendation_tpu.core import distributed

    local_devices = int(os.environ.get("GCNREC_MP_DEVICES", LOCAL_DEVICES))
    active = distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert active == (nprocs > 1), (active, nprocs)
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.local_device_count() == local_devices

    phase = os.environ.get("GCNREC_MP_PHASE", "1")
    if phase.startswith("halo"):
        from gcn_recommendation_tpu.core.mesh import MeshSpec, create_mesh

        # fixed (2,4) mesh: 2 procs x 4 devices (halo_mp) or 1 proc x 8
        # devices (halo_single) — same shape, same shardings, so the
        # metrics must agree across the process boundary
        mesh = create_mesh(MeshSpec(data=2, model=4))
        out = os.path.join(
            os.environ["GCNREC_MP_CKPT"], f"{phase}.json"
        )
        _halo_check(mesh, out, pid)
        return

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from gcn_recommendation_tpu.core.distributed import auto_mesh_spec
    from gcn_recommendation_tpu.core.mesh import create_mesh

    spec = auto_mesh_spec()
    assert spec.data * spec.model == nprocs * LOCAL_DEVICES
    mesh = create_mesh(spec)

    # cross-process collective: every device contributes its global index;
    # psum must see ALL devices, not just this process's
    n_global = nprocs * LOCAL_DEVICES

    @jax.jit
    @jax.shard_map(mesh=mesh, in_specs=P("data", "model"), out_specs=P())
    def summed(x):
        return jax.lax.psum(jnp.sum(x), ("data", "model"))[None]

    import jax.experimental.multihost_utils as mhu

    local = np.arange(n_global, dtype=np.float32).reshape(spec.data, spec.model)
    garr = mhu.host_local_array_to_global_array(local, mesh, P())
    # replicated output: read this process's local shard
    total = float(np.asarray(summed(garr).addressable_shards[0].data)[0])
    expect = float(n_global * (n_global - 1) / 2)
    assert total == expect, (total, expect)

    # tiny sharded forward over the global mesh (row-sharded tables)
    from gcn_recommendation_tpu.config import Config
    from gcn_recommendation_tpu.data.synthetic import synthetic_bundle
    from gcn_recommendation_tpu.models import get_model
    from gcn_recommendation_tpu.ops.spmm import to_device_graph
    from gcn_recommendation_tpu.parallel.spmd import shard_graph, shard_params

    cfg = Config(embedding_dim=16, n_layers=2, batch_size=64, epochs=1)
    bundle = synthetic_bundle(
        num_users=256, num_items=128, num_brands=16, mean_degree=8.0, seed=0
    )
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    params = shard_params(model.init(jax.random.PRNGKey(0)), mesh)
    graph = shard_graph(to_device_graph(bundle.graph), mesh)
    fu, fi, *_ = jax.jit(model.apply)(params, graph)
    for shard in fu.addressable_shards:
        assert np.isfinite(np.asarray(shard.data)).all()

    # --- multi-host checkpoint -> kill -> resume (pod-mode Orbax path) ---
    # Phase 1 trains 2 epochs and exits right after the collective sharded
    # checkpoint write (the 'kill' — the process is gone before training
    # finishes its nominal schedule).  Phase 2 relaunches the workers,
    # resumes from the 'last' checkpoint, and checks the resumed run's
    # final params match an uninterrupted 4-epoch run exactly (the RNG key
    # stream is checkpointed, so epochs 3-4 replay identically).
    ckroot = os.environ.get("GCNREC_MP_CKPT")
    phase = os.environ.get("GCNREC_MP_PHASE", "1")
    if ckroot:
        from gcn_recommendation_tpu.parallel.spmd import ShardedTrainer

        def make_trainer(ck_sub, epochs):
            c = Config(
                embedding_dim=16, n_layers=2, batch_size=64, epochs=epochs,
                val_interval=2,
                checkpoint_dir=os.path.join(ckroot, ck_sub),
                results_dir=os.path.join(ckroot, ck_sub + "_res"),
            )
            # non-divisible brands on the 2-way model axis -> the padded-TP
            # layout is exercised under real multi-process sharding too
            b = synthetic_bundle(
                num_users=90, num_items=70, num_brands=11, mean_degree=8.0,
                seed=1,
            )
            m = get_model("LightGCN")(
                b.num_users, b.num_items, b.num_brands, c
            )
            return ShardedTrainer(c, m, b, mesh)

        if phase == "1":
            tr = make_trainer("ck", epochs=2)
            _, best = tr.fit()  # checkpoints (sharded, collective) at epoch 2
            assert best > 0.0
            if pid == 0:
                print("multiproc_dryrun: phase 1 — sharded checkpoint written")
        else:
            tr = make_trainer("ck", epochs=4)
            params_resumed, _ = tr.fit(resume=True)
            tr_full = make_trainer("ck_full", epochs=4)
            params_full, _ = tr_full.fit()
            for k in params_resumed:
                a = np.asarray(params_resumed[k].addressable_shards[0].data)
                b = np.asarray(params_full[k].addressable_shards[0].data)
                np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
            if pid == 0:
                print(
                    "multiproc_dryrun: phase 2 — resumed across processes; "
                    "params match the uninterrupted run"
                )

    if pid == 0:
        print(
            f"multiproc_dryrun: {nprocs} processes x {LOCAL_DEVICES} devices — "
            f"psum={total:.0f} (expected {expect:.0f}), sharded forward ok"
        )


def main() -> int:
    nprocs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    if len(sys.argv) > 2 and sys.argv[2] == "--worker":
        worker(nprocs, int(sys.argv[3]))
        return 0

    env = dict(os.environ)
    # drop any inherited device-count flag (e.g. the test suite's =8);
    # XLA takes the LAST occurrence, so it would override ours
    inherited = [
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    ]
    env["XLA_FLAGS"] = " ".join(
        inherited + [f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"]
    )
    env["JAX_PLATFORMS"] = "cpu"

    import json
    import tempfile

    ckroot = tempfile.mkdtemp(prefix="gcnrec_mp_ck_")
    env["GCNREC_MP_CKPT"] = ckroot

    def launch(phase, n_workers=None, devices=LOCAL_DEVICES):
        n_workers = nprocs if n_workers is None else n_workers
        env["GCNREC_MP_PHASE"] = phase
        env["GCNREC_MP_DEVICES"] = str(devices)
        env["XLA_FLAGS"] = " ".join(
            inherited
            + [f"--xla_force_host_platform_device_count={devices}"]
        )
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), str(n_workers),
                 "--worker", str(i)],
                env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            for i in range(n_workers)
        ]
        return [p.wait(timeout=600) for p in procs]

    # phase 1: train + sharded checkpoint, then the processes exit (the
    # 'kill'); phase 2: fresh processes resume and verify against an
    # uninterrupted run
    for phase in ("1", "2"):
        rc = launch(phase)
        if any(rc):
            print(f"multiproc_dryrun FAILED (phase {phase}): exit codes {rc}")
            return 1

    # halo across a real process boundary: the same (2,4) mesh as 2
    # processes x 4 devices and as 1 process x 8 devices; one HaloTrainer
    # epoch + sharded validate must produce the same loss/recall
    for phase, n_workers, devices in (
        ("halo_mp", 2, 4),
        ("halo_single", 1, 8),
    ):
        rc = launch(phase, n_workers=n_workers, devices=devices)
        if any(rc):
            print(f"multiproc_dryrun FAILED (phase {phase}): exit codes {rc}")
            return 1
    with open(os.path.join(ckroot, "halo_mp.json")) as f:
        mp = json.load(f)
    with open(os.path.join(ckroot, "halo_single.json")) as f:
        single = json.load(f)
    for key in ("avg_loss", "recall", "ndcg"):
        if abs(mp[key] - single[key]) > 1e-5 + 1e-4 * abs(single[key]):
            print(
                f"multiproc_dryrun FAILED: halo {key} mismatch across the "
                f"process boundary: 2-proc {mp[key]!r} vs 1-proc "
                f"{single[key]!r}"
            )
            return 1
    print(
        f"halo process-boundary equality: loss {mp['avg_loss']:.6f} "
        f"recall {mp['recall']:.6f} (2x4-device == 1x8-device)"
    )
    print("multiproc_dryrun PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
