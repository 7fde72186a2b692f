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


def worker(nprocs: int, pid: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from gcn_recommendation_tpu.core import distributed

    active = distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert active == (nprocs > 1), (active, nprocs)
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.local_device_count() == LOCAL_DEVICES

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

    import tempfile

    ckroot = tempfile.mkdtemp(prefix="gcnrec_mp_ck_")
    env["GCNREC_MP_CKPT"] = ckroot

    def launch(phase):
        env["GCNREC_MP_PHASE"] = phase
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), str(nprocs),
                 "--worker", str(i)],
                env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            for i in range(nprocs)
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
    print("multiproc_dryrun PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
