"""True CLI integration: run the module entry point as a subprocess."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, extra_env=None):
    # must run from the repo root (package is resolved via cwd);
    # exp/ artifacts land there and are cleaned below
    env = dict(os.environ)
    env["GCN_TPU_FORCE_PLATFORM"] = "cpu"
    env.pop("JAX_PLATFORMS", None)
    if extra_env:
        env.update(extra_env)
    return subprocess.run(
        [sys.executable, "-m", "gcn_recommendation_tpu"] + args,
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )


@pytest.mark.slow
def test_cli_prepare_train_test_roundtrip(tmp_path):
    data = str(tmp_path / "data")
    r = _run(
        ["prepare", "--recipe", "synthetic", "--num_users", "300",
         "--num_items", "200", "--num_brands", "20", "--core", "16",
         "--style", "latent", "--output_dir", data],
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(data, "stats.json"))

    out_root = str(tmp_path / "out")
    # epochs=5 -> one validation pass -> checkpoint written; --output_root
    # keeps all artifacts inside tmp_path (NEVER write to the shared
    # repo-root exp/ from tests — it can race with live training runs)
    r = _run(
        ["train", "--processed_dir", data, "--epochs", "5",
         "--batch_size", "256", "--output_root", out_root],
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Val Recall@20" in r.stdout
    assert os.path.exists(os.path.join(out_root, "exp"))

    r = _run(["test", "--processed_dir", data, "--output_root", out_root])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Recall@20" in r.stdout

    # serving entry: explicit users + a sampled batch
    r = _run(
        ["recommend", "--processed_dir", data, "--output_root", out_root,
         "--users", "3,7", "--k", "5"],
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "user 3:" in r.stdout and "user 7:" in r.stdout
    # each line carries k item:score pairs
    line = [l for l in r.stdout.splitlines() if l.startswith("user 3:")][0]
    assert len(line.split()[2:]) == 5

    # out-of-range user id fails loudly
    r = _run(
        ["recommend", "--processed_dir", data, "--output_root", out_root,
         "--users", "99999"],
    )
    assert r.returncode != 0
    assert "out of range" in r.stderr


@pytest.mark.slow
def test_multiprocess_distributed_dryrun():
    """Real multi-PROCESS jax.distributed on CPU: core.distributed
    .initialize + a cross-process psum + a sharded forward (the
    multi-host layer the virtual in-process mesh can't exercise)."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multiproc_dryrun.py"), "2"],
        cwd=REPO,
        capture_output=True,
        text=True,
        # phases 1-2 (checkpoint drill) + the halo process-boundary
        # phases compile several shard_map programs on CPU: ~9 min cold
        timeout=1200,
    )
    assert "halo process-boundary equality" in r.stdout, r.stdout + r.stderr
    assert r.returncode == 0, r.stdout + r.stderr
    assert "multiproc_dryrun PASSED" in r.stdout


@pytest.mark.slow
def test_cli_sharded_train_both_schedules(tmp_path):
    """--mesh launches ShardedTrainer / HaloTrainer from the CLI on the
    8-virtual-device mesh; both schedules must train and validate."""
    data = str(tmp_path / "data")
    r = _run(
        ["prepare", "--recipe", "synthetic", "--num_users", "300",
         "--num_items", "200", "--num_brands", "20", "--core", "16",
         "--style", "latent", "--output_dir", data],
    )
    assert r.returncode == 0, r.stderr[-2000:]

    env_extra = {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    for schedule in ("gspmd", "halo"):
        out_root = str(tmp_path / f"out_{schedule}")
        env = dict(os.environ)
        env["GCN_TPU_FORCE_PLATFORM"] = "cpu"
        env.pop("JAX_PLATFORMS", None)
        env.update(env_extra)
        r = subprocess.run(
            [sys.executable, "-m", "gcn_recommendation_tpu", "train",
             "--processed_dir", data, "--epochs", "5", "--batch_size", "256",
             "--mesh", "2,4", "--schedule", schedule,
             "--output_root", out_root],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, (schedule, r.stderr[-2000:])
        assert "Sharded execution: mesh {'data': 2, 'model': 4}" in r.stdout
        assert "Val Recall@20" in r.stdout

    # wrong device count fails loudly
    env = dict(os.environ)
    env["GCN_TPU_FORCE_PLATFORM"] = "cpu"
    env.pop("JAX_PLATFORMS", None)
    env.update(env_extra)
    r = subprocess.run(
        [sys.executable, "-m", "gcn_recommendation_tpu", "train",
         "--processed_dir", data, "--epochs", "5", "--mesh", "3,4",
         "--output_root", str(tmp_path / "bad")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode != 0
    assert "needs 12 devices" in r.stderr


@pytest.mark.slow
def test_cli_sharded_test_and_recommend_match_single_device(tmp_path):
    """Round-2 VERDICT #6: `test --mesh` and `recommend --mesh` route
    through the sharded evaluator / item-sharded retriever and must agree
    with the single-device paths on a checkpoint trained single-device."""
    data = str(tmp_path / "data")
    r = _run(
        ["prepare", "--recipe", "synthetic", "--num_users", "300",
         "--num_items", "200", "--num_brands", "20", "--core", "16",
         "--style", "latent", "--output_dir", data],
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out_root = str(tmp_path / "out")
    r = _run(
        ["train", "--processed_dir", data, "--epochs", "5",
         "--batch_size", "256", "--output_root", out_root],
    )
    assert r.returncode == 0, r.stderr[-2000:]

    def metrics(stdout):
        vals = {}
        for line in stdout.splitlines():
            if line.startswith(("Recall@", "NDCG@")):
                k, v = line.split(":")
                vals[k.strip()] = float(v)
        return vals

    mesh_env = {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    r1 = _run(["test", "--processed_dir", data, "--output_root", out_root])
    assert r1.returncode == 0, r1.stderr[-2000:]
    r2 = _run(
        ["test", "--processed_dir", data, "--output_root", out_root,
         "--mesh", "1,8"],
        extra_env=mesh_env,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "Sharded execution: mesh {'data': 1, 'model': 8}" in r2.stdout
    m1, m2 = metrics(r1.stdout), metrics(r2.stdout)
    assert m1 and m1.keys() == m2.keys()
    for k in m1:
        assert abs(m1[k] - m2[k]) < 1e-4, (k, m1, m2)
    # data-axis-only mesh works too (items unsharded, users split)
    r3 = _run(
        ["test", "--processed_dir", data, "--output_root", out_root,
         "--mesh", "8,1"],
        extra_env=mesh_env,
    )
    assert r3.returncode == 0, r3.stderr[-2000:]
    m3 = metrics(r3.stdout)
    for k in m1:
        assert abs(m1[k] - m3[k]) < 1e-4, (k, m1, m3)

    def items_of(stdout, user):
        line = [l for l in stdout.splitlines() if l.startswith(f"user {user}:")][0]
        return [p.split(":")[0] for p in line.split()[2:]]

    s1 = _run(["recommend", "--processed_dir", data, "--output_root", out_root,
               "--users", "3,7", "--k", "5"])
    assert s1.returncode == 0, s1.stderr[-2000:]
    s2 = _run(["recommend", "--processed_dir", data, "--output_root", out_root,
               "--users", "3,7", "--k", "5", "--mesh", "1,8"],
              extra_env=mesh_env)
    assert s2.returncode == 0, s2.stderr[-2000:]
    for u in (3, 7):
        assert items_of(s1.stdout, u) == items_of(s2.stdout, u)
    # round-3 VERDICT #7: int8 composes with the sharded catalog — the
    # per-shard int8 scoring + merge must match single-device int8
    s3 = _run(["recommend", "--processed_dir", data, "--output_root", out_root,
               "--users", "3,7", "--k", "5", "--int8"])
    assert s3.returncode == 0, s3.stderr[-2000:]
    s4 = _run(["recommend", "--processed_dir", data, "--output_root", out_root,
               "--users", "3,7", "--k", "5", "--int8", "--mesh", "1,8"],
              extra_env=mesh_env)
    assert s4.returncode == 0, s4.stderr[-2000:]
    for u in (3, 7):
        assert items_of(s3.stdout, u) == items_of(s4.stdout, u)


@pytest.mark.slow
def test_cli_serve_daemon(tmp_path):
    """Drive the HTTP serving daemon end to end: train a checkpoint,
    start `serve` as a subprocess, hit /health + /recommend, and check
    the responses match the `recommend` CLI for the same users."""
    import json as _json
    import signal
    import time
    import urllib.request

    data = str(tmp_path / "data")
    r = _run(
        ["prepare", "--recipe", "synthetic", "--num_users", "300",
         "--num_items", "200", "--num_brands", "20", "--core", "16",
         "--style", "latent", "--output_dir", data],
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out_root = str(tmp_path / "out")
    r = _run(
        ["train", "--processed_dir", data, "--epochs", "5",
         "--batch_size", "256", "--output_root", out_root],
    )
    assert r.returncode == 0, r.stderr[-2000:]

    env = dict(os.environ)
    env["GCN_TPU_FORCE_PLATFORM"] = "cpu"
    env.pop("JAX_PLATFORMS", None)
    # stderr -> DEVNULL: JAX/absl warnings can exceed the OS pipe buffer
    # and deadlock a child whose pipe nobody drains
    proc = subprocess.Popen(
        [sys.executable, "-u", "-m", "gcn_recommendation_tpu", "serve",
         "--processed_dir", data, "--output_root", out_root, "--port", "0"],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True,
    )
    try:
        # the daemon prints "serving on http://host:port" once ready;
        # select() bounds every wait so a silent/wedged child fails the
        # test instead of hanging it on a blocking readline
        import select

        line = ""
        deadline = time.monotonic() + 300
        while time.monotonic() < deadline:
            ready, _, _ = select.select([proc.stdout], [], [], 5.0)
            if not ready:
                assert proc.poll() is None, "daemon exited before binding"
                continue
            line = proc.stdout.readline()
            if "serving on" in line:
                break
            assert proc.poll() is None, "daemon exited before binding"
        assert "serving on" in line, line
        port = int(line.split(":")[-1].split()[0])

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/health", timeout=30
        ) as resp:
            assert _json.loads(resp.read()) == {"status": "ok"}

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/recommend",
            data=_json.dumps({"users": [3, 7], "k": 5}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            body = _json.loads(resp.read())
        assert len(body["items"]) == 2 and len(body["items"][0]) == 5

        # parity with the one-shot recommend CLI on the same checkpoint
        r = _run(["recommend", "--processed_dir", data, "--output_root",
                  out_root, "--users", "3,7", "--k", "5"])
        assert r.returncode == 0, r.stderr[-2000:]
        for idx, u in enumerate((3, 7)):
            cli_line = [l for l in r.stdout.splitlines()
                        if l.startswith(f"user {u}:")][0]
            cli_items = [int(p.split(":")[0]) for p in cli_line.split()[2:]]
            assert body["items"][idx] == cli_items
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


def _spawn_daemon(args, extra_env=None):
    """Start `serve` as a subprocess; return (proc, port) once bound."""
    import select
    import time

    env = dict(os.environ)
    env["GCN_TPU_FORCE_PLATFORM"] = "cpu"
    env.pop("JAX_PLATFORMS", None)
    if extra_env:
        env.update(extra_env)
    proc = subprocess.Popen(
        [sys.executable, "-u", "-m", "gcn_recommendation_tpu", "serve"] + args,
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True,
    )
    line = ""
    deadline = time.monotonic() + 300
    while time.monotonic() < deadline:
        ready, _, _ = select.select([proc.stdout], [], [], 5.0)
        if not ready:
            assert proc.poll() is None, "daemon exited before binding"
            continue
        line = proc.stdout.readline()
        if "serving on" in line:
            break
        assert proc.poll() is None, "daemon exited before binding"
    assert "serving on" in line, line
    return proc, int(line.split(":")[-1].split()[0])


@pytest.mark.slow
def test_cli_serve_daemon_sharded_int8_reload(tmp_path):
    """Round-4 verdict #4/#7: the daemon's full surface — `serve --mesh
    --int8` (sharded int8 catalog) served over HTTP must match the
    `recommend --mesh --int8` CLI, and POST /reload must pick up a newer
    checkpoint without a restart (reference main.py:571's on-demand
    checkpoint load, daemonized)."""
    import json as _json
    import signal
    import urllib.request

    def post(port, payload, path="/recommend"):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=_json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            return _json.loads(resp.read())

    def cli_items(stdout, user):
        line = [l for l in stdout.splitlines()
                if l.startswith(f"user {user}:")][0]
        return [int(p.split(":")[0]) for p in line.split()[2:]]

    data = str(tmp_path / "data")
    r = _run(
        ["prepare", "--recipe", "synthetic", "--num_users", "300",
         "--num_items", "200", "--num_brands", "20", "--core", "16",
         "--style", "latent", "--output_dir", data],
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out_root = str(tmp_path / "out")
    r = _run(
        ["train", "--processed_dir", data, "--epochs", "5",
         "--batch_size", "256", "--output_root", out_root],
    )
    assert r.returncode == 0, r.stderr[-2000:]

    mesh_env = {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    proc, port = _spawn_daemon(
        ["--processed_dir", data, "--output_root", out_root, "--port", "0",
         "--int8", "--mesh", "1,8"],
        extra_env=mesh_env,
    )
    try:
        body_v1 = post(port, {"users": [3, 7], "k": 5})
        r = _run(["recommend", "--processed_dir", data, "--output_root",
                  out_root, "--users", "3,7", "--k", "5", "--int8",
                  "--mesh", "1,8"], extra_env=mesh_env)
        assert r.returncode == 0, r.stderr[-2000:]
        for idx, u in enumerate((3, 7)):
            assert body_v1["items"][idx] == cli_items(r.stdout, u)

        # a newer checkpoint lands on disk (longer train run, same root)
        r = _run(
            ["train", "--processed_dir", data, "--epochs", "15",
             "--batch_size", "256", "--output_root", out_root],
        )
        assert r.returncode == 0, r.stderr[-2000:]

        reload_body = post(port, {}, path="/reload")
        assert reload_body["status"] == "reloaded"

        body_v2 = post(port, {"users": [3, 7], "k": 5})
        r = _run(["recommend", "--processed_dir", data, "--output_root",
                  out_root, "--users", "3,7", "--k", "5", "--int8",
                  "--mesh", "1,8"], extra_env=mesh_env)
        assert r.returncode == 0, r.stderr[-2000:]
        for idx, u in enumerate((3, 7)):
            assert body_v2["items"][idx] == cli_items(r.stdout, u)
        # the swap actually changed the serving tables
        assert body_v2 != body_v1
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


@pytest.mark.slow
def test_crash_resume_roundtrip(tmp_path):
    """Elastic-recovery proof: SIGKILL training after its first
    checkpoint, then --resume must continue from the saved epoch (not
    epoch 1) and finish with artifacts intact (SURVEY.md §5 failure
    detection / recovery — absent in the reference)."""
    data = str(tmp_path / "data")
    r = _run(
        ["prepare", "--recipe", "synthetic", "--num_users", "300",
         "--num_items", "200", "--num_brands", "20", "--core", "16",
         "--style", "latent", "--output_dir", data],
    )
    assert r.returncode == 0, r.stderr[-2000:]

    out_root = str(tmp_path / "out")
    env = dict(os.environ)
    env["GCN_TPU_FORCE_PLATFORM"] = "cpu"
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.Popen(
        [sys.executable, "-u", "-m", "gcn_recommendation_tpu", "train",
         "--processed_dir", data, "--epochs", "30", "--batch_size", "256",
         "--output_root", out_root],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )
    # kill -9 as soon as the first rolling checkpoint lands (epoch 5).
    # A real watchdog thread enforces the deadline even if the child hangs
    # *silently* — `for line in proc.stdout` blocks on a quiet pipe, so an
    # in-loop time check would never fire (round-1 ADVICE.md finding).
    import threading

    saw_epoch5 = False
    timed_out = []

    def _deadline_kill():
        timed_out.append(True)
        proc.kill()  # SIGKILL the exact child PID — never by pattern

    watchdog = threading.Timer(300, _deadline_kill)
    watchdog.start()
    try:
        for line in proc.stdout:
            if "Epoch 5 |" in line:
                saw_epoch5 = True
            if saw_epoch5 and "Epoch 7/" in line:
                proc.kill()
                break
    finally:
        watchdog.cancel()
    proc.wait(timeout=60)
    assert not timed_out, "training hung before reaching epoch 7"
    assert saw_epoch5

    ckpt_root = os.path.join(out_root, "exp", "checkpoints", "checkpoints")
    runs = os.listdir(ckpt_root)
    assert runs, "no checkpoint dir written before the kill"

    r = _run(
        ["train", "--processed_dir", data, "--epochs", "10",
         "--batch_size", "256", "--resume", "--output_root", out_root],
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Resumed from epoch 5" in r.stdout
    assert "Epoch 6/10" in r.stdout and "Epoch 1/10" not in r.stdout
    assert "Val Recall@20" in r.stdout
