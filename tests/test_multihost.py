"""Multi-host (multi-process) tier tests.

The distributed tier everywhere else in the suite runs on one process
with 8 virtual devices; these tests run REAL multi-process coordination:
two gloo-linked CPU processes with 4 virtual devices each execute the
full Batcher -> prefetch -> fused-train-step -> eval pipeline over one
global 8-device mesh (tests/multihost_worker.py) and must match the
single-process 8-device run per step. This validates exactly the recipe
main.py uses on a TPU pod (one process per host, DCN collectives).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env():
    env = dict(os.environ)
    # The worker sets its own platform/device-count env; scrub the
    # suite's so they don't conflict. Running the script by path puts
    # tests/ (not the repo root) on sys.path, hence PYTHONPATH.
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _parse_worker_json(out: str) -> dict:
    """Last JSON object on stdout. Gloo logs its connection summary to
    stdout and can interleave AFTER the worker's result line, so scan
    from the end for a line that actually parses."""
    for line in reversed(out.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    raise AssertionError(f"no JSON result line in worker output:\n{out}")


def _run_worker(extra_args, timeout=420):
    env = _env()
    proc = subprocess.run(
        [sys.executable, WORKER, *extra_args],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, (
        f"worker {extra_args} failed:\n{proc.stdout}\n{proc.stderr}"
    )
    return _parse_worker_json(proc.stdout)


@pytest.fixture(scope="module")
def runs():
    """One single-process run + one 2-process run of the same program."""
    single = _run_worker(["--procs", "1", "--local-devices", "8"])

    port = _free_port()
    env = _env()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--procs", "2", "--pid", str(pid),
             "--port", str(port), "--local-devices", "4"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"rank failed:\n{out}\n{err}"
        outs.append(_parse_worker_json(out))
    return single, outs


def test_multiprocess_matches_single_process(runs):
    """Two coordinated processes over one global mesh produce the same
    per-step training losses/scores and final eval as one process with
    all 8 devices (the all-reduce crosses the process boundary)."""
    single, (r0, r1) = runs
    assert r0["procs"] == r1["procs"] == 2
    assert r0["devices"] == r1["devices"] == 8
    assert single["devices"] == 8
    # Same global program; gloo vs intra-process all-reduce may round
    # differently in f32, hence allclose (tight) not equality.
    np.testing.assert_allclose(r0["losses"], single["losses"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(r0["scores"], single["scores"],
                               rtol=1e-5, atol=1e-6)
    assert r0["eval_score"] == pytest.approx(single["eval_score"], abs=1e-4)
    assert r0["eval_loss"] == pytest.approx(single["eval_loss"], rel=1e-5)


def test_ranks_agree(runs):
    """Metrics are fully replicated: every rank reports identical values
    (the coordinator-only logging gate loses no information)."""
    _, (r0, r1) = runs
    assert r0["losses"] == r1["losses"]
    assert r0["scores"] == r1["scores"]
    assert r0["eval_score"] == r1["eval_score"]


def test_batcher_process_slice_partitions_batches():
    """Two Batchers with complementary process slices reconstruct the
    single Batcher's global batches exactly (same seed => same order)."""
    from dl_vqa_tpu.data.pipeline import Batcher

    class DS:
        def __init__(self, n):
            r = np.random.default_rng(0)
            self.questions = r.integers(0, 9, (n, 4)).astype(np.int32)
            self.question_lengths = np.full(n, 4, np.int32)
            self.answer_indices = r.integers(1, 5, (n, 2)).astype(np.int32)
            self.answer_values = r.integers(1, 9, (n, 2)).astype(np.int32)

        def __len__(self):
            return len(self.questions)

    ds = DS(22)  # 3 batches of 8, last padded
    full = list(Batcher(ds, 8, shuffle=True, seed=3, load_images=False))
    halves = [
        list(Batcher(ds, 8, shuffle=True, seed=3, load_images=False,
                     process_slice=s))
        for s in (slice(0, 4), slice(4, 8))
    ]
    assert len(full) == len(halves[0]) == len(halves[1]) == 3
    for b_full, b0, b1 in zip(full, *halves):
        for key in b_full:
            glued = np.concatenate([b0[key], b1[key]])
            np.testing.assert_array_equal(glued, b_full[key], err_msg=key)
    # the padded rows of the final batch stay masked wherever they land
    assert full[-1]["mask"].sum() == 6


def test_model_sharded_checkpoint_gathers_across_processes(tmp_path):
    """Multihost + tensor parallel (mesh model=4 across 2 processes):
    params are NOT fully addressable on any process, so the coordinator-
    gated save must gather collectively (non-coordinators mirror with
    ckpt.host_snapshot) and the npz must round-trip the full values —
    previously this crashed on np.asarray at the first save."""
    ckpt_path = str(tmp_path / "tp.ckpt")
    port = _free_port()
    env = _env()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--procs", "2", "--pid", str(pid),
             "--port", str(port), "--local-devices", "4",
             "--model-axis", "4", "--epochs", "1",
             "--save-ckpt", ckpt_path],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"rank failed:\n{out}\n{err}"
        outs.append(_parse_worker_json(out))
    r0, r1 = outs
    # Both ranks loaded the file the coordinator wrote; its contents
    # equal the live (allgathered) state on every rank, full-size.
    for r in (r0, r1):
        assert r["ckpt"]["saved_numel"] == r["ckpt"]["live_numel"]
        assert r["ckpt"]["saved_sum"] == pytest.approx(
            r["ckpt"]["live_sum"], rel=1e-12
        )
    assert r0["ckpt"] == r1["ckpt"]


@pytest.mark.parametrize("layout", ["replicated", "sharded"])
def test_device_image_cache_across_processes(layout):
    """The device-resident image table works in multi-process runs: each
    process contributes its addressable block via
    make_array_from_process_local_data (device_cache._upload) — full
    table for 'replicated', its own row block for 'sharded' — and the
    2-process run matches the single-process run per step."""
    single = _run_worker(
        ["--procs", "1", "--local-devices", "8",
         "--device-cache", layout, "--epochs", "1"]
    )

    port = _free_port()
    env = _env()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--procs", "2", "--pid", str(pid),
             "--port", str(port), "--local-devices", "4",
             "--device-cache", layout, "--epochs", "1"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"rank failed:\n{out}\n{err}"
        outs.append(_parse_worker_json(out))
    r0, r1 = outs
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=0)
    np.testing.assert_allclose(
        single["losses"], r0["losses"], rtol=1e-5, atol=1e-6
    )
    assert single["eval_score"] == pytest.approx(
        r0["eval_score"], rel=1e-5, abs=1e-6
    )


def _launch_cluster(n_procs, local_devices, extra_args, timeout=420,
                    expect_fail_ranks=()):
    """Start n_procs coordinated workers; return their parsed JSON lines.
    Ranks in expect_fail_ranks may exit non-zero (fault injection); once
    one of them has died, surviving ranks that block on the torn fabric
    are reaped (kill by tracked Popen handle — cleanup, not the fault)."""
    port = _free_port()
    env = _env()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--procs", str(n_procs), "--pid",
             str(pid), "--port", str(port), "--local-devices",
             str(local_devices), *extra_args],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO, env=env,
        )
        for pid in range(n_procs)
    ]
    outs = {}
    try:
        for pid in expect_fail_ranks:
            procs[pid].wait(timeout=timeout)
            assert procs[pid].returncode != 0
        for pid, p in enumerate(procs):
            if pid in expect_fail_ranks:
                continue
            try:
                out, err = p.communicate(
                    timeout=30 if expect_fail_ranks else timeout
                )
            except subprocess.TimeoutExpired:
                if not expect_fail_ranks:
                    raise
                p.kill()  # survivor blocked on the dead peer's collective
                p.communicate()
                continue
            if expect_fail_ranks:
                continue  # survivors' exit state is not under test
            assert p.returncode == 0, f"rank {pid} failed:\n{out}\n{err}"
            outs[pid] = _parse_worker_json(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return [outs[pid] for pid in sorted(outs)]


@pytest.mark.parametrize("backend", ["npz", "orbax"])
def test_multihost_crash_recovery_resumes_exactly(tmp_path, backend):
    """VERDICT r4 item 4: lose one host of a 2-process pod mid-epoch
    (the coordinator hard-exits right after its first in-epoch rolling
    save lands), restart the whole job from last.ckpt, and the resumed
    trajectory — per-epoch metrics AND final full train state — must be
    identical to an uninterrupted 2-process run. The orbax variant
    drives the every-process collective save path in
    train/loop.py::_save_rolling (npz gates on the coordinator with
    host_snapshot mirroring instead)."""
    from dl_vqa_tpu.utils import checkpoint as ckpt

    loop_args = ["--train-loop", "--epochs", "2",
                 "--checkpoint-every-steps", "2",
                 "--ckpt-backend", backend]
    last_name = "last.ckpt" if backend == "npz" else "last.ckpt.orbax"

    def stats(run):  # drop wall-clock noise from the comparison
        return [
            {k: v for k, v in s.items() if k != "epoch_time"}
            for s in run["epoch_stats"]
        ]

    # Uninterrupted ground truth.
    ref_dir = str(tmp_path / "ref")
    ref0, ref1 = _launch_cluster(
        2, 4, loop_args + ["--exp-dir", ref_dir]
    )
    assert stats(ref0) == stats(ref1)

    # Crash: rank 0 dies after the batch-2 save of epoch 0; rank 1 is
    # left blocked on the torn collective fabric and gets reaped.
    crash_dir = str(tmp_path / "crash")
    _launch_cluster(
        2, 4, loop_args + ["--exp-dir", crash_dir, "--kill-rank", "0"],
        expect_fail_ranks=(0,),
    )
    last = os.path.join(crash_dir, last_name)
    assert os.path.exists(last)
    _, meta = ckpt.load_checkpoint(last)
    assert meta.get("batch_in_epoch") == 2  # mid-epoch save, not end-of-epoch
    assert meta.get("epoch") == 0

    # Restart the full pod from the rolling checkpoint.
    res0, res1 = _launch_cluster(
        2, 4, loop_args + ["--exp-dir", crash_dir, "--resume", last]
    )
    assert stats(res0) == stats(res1)

    # The resumed run re-reports the interrupted epoch (carried partial
    # sums) then the rest; stats and final state must match exactly.
    assert len(res0["epoch_stats"]) == len(ref0["epoch_stats"])
    for got, want in zip(stats(res0), stats(ref0)):
        assert got.keys() == want.keys()
        for k in want:
            assert got[k] == pytest.approx(want[k], rel=1e-6, abs=1e-7), k
    assert res0["ckpt_numel"] == ref0["ckpt_numel"]
    assert res0["ckpt_sum"] == pytest.approx(ref0["ckpt_sum"], rel=1e-9)
    assert res0["metrics"] == pytest.approx(ref0["metrics"], rel=1e-6)


def test_four_process_matches_single_process():
    """4-process variant of the equivalence tier: 4 gloo ranks x 2 local
    devices over one global 8-device mesh reproduce the single-process
    8-device run per step (VERDICT r4 item 4)."""
    single = _run_worker(
        ["--procs", "1", "--local-devices", "8", "--epochs", "1"]
    )
    outs = _launch_cluster(
        4, 2, ["--epochs", "1"]
    )
    assert [o["procs"] for o in outs] == [4] * 4
    assert all(o["devices"] == 8 for o in outs)
    for o in outs[1:]:
        assert o["losses"] == outs[0]["losses"]
        assert o["eval_score"] == outs[0]["eval_score"]
    np.testing.assert_allclose(outs[0]["losses"], single["losses"],
                               rtol=1e-5, atol=1e-6)
    assert outs[0]["eval_score"] == pytest.approx(
        single["eval_score"], abs=1e-4
    )


def test_maybe_initialize_env_handling(monkeypatch):
    """The 'auto' opt-in must not leak the literal string to jax (which
    falls back to the env var), and partial manual config must pass None
    through instead of KeyError-ing."""
    from dl_vqa_tpu.parallel import multihost

    calls = []

    def fake_initialize(coordinator_address=None, num_processes=None,
                        process_id=None):
        # what jax would see, including its env-var fallback
        calls.append(coordinator_address or
                     os.environ.get("JAX_COORDINATOR_ADDRESS"))

    import jax

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "auto")
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    multihost.maybe_initialize()
    assert calls[-1] is None  # 'auto' never reached jax
    assert os.environ["JAX_COORDINATOR_ADDRESS"] == "auto"  # restored

    # Address-only manual config (managed platform fills in the rest).
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    multihost.maybe_initialize()
    assert calls[-1] == "10.0.0.1:1234"

    # Idempotency is asked, not parsed from error strings.
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)
    before = len(calls)
    multihost.maybe_initialize()
    assert len(calls) == before


def test_process_batch_slice_single_process_is_none():
    import jax

    from dl_vqa_tpu.parallel import batch_sharding, make_mesh
    from dl_vqa_tpu.parallel import multihost

    mesh = make_mesh(data=-1, model=1)
    assert multihost.process_batch_slice(batch_sharding(mesh), 16) is None
    assert multihost.is_coordinator()
    assert not multihost.active()
    multihost.barrier("noop")  # single-process no-op
    assert jax.process_count() == 1
