#!/usr/bin/env python
"""Multi-process (multi-controller) validation of the distributed path
(VERDICT r2 next #8; SURVEY.md §2 row 16).

`parallel/mesh.py` documents that `jax.distributed.initialize()` before
`make_mesh` makes the same DP code span processes/hosts. No multi-chip
hardware exists here, so this smoke validates the claim the JAX way:
TWO LOCAL PROCESSES, each owning 4 virtual CPU devices
(xla_force_host_platform_device_count), joined through the coordination
service on localhost — a faithful miniature of a 2-host topology
(per-process addressable devices + cross-process collectives via the
gloo CPU backend).

Parent mode spawns the two children and checks both report the SAME
DP-train-step loss as a reference single-process run on the identical
global batch. Run directly:

  python scripts/multiprocess_smoke.py            # parent
  (children are spawned with --process_id)

Exit 0 on success; 75 (EX_TEMPFAIL) when the environment cannot
initialize distributed JAX (sandboxes without localhost sockets) — the
caller/test records the attempt and skips.
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PORT = int(os.environ.get("SMOKE_PORT", "12421"))
NPROC = 2
LOCAL_DEVICES = 4


def child(process_id: int) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}")
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        # gloo is the CPU cross-process collectives backend.
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # older config name; initialize() may still work
    try:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{PORT}",
            num_processes=NPROC, process_id=process_id)
    except Exception as e:
        print(json.dumps({"init_error": f"{type(e).__name__}: {e}"}),
              flush=True)
        raise SystemExit(75)

    import jax.numpy as jnp
    import numpy as np

    from tpu_pose.models import cpm_train
    from tpu_pose.parallel import mesh as mesh_lib
    from tpu_pose.utils.config import CPMConfig

    assert jax.process_count() == NPROC
    assert len(jax.devices()) == NPROC * LOCAL_DEVICES  # global view
    mesh = mesh_lib.make_mesh()          # spans BOTH processes' devices

    cfg = CPMConfig(input_size=32, features=8, stage1_head_width=8,
                    refine_width=8, num_stages=2,
                    compute_dtype="float32")
    rng = np.random.RandomState(0)       # same seed → same global batch
    b = 2 * NPROC * LOCAL_DEVICES
    batch = {
        "images": rng.rand(b, 32, 32, 3).astype(np.float32) - 0.5,
        "center_maps": rng.rand(b, 32, 32, 1).astype(np.float32),
        "heatmaps": rng.rand(b, 4, 4, 15).astype(np.float32),
    }
    params, opt_state, opt = cpm_train.init_train_state(
        jax.random.PRNGKey(0), cfg, lr=1e-4)

    # Per-process placement: each controller hands its LOCAL slice of the
    # global batch to the runtime (the multi-host idiom — device_put of a
    # full array onto non-addressable devices is not legal).
    sharding = mesh_lib.batch_sharding(mesh)

    def to_global(x):
        per = b // NPROC
        local = x[process_id * per:(process_id + 1) * per]
        return jax.make_array_from_process_local_data(sharding, local,
                                                      x.shape)

    gbatch = {k: to_global(v) for k, v in batch.items()}
    gparams = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            mesh_lib.replicated(mesh), np.asarray(x), np.shape(x)),
        params)
    gopt = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            mesh_lib.replicated(mesh), np.asarray(x), np.shape(x)),
        opt_state)

    step = cpm_train.make_train_step(cfg, opt, mesh=mesh)
    new_params, _, loss = step(gparams, gopt, gbatch)
    # The loss is fully replicated — addressable on every process.
    loss = float(jax.device_get(
        jax.tree.map(lambda x: x, loss).addressable_shards[0].data))

    # Reference: the same step single-"process" on this controller's view
    # cannot be computed here (devices are split); the parent re-runs it
    # in a plain single-process interpreter and compares.
    print(json.dumps({"process_id": process_id,
                      "process_count": jax.process_count(),
                      "global_devices": len(jax.devices()),
                      "local_devices": len(jax.local_devices()),
                      "loss": loss}), flush=True)


def single_process_reference() -> float:
    """The same global batch/step on one process (8 virtual devices)."""
    env = dict(os.environ,
               XLA_FLAGS=(f"--xla_force_host_platform_device_count="
                          f"{NPROC * LOCAL_DEVICES}"),
               JAX_PLATFORM_NAME="cpu")
    code = r"""
import json
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from tpu_pose.models import cpm_train
from tpu_pose.parallel import mesh as mesh_lib
from tpu_pose.utils.config import CPMConfig
cfg = CPMConfig(input_size=32, features=8, stage1_head_width=8,
                refine_width=8, num_stages=2, compute_dtype="float32")
rng = np.random.RandomState(0)
b = %d
batch = {
    "images": rng.rand(b, 32, 32, 3).astype(np.float32) - 0.5,
    "center_maps": rng.rand(b, 32, 32, 1).astype(np.float32),
    "heatmaps": rng.rand(b, 4, 4, 15).astype(np.float32),
}
params, opt_state, opt = cpm_train.init_train_state(
    jax.random.PRNGKey(0), cfg, lr=1e-4)
mesh = mesh_lib.make_mesh()
step = cpm_train.make_train_step(cfg, opt, mesh=mesh)
_, _, loss = step(mesh_lib.replicate(params, mesh),
                  mesh_lib.replicate(opt_state, mesh),
                  mesh_lib.shard_batch(batch, mesh))
print(json.dumps({"loss": float(loss)}))
""" % (2 * NPROC * LOCAL_DEVICES)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=600,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    if out.returncode != 0:
        raise RuntimeError(f"reference run failed: {out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])["loss"]


def parent() -> int:
    here = os.path.abspath(__file__)
    procs = [subprocess.Popen(
        [sys.executable, here, "--process_id", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(NPROC)]
    outs = []
    for p in procs:
        try:
            so, se = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            print("child timed out — distributed init likely blocked "
                  "by the sandbox", file=sys.stderr)
            return 75
        outs.append((p.returncode, so, se))
    if any(rc == 75 for rc, _, _ in outs):
        for rc, so, _ in outs:
            print(f"child rc={rc}: {so.strip()[:300]}", file=sys.stderr)
        print("ENVIRONMENT-BLOCKED: jax.distributed.initialize failed; "
              "attempt recorded", file=sys.stderr)
        return 75
    for rc, so, se in outs:
        if rc != 0:
            print(f"child failed rc={rc}\n{se[-3000:]}", file=sys.stderr)
            return 1
    reports = [json.loads(so.strip().splitlines()[-1])
               for _, so, _ in outs]
    ref_loss = single_process_reference()
    ok = True
    for r in reports:
        print(f"process {r['process_id']}: {r['local_devices']} local / "
              f"{r['global_devices']} global devices, loss {r['loss']:.6f}"
              f" (single-process reference {ref_loss:.6f})")
        ok &= r["process_count"] == NPROC
        ok &= r["global_devices"] == NPROC * LOCAL_DEVICES
        ok &= abs(r["loss"] - ref_loss) <= 1e-5 * max(1.0, abs(ref_loss))
    print("multiprocess_smoke:", "OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    if "--process_id" in sys.argv:
        child(int(sys.argv[sys.argv.index("--process_id") + 1]))
    else:
        raise SystemExit(parent())
