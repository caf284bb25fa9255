"""Virtual-mesh scaling curve for the sharded tempered estimator.

Weak-scaling measurement on a CPU host mesh (the same sharding program the
TPU pod-slice path compiles): fixed restarts *per device*, device count
swept 1 -> 8 via XLA_FLAGS=--xla_force_host_platform_device_count. Each
device count runs in a fresh subprocess (the flag must precede backend
init). Ideal weak scaling = flat wall-clock as devices grow; the printed
`efficiency` is t(1)/t(n).

This measures the sharding overhead of the XLA partitioner on a virtual
mesh — it is NOT multi-chip hardware evidence (none is available here); it
validates that per-device work is collective-free and the program
partitions without replication blowup. See docs/DESIGN.md §Scale-out.

Both optimizer paths are measured: ``--path device`` shards the on-device
while-loop estimator (parallel/mesh.py); ``--path host`` shards the
production host strong-Wolfe path's value_and_grad dispatches
(inference/lbfgs_host.py, mesh=...).

Usage: python measure_scaling.py [--per-device 16] [--devices 1,2,4,8]
                                 [--path device|host]
"""

import argparse
import json
import os
import subprocess
import sys

_CHILD = r"""
import os, time, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
import numpy as np
import jax.numpy as jnp
import __graft_entry__ as ge
from ode_uncertainty_tpu.parallel import (
    device_mesh, make_sharded_tempered_estimator, shard_restarts)

n = {n}
per = {per}
path = {path!r}
mesh = device_mesh(num_devices=n)
_, _, spec, nll, p0 = ge._lv_rig(jnp.float32, restarts=per * n)
q = jnp.eye(2, dtype=jnp.float32)
if path == "device":
    est = make_sharded_tempered_estimator(nll, spec, q, mesh, max_iter=25, tol=0.0)
    gammas = jnp.asarray([1e-2, 1e-5], jnp.float32)
    p0 = shard_restarts(p0, mesh)
    res = jax.block_until_ready(est(p0, gammas))  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        res = jax.block_until_ready(est(p0, gammas))
    print("WALL=%.4f" % ((time.perf_counter() - t0) / 3))
else:
    from ode_uncertainty_tpu.inference.lbfgs_host import make_stage_optimizer_host

    stage = make_stage_optimizer_host(
        nll, q, max_iter=25, tol=0.0, mesh=mesh, progress_every=0
    )
    x0 = np.asarray(p0)
    stage(x0, 1e-2)  # compile all bucket shapes
    t0 = time.perf_counter()
    for _ in range(3):
        stage(x0, 1e-2)
    print("WALL=%.4f" % ((time.perf_counter() - t0) / 3))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device", type=int, default=16)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--path", default="device", choices=["device", "host"])
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = []
    for n in [int(x) for x in args.devices.split(",")]:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={n}"
        ).strip()
        env["JAX_PLATFORMS"] = "cpu"
        code = _CHILD.format(repo=repo, n=n, per=args.per_device, path=args.path)
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, env=env, timeout=1200
        )
        wall = None
        for line in out.stdout.splitlines():
            if line.startswith("WALL="):
                wall = float(line.split("=")[1])
        if wall is None:
            print(f"devices={n}: FAILED\n{out.stdout}\n{out.stderr}", file=sys.stderr)
            continue
        rows.append((n, wall))
        base = rows[0][1]
        # On a VIRTUAL mesh all devices share the host's physical cores, so
        # weak scaling cannot show a flat wall-clock — the meaningful number
        # is partition_overhead: measured wall over the serial-equivalent
        # n * t(1). ~1.0 means XLA partitioned the program without
        # replicating work or inserting hot-loop collectives; that is the
        # property that transfers to a real multi-chip mesh.
        print(
            json.dumps(
                {
                    "path": args.path,
                    "devices": n,
                    "restarts": n * args.per_device,
                    "wall_s": round(wall, 4),
                    "partition_overhead": round(wall / (n * base), 3),
                }
            )
        )


if __name__ == "__main__":
    main()
