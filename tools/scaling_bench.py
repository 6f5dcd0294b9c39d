"""Scaling-efficiency harness (BASELINE.md: ">=85% linear to 2+ hosts").

Measures the fused cleanup chain at 1 vs N devices (GSPMD pages-axis DP)
and 1 vs 2 jax.distributed OS processes, writing SCALING.json.

WHAT THE NUMBERS MEAN PER BACKEND — read this before quoting:

* On real multi-chip hardware (a TPU pod slice): the devices are
  physical, so `efficiency_strong = T_1 / (N * T_N)` for a FIXED total
  batch is the real scaling efficiency the BASELINE.md contract asks
  for. The script runs unchanged there (it auto-uses the real backend
  when it exposes >= 2 devices).
* On this machine (one TPU chip via tunnel): virtual CPU devices share
  the same physical cores, so T_N ~= T_1 no matter how well the
  sharding works, and efficiency_strong degenerates to ~1/N by
  construction — meaningless. What IS measurable and meaningful is
  `parallel_overhead_pct = (T_N - T_1) / T_1`: the extra time GSPMD
  partitioning + collectives add over the unsharded program on the
  SAME silicon. A well-laid-out DP chain should add ~0 (page-parallel,
  no cross-page communication); large overhead would mean the sharded
  program inserts real communication or partitioning waste — exactly
  the defect scaling on a pod would expose.

Both figures are recorded, with `valid` flags per backend.

Usage: python tools/scaling_bench.py [--devices 1,2,8] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys, time
n_dev, b, h, w, iters, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                   int(sys.argv[3]), int(sys.argv[4]),
                                   int(sys.argv[5]), sys.argv[6])
use_cpu = os.environ.get("PF_SCALING_CPU", "1") == "1"
if use_cpu:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={n_dev}").strip()
import jax
if use_cpu:
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, {repo!r})
from bench import _pages
from libpillowfight_tpu.parallel.mesh import make_mesh, shard_pages
from libpillowfight_tpu.parallel.pipeline import (
    DOCUMENT_CLEANUP, normalize_spec, run_pipeline)

assert len(jax.devices()) >= n_dev, (len(jax.devices()), n_dev)
mesh = make_mesh(n_devices=n_dev, rows=1)
pages = _pages(b, h, w)
x = shard_pages(jnp.asarray(pages), mesh)
spec = normalize_spec(DOCUMENT_CLEANUP)
fn = jax.jit(lambda p: run_pipeline(p, spec))

def fetch(o):
    return float(jnp.sum(o[0, 0, 0].astype(jnp.float32)))

fetch(fn(x))
ts = []
for _ in range(iters):
    t0 = time.perf_counter()
    fetch(fn(x))
    ts.append(time.perf_counter() - t0)
dt = float(np.median(ts))
with open(out_path, "w") as f:
    json.dump({"n_devices": n_dev, "seconds": dt,
               "pages_per_s": b / dt}, f)
"""

_MP_WORKER = r"""
import json, os, sys, time
idx, nproc, port, out_path, b, h, w, iters = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    int(sys.argv[5]), int(sys.argv[6]), int(sys.argv[7]), int(sys.argv[8]))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4").strip()
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from libpillowfight_tpu.parallel.multihost import (
    initialize_distributed, make_host_mesh)

if nproc > 1:
    initialize_distributed(coordinator=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=idx)
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from bench import _pages
from libpillowfight_tpu.parallel.pipeline import (
    DOCUMENT_CLEANUP, normalize_spec, run_pipeline)

if nproc > 1:
    mesh = make_host_mesh()
    sharding = NamedSharding(mesh, P(("host", "chip")))
else:
    from libpillowfight_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(n_devices=4, rows=1)
    sharding = NamedSharding(mesh, P("pages"))

pages = _pages(b, h, w)
garr = jax.make_array_from_callback(
    pages.shape, sharding, lambda i: pages[i])
spec = normalize_spec(DOCUMENT_CLEANUP)
fn = jax.jit(lambda p: run_pipeline(p, spec), out_shardings=sharding)

out = fn(garr)
jax.block_until_ready(out)
ts = []
for _ in range(iters):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(garr))
    ts.append(time.perf_counter() - t0)
dt = float(np.median(ts))
if idx == 0:
    with open(out_path, "w") as f:
        json.dump({"n_processes": nproc, "seconds": dt,
                   "pages_per_s": b / dt}, f)
"""


def _run_virtual(n_dev, b, h, w, iters, tmpdir, use_cpu):
    out = os.path.join(tmpdir, f"dev{n_dev}.json")
    worker = os.path.join(tmpdir, "worker.py")
    with open(worker, "w") as f:
        f.write(_WORKER.replace("{repo!r}", repr(_REPO)))
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["PF_SCALING_CPU"] = "1" if use_cpu else "0"
    r = subprocess.run(
        [sys.executable, worker, str(n_dev), str(b), str(h), str(w),
         str(iters), out],
        env=env, cwd=_REPO, capture_output=True, text=True, timeout=1800)
    if r.returncode != 0:
        raise RuntimeError(f"scaling worker n={n_dev} failed:\n"
                           f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
    with open(out) as f:
        return json.load(f)


def _run_processes(nproc, b, h, w, iters, tmpdir):
    out = os.path.join(tmpdir, f"proc{nproc}.json")
    worker = os.path.join(tmpdir, "mp_worker.py")
    with open(worker, "w") as f:
        f.write(_MP_WORKER.replace("{repo!r}", repr(_REPO)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(nproc), str(port), out,
             str(b), str(h), str(w), str(iters)],
            env=env, cwd=_REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT)
        for i in range(nproc)
    ]
    logs = []
    for p in procs:
        o, _ = p.communicate(timeout=1800)
        logs.append(o.decode(errors="replace"))
    for i, p in enumerate(procs):
        if p.returncode != 0:
            raise RuntimeError(f"mp worker {i} failed:\n{logs[i][-2000:]}")
    with open(out) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,8")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-multiprocess", action="store_true")
    ap.add_argument("--out", default="SCALING.json")
    args = ap.parse_args()

    import tempfile

    b, h, w = (8, 256, 256) if args.quick else (8, 512, 512)
    iters = 3 if args.quick else 5
    devs = sorted({int(d) for d in args.devices.split(",")})

    # real multi-chip hardware? use it (the honest path on a pod)
    use_cpu = True
    try:
        import jax

        if jax.default_backend() != "cpu" and len(jax.devices()) >= max(devs):
            use_cpu = False
    except Exception:
        pass

    rec = {
        "config": "unpaper_chain_dp_scaling",
        "batch_pages": b, "page_shape": [h, w],
        "backend": "real-multichip" if not use_cpu else "cpu-virtual-devices",
        "efficiency_strong_valid": not use_cpu,
        "parallel_overhead_valid": True,
        "note": ("cpu-virtual devices share physical cores: "
                 "efficiency_strong degenerates to ~1/N by construction "
                 "and only parallel_overhead_pct (GSPMD partitioning + "
                 "collective cost over the unsharded program) is "
                 "meaningful; on a real pod slice the same script yields "
                 "the true strong-scaling efficiency" if use_cpu else
                 "real devices: efficiency_strong is the contract metric"),
    }

    with tempfile.TemporaryDirectory() as tmp:
        runs = [_run_virtual(n, b, h, w, iters, tmp, use_cpu) for n in devs]
        t1 = next(r["seconds"] for r in runs if r["n_devices"] == 1)
        for r in runs:
            n = r["n_devices"]
            r["efficiency_strong_pct"] = round(100.0 * t1 / (n * r["seconds"]), 1)
            r["parallel_overhead_pct"] = round(
                100.0 * (r["seconds"] - t1) / t1, 1)
        rec["gspmd_device_sweep"] = runs

        if not args.skip_multiprocess:
            p1 = _run_processes(1, b, h, w, iters, tmp)
            p2 = _run_processes(2, b, h, w, iters, tmp)
            p2["efficiency_strong_pct"] = round(
                100.0 * p1["seconds"] / (2 * p2["seconds"]), 1)
            p2["parallel_overhead_pct"] = round(
                100.0 * (p2["seconds"] - p1["seconds"]) / p1["seconds"], 1)
            rec["jax_distributed_process_sweep"] = [p1, p2]

    path = os.path.join(_REPO, args.out)
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
