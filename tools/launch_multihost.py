"""Multi-process launch rehearsal: the real `jax.distributed` path on CPU.

Spawns N processes on this machine, each with its own jax runtime (CPU
backend, `jax_num_cpu_devices` local devices), connected through
`jax.distributed.initialize` exactly like a multi-host TPU pod launch
(SGTPU_* env vars -> parallel.multihost.init_distributed). Every process
builds the global (view=process, band=local-chip) mesh and runs hybrid
train steps; process 0 prints the verdict.

Usage:
    python tools/launch_multihost.py [--procs 2] [--local-devices 4] [--steps 2]

This is the 2-host CI stand-in: same code path as a pod launch, DCN
replaced by localhost gRPC. On a real pod, run train.py on every host with
pipeline.distributed=true instead.
"""
import argparse
import os
import pathlib
import socket
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

WORKER = r"""
import sys, os, pathlib
sys.path.insert(0, os.environ["SGTPU_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", int(os.environ["SGTPU_LOCAL_DEVICES"]))

# distributed init MUST precede anything that may touch the XLA backend —
# including importing framework modules.
from semantic_gaussians_tpu.parallel import multihost

assert multihost.init_distributed(), "distributed init failed"

import numpy as np
import jax.numpy as jnp
from semantic_gaussians_tpu.parallel.train_parallel import (
    make_hybrid_train_step, stack_cameras,
)
from semantic_gaussians_tpu.pipelines.train import TrainConfig, init_train_state
from semantic_gaussians_tpu.core.gaussians import init_from_pcd
from semantic_gaussians_tpu.utils.camera import make_camera
nproc = jax.process_count()
pid = jax.process_index()
mesh = multihost.make_view_band_mesh()

rng = np.random.default_rng(0)  # same scene everywhere (replicated params)
pts = (rng.normal(size=(300, 3)) * 0.5 + [0, 0, 4]).astype(np.float32)
cols = rng.uniform(size=(300, 3)).astype(np.float32)
params, alive = init_from_pcd(pts, cols, sh_degree=2, capacity=512)
state = init_train_state(params, alive)

H, W = 64, 128
cams = [
    make_camera(
        np.eye(3), np.array([0.05 * i, 0, 0]), 1.2, 0.9, W, H,
        image=rng.uniform(size=(H, W, 3)).astype(np.float32),
    )
    for i in range(nproc)
]
# Each process contributes ITS view; global batch assembled over "view".
local = stack_cameras([cams[pid]])
cam_batch = multihost.global_batch_from_local(local, mesh, "view")

step = make_hybrid_train_step(
    mesh, TrainConfig(), active_sh_degree=1, img_height=H, img_width=W
)
bg = jnp.zeros(3)
for _ in range(int(os.environ["SGTPU_STEPS"])):
    state, metrics = step(state, cam_batch, bg)
loss = float(metrics["loss"])
psnr = float(metrics["psnr"])
assert np.isfinite(loss)
multihost.primary_print(
    f"[multihost] procs={nproc} mesh={dict(mesh.shape)} "
    f"steps={os.environ['SGTPU_STEPS']} loss={loss:.5f} psnr={psnr:.2f} OK"
)
"""


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--timeout", type=int, default=600)
    args = ap.parse_args(argv)

    coord = f"127.0.0.1:{free_port()}"
    procs = []
    for pid in range(args.procs):
        env = dict(
            os.environ,
            SGTPU_COORDINATOR=coord,
            SGTPU_NUM_PROCS=str(args.procs),
            SGTPU_PROC_ID=str(pid),
            SGTPU_LOCAL_DEVICES=str(args.local_devices),
            SGTPU_STEPS=str(args.steps),
            SGTPU_REPO=str(REPO),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    rc = 0
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            rc = 1
        if p.returncode != 0:
            rc = 1
        tag = f"[proc {pid} rc={p.returncode}]"
        for line in (out or "").strip().splitlines():
            print(tag, line)
    if rc == 0:
        print("multihost rehearsal OK")
    return rc


if __name__ == "__main__":
    sys.exit(main())
