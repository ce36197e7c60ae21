import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
"""AOT-compile the ZeRO band step for a REAL 8-chip v5e topology and dump
the XLA latency-hiding schedule (VERDICT r2 item 3).

One physical chip cannot RUN an 8-way reduce-scatter, but XLA can still
COMPILE for an unattached v5e 2x4 topology (jax.experimental.topologies).
The after-optimization module then shows, with the production TPU
latency-hiding scheduler, exactly where each collective's async start/done
pair sits relative to the backward compute — turning the "per-leaf
reduce-scatters overlap the backward" dataflow argument
(parallel/train_parallel.py make_band_train_step_zero) into checkable
schedule evidence.

Writes ZERO_OVERLAP.json: per collective, the ops scheduled between its
-start and -done (the overlap window), plus totals. The full HLO goes to
/tmp/zero_schedule_hlo.txt for inspection.
"""
import argparse
import json
import re

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--opt", action="append", default=[],
        help="TPU compiler option key=value (passed via compiler_options; "
        "xla_tpu_* flags are known to the TPU compiler, not the client "
        "XLA_FLAGS parser)",
    )
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--capacity", type=int, default=8192,
        help="Gaussian capacity for the AOT compile. 8192 compiles in ~40 s; "
        "131072 approaches the production regime where the reduce-scatter "
        "moves MBs and the scheduler's async cost model bites",
    )
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=128)
    cli = ap.parse_args()
    compiler_options = {}
    for kv in cli.opt:
        k, _, v = kv.partition("=")
        compiler_options[k] = {"true": True, "false": False}.get(v, v)
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from semantic_gaussians_tpu.core.gaussians import GaussianParams
    from semantic_gaussians_tpu.parallel.train_parallel import (
        make_band_train_step_zero,
    )
    from semantic_gaussians_tpu.pipelines.train import TrainConfig, init_train_state
    from semantic_gaussians_tpu.utils.camera import make_camera
    import dataclasses

    topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x4")
    mesh = Mesh(np.array(topo.devices).reshape(-1), ("data",))
    print(f"topology: {len(topo.devices)} v5e devices")

    w, h, n = cli.width, cli.height, cli.capacity
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n, 3)).astype(np.float32) + np.array([0, 0, 4], np.float32)
    k = 16
    params = GaussianParams(
        means=jnp.asarray(pts),
        sh_dc=jnp.zeros((n, 1, 3)),
        sh_rest=jnp.zeros((n, k - 1, 3)),
        log_scales=jnp.full((n, 3), -4.0),
        quats=jnp.zeros((n, 4)).at[:, 0].set(1.0),
        opacity_logits=jnp.zeros((n, 1)),
    )
    alive = jnp.ones((n,), bool)
    state = init_train_state(params, alive)
    img = jnp.zeros((h, w, 3), jnp.float32)
    cam = dataclasses.replace(
        make_camera(np.eye(3), np.zeros(3), 1.2, 0.8, w, h), image=img
    )
    bg = jnp.zeros(3)

    step = make_band_train_step_zero(mesh, TrainConfig(), 0, h, w)
    repl = NamedSharding(mesh, P())

    def sds(x):
        x = jnp.asarray(x) if not hasattr(x, "dtype") else x
        return jax.ShapeDtypeStruct(jnp.shape(x), x.dtype, sharding=repl)

    args = jax.tree.map(sds, (state, cam, bg))
    lowered = step.lower(*args)
    print(f"lowered; compiling for the unattached topology "
          f"(options: {compiler_options or 'default'}) ...")
    compiled = lowered.compile(compiler_options=compiler_options or None)
    txt = compiled.as_text()
    pathlib.Path("/tmp/zero_schedule_hlo.txt").write_text(txt)
    print(f"HLO: {len(txt)} bytes -> /tmp/zero_schedule_hlo.txt")

    # --- schedule analysis -------------------------------------------------
    # XLA:TPU's latency-hiding machinery shows up in the optimized module in
    # three forms (all string-checkable):
    #   1. `async_collective_fusion.N` computations: a collective BROKEN INTO
    #      a start + continuation chunks that execute INSIDE compute fusions
    #      (the host fusion's metadata names the op it rides in);
    #   2. `async_collective_name=...-start.K` frontend attributes on
    #      collectives that the scheduler runs asynchronously;
    #   3. `flag_start`/`flag_end` barrier flags in
    #      async_collective_fusion_config (non -1 => windowed execution).
    collectives = []
    for m in re.finditer(
        r"%([\w\.\-]+) = [^\n]*? (all-gather|all-reduce|reduce-scatter)"
        r"\(([^\n]*)", txt
    ):
        line = m.group(0)
        sh = re.search(r"= \(?((?:f32|s32|u32|bf16)\[[0-9,]*\])", line)
        fused_async = '"flag_start":"-1"' not in line and (
            "async_collective_fusion_config" in line
        )
        named_async = "async_collective_name" in line
        emitter = re.search(r'"emitter":"([\w]+)"', line)
        meta = re.search(r'op_name="([^"]+)"', line)
        collectives.append(
            dict(
                name=m.group(1),
                kind=m.group(2),
                shape=sh.group(1) if sh else "?",
                async_fused=bool(fused_async),
                async_named=bool(named_async),
                emitter=emitter.group(1) if emitter else None,
                op_name=meta.group(1) if meta else None,
            )
        )
    # which compute hosts the collective continuations?
    hosts = []
    for m in re.finditer(
        r"%(fusion\.[0-9]+) = [^\n]*calls=%(async_collective_fusion\.[0-9]+)"
        r"[^\n]*", txt
    ):
        line = m.group(0)
        meta = re.search(r'op_name="([^"]+)"', line)
        hosts.append(
            dict(
                fusion=m.group(1),
                computation=m.group(2),
                hosted_in=meta.group(1) if meta else None,
            )
        )
    # --- schedule positions: where does each collective sit in the entry
    # schedule, and how many estimated compute cycles remain after it?  A
    # sync collective near the end has (and an async one would have) almost
    # nothing to overlap with — this turns "is it async?" into the question
    # that actually matters, "how much could overlap buy here?".
    em = re.search(r"ENTRY [^\{]+\{(.*)\n\}", txt, re.S)
    elines = [l for l in em.group(1).split("\n") if re.match(r"\s+%", l)]

    def _cyc(l):
        c = re.search(r'"estimated_cycles":"(\d+)"', l)
        return int(c.group(1)) if c else 0

    cum_after = [0] * (len(elines) + 1)
    for i in range(len(elines) - 1, -1, -1):
        cum_after[i] = cum_after[i + 1] + _cyc(elines[i])
    total_cycles = cum_after[0]
    epos = {}
    for i, l in enumerate(elines):
        nm = re.match(r"\s+%([\w\.\-]+) =", l)
        if nm:
            epos[nm.group(1)] = i
    for c in collectives:
        i = epos.get(c["name"])
        if i is not None:
            c["schedule_pos"] = [i, len(elines)]
            c["est_cycles_after"] = cum_after[i + 1]
    n_async = sum(c["async_fused"] or c["async_named"] for c in collectives)
    report = dict(
        topology="v5e:2x4 (8 chips, AOT, latency-hiding scheduler)",
        step="make_band_train_step_zero",
        img=[h, w],
        capacity=n,
        collectives=collectives,
        async_count=n_async,
        sync_count=len(collectives) - n_async,
        continuation_hosts=hosts,
        entry_total_est_cycles=total_cycles,
    )
    if compiler_options:
        report["compiler_options"] = {k: str(v) for k, v in compiler_options.items()}
    out = pathlib.Path(cli.out) if cli.out else (
        pathlib.Path(__file__).resolve().parent.parent / "ZERO_OVERLAP.json"
    )
    out.write_text(json.dumps(report, indent=1))
    print(f"collectives: {len(collectives)} total, {n_async} async "
          f"(fused/named), {len(hosts)} compute fusions hosting collective "
          "continuations:")
    for c in collectives:
        tag = "ASYNC" if (c["async_fused"] or c["async_named"]) else "sync "
        print(f"  {tag} {c['kind']:<14} {c['shape']:<24} "
              f"{c['emitter'] or '-':<36} {c['op_name'] or ''}")
    for h_ in hosts[:12]:
        print(f"  continuation {h_['computation']:<28} inside {h_['hosted_in']}")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
