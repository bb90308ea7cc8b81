#!/usr/bin/env python3
"""Weak-scaling efficiency of the sharded WST feature pipeline.

BASELINE.json asks for patches/s scaling efficiency measured at 1 chip,
1 host, and N hosts.  This harness measures it on whatever devices
``jax.devices()`` exposes: for each mesh size n in {1, 2, ..., N} it times
the data-parallel scattering-feature extraction on a batch of
``per_device_batch * n`` patches sharded over an n-device ``data`` mesh and
reports throughput plus efficiency relative to the 1-device run
(weak scaling: perfect = 1.0).

The patch pipeline has no cross-patch communication (SURVEY.md §2.2 D1-D2:
features are per-patch; only the reduction of feature moments / confusion
matrices crosses shards, a few KB per step), so hardware scaling is
expected to sit at the batch-dispatch overhead floor.

NOTE on this sandbox: only ONE real TPU chip is reachable, so multi-device
numbers here can only come from the simulated CPU mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu``),
where "devices" timeshare 2 physical cores — those runs validate the
sharding *machinery* (and that per-device work stays constant), not ICI
bandwidth.  On a real pod slice the same script reports true efficiency.

Prints one JSON line:
    {"metric": "weak_scaling_efficiency", "value": eff_at_N, ...,
     "per_mesh": {n: patches_per_s}}
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# This sandbox's sitecustomize force-registers a remote-TPU backend and
# overwrites JAX_PLATFORMS; jax.config is the only reliable selector
# (CLAUDE.md "Environment quirks").  Honor an explicit CPU request or a
# simulated-mesh request before first backend use.
if (os.environ.get("WST_TPU_BENCH_CPU")
        or "xla_force_host_platform_device_count"
        in os.environ.get("XLA_FLAGS", "")):
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def _sizes(n: int):
    out, k = [], 1
    while k < n:
        out.append(k)
        k *= 2
    out.append(n)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--per-device-batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--hw", type=int, default=128)
    p.add_argument("--mode", default=None,
                   help="scattering mode override (e.g. 'pallas')")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from wst_tpu.parallel.distributed import DistributedTrainer
    from wst_tpu.parallel.mesh import make_mesh

    n_total = len(jax.devices())
    platform = jax.devices()[0].platform
    rng = np.random.default_rng(0)
    per_mesh = {}
    for n in _sizes(n_total):
        mesh = make_mesh(n_devices=n, model_axis=1)
        trainer = DistributedTrainer(mesh=mesh, method="wst",
                                     H=args.hw, W=args.hw, mode=args.mode)
        batch = args.per_device_batch * n
        x = rng.random((batch, 3, args.hw, args.hw), dtype=np.float32)
        feats = trainer.extract_features(x)      # compile + warmup
        float(jnp.asarray(feats).sum())
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(args.iters):
            acc = acc + jnp.asarray(trainer.extract_features(x)).sum()
        float(acc)                               # full dependency-chain sync
        dt = (time.perf_counter() - t0) / args.iters
        per_mesh[n] = batch / dt
        print(f"# mesh={n}: {per_mesh[n]:.1f} patches/s "
              f"({per_mesh[n] / n:.1f}/device)", file=sys.stderr)

    base = per_mesh[_sizes(n_total)[0]]
    eff = per_mesh[n_total] / (n_total * base) if n_total > 1 else 1.0
    out = {
        "metric": "weak_scaling_efficiency",
        "value": round(eff, 4),
        "unit": f"fraction of linear at N={n_total} ({platform})",
        "per_mesh_patches_per_s": {str(k): round(v, 1)
                                   for k, v in per_mesh.items()},
    }
    if platform == "cpu" and n_total > 1:
        out["note"] = ("simulated mesh: N virtual devices timeshare the "
                       "host's physical cores, so efficiency here validates "
                       "the sharding machinery, not hardware scaling")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
