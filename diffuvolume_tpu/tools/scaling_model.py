"""Analytic data-parallel scaling model from the compiled GSPMD program.

The virtual 8-CPU mesh can verify sharding CORRECTNESS but not scaling
efficiency (8 virtual devices share 2 physical cores, so measured "efficiency"
only measures the host).  This tool instead extracts what actually determines
pod-slice scaling from the compiled program itself — the scaling-book recipe:

  * gradient all-reduce bytes per step (from the partitioned HLO),
  * per-device FLOPs per step (XLA cost analysis),

and projects efficiency on real v5e ICI: a ring all-reduce moves
``2·(N-1)/N · bytes`` per device at ``ICI_BW``; with XLA's collective/compute
overlap the step time is ``max(T_compute, T_comm)``, without it their sum.

    python -m diffuvolume_tpu.tools.scaling_model [--devices 8] [--hw 256 512]
"""

from __future__ import annotations

import argparse
import json
import re

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

# v5e public specs: 197 bf16 TFLOP/s per chip; 1600 Gbps ICI per chip.
V5E_PEAK_FLOPS = 197e12
V5E_ICI_BYTES_S = 200e9
ASSUMED_MFU = 0.40  # conv-heavy nets on v5e (measured bench ≈ this ballpark)

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "f64": 8}


def _allreduce_bytes(hlo: str) -> int:
    total = 0
    for m in re.finditer(
        r"=\s*\(?(\w+)\[([\d,]*)\][^\n]*?\ball-reduce(?:-start)?\(", hlo
    ):
        n = 1
        for d in filter(None, m.group(2).split(",")):
            n *= int(d)
        total += n * _DTYPE_BYTES.get(m.group(1), 4)
    return total


def main(argv=None):
    from diffuvolume_tpu.models.acv import ACVNet
    from diffuvolume_tpu.parallel.mesh import batch_sharding, make_mesh
    from diffuvolume_tpu.train.loop import create_train_state, make_train_step

    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=0, help="0 = all")
    p.add_argument("--hw", type=int, nargs=2, default=(256, 512))
    p.add_argument("--per_device_batch", type=int, default=1)
    p.add_argument("--maxdisp", type=int, default=192)
    args = p.parse_args(argv)

    n = args.devices or len(jax.devices())
    h, w = args.hw
    b = args.per_device_batch * n
    model = ACVNet(max_disp=args.maxdisp, diffusion=True)
    optimizer = optax.adam(1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, h, w), optimizer)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))

    mesh = make_mesh(n_data=n)
    bsh, repl = batch_sharding(mesh), NamedSharding(mesh, P())
    batch_abs = {
        k: jax.ShapeDtypeStruct((b, h, w) + s, jnp.float32)
        for k, s in (("left", (3,)), ("right", (3,)), ("disp_gt", ()))
    }
    step = make_train_step(model, optimizer)
    with mesh:
        lowered = jax.jit(
            step,
            in_shardings=(repl, {k: bsh for k in batch_abs}, repl),
            out_shardings=(repl, repl),
        ).lower(
            jax.tree.map(lambda x: x, state),
            batch_abs,
            jax.ShapeDtypeStruct((2,), jnp.uint32),
        )
        compiled = lowered.compile()

    ar_bytes = _allreduce_bytes(compiled.as_text())
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops_total = float(cost.get("flops", 0.0))
    flops_per_dev = flops_total / n

    t_compute = flops_per_dev / (V5E_PEAK_FLOPS * ASSUMED_MFU)
    # ring all-reduce: each device sends/receives 2·(N-1)/N of the payload.
    t_comm = (2 * (n - 1) / n) * ar_bytes / n / V5E_ICI_BYTES_S
    eff_overlap = t_compute / max(t_compute, t_comm)
    eff_serial = t_compute / (t_compute + t_comm)

    print(
        json.dumps(
            {
                "metric": "dp_scaling_projection_v5e",
                "devices": n,
                "hw": [h, w],
                "params_m": round(n_params / 1e6, 2),
                "allreduce_mb_per_step": round(ar_bytes / 1e6, 2),
                "flops_per_device_g": round(flops_per_dev / 1e9, 1),
                "t_compute_ms": round(t_compute * 1e3, 2),
                "t_comm_ms": round(t_comm * 1e3, 3),
                "projected_efficiency_overlapped": round(eff_overlap, 4),
                "projected_efficiency_serial": round(eff_serial, 4),
                "assumptions": {
                    "peak_flops": V5E_PEAK_FLOPS,
                    "ici_bytes_s": V5E_ICI_BYTES_S,
                    "mfu": ASSUMED_MFU,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
