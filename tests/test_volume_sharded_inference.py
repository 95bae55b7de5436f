"""Volume-sharded INFERENCE at a realistic cost-volume shape (VERDICT r1 #5).

The round-1 suite proved volume sharding on toy shapes inside a train step;
here the ACV aggregation tower (the flagship hot path,
SceneFlow/models/acv_ddim.py:452-455) runs on a (D=48, H4=64, W4=240) volume
— the quarter-res geometry of ~256×960 inputs — sharded 4-way over H, and we
assert (a) numerical equality with the unsharded run and (b) that GSPMD
actually materialized halo exchanges (collective-permutes) for the 3×3×3
convs, counting their bytes from the compiled HLO.
"""

import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from diffuvolume_tpu.models.acv import ACVNet
from diffuvolume_tpu.parallel.mesh import make_mesh
from diffuvolume_tpu.parallel.volume_sharding import constrain_volume, volume_sharding

pytestmark = pytest.mark.slow

D, H4, W4, C = 48, 64, 240, 16

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "f64": 8,
                "s8": 1, "u8": 1, "pred": 1}


def _collective_permute_bytes(hlo_text: str) -> int:
    """Sum output bytes of all collective-permute ops in a compiled HLO."""
    total = 0
    # HLO: `%name = f32[1,48,1,240,16]{layout} collective-permute(...)`
    for m in re.finditer(
        r"=\s*(\w+)\[([\d,]*)\][^\n]*?\bcollective-permute(?:-start)?\(",
        hlo_text,
    ):
        dtype, dims = m.group(1), m.group(2)
        n = 1
        for d in filter(None, dims.split(",")):
            n *= int(d)
        total += n * _DTYPE_BYTES.get(dtype, 4)
    return total


def test_volume_sharded_aggregation_matches_and_exchanges_halos():
    model = ACVNet(max_disp=4 * D, diffusion=False)

    rng = jax.random.PRNGKey(0)
    vol_small = jax.random.normal(rng, (1, 16, 8, 16, C)) * 0.1
    variables = model.init(
        jax.random.PRNGKey(1), vol_small, False, method=ACVNet._aggregate
    )

    vol = jax.random.normal(jax.random.fold_in(rng, 1), (1, D, H4, W4, C)) * 0.1

    def agg(v):
        _, _, out2 = model.apply(
            variables, constrain_volume(v), False, method=ACVNet._aggregate
        )
        return out2

    want = jax.jit(agg)(vol)

    mesh = make_mesh(n_data=1, n_volume=4, devices=jax.devices()[:4])
    vsh = NamedSharding(mesh, P(None, None, "volume"))
    jitted = jax.jit(agg, in_shardings=(vsh,), out_shardings=vsh)
    with mesh, volume_sharding(P(None, None, "volume")):
        lowered = jitted.lower(jax.ShapeDtypeStruct(vol.shape, vol.dtype))
        compiled = lowered.compile()
        got = jitted(jax.device_put(vol, vsh))

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    halo = _collective_permute_bytes(compiled.as_text())
    # Each 3x3x3 conv over the 4-way H-sharded volume needs a 1-row halo from
    # each neighbor: >= one (1, D', 1, W', C') slab per direction per conv.
    # The tower has ~20 such convs; require a sane lower bound rather than an
    # exact count (XLA may fuse/resize halos).
    one_slab = D * 1 * W4 * 32 * 4  # f32 bytes of a full-res 1-row, C=32 slab
    assert halo >= 2 * one_slab, f"halo bytes {halo} < {2 * one_slab}"
    print(f"halo traffic: {halo / 1e6:.2f} MB per aggregation pass")
