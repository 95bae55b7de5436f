"""Regression tests for the round-1 bench crash (VERDICT weak #1).

bench.py initializes params on host CPU via ``init_on_cpu``; the baseline
ACVNet eval branch reaches the Pallas fused head, whose interpret-mode default
was keyed on ``jax.default_backend()`` — which still reports "tpu" inside a
``jax.default_device(cpu)`` context — so Pallas lowered a Mosaic kernel for
the CPU backend and crashed.  These tests pin (a) the centralized
platform-detection helper and (b) bench.py's exact init sequence.
"""

import jax
import jax.numpy as jnp
import pytest


def test_lowering_platform_respects_default_device(monkeypatch):
    from diffuvolume_tpu.utils import platform as plat

    # Simulate the relay environment: the installed backend claims TPU.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert plat.lowering_platform() == "tpu"
    assert plat.is_tpu_lowering()
    with jax.default_device(jax.devices("cpu")[0]):
        assert plat.lowering_platform() == "cpu"
        assert not plat.is_tpu_lowering()
    assert plat.lowering_platform() == "tpu"


def test_fused_head_interpret_default_under_cpu_context(monkeypatch):
    """interpret=None must resolve to interpret mode when lowering for CPU,
    even when the default backend claims TPU (the round-1 crash)."""
    from diffuvolume_tpu.ops.pallas.fused_head import fused_upsample_softargmin

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cost = jnp.zeros((1, 48, 16, 32), jnp.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        disp, unc = fused_upsample_softargmin(cost, 192, (64, 128))
    assert disp.shape == (1, 64, 128)
    assert bool(jnp.isfinite(disp).all())


@pytest.mark.slow
def test_bench_init_sequence():
    """Execute bench.py's init sequence verbatim (small shapes, CPU)."""
    from diffuvolume_tpu.models.acv import ACVNet
    from diffuvolume_tpu.utils.hostinit import init_on_cpu

    rng = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    baseline_model = ACVNet(max_disp=192, diffusion=False, dtype=dtype)
    ddim_model = ACVNet(max_disp=192, diffusion=True, dtype=dtype)

    left_s = jnp.zeros((1, 64, 128, 3))
    baseline_vars = init_on_cpu(baseline_model.init, rng, left_s, left_s, train=False)
    disp_q = jnp.zeros((1, 16, 32))
    t = jnp.zeros((1,), jnp.int32)
    noise = jnp.zeros((1, 48, 16, 32))
    ddim_vars = init_on_cpu(
        ddim_model.init, rng, left_s, left_s, disp_q, t, noise, train=True
    )
    assert "params" in baseline_vars and "params" in ddim_vars
