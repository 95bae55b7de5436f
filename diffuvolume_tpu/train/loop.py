"""pjit training step for the ACVNet DiffuVolume recipe.

Reference semantics: SceneFlow/main.py:126-156 — clamp GT disparity, bilinear
↓4 ÷4, diffusion-conditioned forward, weighted smooth-L1, Adam.  Here the step
is one jitted function over a device mesh: inputs batch-sharded on ``data``,
params/optimizer replicated, gradient all-reduce inserted by GSPMD over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from diffuvolume_tpu.ops.regression import resize_bilinear
from diffuvolume_tpu.train.loss import SCENEFLOW_WEIGHTS, multi_scale_loss


@dataclasses.dataclass
class TrainState:
    """Minimal mutable-free train state pytree."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array

    def tree_flatten(self):
        return (self.params, self.batch_stats, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def create_train_state(model, rng, sample_shape, optimizer) -> TrainState:
    """Initialize params/batch_stats/optimizer for the diffusion model."""
    b, h, w = sample_shape
    left = jnp.zeros((b, h, w, 3))
    disp_q = jnp.zeros((b, h // 4, w // 4))
    t = jnp.zeros((b,), jnp.int32)
    noise = jnp.zeros((b, model.max_disp // 4, h // 4, w // 4))
    variables = model.init(rng, left, left, disp_q, t, noise, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def create_igev_train_state(model, rng, sample_shape, optimizer) -> TrainState:
    """Initialize the IGEV recipe's state (init takes raw images only)."""
    b, h, w = sample_shape
    left = jnp.zeros((b, h, w, 3))
    variables = model.init(rng, left, left, train=True)
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    model, optimizer: optax.GradientTransformation, weights=SCENEFLOW_WEIGHTS
) -> Callable:
    """Build the jitted train step.

    Batch: dict with ``left``/``right`` ``(B,H,W,3)`` and ``disp_gt`` ``(B,H,W)``.
    """

    def step_fn(state: TrainState, batch, rng):
        left, right, disp_gt = batch["left"], batch["right"], batch["disp_gt"]
        b, h, w = disp_gt.shape
        max_disp = model.max_disp
        mask = (disp_gt < max_disp) & (disp_gt > 0)

        # GT conditioning: clamp → bilinear ↓4 → ÷4 (main.py:132-134).
        disp_clamped = jnp.clip(disp_gt, 0.0, max_disp - 1)
        disp_q = resize_bilinear(disp_clamped, (h // 4, w // 4), 1, 2) / 4.0

        rng_t, rng_noise = jax.random.split(rng)
        # One t for the whole batch, like the reference (acv_ddim.py:441).
        t = jnp.broadcast_to(
            jax.random.randint(rng_t, (1,), 0, 1000), (b,)
        ).astype(jnp.int32)
        noise = jax.random.normal(rng_noise, (b, max_disp // 4, h // 4, w // 4))

        def loss_fn(params):
            preds, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                left, right, disp_q, t, noise,
                train=True, mutable=["batch_stats"],
            )
            loss = multi_scale_loss(preds, disp_gt, mask, weights)
            return loss, (updates["batch_stats"], preds[-1])

        (loss, (new_bs, pred)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        epe = jnp.sum(jnp.abs(pred - disp_gt) * mask) / jnp.maximum(mask.sum(), 1)
        # pred rides along for the TB image summaries (experiment.py:72-88);
        # fetching it is lazy (async transfer only when the host reads it).
        return new_state, {"loss": loss, "epe": epe, "pred": pred}

    return step_fn


def make_igev_train_step(
    model, optimizer: optax.GradientTransformation, iters: int = 22,
    grad_clip: float = 1.0,
) -> Callable:
    """KITTI15 recipe train step (train_stereo.py:150-174): diffusion-
    conditioned GRU rollout, sequence loss over iterates, grad-norm clip.

    Batch: ``left``/``right`` RAW [0,255] ``(B,H,W,3)``, ``disp_gt`` ``(B,H,W)``,
    ``valid`` ``(B,H,W)``.  Note ``optimizer`` should already include the clip
    (or pass grad_clip here and use plain adamw).
    """
    from diffuvolume_tpu.diffusion import make_schedule, q_sample
    from diffuvolume_tpu.diffusion.codec import encode_disparity_volume
    from diffuvolume_tpu.models.igev.model import igev_forward
    from diffuvolume_tpu.train.loss import sequence_loss

    sched = make_schedule(1000)
    num_bins = model.max_disp // 4

    def step_fn(state: TrainState, batch, rng):
        left, right = batch["left"], batch["right"]
        disp_gt = batch["disp_gt"]
        valid = batch.get("valid", (disp_gt > 0).astype(jnp.float32))
        b, h, w = disp_gt.shape

        # GT conditioning at 1/4 in bin units (train_stereo.py:154-158:
        # flow_4 = -interp(flow)/4 sign-flipped; disparities positive here).
        disp_q = resize_bilinear(
            jnp.clip(disp_gt, 0.0, 4.0 * (num_bins - 1)), (h // 4, w // 4), 1, 2
        ) / 4.0
        rng_t, rng_noise = jax.random.split(rng)
        t = jnp.broadcast_to(
            jax.random.randint(rng_t, (1,), 0, 1000), (b,)
        ).astype(jnp.int32)
        eps = jax.random.normal(rng_noise, (b, num_bins, h // 4, w // 4))
        x_start = encode_disparity_volume(disp_q, num_bins, model.scale)
        noisy = q_sample(sched, x_start, t, eps)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            init_up, disp_ups, new_bs = igev_forward(
                model, variables, left, right, iters=iters,
                noisy=noisy, t=t, train=True,
            )
            loss = sequence_loss(
                disp_ups, init_up, disp_gt, valid, max_disp=model.max_disp
            )
            return loss, (new_bs, disp_ups[-1])

        (loss, (new_bs, pred)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_bs if new_bs is not None else state.batch_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        mask = (valid >= 0.5) & (disp_gt < model.max_disp)
        epe = jnp.sum(jnp.abs(pred - disp_gt) * mask) / jnp.maximum(mask.sum(), 1)
        return new_state, {"loss": loss, "epe": epe, "pred": pred}

    return step_fn
