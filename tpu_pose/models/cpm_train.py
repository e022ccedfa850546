"""CPM training: intermediate supervision loss + data-parallel train step.

The reference is inference-only from a pretrained checkpoint (SURVEY.md §2
row 3); the paper trains with per-stage MSE to ground-truth belief maps
(arXiv:1602.00134 §3.3, "intermediate supervision"). The rebuild includes
the training path so (a) the framework can produce its own weights when
the license-gated checkpoint is absent, and (b) the multi-chip story has a
real gradient step: loss/grads computed per shard, ``psum``-ed over the
``data`` mesh axis inside ``shard_map`` — the canonical JAX DP recipe
(SURVEY.md §2 row 16).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

try:  # jax ≥ 0.8 moved shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from tpu_pose.models import cpm as cpm_lib
from tpu_pose.parallel.mesh import DATA_AXIS
from tpu_pose.utils.config import CPMConfig


def stage_supervision_loss(params, images, center_maps, target_heatmaps,
                           cfg: CPMConfig,
                           joint_mask=None,
                           stage1_heatmaps=None) -> jnp.ndarray:
    """Σ_stages ‖b_t − b*‖² (mean over batch/pixels) — every stage gets the
    same ground-truth belief maps, per the CPM paper.

    ``images`` may be raw uint8 — normalization then happens IN-GRAPH
    (x/256 − 0.5, the CPM convention), so input pipelines ship 4×-smaller
    byte tensors to the device (host-link discipline, docs/DESIGN.md §6).

    ``joint_mask`` (B, P+1): per-example channel supervision weights for
    partially-annotated real datasets (MPII labels a subset of joints
    per person; an unlabeled joint's zero target map would otherwise
    actively train the channel to predict absence). All-ones ≡ the
    unmasked loss.

    ``stage1_heatmaps``: optional separate targets for stage 1 ONLY.
    Stage 1 has no center-map input, so on multi-person frames it
    cannot select the target; supervising it with target-only maps
    trains it to suppress people it cannot distinguish, which degrades
    the stage-1 person-evidence proposals every multi-person path rests
    on (measured round 4: k=3 id-acc 0.60 → 0.48 as selector training
    scaled). Pass the UNION maps
    (synthetic_hard.hard_train_batches(union_stage1=True)) so stage 1
    detects everyone while the hinted refinement stages stay
    target-only — the Caffe-CPM detector/selector split."""
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 256.0 - 0.5
    beliefs = cpm_lib.cpm_forward(params, images, center_maps, cfg)
    loss = 0.0
    for si, b in enumerate(beliefs):
        tgt = (stage1_heatmaps
               if si == 0 and stage1_heatmaps is not None
               else target_heatmaps)
        err = (b - tgt) ** 2
        if joint_mask is None:
            loss = loss + jnp.mean(err)
        else:
            w = joint_mask[:, None, None, :].astype(err.dtype)
            denom = jnp.sum(w) * err.shape[1] * err.shape[2]
            loss = loss + jnp.sum(err * w) / jnp.maximum(denom, 1.0)
    return loss / len(beliefs)


def fake_quant_params(params):
    """Straight-through fake-quantized view of f32 conv params for
    quantization-aware training: each kernel is replaced by
    ``w + stop_grad(dq(q(w)) − w)``, so the forward sees EXACTLY the
    int8 serving weights (the per-out-channel symmetric scheme of
    ``cpm.quantize_params`` — scale = max|w| over (kh, kw, ci) / 127)
    while gradients flow to the latent f32 weights (the standard STE).
    Weight-only: the serving path's activation quantization (per-tensor,
    dynamic or calibrated) is not emulated — weights carry most of the
    PTQ drift, and activation ranges shift during training anyway.
    Biases pass through (served in f32)."""

    def fq(p):
        w = p["w"]
        scale = jnp.maximum(
            jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True) / 127.0,
            1e-12)
        wq = jnp.clip(jnp.round(w / scale), -127, 127) * scale
        return dict(p, w=w + jax.lax.stop_gradient(wq - w))

    return {name: fq(p) for name, p in params.items()}


def make_train_step(cfg: CPMConfig, optimizer: optax.GradientTransformation,
                    mesh=None, fake_quant: bool = False):
    """Returns ``step(params, opt_state, batch) → (params, opt_state, loss)``.

    Single-device if ``mesh`` is None; otherwise a ``shard_map`` over the
    ``data`` axis with replicated params and ``psum``-averaged grads (ICI
    collective — the only cross-chip traffic in the whole framework).

    ``fake_quant``: quantization-aware training — the forward runs on
    the :func:`fake_quant_params` view so the trained weights land where
    int8 serving rounds them (``train_cpm --qat``; measure the int8
    accuracy delta vs post-training quantization on the selfcheck hard
    section).
    """

    def loss_fn(params, batch):
        if fake_quant:
            params = fake_quant_params(params)
        return stage_supervision_loss(
            params, batch["images"], batch["center_maps"],
            batch["heatmaps"], cfg,
            joint_mask=batch.get("joint_mask"),
            stage1_heatmaps=batch.get("heatmaps_stage1"))

    def local_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        if mesh is not None:
            grads = jax.lax.pmean(grads, DATA_AXIS)
            loss = jax.lax.pmean(loss, DATA_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        return jax.jit(local_step)

    replicated = P()
    sharded = P(DATA_AXIS)

    def step(params, opt_state, batch):
        specs = {k: sharded for k in batch}
        fn = shard_map(
            local_step, mesh=mesh,
            in_specs=(replicated, replicated, specs),
            out_specs=(replicated, replicated, replicated),
        )
        return fn(params, opt_state, batch)

    return jax.jit(step)


def init_train_state(key, cfg: CPMConfig, lr: float = 1e-4,
                     total_steps: int | None = None,
                     warmup_frac: float = 0.05,
                     clip_norm: float = 1.0
                     ) -> Tuple[Dict, optax.OptState,
                                optax.GradientTransformation]:
    """Fresh params + optimizer. With ``total_steps``, uses the standard
    warmup→cosine-decay schedule (peak ``lr``, 5% warmup, decay to
    lr/50) plus global-norm clipping — measured to stabilize the late
    phase of synthetic CPM training, whose loss is bumpy under a
    constant lr (selfcheck logs: 0.0025 → 0.0091 → 0.0041 over the last
    300 of 800 steps at constant 2e-4)."""
    params = cpm_lib.init_cpm_params(key, cfg)
    if total_steps is None:
        opt = optax.adam(lr)
    else:
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr,
            warmup_steps=max(1, int(total_steps * warmup_frac)),
            decay_steps=total_steps, end_value=lr / 50.0)
        opt = optax.chain(optax.clip_by_global_norm(clip_norm),
                          optax.adam(sched))
    return params, opt.init(params), opt
