"""Convolutional Pose Machines — 2D heatmap network in pure JAX.

TPU-native rebuild of the reference's TF1 CPM graph (SURVEY.md §2 row 3,
§3.1; paper arXiv:1602.00134 §3). Architecture follows the MPII Caffe
deploy graph the reference's ckpt lineage is converted from [K]:

  stage 1:   conv1..3_stage1 (9×9×128 + 3×3/2 maxpools) → conv4_stage1
             (5×5×32) → conv5_stage1 (9×9×512) → conv6 (1×1×512)
             → conv7 (1×1×(P+1))  — belief maps b₁ (46×46)
  shared:    conv1..3_stage2 (9×9×128 + pools) — 128-ch feature map F,
             computed ONCE and reused by every refinement stage
  stage t≥2: convN_t = conv{t}_stageN? — per-stage 5×5×32 on F, then
             concat(feat_t, b_{t−1}, center_lowres) → Mconv1..3_stageT
             (11×11×128) → Mconv4 (1×1×128) → Mconv5 (1×1×(P+1)) = b_t

Parameters are a flat dict keyed by Caffe layer names (conv1_stage1, …,
Mconv5_stage6) so the TF-ckpt converter (utils/tf_converter.py) is a pure
name-mapping exercise once the real checkpoint is present (SURVEY.md §7
step 4).

TPU-first choices: NHWC layout, bf16 conv compute with f32 accumulation
(MXU-native; cfg.compute_dtype), all six stages in one jitted XLA program,
decode fused in (ops/softargmax.py). The 46×46 refinement convs are the
hot loop (SURVEY.md §3.1) — Pallas fusion for them lives in ops/.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from tpu_pose.ops import preprocess as pre
from tpu_pose.ops import softargmax as decode_lib
from tpu_pose.utils.config import CPMConfig

Params = Dict[str, Dict[str, jnp.ndarray]]


# ---------------------------------------------------------------------------
# Parameter construction
# ---------------------------------------------------------------------------

def _layer_defs(cfg: CPMConfig):
    """(name, kernel, in_ch, out_ch, has_relu) for every conv layer."""
    p1 = cfg.out_channels
    f = cfg.features
    defs = [
        # Stage-1 belief path.
        ("conv1_stage1", 9, 3, f, True),
        ("conv2_stage1", 9, f, f, True),
        ("conv3_stage1", 9, f, f, True),
        ("conv4_stage1", 5, f, 32, True),
        ("conv5_stage1", 9, 32, cfg.stage1_head_width, True),
        ("conv6_stage1", 1, cfg.stage1_head_width, cfg.stage1_head_width,
         True),
        ("conv7_stage1", 1, cfg.stage1_head_width, p1, False),
    ]
    if not cfg.share_trunk:
        # Separate refinement trunk (Caffe names it the *_stage2 image
        # path); with share_trunk the conv1..3_stage1 features feed the
        # refinement stages directly (cfg.share_trunk docstring).
        defs += [
            ("conv1_stage2", 9, 3, f, True),
            ("conv2_stage2", 9, f, f, True),
            ("conv3_stage2", 9, f, f, True),
        ]
    cat_ch = 32 + p1 + (1 if cfg.use_center_map else 0)
    for t in range(2, cfg.num_stages + 1):
        feat_name = ("conv4_stage2" if t == 2
                     else f"conv1_stage{t}")  # Caffe naming quirk
        defs.append((feat_name, 5, f, 32, True))
        defs += [
            (f"Mconv1_stage{t}", 11, cat_ch, cfg.refine_width, True),
            (f"Mconv2_stage{t}", 11, cfg.refine_width, cfg.refine_width,
             True),
            (f"Mconv3_stage{t}", 11, cfg.refine_width, cfg.refine_width,
             True),
            (f"Mconv4_stage{t}", 1, cfg.refine_width, cfg.refine_width,
             True),
            (f"Mconv5_stage{t}", 1, cfg.refine_width, p1, False),
        ]
    return defs


def init_cpm_params(key: jax.Array, cfg: CPMConfig = CPMConfig()) -> Params:
    """He-initialized parameter pytree, keyed by Caffe layer names.

    Weight layout: (kh, kw, in_ch, out_ch) = HWIO (XLA-native for NHWC).
    One jitted program for every layer: eager per-layer RNG dispatch pays
    a host↔device round-trip each (~23 s total under the axon tunnel)."""
    def init_all(key):
        params: Params = {}
        for name, k, cin, cout, _ in _layer_defs(cfg):
            key, sub = jax.random.split(key)
            fan_in = k * k * cin
            w = jax.random.normal(sub, (k, k, cin, cout), jnp.float32)
            w = w * jnp.sqrt(2.0 / fan_in)
            params[name] = {"w": w, "b": jnp.zeros((cout,), jnp.float32)}
        return params

    return dict(jax.jit(init_all)(key))


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------

def _conv(x, p, relu: bool, dtype):
    """SAME conv + bias (+ReLU) in ``dtype`` (bf16 by default). The MXU
    accumulates bf16 operands in f32 internally, so a bf16 output dtype
    costs only the final rounding — and keeping the op dtype-closed makes
    forward and backward convs dtype-consistent (the f32-output variant
    breaks ``jax.grad``: bf16 activations × f32 cotangents)."""
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), p["w"].astype(dtype),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + p["b"].astype(dtype)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y


def _pool(x):
    """Caffe CPM pooling: 3×3 max, stride 2, SAME (368→184→92→46)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding="SAME")


# ---------------------------------------------------------------------------
# int8 quantized inference path (serving-speed option)
# ---------------------------------------------------------------------------
#
# v5e executes int8×int8→int32 convs at ~2× the bf16 MXU rate (measured
# 1.44× end-to-end on the dominant 9×9/184² conv, 208 TOP/s vs 144
# TFLOP/s). Since the CPM conv stack is ~88% of the fused pipeline cost
# and runs at 80% MFU in bf16 (no headroom left in scheduling), lower
# precision is the only honest speed lever. Scheme: symmetric per-output-
# channel weight scales (static), symmetric per-tensor dynamic activation
# scales (one cheap max-reduction per layer), f32 bias/ReLU epilogue.
# Accuracy is bench-gated: tests assert soft-argmax joint drift vs the
# bf16 path stays sub-pixel (within the ≤1 mm MPJPE parity budget).
# Measured on v5e with weights trained on the synthetic task (240 steps,
# peaked heatmaps): int8-vs-f32 decoded-joint drift mean 0.90 px, and the
# int8 path added 0.35 px to the ground-truth pixel error (20.83→21.18).

def quantize_params(params: Params,
                    act_scales: dict | None = None) -> Params:
    """Per-output-channel symmetric int8 quantization of conv weights.

    Returns a pytree with ``w_int8`` (kh,kw,ci,co) int8, ``w_scale`` (co,)
    f32, and the original f32 ``b`` — recognized by ``cpm_forward``.

    ``act_scales`` (from :func:`calibrate_act_scales`) adds a static
    per-layer input-activation scale ``a_scale``; without it, activation
    scales are computed dynamically per call (one max-reduction per layer
    — a fusion barrier worth removing in serving).

    All layers quantize in ONE jitted program: per-layer eager dispatch
    costs ~40 × the host↔device round-trip latency, which under the axon
    tunnel (~0.2 s RTT) turned construction into ~28 s; batched it is
    sub-second. ``a_scale`` attaches as host numpy scalars (0-d leaves)
    — no extra transfers.
    """
    def quant_all(ps):
        out = {}
        for name, p in ps.items():
            w = jnp.asarray(p["w"], jnp.float32)
            scale = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
            scale = jnp.maximum(scale, 1e-12)
            w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
            out[name] = {"w_int8": w_q, "w_scale": scale, "b": p["b"]}
        return out

    out: Params = dict(jax.jit(quant_all)(dict(params)))
    if act_scales:
        import numpy as np
        out = {name: (dict(p, a_scale=np.float32(act_scales[name]))
                      if name in act_scales else p)
               for name, p in out.items()}
    return out


def _quantize_act(x: jnp.ndarray, a_scale: jnp.ndarray | None):
    """Symmetric per-tensor activation quantization → (int8, scale).
    Static ``a_scale`` (calibrated) when given; dynamic max otherwise."""
    if a_scale is None:
        a_scale = jnp.maximum(jnp.max(jnp.abs(x)) / 127.0, 1e-12)
    x_q = jnp.clip(jnp.round(x / a_scale), -127, 127).astype(jnp.int8)
    return x_q, a_scale


def _conv_q(x: jnp.ndarray, p, relu: bool,
            act_dtype=jnp.bfloat16) -> jnp.ndarray:
    """int8 conv: quantize activations, int32-accumulate on the MXU,
    dequantize into the f32 bias/ReLU epilogue (XLA fuses the epilogue).

    ``act_dtype`` sets the inter-layer activation dtype. bf16 halves the
    HBM traffic between the epilogue and the next layer's quantize —
    measured 198 → 165 ms on the full 6-stage forward at b=128 on v5e —
    and its rounding is far below the int8 quantization noise."""
    x_q, a_scale = _quantize_act(x.astype(jnp.float32), p.get("a_scale"))
    y = jax.lax.conv_general_dilated(
        x_q, p["w_int8"], window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (a_scale * p["w_scale"]) + p["b"]
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(act_dtype)


def calibrate_act_scales(params: Params, images: jnp.ndarray,
                         center_map: jnp.ndarray | None = None,
                         cfg: CPMConfig = CPMConfig(),
                         margin: float = 1.1) -> dict:
    """Post-training calibration: run the f32 forward on a representative
    batch and record per-layer max|input activation| → static scales for
    :func:`quantize_params`. ``margin`` head-rooms unseen data. The whole
    collection is ONE jitted pass (the taps accumulate per-layer maxima as
    extra outputs); host readback happens once at the end — a one-time
    offline step."""
    def collect(images, center_map):
        amaxes: dict = {}

        def tap(name, x):
            amaxes[name] = jnp.max(jnp.abs(x.astype(jnp.float32)))

        cpm_forward(params, images, center_map, cfg, on_conv_input=tap)
        return amaxes

    amaxes = jax.jit(collect)(images, center_map)  # one compiled pass
    amaxes = jax.device_get(amaxes)  # ONE transfer for every tap: a
    # per-layer float() here would pay ~40 host↔device round-trips
    # (~10 s under the axon tunnel's ~0.2 s RTT).
    return {name: max(float(a) * margin / 127.0, 1e-12)
            for name, a in amaxes.items()}


def _is_quantized(params: Params) -> bool:
    return "w_int8" in next(iter(params.values()))


def _make_conv(params: Params, cfg: CPMConfig, on_conv_input=None):
    """Layer-applier closure ``c(name, h, relu)`` + the activation dtype —
    shared by the staged forward pieces below so a caller can compose
    stage 1 and the refinement stages WITHOUT recomputing anything."""
    quantized = _is_quantized(params)
    dtype = jnp.float32 if quantized else jnp.dtype(cfg.compute_dtype)

    def c(name, h, relu=True):
        if on_conv_input is not None:
            on_conv_input(name, h)  # calibration tap (traced with the pass)
        if quantized:
            return _conv_q(h, params[name], relu,
                           act_dtype=jnp.dtype(cfg.compute_dtype))
        return _conv(h, params[name], relu, dtype)

    return c, dtype


def _stage1_forward(c, images):
    """Stage-1 path: full-res trunk (reused downstream) + belief head.
    Returns (trunk1 at 1/8 res, beliefs_1 f32)."""
    trunk1 = _pool(c("conv1_stage1", images))
    trunk1 = _pool(c("conv2_stage1", trunk1))
    trunk1 = _pool(c("conv3_stage1", trunk1))
    h = c("conv4_stage1", trunk1)
    h = c("conv5_stage1", h)
    h = c("conv6_stage1", h)
    b = c("conv7_stage1", h, relu=False).astype(jnp.float32)
    return trunk1, b


def _refine_trunk(c, images, trunk1, cfg):
    """The refinement stages' image-feature trunk (computed ONCE per
    image; multi-person decode reuses it across person hypotheses)."""
    if cfg.share_trunk:
        return trunk1  # one full-res trunk feeds both paths
    # Separate refinement trunk (reference layout).
    f = _pool(c("conv1_stage2", images))
    f = _pool(c("conv2_stage2", f))
    return _pool(c("conv3_stage2", f))


def _refine_forward(c, dtype, images, trunk1, belief1, center_map, cfg,
                    n_stages):
    """Stages 2..n_stages given precomputed stage-1 results. Returns the
    list of refined belief maps (stage-1's NOT included)."""
    f = _refine_trunk(c, images, trunk1, cfg)

    if cfg.use_center_map:
        if center_map is None:
            # Without this check the missing center channel surfaces as an
            # opaque XLA channel-count mismatch inside Mconv1.
            raise ValueError(
                "cfg.use_center_map=True requires a center_map for a "
                ">1-stage forward (stages 2+ concat the downsampled center "
                "hint); pass one or set use_center_map=False")
        cmap_lo = pre.downsample_center_map(
            center_map, cfg.stride).astype(dtype)
    else:
        cmap_lo = None
    return _refine_stages(c, dtype, f, belief1, cmap_lo, cfg, n_stages)


def _refine_stages(c, dtype, f, belief1, cmap_lo, cfg, n_stages):
    """The stage-2..n refinement loop over precomputed features ``f``,
    stage-1 beliefs, and an (optional) LOW-RES center hint."""
    beliefs = []
    prev = belief1
    for t in range(2, n_stages + 1):
        feat_name = "conv4_stage2" if t == 2 else f"conv1_stage{t}"
        feat = c(feat_name, f)
        parts = [feat, prev.astype(dtype)]
        if cmap_lo is not None:
            parts.append(cmap_lo)
        h = jnp.concatenate(parts, axis=-1)
        h = c(f"Mconv1_stage{t}", h)
        h = c(f"Mconv2_stage{t}", h)
        h = c(f"Mconv3_stage{t}", h)
        h = c(f"Mconv4_stage{t}", h)
        prev = c(f"Mconv5_stage{t}", h, relu=False).astype(jnp.float32)
        beliefs.append(prev)
    return beliefs


def cpm_forward(params: Params, images: jnp.ndarray,
                center_map: jnp.ndarray | None = None,
                cfg: CPMConfig = CPMConfig(),
                on_conv_input=None,
                num_stages: int | None = None) -> List[jnp.ndarray]:
    """All-stage forward pass.

    Args:
      images: (B, S, S, 3) normalized inputs (see ops/preprocess.py).
      center_map: (B, S, S, 1) full-res center map, or None.
    Returns:
      list of per-stage belief maps, each (B, H, H, P+1) float32 —
      intermediate supervision needs every stage (SURVEY.md §2 row 3);
      inference uses [-1].
    """
    c, dtype = _make_conv(params, cfg, on_conv_input)
    trunk1, b1 = _stage1_forward(c, images)
    n_stages = cfg.num_stages if num_stages is None else num_stages
    if n_stages == 1:
        return [b1]
    return [b1] + _refine_forward(c, dtype, images, trunk1, b1, center_map,
                                  cfg, n_stages)


def estimate_person_centers(stage1_beliefs: jnp.ndarray,
                            cfg: CPMConfig = CPMConfig()) -> jnp.ndarray:
    """(B, h, h, P+1) stage-1 beliefs → (B, 2) person centers in input px.

    TPU-native center localization (SURVEY.md §2 row 2): the reference
    lineage assumes a centered person (or a separate PersonNet); here the
    center is refined IN-GRAPH as the spatial expectation of the stage-1
    foreground mass (max over part channels), so off-center crops still
    get a well-placed centering hint for stages 2+."""
    fg = jnp.max(stage1_beliefs[..., :-1], axis=-1)        # (B, h, h)
    b, h, w = fg.shape
    flat = fg.reshape(b, h * w)
    m = jnp.max(flat, axis=-1, keepdims=True)
    p = jax.nn.softmax(50.0 * (flat - m), axis=-1).reshape(b, h, w)
    ys = jnp.arange(h, dtype=jnp.float32) * cfg.stride
    xs = jnp.arange(w, dtype=jnp.float32) * cfg.stride
    cy = jnp.einsum("bhw,h->b", p, ys)
    cx = jnp.einsum("bhw,w->b", p, xs)
    return jnp.stack([cx, cy], axis=-1)


def _decode(heatmaps: jnp.ndarray, cfg: CPMConfig, beta: float):
    """Heatmaps → (joints_px, conf): the Pallas fused soft-argmax on TPU
    (measured 1.77× vs XLA, exact-equal), XLA elsewhere; forced by
    ``cfg.decode_impl``. Single dispatch point for every decode caller."""
    impl = cfg.decode_impl
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from tpu_pose.ops import pallas_kernels
        return pallas_kernels.soft_argmax_pallas(
            heatmaps, beta=beta, stride=cfg.stride)
    return decode_lib.soft_argmax(heatmaps, beta=beta, stride=cfg.stride)


def estimate_2d_from_images(params: Params, images: jnp.ndarray,
                            cfg: CPMConfig = CPMConfig(),
                            beta: float = 100.0,
                            refine_center: bool = False,
                            refine_scale: bool = False,
                            letterbox: bool = False,
                            source_frame: bool = True,
                            scale_target_frac: float = 0.6,
                            max_zoom: float = 3.0,
                            scale_from_refined: bool = False,
                            scale_iters: int = 1,
                            flip_tta: bool = False,
                            scale_tta: tuple = ()):
    """Raw (possibly uint8) images → heatmaps + decoded joints, one traced
    program (SURVEY.md §3.1 rebuilt without the host boundary).

    Args:
      images: (B, H₀, W₀, 3), any size — resized in-graph.
      refine_center: estimate per-image person centers from stage-1
        beliefs and center the stages-2+ hint there (SURVEY.md §2 row 2)
        instead of assuming a centered person. STRUCTURALLY free: stage 1
        is computed once and its trunk+beliefs are reused by the
        refinement stages (no reliance on XLA CSE; the FLOP overhead is
        just the per-image Gaussian hint — asserted ≤1.02× by
        tests/test_cpm.py::test_refine_center_flop_overhead).
      refine_scale: TWO-PASS scale normalization (SURVEY.md §2 row 2's
        contract completed for SCALE, VERDICT r2 next #1): a stage-1-only
        first pass estimates the person's center and extent
        (:func:`estimate_person_geometry`); an in-graph crop/zoom
        (``jax.image.scale_and_translate`` — traced affine, static
        shapes) renormalizes the person to the scale the network trains
        at; the FULL network then runs on the crop and decoded joints map
        back through the inverse crop affine. Subsumes refine_center (the
        crop is person-centered, so the centered hint is correct).
        Overhead: one extra stage-1 pass ≈ 1.35× FLOPs.
      letterbox: aspect-preserving resize + centered pad (the reference's
        "resize → pad" contract, SURVEY.md §2 row 1) instead of a
        distorting square resize; use for non-square inputs.
      source_frame: with letterbox, map decoded joints back to SOURCE
        image pixels (the natural user contract); False keeps them in the
        network frame (the fused fit consumes network-frame joints).
    Returns: (heatmaps (B, 46, 46, P+1), joints_px (B, P, 2), conf (B, P)).
    With ``refine_scale`` the heatmaps are in the CROP frame (joints are
    mapped back; per-pixel consumers should use the crop affine).

    ``flip_tta``: horizontal-flip test-time augmentation — the CPM-era
    evaluation protocol (the CPM paper's benchmark numbers average the
    original and mirrored inputs). The FULL pipeline (incl. any
    refine_scale crop) runs again on the mirrored net frame; its joints
    map back (x → S−1−x, left↔right channels swapped per
    joints.CPM_FLIP_PERM) and the two passes merge by CONFIDENCE-
    WEIGHTED joint averaging. Joint-space merging is exact under the
    cell-corner convention; naively flipping heatmap columns before one
    decode would misalign the grid by stride−1 px. 2× CPM FLOPs;
    heatmaps returned are the unflipped pass's.

    ``scale_tta``: multi-scale test-time augmentation — the other half
    of the CPM-era evaluation protocol (the paper's benchmark numbers
    average several image scales). Each entry s runs the FULL pipeline
    on a centered zoom of the net frame (``_crop_zoom`` at scale s;
    s < 1 shrinks the person, s > 1 enlarges) and its joints map back
    through the inverse affine; all passes (base + scales, × mirrored
    when ``flip_tta``) merge by the same confidence-weighted joint
    averaging. s == 1.0 entries are skipped (the base pass covers
    them). Cost: (1 + len(scales)) × (2 if flip_tta) × CPM FLOPs.
    Heatmaps returned are the base pass's. Single-person paths only —
    the multi-person path normalizes scale per hypothesis via its
    refine_scale crop instead (estimate_2d_multi).
    """
    x = jax.vmap(lambda im: pre.preprocess(
        im, cfg.input_size, letterbox=letterbox))(images)
    conv, dtype = _make_conv(params, cfg)

    def centered_cmap(n):
        cm = pre.gaussian_center_map(cfg.input_size, cfg.center_sigma)
        return jnp.broadcast_to(cm, (n, *cm.shape))

    def run_net(xn, base=None, view_affine=None):
        """Stage 1 → (refine_scale crop) → refinement stages → decode,
        on one preprocessed net-frame batch.

        ``base``/``view_affine``: when ``xn`` is a TTA view (a centered
        zoom of ``base`` under ``view_affine = (s, t)``), refine_scale
        COMPOSES the view affine into its crop instead of cropping the
        already-resampled view — resampling happens once from ``base``
        and the max_zoom clamp bounds the TOTAL zoom (a TTA view must
        not multiply past it). With a view affine + refine_scale the
        returned joints are in the BASE net frame (the total affine is
        inverted here); otherwise they are in ``xn``'s frame.
        """
        trunk1, b1 = _stage1_forward(conv, xn)
        rc = refine_center
        crop_s = crop_t = None
        if refine_scale:
            # Iterative crop refinement: each round estimates the person
            # geometry in the CURRENT crop, maps it back to the net
            # frame, recomputes the TOTAL affine (so the clamp applies
            # to the total zoom and resampling always happens once, from
            # the original — no compounding blur), and re-runs stage 1.
            # Round 2+ sees a person already near training scale, so its
            # geometry estimate is much sharper — this is what rescues
            # the smallest people.
            x0 = xn if base is None else base
            b = xn.shape[0]
            if view_affine is None:
                crop_s = jnp.ones((b,), jnp.float32)
                crop_t = jnp.zeros((b, 2), jnp.float32)
            else:
                crop_s, crop_t = view_affine
            for it in range(max(1, scale_iters)):
                if it == 0 and scale_from_refined and cfg.num_stages > 1:
                    # Geometry from the FULL refined decode of pass 1
                    # (≈2× cost). Measured WORSE than stage-1 geometry on
                    # the hard benchmark (36.7 vs 32.1 px): the centered
                    # hint biases the refined decode toward the frame
                    # center on off-center people, while stage 1 takes no
                    # hint at all. Kept selectable for real-weight sweeps.
                    cmap0 = (centered_cmap(b) if cfg.use_center_map
                             else None)
                    hm1 = _refine_forward(conv, dtype, xn, trunk1, b1,
                                          cmap0, cfg, cfg.num_stages)[-1]
                    j1, c1 = _decode(hm1, cfg, beta)
                    centers, extent = person_geometry_from_joints(j1, c1)
                else:
                    centers, extent = estimate_person_geometry(b1, cfg)
                # Crop-frame geometry → net frame → new TOTAL affine
                # (inverse of the TRUE index mapping, like
                # joints_from_crop_frame).
                centers_net = (centers - crop_index_translation(
                    crop_s, crop_t)) / crop_s[..., None]
                extent_net = extent / crop_s
                crop_s, crop_t = crop_affine_from_geometry(
                    centers_net, extent_net, cfg,
                    target_frac=scale_target_frac, max_zoom=max_zoom)
                xn = _crop_zoom(x0, crop_s, crop_t)
                # The person is now centered near training scale, so the
                # assume-centered contract holds by construction.
                trunk1, b1 = _stage1_forward(conv, xn)
            rc = False

        if cfg.use_center_map:
            if rc:
                # Stage-1 per-part decode (already in hand) →
                # conf-weighted person centers → per-image Gaussian hints
                # for the refinement stages. (The earlier
                # foreground-argmax estimate centered the hint on the
                # single STRONGEST JOINT — measured on the hard benchmark
                # it dragged refinement off-body, 34.9 → 86.7 px; the
                # weighted mean is the body center the training-time
                # hints use.)
                centers, _ = estimate_person_geometry(b1, cfg)
                cmap = jax.vmap(
                    lambda c: pre.gaussian_center_map(
                        cfg.input_size, cfg.center_sigma,
                        center=c))(centers)
            else:
                cmap = centered_cmap(xn.shape[0])
        else:
            cmap = None
        if cfg.num_stages == 1:
            heatmaps = b1
        else:
            heatmaps = _refine_forward(conv, dtype, xn, trunk1, b1, cmap,
                                       cfg, cfg.num_stages)[-1]
        joints, conf = _decode(heatmaps, cfg, beta)
        if crop_s is not None:
            joints = joints_from_crop_frame(joints, crop_s, crop_t)
        return heatmaps, joints, conf

    heatmaps, joints, conf = run_net(x)
    scales = [float(s) for s in scale_tta if float(s) != 1.0]
    if flip_tta or scales:
        from tpu_pose.models.joints import CPM_FLIP_PERM

        def mirror_back(j, c):
            # Continuous pixel p ↔ (S−1)−p under jnp.flip (pixel centers
            # at integers), then swap left/right channels.
            j = j.at[..., 0].set(cfg.input_size - 1.0 - j[..., 0])
            return j[:, CPM_FLIP_PERM, :], c[:, CPM_FLIP_PERM]

        b = x.shape[0]
        # t = (S/2)(1−s) puts the zoom's TRUE index-space fixed point at
        # (S−1)/2 — the mirror fixed point — so centered zoom and
        # horizontal flip commute EXACTLY (verified empirically on
        # scale_and_translate) and flip⊗scale TTA stays
        # mirror-equivariant by construction (tested).
        half = cfg.input_size / 2.0
        # (input, affine) per TTA view; affine None = identity.
        views = [(x, None, None)]
        for s in scales:
            sv = jnp.full((b,), s, jnp.float32)
            tv = jnp.full((b, 2), half * (1.0 - s), jnp.float32)
            views.append((_crop_zoom(x, sv, tv), sv, tv))
        xm = x[:, :, ::-1, :] if flip_tta else None
        passes = [(joints, conf)]
        for i, (xv, sv, tv) in enumerate(views):
            aff = None if sv is None else (sv, tv)
            # With refine_scale, run_net composes the view affine into
            # its crop and returns BASE-frame joints itself; otherwise
            # joints come back in the view frame and map here.
            unscale = (aff is not None) and not refine_scale
            if i > 0:
                _, j_s, c_s = run_net(xv, base=x, view_affine=aff)
                if unscale:
                    j_s = joints_from_crop_frame(j_s, sv, tv)
                passes.append((j_s, c_s))
            if flip_tta:
                # mirror(zoom(x)) == zoom(mirror(x)) exactly (centered
                # zoom commutes with the mirror), so the mirrored view's
                # base is mirror(x) under the SAME view affine.
                _, j_f, c_f = run_net(xv[:, :, ::-1, :], base=xm,
                                      view_affine=aff)
                j_f, c_f = mirror_back(j_f, c_f)
                if unscale:
                    j_f = joints_from_crop_frame(j_f, sv, tv)
                passes.append((j_f, c_f))
        js = jnp.stack([j for j, _ in passes])        # (N, B, P, 2)
        cs = jnp.stack([c for _, c in passes])        # (N, B, P)
        joints = (jnp.sum(js * cs[..., None], 0)
                  / (jnp.sum(cs, 0) + 1e-8)[..., None])
        conf = jnp.mean(cs, 0)
    if letterbox and source_frame:
        affine = pre.letterbox_affine(
            images.shape[1], images.shape[2], cfg.input_size)
        joints = pre.joints_to_source_frame(joints, affine)
    return heatmaps, joints, conf


def estimate_person_geometry(stage1_beliefs: jnp.ndarray,
                             cfg: CPMConfig = CPMConfig(),
                             beta: float = 30.0):
    """Stage-1 beliefs (B, h, h, P+1) → per-image person center AND
    scale, in input pixels (SURVEY.md §2 row 2's contract completed for
    scale — VERDICT r2 next #1).

    Per-part soft-argmax over the stage-1 part channels gives 14 coarse
    joint estimates; the person center is their confidence-weighted mean
    and the scale is the confidence-weighted L∞ extent around it — the
    same extent convention the synthetic data defines GT scale with
    (``scale_frac = extent_px / (input_size/2)``). Confidence weighting
    (normalized per-part peak belief) keeps background-noise channels
    from inflating the extent.

    Returns (centers (B, 2) px, extent_px (B,)).
    """
    joints, conf = decode_lib.soft_argmax(stage1_beliefs, beta=beta,
                                          stride=cfg.stride)
    return person_geometry_from_joints(joints, conf)


def person_geometry_from_joints(joints: jnp.ndarray, conf: jnp.ndarray):
    """Decoded joints (..., P, 2) + conf (..., P) → (centers (..., 2),
    extent_px (...,)): confidence-weighted center and L∞ extent — the
    geometry core shared by :func:`estimate_person_geometry` (stage-1
    beliefs) and the per-hypothesis multi-person scale refinement
    (refined decodes)."""
    # conf is the raw per-part max belief — can be NEGATIVE on untrained
    # or degenerate maps; clamp before using it as a weight.
    conf = jnp.maximum(conf, 1e-6)
    w = conf / (jnp.sum(conf, axis=-1, keepdims=True) + 1e-8)
    centers = jnp.sum(w[..., None] * joints, axis=-2)
    d = jnp.max(jnp.abs(joints - centers[..., None, :]), axis=-1)  # L∞
    # Soft-max-like extent: weight each part's distance by its relative
    # confidence so one noisy channel can only overestimate mildly
    # (overestimation zooms LESS — the safe direction).
    wmax = conf / (jnp.max(conf, axis=-1, keepdims=True) + 1e-8)
    extent = jnp.max(d * jnp.sqrt(wmax), axis=-1)
    return centers, extent


def crop_index_translation(s: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """``jax.image.scale_and_translate``'s ``translation`` parameter is
    defined in the half-integer pixel-CENTER convention, so the TRUE
    index-space content mapping of :func:`_crop_zoom` is
    ``crop_idx = net_idx · s + (t + 0.5·(s − 1))`` (verified empirically:
    a delta at index i lands at exactly that coordinate, and mirror
    commutation holds only under it). Every joint↔crop conversion must
    use THIS translation; using the raw ``t`` biases mapped-back joints
    by 0.5·(s−1) px (≈1 px at max_zoom 3)."""
    return t + 0.5 * (s[..., None] - 1.0)


def crop_affine_from_geometry(centers: jnp.ndarray, extent_px: jnp.ndarray,
                              cfg: CPMConfig = CPMConfig(),
                              target_frac: float = 0.6,
                              max_zoom: float = 3.0,
                              min_zoom: float = 0.5):
    """(centers, extent) → per-image crop affine (s, t) for
    :func:`_crop_zoom` (index mapping ``crop_idx = net_idx · s +
    crop_index_translation(s, t)``): zoom chosen so the person's extent
    maps to ``target_frac`` of the half-frame and the center maps to the
    frame center (S−1)/2 in index space. Zoom is clamped to
    [min_zoom, max_zoom] — a missing/degenerate detection must not
    explode the resample. Returns (s (B,), t (B, 2)).

    The 0.6 default deliberately UNDERSHOOTS the 0.8 training scale:
    geometry noise that underestimates the extent then still leaves the
    limbs inside the crop. Measured on the hard benchmark (scales
    0.3–1.0, trained 0.45–0.95): target 0.8 → 32.1 px (large people
    lose limbs to over-zoom, 48.4 px on scales ≥0.8); target 0.6 →
    24.4 px — AT the fixed-scale baseline (24.7 px, ratio 0.99)."""
    half = cfg.input_size / 2.0
    s = target_frac * half / jnp.maximum(extent_px, 1e-3)
    s = jnp.clip(s, min_zoom, max_zoom)
    # center ↦ (S−1)/2 under the TRUE index mapping:
    # c·s + t + 0.5(s−1) = (S−1)/2  ⇒  t = S/2 − (c + 0.5)·s.
    t = half - (centers + 0.5) * s[..., None]
    return s, t


def _crop_zoom(images_net: jnp.ndarray, s: jnp.ndarray, t: jnp.ndarray,
               fill: float = 0.0) -> jnp.ndarray:
    """Apply per-image crop affines to the (already preprocessed)
    network-frame batch via ``jax.image.scale_and_translate`` (traced
    scale/translation — no dynamic shapes). Out-of-window regions fill
    with ``fill`` (0 = mid-gray in the normalized x/256−0.5 space)."""
    size = images_net.shape[1]

    def one(im, si, ti):
        out = jax.image.scale_and_translate(
            im, (size, size, im.shape[-1]), (0, 1),
            jnp.stack([si, si]), ti[::-1],  # spatial dims are (y, x)
            method="linear")
        # scale_and_translate zero-fills outside the source support;
        # shift to `fill` by resampling a constant-1 mask alongside.
        if fill != 0.0:
            ones = jnp.ones_like(im[..., :1])
            cov = jax.image.scale_and_translate(
                ones, (size, size, 1), (0, 1), jnp.stack([si, si]),
                ti[::-1], method="linear")
            out = out + (1.0 - cov) * fill
        return out

    return jax.vmap(one)(images_net, s, t)


def joints_from_crop_frame(joints_crop: jnp.ndarray, s: jnp.ndarray,
                           t: jnp.ndarray) -> jnp.ndarray:
    """Map (B, P, 2) crop-frame joints back to the network frame through
    the inverse of :func:`_crop_zoom`'s TRUE index affine
    (:func:`crop_index_translation` — NOT the raw ``t``)."""
    t_idx = crop_index_translation(s, t)
    return (joints_crop - t_idx[..., None, :]) / s[..., None, None]


def person_evidence(stage1_beliefs: jnp.ndarray,
                    cfg: CPMConfig = CPMConfig(),
                    person_sigma_px: float = 64.0) -> jnp.ndarray:
    """Person-scale foreground evidence from stage-1 beliefs (B,h,h,P+1)
    → (B,h,h), for multi-person center proposals.

    Max-over-part-channels peaks at EVERY joint, so once the network
    trains sharp, the second NMS peak is just another joint of the SAME
    person with near-equal belief — measured in selfcheck: count
    selection collapsed to 50% (every one-person frame proposed 2).
    Instead: clip+SUM the part channels (total joint mass) and convolve
    with a person-scale Gaussian. A coherent cluster of joints
    integrates into one strong mode at the body center; an isolated limb
    blob stays weak. With the kernel normalized to sum 1 and unit-height
    part blobs (σ≈3 cells), a full person scores ~0.5 and a lone joint
    ~0.15, so ``select_people``'s default ``score_frac=0.4`` separates
    them cleanly.
    """
    fg = jnp.sum(jnp.maximum(stage1_beliefs[..., :-1], 0.0), axis=-1)
    sigma = person_sigma_px / cfg.stride
    r = max(1, int(3.0 * sigma))
    xs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k1 = jnp.exp(-0.5 * (xs / sigma) ** 2)
    k1 = k1 / jnp.sum(k1)
    x = fg[..., None]  # (B, h, w, 1)
    kh = k1.reshape(-1, 1, 1, 1)
    kw = k1.reshape(1, -1, 1, 1)
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "SAME",
                                     dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "SAME",
                                     dimension_numbers=dn)
    return x[..., 0]


def find_person_peaks(fg: jnp.ndarray, k: int, stride: int,
                      nms_radius_px: float):
    """Top-k peaks with non-maximum suppression on a foreground map.

    In-graph greedy NMS: k static rounds of (argmax → record → mask a
    disc of ``nms_radius_px``) — no data-dependent control flow, so it
    jits and vmaps (SURVEY.md-style TPU-native multi-person extension;
    the reference is single-person, ROADMAP r1 #4).

    Args: fg (B, h, w) foreground beliefs. Returns (centers_px (B, k, 2)
    as (x, y), scores (B, k)).
    """
    b, h, w = fg.shape
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    r_cells2 = (nms_radius_px / stride) ** 2
    m = fg
    centers, scores = [], []
    for _ in range(k):
        flat = m.reshape(b, h * w)
        idx = jnp.argmax(flat, axis=-1)                     # (B,)
        score = jnp.take_along_axis(flat, idx[:, None], -1)[:, 0]
        cy = (idx // w).astype(jnp.float32)
        cx = (idx % w).astype(jnp.float32)
        centers.append(jnp.stack([cx * stride, cy * stride], -1))
        scores.append(score)
        d2 = ((ys[None, :, None] - cy[:, None, None]) ** 2
              + (xs[None, None, :] - cx[:, None, None]) ** 2)
        m = jnp.where(d2 <= r_cells2, -jnp.inf, m)
    return jnp.stack(centers, axis=1), jnp.stack(scores, axis=1)


def select_people(scores: jnp.ndarray, min_score: float = 0.05,
                  score_frac: float = 0.4,
                  joints: jnp.ndarray | None = None,
                  dup_px: float = 30.0,
                  allow_empty: bool = False,
                  order_by_score: bool = False,
                  dup_joint_frac: float = 0.0) -> jnp.ndarray:
    """Person-count selection from hypothesis scores (ROADMAP #4's
    remaining piece: fixed ``max_people`` slots, variable TRUE count).

    Two filters:

    1. Score thresholds: a hypothesis must clear an absolute noise floor
       (``min_score``) AND a fraction of the frame's strongest peak
       (``score_frac``).
    2. Pose dedupe (when ``joints`` (B, k, P, 2) is given): hypotheses
       whose DECODED joints lie within ``dup_px`` mean distance of a
       stronger kept hypothesis are duplicates of the same person and
       are dropped. This is the scale-robust person-count signal: a
       one-person frame's spurious center proposals (limb fringes —
       their center-map hints all snap the refinement onto the same
       body) decode near-identical joint sets, while genuinely distinct
       people cannot, regardless of person scale. Peak-score margins
       alone cannot make that distinction once the network trains sharp
       (measured: count accuracy 0.50 on score-only selection vs 14-joint
       evidence peaking at every limb).

    By default the top hypothesis per frame is always kept, so every
    frame yields at least one person — the person-centric contract the
    reference's single-person pipeline assumes (a person IS in frame).
    ``allow_empty=True`` drops that guarantee: a frame whose strongest
    hypothesis clears neither the absolute floor ``min_score`` nor the
    evidence bar reports ZERO people (VERDICT r3 weak #4 — multi-person
    serving and tracked video on person-free stretches need a no-person
    call; pick ``min_score`` from the measured person-free operating
    point, see PARITY.md "empty-frame operating point"). The relative
    ``score_frac`` gate still applies only BETWEEN hypotheses — with
    allow_empty the frame max itself must clear ``min_score`` first.
    Static shapes: returns a (B, k) bool mask, not a ragged result —
    downstream consumers mask, they don't reshape (the jit-stable TPU
    idiom for dynamic counts).

    ``order_by_score``: the greedy dedupe keeps the LOWER-indexed of a
    duplicate pair, which is the stronger one only when hypotheses
    arrive score-sorted (true for the NMS proposal order). TRACK-ordered
    inputs (the video paths gather to track slots) are not sorted, so a
    coasting duplicate in a low slot could kill the real person in a
    high slot; with this flag the dedupe runs in per-frame descending
    score order and the mask scatters back to the input slots.

    ``dup_joint_frac`` > 0 adds a PARTIAL-overlap dedupe: hypothesis j
    also duplicates a stronger kept i when ≥ this fraction of j's
    joints lie within ``dup_px`` of SOME joint of i (nearest-joint, not
    part-aligned). Round-5 measurement (u64 weights, hard one-person
    frames, PARITY.md "empty-frame operating point"): a clutter-decoy
    hint whose decode splits across the real person shares 0.64–1.00
    of its joints with the person slot (nearest-joint mean 10–28 px)
    at a part-ALIGNED mean distance of 49–84 px — invisible to the
    mean-distance dedupe — while genuine second people share 0.00
    (nearest ≥ 105 px); neither evidence score (0.60–0.96 of top) nor
    decode confidence (0.54–1.12 of top) separates the two. 0.5 sits
    mid-gap; 0 (default) keeps the certified round-4 behavior. Meant
    for still/serving count selection (``allow_empty`` paths); the
    video tracker keeps it off — mid-crossing REAL people legitimately
    overlap partially for a few frames.
    """
    if order_by_score:
        ordr = jnp.argsort(-scores, axis=-1)
        inv = jnp.argsort(ordr, axis=-1)
        s_s = jnp.take_along_axis(scores, ordr, -1)
        j_s = (None if joints is None else
               jnp.take_along_axis(joints, ordr[..., None, None], -3))
        m = select_people(s_s, min_score, score_frac, j_s, dup_px,
                          allow_empty, dup_joint_frac=dup_joint_frac)
        return jnp.take_along_axis(m, inv, -1)
    is_top = scores >= jnp.max(scores, axis=-1, keepdims=True)
    keep = ((scores >= min_score)
            & (scores >= score_frac * jnp.max(scores, axis=-1,
                                              keepdims=True)))
    if not allow_empty:
        keep = keep | is_top
    if joints is None:
        return keep
    k = scores.shape[-1]
    # Pairwise mean joint distance (B, k, k); NMS emits hypotheses in
    # descending score order, so a greedy unrolled pass over the static
    # (small) k suffices: j is a duplicate if some kept i < j is within
    # dup_px.
    d = jnp.mean(jnp.linalg.norm(
        joints[..., :, None, :, :] - joints[..., None, :, :, :], axis=-1),
        axis=-1)
    is_dup = d < dup_px
    if dup_joint_frac > 0:
        # overlap[b, j, i] = fraction of j's joints within dup_px of
        # SOME joint of i (nearest-joint; docstring: dup_joint_frac).
        d2 = jnp.linalg.norm(
            joints[..., :, None, :, None, :]
            - joints[..., None, :, None, :, :], axis=-1)  # (B,k,k,P,P)
        overlap = jnp.mean(jnp.min(d2, axis=-1) < dup_px, axis=-1)
        is_dup = is_dup | (overlap >= dup_joint_frac)
    kept_cols = [keep[..., 0:1]]
    for j in range(1, k):
        kept_sofar = jnp.concatenate(kept_cols, axis=-1)      # (B, j)
        dup = jnp.any(kept_sofar & is_dup[..., j, :j], axis=-1)
        kept_cols.append((keep[..., j] & ~dup)[..., None])
    return jnp.concatenate(kept_cols, axis=-1)


def estimate_2d_multi(params: Params, images: jnp.ndarray,
                      cfg: CPMConfig = CPMConfig(),
                      max_people: int = 2,
                      beta: float = 100.0,
                      nms_radius_px: float = 96.0,
                      person_sigma_px: float = 64.0,
                      letterbox: bool = False,
                      refine_scale: bool = False,
                      scale_target_frac: float = 0.6,
                      max_zoom: float = 3.0,
                      flip_tta: bool = False,
                      center_hints: jnp.ndarray | None = None,
                      hint_crop: bool | str = False,
                      hint_crop_dup_px: float = 30.0,
                      hint_crop_min_conf: float = 0.0):
    """Multi-person 2D estimation, one traced program (TPU-native
    extension beyond the single-person reference; VERDICT r1 item 9).

    Strategy: the stage-1 trunk+beliefs and the refinement trunk compute
    ONCE per image; k person-center hypotheses come from NMS'd stage-1
    foreground peaks; the cheap refinement stages then run per-hypothesis
    (k folded into the batch axis) with per-person Gaussian center hints,
    so each hypothesis's belief maps lock onto its own person.

    Requires ``cfg.use_center_map=True`` (the hint is the person selector).

    ``letterbox`` preserves aspect (resize→pad); joints stay in the
    NETWORK frame either way — the api layer maps to source pixels.

    ``flip_tta``: the full per-hypothesis pipeline reruns on the
    mirrored frame with MIRRORED center hints in the SAME slot order —
    slot i denotes the same person in both passes by construction, so
    no hypothesis matching is needed and the merge is the slot-wise
    conf-weighted average of the single-person path. 2× FLOPs.

    ``center_hints``: optional (B, k, 2) NET-frame pixel centers that
    REPLACE the internal NMS peak proposals — slot i decodes the person
    at ``center_hints[b, i]``, so the caller controls slot identity
    (the video tracker's temporal-hint second pass relies on this).
    ``person_scores`` are then the person-evidence values sampled at
    the hints (same scale as the peak scores), so liveness gating keeps
    working.

    ``hint_crop`` (round 5; needs ``center_hints``): run the crop/zoom
    second pass with the crop centered on the HINT instead of on the
    hypothesis decode's geometry. The decode-placement failure the
    tracked-video benchmarks measured (k3 coverage: 3 distinct
    proposals on 100% of frames but a bijective 40 px person cover on
    only 24%) is a slot whose decode slides onto a nearby ESTABLISHED
    person — refine_scale then faithfully crops around the wrong
    person. Hint-centered cropping keeps the window on the track's own
    trajectory, and the zoom multiplies the hint↔distractor separation
    relative to the center-map sigma, which is exactly the selector's
    discriminative axis. Extent (zoom) still comes from the decode
    geometry — people are similar-sized, so scale survives a placement
    miss. Costs one full per-hypothesis pass, same as refine_scale
    (which it overrides on the hinted call when both are set).
    True/"dup" (default) substitutes the crop decode ONLY for slots
    whose plain hinted decode lies within ``hint_crop_dup_px`` mean
    joint distance of a stronger slot's (the measured failure mode);
    "all" replaces every slot — A/B-measured worse (see the in-code
    comment at the selective substitution).

    Returns: heatmaps (B, k, H, H, P+1), joints_px (B, k, P, 2),
    conf (B, k, P), person_scores (B, k).
    """
    if not cfg.use_center_map:
        raise ValueError("estimate_2d_multi needs cfg.use_center_map=True "
                         "(the center hint is what separates people)")
    b = images.shape[0]
    k = max_people
    x = jax.vmap(lambda im: pre.preprocess(
        im, cfg.input_size, letterbox=letterbox))(images)
    conv, dtype = _make_conv(params, cfg)
    trunk1, b1 = _stage1_forward(conv, x)                 # once per image

    fg = person_evidence(b1, cfg, person_sigma_px)        # (B, h, h)
    if center_hints is None:
        centers, person_scores = find_person_peaks(
            fg, k, cfg.stride, nms_radius_px)             # (B, k, 2)
    else:
        # Caller-supplied slots: decode the person at each hint and
        # score it by the evidence there (bilinear, cell-corner
        # convention: pixel x = col·stride).
        centers = jnp.asarray(center_hints, jnp.float32)
        cells = centers[..., ::-1] / cfg.stride           # (B, k, [y,x])
        person_scores = jax.vmap(lambda m, c: jax.scipy.ndimage.map_coordinates(
            m, [c[:, 0], c[:, 1]], order=1, mode="nearest"))(fg, cells)

    def rep(t):  # (B, ...) → (B*k, ...) person-hypothesis fold
        return jnp.repeat(t, k, axis=0)

    def run_multi(xn, centers_n, trunk1_n=None, b1_n=None):
        """Per-hypothesis refinement (+optional crop second pass) on one
        net-frame batch with (B, k, 2) center hints. Joints (B·k) in
        xn's frame."""
        if b1_n is None:
            trunk1_n, b1_n = _stage1_forward(conv, xn)
        f = _refine_trunk(conv, xn, trunk1_n, cfg)        # once per image
        cmaps = jax.vmap(jax.vmap(
            lambda c_: pre.gaussian_center_map(
                cfg.input_size, cfg.center_sigma, center=c_)))(centers_n)
        cmap_lo = pre.downsample_center_map(
            cmaps.reshape((b * k,) + cmaps.shape[2:]),
            cfg.stride).astype(dtype)
        beliefs = _refine_stages(conv, dtype, rep(f), rep(b1_n), cmap_lo,
                                 cfg, cfg.num_stages)
        hm = (beliefs[-1] if beliefs else rep(b1_n))
        joints, conf = _decode(hm, cfg, beta)

        do_hc = bool(hint_crop) and center_hints is not None
        if refine_scale or do_hc:
            # Per-hypothesis scale normalization (the multi-person half
            # of VERDICT r2 next #1): geometry from each hypothesis's
            # REFINED decode (reliable even for the non-dominant person,
            # unlike raw stage-1 evidence), then a per-hypothesis
            # crop/zoom and a full second pass on the normalized crops.
            # The centered default hint is correct by construction — the
            # crop centers its person.
            g_centers, g_extent = person_geometry_from_joints(joints,
                                                              conf)
            if do_hc:
                # Placement override: center the crop on the track's
                # HINT (its smoothed trajectory point), not on wherever
                # this slot's decode landed (docstring: hint_crop).
                g_centers = centers_n.reshape(b * k, 2)
            s, t = crop_affine_from_geometry(
                g_centers, g_extent, cfg, target_frac=scale_target_frac,
                max_zoom=max_zoom)
            xc = _crop_zoom(rep(xn), s, t)
            trunk1c, b1c = _stage1_forward(conv, xc)
            fc = _refine_trunk(conv, xc, trunk1c, cfg)
            cmap_c = pre.gaussian_center_map(cfg.input_size,
                                             cfg.center_sigma)
            cmap_c_lo = pre.downsample_center_map(
                jnp.broadcast_to(cmap_c, (b * k,) + cmap_c.shape),
                cfg.stride).astype(dtype)
            beliefs2 = _refine_stages(conv, dtype, fc, b1c, cmap_c_lo,
                                      cfg, cfg.num_stages)
            hm2 = beliefs2[-1] if beliefs2 else b1c
            joints2, conf2 = _decode(hm2, cfg, beta)
            joints2 = joints_from_crop_frame(joints2, s, t)
            if do_hc and hint_crop != "all":
                # SELECTIVE substitution (the default, "dup"): use the
                # crop decode only for slots whose PLAIN hinted decode
                # duplicates a stronger slot — the measured failure
                # mode (a slot sliding onto an established person).
                # Unconditional replacement ("all") was A/B-measured
                # WORSE on the 10-seed k3/crossing benchmarks (k3 id
                # acc 0.523→0.504, cover40 0.577→0.519): crop-resample
                # noise on the majority of already-correct slots
                # outweighs the gains on the few duplicated ones.
                jb = joints.reshape(b, k, -1, 2)
                d = jnp.mean(jnp.linalg.norm(
                    jb[:, :, None] - jb[:, None, :], axis=-1), axis=-1)
                sc = person_scores                        # (B, k)
                idx = jnp.arange(k)
                stronger = ((sc[:, None, :] > sc[:, :, None])
                            | ((sc[:, None, :] == sc[:, :, None])
                               & (idx[None, None, :] < idx[None, :, None])))
                dup = jnp.any(stronger & (d < hint_crop_dup_px),
                              axis=-1)                    # (B, k)
                if hint_crop_min_conf > 0:
                    # Ghost gate: substituting un-duplicates the slot,
                    # which also disarms the dedupe that (correctly)
                    # killed it when its person is truly ABSENT —
                    # measured on the enter/leave benchmark as
                    # over-counts 0.123→0.189. A crop decode over
                    # background carries low belief (0.10–0.54 of a
                    # person's on these weights), so require the crop
                    # decode's mean conf to clear this fraction of the
                    # frame's best PLAIN slot conf before substituting;
                    # otherwise keep the duplicate and let the dedupe
                    # make the absence call.
                    cm = conf2.reshape(b, k, -1).mean(-1)
                    pm = conf.reshape(b, k, -1).mean(-1)
                    ref = jnp.max(pm, axis=-1, keepdims=True)
                    dup = dup & (cm >= hint_crop_min_conf * ref)
                m = dup.reshape(b * k)
                joints = jnp.where(m[:, None, None], joints2, joints)
                conf = jnp.where(m[:, None], conf2, conf)
                hm = jnp.where(m[:, None, None, None], hm2, hm)
            else:
                hm, joints, conf = hm2, joints2, conf2
        return hm, joints, conf

    hm, joints, conf = run_multi(x, centers, trunk1, b1)
    if flip_tta:
        from tpu_pose.models.joints import CPM_FLIP_PERM
        centers_f = jnp.stack(
            [cfg.input_size - 1.0 - centers[..., 0], centers[..., 1]],
            axis=-1)
        _, j_f, c_f = run_multi(x[:, :, ::-1, :], centers_f)
        j_f = j_f.at[..., 0].set(cfg.input_size - 1.0 - j_f[..., 0])
        j_f = j_f[:, CPM_FLIP_PERM, :]
        c_f = c_f[:, CPM_FLIP_PERM]
        w = conf + c_f + 1e-8
        joints = (joints * conf[..., None]
                  + j_f * c_f[..., None]) / w[..., None]
        conf = 0.5 * (conf + c_f)

    return (hm.reshape((b, k) + hm.shape[1:]),
            joints.reshape((b, k) + joints.shape[1:]),
            conf.reshape((b, k) + conf.shape[1:]),
            person_scores)


def estimate_2d_microbatched(params: Params, images: jnp.ndarray,
                             cfg: CPMConfig = CPMConfig(),
                             chunk: int = 0, **kw):
    """:func:`estimate_2d_from_images` executed in sequential batch
    micro-chunks via ``lax.map`` — peak activation memory becomes
    per-chunk instead of per-batch.

    Why: the int8 path's int32 conv accumulators on the full-res trunk
    are the HBM high-water mark (b×368²×128×4 B ≈ 69 MB/frame); whole-
    batch b≥192 OOMs 16 GB on v5e (bench.py r1). Chunked, the serving
    batch is bounded by the fit, not the trunk. Convs stay large enough
    to saturate the MXU at chunk ≥ 32.

    No-op (falls through to the whole-batch path) when ``chunk`` ≤ 0 or
    ≥ batch. An uneven batch pads up to a chunk multiple (edge-repeat)
    and slices the results back — falling through on remainders would
    silently void the memory bound this function exists to provide.
    """
    b = images.shape[0]
    if chunk <= 0 or chunk >= b:
        return estimate_2d_from_images(params, images, cfg, **kw)
    b_pad = -(-b // chunk) * chunk
    padded = images
    if b_pad != b:
        padded = jnp.concatenate(
            [images, jnp.broadcast_to(images[-1],
                                      (b_pad - b,) + images.shape[1:])])
    folded = padded.reshape((b_pad // chunk, chunk) + padded.shape[1:])
    hm, joints, conf = jax.lax.map(
        lambda im: estimate_2d_from_images(params, im, cfg, **kw), folded)
    return (hm.reshape((b_pad,) + hm.shape[2:])[:b],
            joints.reshape((b_pad,) + joints.shape[2:])[:b],
            conf.reshape((b_pad,) + conf.shape[2:])[:b])
