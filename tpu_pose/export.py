"""AOT export — serialized deployment artifacts for the fused pipeline.

The reference deploys by shipping model code + checkpoints and re-tracing
at startup (TF1 session graphs; SURVEY.md §1 L0). The TPU-native
deployment story is ahead-of-time: `jax.export` lowers the jitted program
to StableHLO once, CPM weights / SMPL model / prior are baked in as
constants, and the serialized artifact runs anywhere jax runs — no
tpu_pose model code, no checkpoint loading, no Python re-trace at serve
time. This module is that packaging layer (SURVEY.md §2 row 14
"entry points", production half).

Artifact layout (a directory):

- ``meta.json``   — format version, exported function, platforms, input
  spec, output spec, decode impl, estimator settings echo. Human-readable
  contract of what the program computes.
- ``program.bin`` — the serialized ``jax.export.Exported`` (StableHLO +
  calling convention + embedded constants).

Five exportable functions (the serving entry points):

- ``estimate_2d``          — frames → heatmaps, 2D joints, confidences.
- ``estimate_and_fit``     — frames → the full fused result (2D joints,
  SMPL θ/β/cam, posed vertices, 3D joints, energies).
- ``estimate_and_fit_multi`` — the multi-person fused path (static
  ``max_people`` slots + person mask).
- ``estimate_and_fit_video`` — the fused video path (leading dim = T;
  ``mode`` smooth | temporal | independent).
- ``fit_smpl``             — (joints2d, conf) → SMPL fit + posed mesh,
  for deployments whose 2D joints come from an external detector.

Batch dimension: ``batch=None`` (default) exports with a SYMBOLIC batch
size — one artifact serves any batch, including the serving layer's
bucket ladder. A static int pins it (required when the estimator uses
``cpm_microbatch`` chunking, whose scan length must be concrete).

Platform targeting: artifacts are cross-lowered — a CPU host can export
for TPU and vice versa. ``platforms=("tpu", "cpu")`` builds one portable
artifact (decode forced to the XLA path, portable by construction);
single-platform TPU artifacts keep the fused Pallas decode when the
estimator's ``decode_impl`` resolves to it.

Loading needs only this module's :func:`load` (pure jax + json, no model
code): ``prog = load(path); out = prog(frames)`` returns numpy arrays.

Numerics note: the serialized program is the SAME StableHLO the live
estimator traces, but XLA re-optimizes it at load time; the iterative
fit amplifies reduction-order differences to ~1e-3 on θ/cam (measured).
Pre-fit outputs (joints2d, conf) reproduce to float tolerance.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

FORMAT_VERSION = 1
FUNCTIONS = ("estimate_2d", "estimate_and_fit", "estimate_and_fit_multi",
             "estimate_and_fit_video", "fit_smpl")
_META_NAME = "meta.json"
_PROGRAM_NAME = "program.bin"


def _resolve_decode_impl(cpm_cfg, platforms: Sequence[str]) -> str:
    """Pin ``decode_impl="auto"`` to the export target: the Pallas fused
    soft-argmax only for single-platform TPU artifacts, the XLA decode
    everywhere else (multi-platform artifacts must be portable)."""
    if cpm_cfg.decode_impl != "auto":
        return cpm_cfg.decode_impl
    return "pallas" if tuple(platforms) == ("tpu",) else "xla"


def _estimator_with_cfg(est, cpm_cfg):
    """Shallow clone with a replaced CPMConfig — the impl methods read
    ``self.cpm_cfg`` at trace time; nothing else in the clone is used."""
    import copy
    est2 = copy.copy(est)
    est2.cpm_cfg = cpm_cfg
    return est2


def _build_fn(est, fn_name: str, params, **fn_kwargs):
    """Dict-returning wrapper over the estimator's traced impl. Dicts
    (not NamedTuples) so deserialization needs no pytree registration."""
    if fn_name == "estimate_2d":
        from tpu_pose.models import cpm as cpm_lib

        def fn(frames):
            hm, joints, conf = cpm_lib.estimate_2d_microbatched(
                params, frames, cfg=est.cpm_cfg, chunk=est.cpm_microbatch,
                refine_center=est.refine_center,
                refine_scale=est.refine_scale,
                scale_from_refined=est.scale_from_refined,
                flip_tta=est.flip_tta,
                scale_tta=getattr(est, "scale_tta", ()),
                letterbox=est.letterbox)
            return {"heatmaps": hm, "joints2d": joints, "conf": conf}
        return fn
    if fn_name == "estimate_and_fit":
        def fn(frames):
            return est._estimate_and_fit_impl(
                params, est.smpl_model, frames)._asdict()
        return fn
    if fn_name == "estimate_and_fit_video":
        mode = fn_kwargs.get("mode", "smooth")
        if mode not in ("smooth", "temporal", "independent"):
            raise ValueError(f"unknown video mode: {mode!r}")

        def fn(frames):
            return est._estimate_and_fit_video_impl(
                params, est.smpl_model, frames, mode=mode)._asdict()
        return fn
    if fn_name == "estimate_and_fit_multi":
        kw = dict(max_people=2, min_person_score=0.05,
                  person_score_frac=0.4, dup_px=30.0)
        kw.update(fn_kwargs)

        def fn(frames):
            return est._estimate_and_fit_multi_impl(
                params, est.smpl_model, frames, **kw)._asdict()
        return fn
    if fn_name == "fit_smpl":
        # Joints-only deployment (an external 2D detector feeds the
        # fit): joints2d in NETWORK-frame pixels (FitConfig.img_size),
        # conf in [0, 1]. Mirrors the fused impl's fit+mesh tail.
        from tpu_pose.fitting import fit as fit_lib
        from tpu_pose.models import smpl as smpl_lib

        def fn(joints2d, conf):
            if est.fit_restarts > 1:
                res = jax.vmap(
                    lambda j, c: fit_lib.fit_smpl_multistart(
                        est.smpl_model, j, c, cfg=est.fit_cfg,
                        prior=est.prior,
                        restarts=est.fit_restarts))(joints2d, conf)
            else:
                init = est._head_init(est.smpl_model, joints2d, conf)
                res = fit_lib.fit_smpl_batch(
                    est.smpl_model, joints2d, conf, cfg=est.fit_cfg,
                    prior=est.prior, init=init)
            out = smpl_lib.smpl_forward_batch(
                est.smpl_model, res.beta, res.theta,
                precision=smpl_lib.EXACT_PRECISION)
            return {"theta": res.theta, "beta": res.beta,
                    "cam": res.cam, "vertices": out.vertices,
                    "joints3d": out.joints, "energy": res.energy}
        return fn
    raise ValueError(f"unknown fn {fn_name!r}; expected one of {FUNCTIONS}")


def export_estimator(est, path: str, fn: str = "estimate_and_fit",
                     batch: Optional[int] = None,
                     input_shape: Optional[tuple] = None,
                     platforms: Optional[Sequence[str]] = None,
                     params_batch_hint: int = 1,
                     n_devices: Optional[int] = None,
                     **fn_kwargs) -> dict:
    """Export one of the estimator's fused entry points as a standalone
    artifact directory at ``path``.

    Args:
      est: a ``PoseEstimator``; its refine/flip/letterbox settings are
        honored and recorded in the artifact metadata.
      fn: one of :data:`FUNCTIONS`.
      batch: static batch size, or None for a symbolic batch dimension
        (one artifact, any batch). Incompatible with ``cpm_microbatch``.
      input_shape: (H, W) of the input frames; defaults to the network
        input size. Frames are uint8 (B, H, W, 3).
      platforms: lowering targets, e.g. ``("tpu",)``, ``("cpu",)`` or
        ``("tpu", "cpu")``; defaults to the current backend. Cross-
        lowering works (export for TPU from a CPU host).
      params_batch_hint: which side of the int8/bf16 precision policy to
        bake when ``batch=None`` (the policy is batch-dependent;
        a static ``batch`` overrides the hint).
      n_devices: None (default) exports a single-device program. An int
        exports a MULTI-CHIP data-parallel program: the batch dimension
        is sharded over a 1-D ``("data",)`` mesh of that many devices
        (params ride along replicated), XLA partitions the whole fused
        pipeline, and the serialized program records the device
        topology. Requires a static ``batch`` divisible by
        ``n_devices``; loading requires ≥ ``n_devices`` visible devices
        (the loader rebuilds the mesh and shards inputs itself).
      **fn_kwargs: static knobs of the multi-person path
        (``max_people``, ``min_person_score``, ...).

    Returns the metadata dict that was written to ``meta.json``.
    """
    if fn not in FUNCTIONS:
        raise ValueError(f"unknown fn {fn!r}; expected one of {FUNCTIONS}")
    if fn_kwargs and fn not in ("estimate_and_fit_multi",
                                "estimate_and_fit_video"):
        raise ValueError(
            f"{fn} takes no extra kwargs, got {sorted(fn_kwargs)}")
    if n_devices is not None:
        if batch is None:
            raise ValueError("sharded export needs a static batch")
        if batch % n_devices:
            raise ValueError(
                f"batch {batch} not divisible by n_devices {n_devices}")
        if len(jax.devices()) < n_devices:
            raise ValueError(
                f"need {n_devices} devices to lower the sharded program, "
                f"have {len(jax.devices())}")
    if batch is None and est.cpm_microbatch:
        raise ValueError(
            "symbolic batch (batch=None) is incompatible with "
            "cpm_microbatch chunking — pass a static batch")
    platforms = tuple(platforms) if platforms else (jax.default_backend(),)
    decode_impl = _resolve_decode_impl(est.cpm_cfg, platforms)
    if batch is None and decode_impl == "pallas":
        # The Pallas soft-argmax grid is sized by the (flattened) batch,
        # which a symbolic dimension can't provide.
        if est.cpm_cfg.decode_impl == "pallas":
            raise ValueError(
                "decode_impl='pallas' needs a static batch — pass batch=N "
                "or leave decode_impl='auto' (falls back to the XLA "
                "decode for symbolic-batch artifacts)")
        decode_impl = "xla"
    est2 = _estimator_with_cfg(
        est, dataclasses.replace(est.cpm_cfg, decode_impl=decode_impl))
    params = est2._params_for_batch(
        batch if batch is not None else params_batch_hint)

    h, w = input_shape or (est.cpm_cfg.input_size, est.cpm_cfg.input_size)
    if batch is None:
        bdim = jax_export.symbolic_shape("b")[0]
    else:
        bdim = int(batch)
    b_meta = "b" if batch is None else int(batch)
    if fn == "fit_smpl":
        p = est.cpm_cfg.num_joints
        specs = (jax.ShapeDtypeStruct((bdim, p, 2), jnp.float32),
                 jax.ShapeDtypeStruct((bdim, p), jnp.float32))
        inputs_meta = [
            {"name": "joints2d", "shape": [b_meta, p, 2],
             "dtype": "float32"},
            {"name": "conf", "shape": [b_meta, p], "dtype": "float32"}]
    else:
        specs = (jax.ShapeDtypeStruct((bdim, h, w, 3), jnp.uint8),)
        inputs_meta = [{"name": "frames",
                        "shape": [b_meta, int(h), int(w), 3],
                        "dtype": "uint8"}]
    wrapped = _build_fn(est2, fn, params, **fn_kwargs)
    if n_devices is None:
        jitted = jax.jit(wrapped)
    else:
        from jax.sharding import (Mesh, NamedSharding,
                                  PartitionSpec as PS)
        mesh = Mesh(np.array(jax.devices()[:n_devices]), ("data",))
        batch_shard = NamedSharding(mesh, PS("data"))
        jitted = jax.jit(wrapped,
                         in_shardings=(batch_shard,) * len(specs))
        specs = tuple(
            jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=batch_shard)
            for s in specs)
    exported = jax_export.export(jitted, platforms=list(platforms))(*specs)

    meta = {
        "format_version": FORMAT_VERSION,
        "fn": fn,
        "fn_kwargs": fn_kwargs,
        "platforms": list(platforms),
        "decode_impl": decode_impl,
        # "input" mirrors inputs[0] for image artifacts (ServableProgram
        # and pre-video consumers read it); "inputs" is authoritative.
        "input": {"shape": inputs_meta[0]["shape"],
                  "dtype": inputs_meta[0]["dtype"]},
        "inputs": inputs_meta,
        "sharding": (None if n_devices is None else
                     {"n_devices": int(n_devices), "axis": "data"}),
        "outputs": _out_spec(exported),
        "estimator": {
            "refine_center": bool(est.refine_center),
            "refine_scale": bool(est.refine_scale),
            "flip_tta": bool(est.flip_tta),
            # Manifest records what the PROGRAM does: scale TTA runs
            # only on the single-person image front ends (the multi
            # path normalizes scale per hypothesis; fit_smpl has no
            # CPM at all).
            "scale_tta": ([float(s) for s in
                           getattr(est, "scale_tta", ())]
                          if fn in ("estimate_2d", "estimate_and_fit",
                                    "estimate_and_fit_video") else []),
            "letterbox": bool(est.letterbox),
            "fit_restarts": int(est.fit_restarts),
            "quantized_params": _params_quantized(params),
        },
        "tpu_pose_version": _version(),
    }
    blob = exported.serialize()
    meta["program_sha256"] = hashlib.sha256(blob).hexdigest()
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _PROGRAM_NAME), "wb") as f:
        f.write(blob)
    with open(os.path.join(path, _META_NAME), "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
    return meta


def _out_spec(exported) -> dict:
    """Output name → {shape, dtype} from the Exported's out tree."""
    leaves_names = exported.out_tree.unflatten(
        [str(i) for i in range(len(exported.out_avals))])
    # leaves_names is the dict {name: index-string}.
    return {name: {"shape": [str(d) for d in
                             exported.out_avals[int(idx)].shape],
                   "dtype": str(exported.out_avals[int(idx)].dtype)}
            for name, idx in leaves_names.items()}


def _params_quantized(params) -> bool:
    try:
        from tpu_pose.models import cpm as cpm_lib
        return bool(cpm_lib._is_quantized(params))
    except Exception:
        return False


def _version() -> str:
    try:
        import tpu_pose
        return tpu_pose.__version__
    except Exception:
        return "unknown"


class LoadedProgram:
    """A deserialized deployment artifact: ``prog(frames)`` → dict of
    numpy arrays. Validates the input against the artifact's recorded
    spec; the compiled executable is cached after the first call."""

    def __init__(self, exported, meta: dict):
        self._exported = exported
        self.meta = meta
        self._jitted = jax.jit(exported.call)
        self._batch_sharding = None
        shard = meta.get("sharding")
        if shard:
            from jax.sharding import (Mesh, NamedSharding,
                                      PartitionSpec as PS)
            n = shard["n_devices"]
            if len(jax.devices()) < n:
                raise ValueError(
                    f"artifact needs {n} devices "
                    f"({shard['axis']}-sharded), have "
                    f"{len(jax.devices())}")
            mesh = Mesh(np.array(jax.devices()[:n]), (shard["axis"],))
            self._batch_sharding = NamedSharding(mesh, PS(shard["axis"]))

    @property
    def fn(self) -> str:
        return self.meta["fn"]

    @property
    def platforms(self) -> tuple:
        return tuple(self.meta["platforms"])

    def _input_specs(self) -> list:
        # Pre-multi-input artifacts recorded only "input" (frames).
        return self.meta.get(
            "inputs",
            [dict(self.meta["input"], name="frames")])

    def _validate(self, args) -> tuple:
        specs = self._input_specs()
        if len(args) != len(specs):
            raise ValueError(
                f"{self.fn} artifact takes {len(specs)} input(s) "
                f"({[s['name'] for s in specs]}), got {len(args)}")
        out = []
        for a, spec in zip(args, specs):
            a = np.asarray(a)
            want = spec["shape"]
            if a.ndim == len(want) - 1:   # single sample → batch of 1
                a = a[None]
            if a.ndim != len(want) or list(a.shape[1:]) != want[1:]:
                raise ValueError(
                    f"expected {spec['name']} (b, "
                    f"{', '.join(map(str, want[1:]))}), got {a.shape}")
            if want[0] != "b" and a.shape[0] != want[0]:
                raise ValueError(
                    f"artifact was exported for static batch {want[0]}, "
                    f"got {a.shape[0]}")
            if str(a.dtype) != spec["dtype"]:
                if spec["dtype"] == "uint8":
                    a = np.clip(a, 0, 255).astype(np.uint8)
                else:
                    a = a.astype(spec["dtype"])
            out.append(a)
        if len({a.shape[0] for a in out}) > 1:
            raise ValueError(
                f"inconsistent batch sizes: {[a.shape[0] for a in out]}")
        return tuple(out)

    def call_device(self, *args) -> dict:
        """Run WITHOUT the device→host sync: returns jax arrays so a
        caller pipelining transfers (the serving dispatcher) keeps the
        launch asynchronous. Sharded artifacts scatter inputs over the
        recorded mesh here."""
        args = self._validate(args)
        if self._batch_sharding is not None:
            args = tuple(jax.device_put(a, self._batch_sharding)
                         for a in args)
        return self._jitted(*args)

    def __call__(self, *args) -> dict:
        out = self.call_device(*args)
        return {k: np.asarray(v) for k, v in out.items()}


# Result-field axis split for window slicing — MUST mirror
# api._VIDEO_MULTI_T_FIRST / _VIDEO_MULTI_K_FIRST (tested for drift in
# tests/test_export.py); duplicated so a deployment host importing only
# this module never pulls the model stack.
_VIDEO_T_FIRST = ("joints2d", "conf", "person_scores", "frame_mask",
                  "perm")
_VIDEO_K_FIRST = ("theta", "beta", "cam", "vertices", "joints3d",
                  "energy")
_CARRY_KEYS = ("carry_feats", "carry_present", "carry_theta",
               "carry_beta", "carry_cam")
_PROGRAM_FIRST = "program_first.bin"
_PROGRAM_ANCHORED = "program_anchored.bin"


def export_video_multi_stream(est, path: str, chunk: int = 64,
                              platforms: Optional[Sequence[str]] = None,
                              max_people: int = 2,
                              min_person_score: float = 0.05,
                              person_score_frac: float = 0.4,
                              dup_px: float = 30.0,
                              temporal_hints: bool = True,
                              hint_passes: int = 1,
                              hint_crop: bool = False,
                              track_reassociate: bool = False,
                              allow_empty: bool = False,
                              track_birth_cost: float = 0.05,
                              track_death_frames: int = 0,
                              track_anchor_refresh: float = 0.0,
                              presence_keep_frac: float = 1.0) -> dict:
    """Export the TRACKED STREAMING video pipeline: the same two fused
    window programs :class:`api.MultiPersonVideoSession` runs (first
    window; anchored continuation carrying tracker state + per-track
    last solutions), serialized so a deployment host can run
    identity-consistent multi-person video of ANY length from the
    artifact alone — see :class:`ArtifactVideoSession`.

    Artifact layout: ``meta.json`` + ``program_first.bin`` +
    ``program_anchored.bin``. Both programs take a ``chunk``-frame
    window (static — the session zero-pads the final partial window) and
    return the window result plus the flattened carry
    (track features, presence, per-track θ/β/cam anchors).
    """
    platforms = tuple(platforms) if platforms else (jax.default_backend(),)
    decode_impl = _resolve_decode_impl(est.cpm_cfg, platforms)
    est2 = _estimator_with_cfg(
        est, dataclasses.replace(est.cpm_cfg, decode_impl=decode_impl))
    params = est2._params_for_batch(chunk)
    size = est2.cpm_cfg.input_size
    base = dict(max_people=max_people, min_person_score=min_person_score,
                person_score_frac=person_score_frac, dup_px=dup_px,
                restarts=max(est.fit_restarts, 1),
                temporal_hints=temporal_hints,
                hint_passes=hint_passes, hint_crop=hint_crop,
                reassociate=track_reassociate and temporal_hints,
                allow_empty=allow_empty,
                birth_cost=track_birth_cost,
                death_frames=track_death_frames,
                anchor_refresh=track_anchor_refresh,
                presence_keep_frac=presence_keep_frac)

    # The association state is an opaque pytree (the Viterbi carry:
    # cost vector, last live features, re-ID anchor); flatten it into
    # enumerated carry keys so the artifact format does not depend on
    # its internal structure. The session replays keys from meta.
    def pack(result, state, anchors):
        d = dict(result._asdict())
        d.pop("track_mask")   # per-window; the session recomputes it
        for i, leaf in enumerate(jax.tree.leaves(state)):
            d[f"carry_assoc_{i}"] = leaf
        d["carry_theta"] = anchors["theta"]
        d["carry_beta"] = anchors["beta"]
        d["carry_cam"] = anchors["cam"]
        if "presence" in anchors:     # presence_keep_frac < 1 hysteresis
            d["carry_presence"] = anchors["presence"]
        return d

    def fn_first(frames, pad_mask):
        r, s, a = est2._estimate_and_fit_video_multi_impl(
            params, est2.smpl_model, frames, pad_mask=pad_mask,
            return_carry=True, **base)
        return pack(r, s, a)

    frame_spec = jax.ShapeDtypeStruct((chunk, size, size, 3), jnp.uint8)
    mask_spec = jax.ShapeDtypeStruct((chunk,), jnp.float32)
    state_treedef = jax.tree.structure(jax.eval_shape(
        lambda f, m: est2._estimate_and_fit_video_multi_impl(
            params, est2.smpl_model, f, pad_mask=m,
            return_carry=True, **base)[1],
        frame_spec, mask_spec))
    n_assoc = state_treedef.num_leaves
    carry_keys = tuple(f"carry_assoc_{i}" for i in range(n_assoc)) + (
        "carry_theta", "carry_beta", "carry_cam") + (
        ("carry_presence",) if presence_keep_frac < 1.0 else ())

    def fn_anchored(frames, pad_mask, *carry):
        state = jax.tree.unflatten(state_treedef, carry[:n_assoc])
        theta, beta, cam = carry[n_assoc:n_assoc + 3]
        anchors = {"theta": theta, "beta": beta, "cam": cam}
        if presence_keep_frac < 1.0:
            anchors["presence"] = carry[n_assoc + 3]
        r, s, a = est2._estimate_and_fit_video_multi_impl(
            params, est2.smpl_model, frames, pad_mask=pad_mask,
            track_state=state, anchors=anchors,
            return_carry=True, **base)
        return pack(r, s, a)

    carry_avals = jax.eval_shape(fn_first, frame_spec, mask_spec)
    carry_specs = tuple(
        jax.ShapeDtypeStruct(carry_avals[k].shape, carry_avals[k].dtype)
        for k in carry_keys)

    exp_first = jax_export.export(
        jax.jit(fn_first), platforms=list(platforms))(
            frame_spec, mask_spec)
    exp_anchored = jax_export.export(
        jax.jit(fn_anchored), platforms=list(platforms))(
            frame_spec, mask_spec, *carry_specs)

    meta = {
        "format_version": FORMAT_VERSION,
        "fn": "video_multi_stream",
        "fn_kwargs": {"max_people": max_people,
                      "min_person_score": min_person_score,
                      "person_score_frac": person_score_frac,
                      "dup_px": dup_px,
                      "temporal_hints": temporal_hints,
                      "hint_passes": hint_passes,
                      "hint_crop": hint_crop,
                      "track_reassociate": track_reassociate,
                      "allow_empty": allow_empty,
                      "track_birth_cost": track_birth_cost,
                      "track_death_frames": track_death_frames,
                      "track_anchor_refresh": track_anchor_refresh,
                      "presence_keep_frac": presence_keep_frac},
        "platforms": list(platforms),
        "decode_impl": decode_impl,
        "chunk": int(chunk),
        "carry_keys": list(carry_keys),
        "input": {"shape": [int(chunk), size, size, 3],
                  "dtype": "uint8"},
        "carry": {k: {"shape": list(map(int, carry_avals[k].shape)),
                      "dtype": str(carry_avals[k].dtype)}
                  for k in carry_keys},
        "outputs": _out_spec(exp_first),
        "estimator": {
            "refine_scale": bool(est.refine_scale),
            "flip_tta": bool(est.flip_tta),
            # The multi-person program never applies scale TTA
            # (per-hypothesis refine_scale covers it).
            "scale_tta": [],
            "letterbox": bool(est.letterbox),
            "fit_restarts": int(est.fit_restarts),
            "quantized_params": _params_quantized(params),
        },
        "tpu_pose_version": _version(),
    }
    _write_stream_artifact(path, meta, exp_first, exp_anchored)
    return meta


def _write_stream_artifact(path: str, meta: dict, exp_first,
                           exp_anchored) -> None:
    blob_first = exp_first.serialize()
    blob_anchored = exp_anchored.serialize()
    meta["program_sha256"] = {
        _PROGRAM_FIRST: hashlib.sha256(blob_first).hexdigest(),
        _PROGRAM_ANCHORED: hashlib.sha256(blob_anchored).hexdigest(),
    }
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _PROGRAM_FIRST), "wb") as f:
        f.write(blob_first)
    with open(os.path.join(path, _PROGRAM_ANCHORED), "wb") as f:
        f.write(blob_anchored)
    with open(os.path.join(path, _META_NAME), "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)


_CARRY_KEYS_SINGLE = ("carry_theta", "carry_beta", "carry_cam")


def export_video_stream(est, path: str, chunk: int = 64,
                        platforms: Optional[Sequence[str]] = None
                        ) -> dict:
    """Export the SINGLE-PERSON streaming video pipeline — the two fused
    window programs :class:`api.VideoSession` runs (CPM 2D + anchored
    joint smooth fit; the last solution carries as the next window's
    anchor). Same artifact layout as :func:`export_video_multi_stream`;
    run with :class:`ArtifactVideoSession`."""
    platforms = tuple(platforms) if platforms else (jax.default_backend(),)
    decode_impl = _resolve_decode_impl(est.cpm_cfg, platforms)
    est2 = _estimator_with_cfg(
        est, dataclasses.replace(est.cpm_cfg, decode_impl=decode_impl))
    params = est2._params_for_batch(chunk)
    size = est2.cpm_cfg.input_size

    def pack(result, anchor):
        d = dict(result._asdict())
        d["carry_theta"] = anchor["theta"]
        d["carry_beta"] = anchor["beta"]
        d["carry_cam"] = anchor["cam"]
        return d

    def fn_first(frames, pad_mask):
        r, a = est2._video_stream_window_impl(
            params, est2.smpl_model, frames, pad_mask)
        return pack(r, a)

    def fn_anchored(frames, pad_mask, theta, beta, cam):
        r, a = est2._video_stream_window_impl(
            params, est2.smpl_model, frames, pad_mask,
            anchor={"theta": theta, "beta": beta, "cam": cam})
        return pack(r, a)

    frame_spec = jax.ShapeDtypeStruct((chunk, size, size, 3), jnp.uint8)
    mask_spec = jax.ShapeDtypeStruct((chunk,), jnp.float32)
    carry_avals = jax.eval_shape(fn_first, frame_spec, mask_spec)
    carry_specs = tuple(
        jax.ShapeDtypeStruct(carry_avals[k].shape, carry_avals[k].dtype)
        for k in _CARRY_KEYS_SINGLE)

    exp_first = jax_export.export(
        jax.jit(fn_first), platforms=list(platforms))(
            frame_spec, mask_spec)
    exp_anchored = jax_export.export(
        jax.jit(fn_anchored), platforms=list(platforms))(
            frame_spec, mask_spec, *carry_specs)

    meta = {
        "format_version": FORMAT_VERSION,
        "fn": "video_stream",
        "fn_kwargs": {},
        "platforms": list(platforms),
        "decode_impl": decode_impl,
        "chunk": int(chunk),
        "carry_keys": list(_CARRY_KEYS_SINGLE),
        "input": {"shape": [int(chunk), size, size, 3],
                  "dtype": "uint8"},
        "carry": {k: {"shape": list(map(int, carry_avals[k].shape)),
                      "dtype": str(carry_avals[k].dtype)}
                  for k in _CARRY_KEYS_SINGLE},
        "outputs": _out_spec(exp_first),
        "estimator": {
            "refine_center": bool(est.refine_center),
            "refine_scale": bool(est.refine_scale),
            "flip_tta": bool(est.flip_tta),
            "scale_tta": [float(s) for s in
                          getattr(est, "scale_tta", ())],
            "letterbox": bool(est.letterbox),
            "fit_restarts": int(est.fit_restarts),
            "quantized_params": _params_quantized(params),
        },
        "tpu_pose_version": _version(),
    }
    _write_stream_artifact(path, meta, exp_first, exp_anchored)
    return meta


class ArtifactVideoSession:
    """Online streaming video driven ENTIRELY from an artifact — the
    deployment twin of :class:`api.MultiPersonVideoSession` (for
    :func:`export_video_multi_stream` artifacts: tracked multi-person)
    or :class:`api.VideoSession` (for :func:`export_video_stream`
    artifacts: single-person anchored smooth fits). Same push/flush
    contract and window programs as the live sessions, with no model
    code and no weights on the host.

    ``push(frames)`` buffers host-side and runs one fused window program
    per full ``chunk``; returns a dict of numpy arrays covering the
    completed windows (time-first fields on axis 0, track-first on
    axis 1, plus ``track_mask`` over the emitted span) or None.
    ``flush()`` runs the final zero-padded partial window and closes the
    session. Track i means the same person for the whole session.
    """

    def __init__(self, path: str):
        meta_path = os.path.join(path, _META_NAME)
        if not os.path.exists(meta_path):
            raise FileNotFoundError(f"{path} is not an export artifact")
        with open(meta_path) as f:
            self.meta = json.load(f)
        if self.meta.get("fn") not in ("video_multi_stream",
                                       "video_stream"):
            raise ValueError(
                f"need a video_multi_stream or video_stream artifact, "
                f"got fn={self.meta.get('fn')!r}")
        if self.meta.get("format_version") != FORMAT_VERSION:
            raise ValueError(
                f"artifact format {self.meta.get('format_version')} "
                f"!= supported {FORMAT_VERSION}")
        shas = self.meta.get("program_sha256") or {}
        self._first = jax.jit(jax_export.deserialize(_read_verified(
            os.path.join(path, _PROGRAM_FIRST),
            shas.get(_PROGRAM_FIRST))).call)
        self._anchored = jax.jit(jax_export.deserialize(_read_verified(
            os.path.join(path, _PROGRAM_ANCHORED),
            shas.get(_PROGRAM_ANCHORED))).call)
        self.chunk = int(self.meta["chunk"])
        self._hw = tuple(self.meta["input"]["shape"][1:3])
        self._carry_keys = tuple(
            self.meta.get("carry_keys", _CARRY_KEYS))
        if self.meta["fn"] == "video_stream":
            # Single-person results: every field is time-first.
            self._t_first = tuple(
                k for k in self.meta["outputs"]
                if k not in self._carry_keys)
            self._k_first = ()
        else:
            self._t_first = _VIDEO_T_FIRST
            self._k_first = _VIDEO_K_FIRST
        self._buf: list = []
        self._buffered = 0
        self._carry = None
        self._closed = False

    @property
    def frames_buffered(self) -> int:
        return self._buffered

    def _run_window(self, win: np.ndarray, n_real: int) -> dict:
        pad_mask = np.ones(self.chunk, np.float32)
        if n_real < self.chunk:
            pad = np.zeros((self.chunk - n_real,) + win.shape[1:],
                           win.dtype)
            win = np.concatenate([win, pad])
            pad_mask[n_real:] = 0.0
        if self._carry is None:
            out = self._first(win, pad_mask)
        else:
            out = self._anchored(win, pad_mask, *self._carry)
        self._carry = tuple(out[k] for k in self._carry_keys)
        res = {k: np.asarray(v) for k, v in out.items()
               if k not in self._carry_keys}
        for k in self._t_first:
            res[k] = res[k][:n_real]
        for k in self._k_first:
            res[k] = res[k][:, :n_real]
        return res

    def _concat(self, outs: list) -> dict:
        res = outs[0] if len(outs) == 1 else {
            k: np.concatenate(
                [o[k] for o in outs],
                axis=0 if k in self._t_first else 1)
            for k in self._t_first + self._k_first}
        if "frame_mask" in res:
            res["track_mask"] = (
                res["frame_mask"].astype(np.float32).mean(axis=0) >= 0.5)
        return res

    def push(self, frames) -> Optional[dict]:
        if self._closed:
            raise RuntimeError("session already flushed")
        frames = np.asarray(frames)
        if frames.ndim == 3:
            frames = frames[None]
        if frames.shape[1:3] != self._hw or frames.shape[-1] != 3:
            raise ValueError(
                f"expected frames (n, {self._hw[0]}, {self._hw[1]}, 3), "
                f"got {frames.shape}")
        if frames.dtype != np.uint8:
            frames = np.clip(frames, 0, 255).astype(np.uint8)
        self._buf.append(frames)
        self._buffered += frames.shape[0]
        outs = []
        while self._buffered >= self.chunk:
            buf = (np.concatenate(self._buf)
                   if len(self._buf) > 1 else self._buf[0])
            win, rest = buf[:self.chunk], buf[self.chunk:]
            self._buf = [rest] if rest.shape[0] else []
            self._buffered -= self.chunk
            outs.append(self._run_window(win, self.chunk))
        return self._concat(outs) if outs else None

    def flush(self) -> Optional[dict]:
        if self._closed:
            raise RuntimeError("session already flushed")
        self._closed = True
        if self._buffered == 0:
            return None
        buf = (np.concatenate(self._buf)
               if len(self._buf) > 1 else self._buf[0])
        self._buf, self._buffered = [], 0
        return self._concat([self._run_window(buf, buf.shape[0])])


class ServableProgram:
    """Adapter: a fused-path artifact presented through the estimator
    interface :class:`serving.BatchingServer` consumes — so a serving
    host deploys from the artifact alone (no checkpoints, no model
    code, no re-trace at startup).

    ``BatchingServer(ServableProgram("/srv/pose_artifact"))`` serves
    mixed-resolution traffic: the adapter exposes the artifact's network
    frame size for the server's submit-time letterbox, and the server's
    ``fields=`` selection validates against the artifact's recorded
    output spec. Use a SYMBOLIC-batch artifact (``batch=None`` at
    export) so every server bucket runs; a static-batch artifact
    requires ``buckets=(batch,)`` and ``max_batch=batch``.
    """

    def __init__(self, program):
        prog = load(program) if isinstance(program, str) else program
        if prog.fn not in ("estimate_and_fit",
                           "estimate_and_fit_multi", "fit_smpl"):
            raise ValueError(
                f"serving needs an estimate_and_fit, "
                f"estimate_and_fit_multi, or fit_smpl artifact, "
                f"got fn={prog.fn!r}")
        self.program = prog
        self.fn = prog.fn     # BatchingServer(fn=...) must match this
        self.result_fields = tuple(prog.meta["outputs"])
        shape = prog.meta["input"]["shape"]
        if prog.fn == "fit_smpl":
            # joints2d spec (b, P, 2): the server validates submit_fit
            # requests against this before co-batching them.
            self.num_joints = int(shape[1])
        self.symbolic_batch = shape[0] == "b"
        self.static_batch = None if self.symbolic_batch else shape[0]
        if shape[1] == shape[2]:
            import types
            self.cpm_cfg = types.SimpleNamespace(input_size=shape[1])

    def _call(self, *args) -> dict:
        # jax arrays out (no host sync) — the dispatcher pipelines the
        # transfer itself.
        return self.program.call_device(*args)

    # Every servable fn name resolves to the artifact's single program
    # (fit_smpl takes (joints2d, conf) per its two-input spec); the
    # server verifies its fn matches self.fn before dispatching.
    estimate_and_fit = _call
    estimate_and_fit_multi = _call
    fit_smpl = _call


def load(path: str) -> LoadedProgram:
    """Load an artifact directory written by :func:`export_estimator`.
    Needs no tpu_pose model code — just jax and the artifact. Verifies
    the program's sha256 against ``meta.json`` when present (artifacts
    ship over networks; a truncated or bit-rotted program should fail
    loudly here, not as an opaque deserialize error or wrong numerics)."""
    meta_path = os.path.join(path, _META_NAME)
    prog_path = os.path.join(path, _PROGRAM_NAME)
    if not (os.path.exists(meta_path) and os.path.exists(prog_path)):
        raise FileNotFoundError(
            f"{path} is not an export artifact "
            f"(need {_META_NAME} + {_PROGRAM_NAME})")
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"artifact format {meta.get('format_version')} "
            f"!= supported {FORMAT_VERSION}")
    blob = _read_verified(prog_path, meta.get("program_sha256"))
    return LoadedProgram(jax_export.deserialize(blob), meta)


def inspect_artifact(path: str) -> dict:
    """Summarize an artifact directory WITHOUT deserializing or running
    it: manifest essentials, per-program blob sizes, and sha256
    verification status. Ops-side counterpart of :func:`load` — cheap
    enough for a registry scan or a deploy-time preflight
    (``tpu-pose-export --inspect <dir>``)."""
    meta_path = os.path.join(path, _META_NAME)
    if not os.path.exists(meta_path):
        raise FileNotFoundError(f"{path} is not an export artifact "
                                f"(no {_META_NAME})")
    with open(meta_path) as f:
        meta = json.load(f)
    recorded = meta.get("program_sha256")
    # Single artifacts: program.bin + one sha string; streaming-session
    # artifacts: {blob name: sha} over their two window programs.
    names = (sorted(recorded) if isinstance(recorded, dict)
             else [_PROGRAM_NAME])
    programs, ok = {}, True
    for name in names:
        p = os.path.join(path, name)
        if not os.path.exists(p):
            programs[name] = {"bytes": None, "sha256_ok": False}
            ok = False
            continue
        with open(p, "rb") as f:
            blob = f.read()
        want = recorded[name] if isinstance(recorded, dict) else recorded
        good = (want is None
                or hashlib.sha256(blob).hexdigest() == want)
        programs[name] = {"bytes": len(blob), "sha256_ok": bool(good)}
        ok = ok and good
    return {
        "path": path,
        "ok": bool(ok and meta.get("format_version") == FORMAT_VERSION),
        "format_version": meta.get("format_version"),
        "fn": meta.get("fn"),
        "platforms": meta.get("platforms"),
        "sharding": meta.get("sharding"),
        "inputs": meta.get("inputs", [meta.get("input")]),
        "outputs": sorted(meta.get("outputs", {})),
        "estimator": meta.get("estimator"),
        "chunk": meta.get("chunk"),
        "tpu_pose_version": meta.get("tpu_pose_version"),
        "programs": programs,
    }


def _read_verified(prog_path: str, expect_sha: Optional[str]) -> bytes:
    with open(prog_path, "rb") as f:
        blob = f.read()
    if expect_sha is not None:
        got = hashlib.sha256(blob).hexdigest()
        if got != expect_sha:
            raise ValueError(
                f"artifact integrity check failed for {prog_path}: "
                f"sha256 {got} != recorded {expect_sha} "
                f"(corrupt or tampered program.bin)")
    return blob
