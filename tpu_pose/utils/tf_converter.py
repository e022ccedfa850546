"""One-time TF1-checkpoint → JAX params converter (SURVEY.md §5
'Checkpoint / resume': TF-ckpt → npz pytree for CPM weights).

The reference restores a pretrained Caffe→TF CPM checkpoint with
``tf.train.Saver``. Our params dict is keyed by the same Caffe layer names
(models/cpm.py), so conversion is a name-mapping walk over the checkpoint's
variable list. TF 2.x reads TF1 ckpts via ``tf.train.load_checkpoint``.

The real checkpoint is license-gated and absent in this environment
(SURVEY.md §0); this module is import-gated on tensorflow and exercised by
a synthetic round-trip test (tests/test_converter.py) so the code path is
proven before the real file appears.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# Candidate TF variable-name templates per lineage; the converter tries each
# until the checkpoint matches (exact reference naming is unverified [U]).
_NAME_TEMPLATES = (
    "{layer}/weights",            # tf-slim style
    "{layer}/biases",
    "{layer}/kernel",             # tf.layers style
    "{layer}/bias",
    "CPM/{layer}/weights",
    "CPM/{layer}/biases",
    "{layer}_W",                  # plain-variable ports
    "{layer}_b",
)


def convert_tf_checkpoint(ckpt_path: str, layer_names) -> Dict[str, dict]:
    """Read a TF1 CPM checkpoint and return our params pytree (numpy).

    Args:
      ckpt_path: path/prefix of the ``.ckpt``.
      layer_names: iterable of Caffe layer names (the keys of our params
        dict, e.g. from ``cpm._layer_defs(cfg)``).
    Raises if any layer cannot be located under any known naming scheme.
    """
    import tensorflow as tf  # local import: optional heavy dep

    reader = tf.train.load_checkpoint(ckpt_path)
    available = set(reader.get_variable_to_shape_map())

    def find(layer: str, kind: str) -> np.ndarray:
        wanted = [t for t in _NAME_TEMPLATES
                  if ("weight" in t or "kernel" in t or t.endswith("_W"))
                  == (kind == "w")]
        for t in wanted:
            name = t.format(layer=layer)
            if name in available:
                return reader.get_tensor(name)
        raise KeyError(
            f"no checkpoint variable for layer {layer!r} ({kind}); "
            f"available sample: {sorted(available)[:8]}")

    params = {}
    for layer in layer_names:
        w = np.asarray(find(layer, "w"), np.float32)
        b = np.asarray(find(layer, "b"), np.float32)
        # TF conv kernels are already HWIO — matches our layout directly.
        if w.ndim != 4:
            raise ValueError(f"{layer}: expected 4D kernel, got {w.shape}")
        params[layer] = {"w": w, "b": b}
    return params


def save_params_npz(path: str, params: Dict[str, dict]) -> None:
    """Flat ``layer.tensor`` npz of a CPM params pytree. Saves EVERY
    per-layer entry, so f32 (``w``/``b``) and serving-quantized params
    (``w_int8``/``w_scale``/``b``/``a_scale`` — models/cpm.py) both
    round-trip: a server can load calibrated int8 weights directly and
    skip the whole calibrate+quantize cold start."""
    flat = {}
    for layer, wb in params.items():
        for kind, v in wb.items():
            flat[f"{layer}.{kind}"] = np.asarray(v)
    np.savez(path, **flat)


def load_params_npz(path: str) -> Dict[str, dict]:
    import jax.numpy as jnp
    params: Dict[str, dict] = {}
    with np.load(path) as z:
        for key in z.files:
            layer, kind = key.rsplit(".", 1)
            params.setdefault(layer, {})[kind] = jnp.asarray(z[key])
    return params
