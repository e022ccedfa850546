"""TF1-checkpoint conversion, end to end against a REAL checkpoint written
with tf.compat.v1 — closes the [U] risk that the converter only ever saw
its own npz format (SURVEY.md §5 'Checkpoint / resume')."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from tpu_pose.models import cpm as cpm_lib  # noqa: E402
from tpu_pose.utils import tf_converter  # noqa: E402
from tpu_pose.utils.config import CPMConfig  # noqa: E402

SMALL = CPMConfig(input_size=64, features=8, stage1_head_width=16,
                  refine_width=8, num_stages=2)


def _write_tf1_ckpt(path, layer_defs, style, seed=0):
    """Author a TF1-style checkpoint with the given variable-name style."""
    rng = np.random.RandomState(seed)
    tf1 = tf.compat.v1
    expected = {}
    graph = tf1.Graph()
    with graph.as_default():
        for name, k, cin, cout, _ in layer_defs:
            w = rng.randn(k, k, cin, cout).astype(np.float32) * 0.05
            b = rng.randn(cout).astype(np.float32) * 0.01
            if style == "slim":
                wn, bn = f"{name}/weights", f"{name}/biases"
            elif style == "layers":
                wn, bn = f"{name}/kernel", f"{name}/bias"
            else:
                wn, bn = f"{name}_W", f"{name}_b"
            tf1.Variable(w, name=wn)
            tf1.Variable(b, name=bn)
            expected[name] = {"w": w, "b": b}
        saver = tf1.train.Saver()
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, path)
    return expected


@pytest.mark.parametrize("style", ["slim", "layers", "plain"])
def test_convert_real_tf1_checkpoint(tmp_path, style):
    defs = cpm_lib._layer_defs(SMALL)
    ckpt = str(tmp_path / f"model_{style}.ckpt")
    expected = _write_tf1_ckpt(ckpt, defs, style)

    params = tf_converter.convert_tf_checkpoint(
        ckpt, [d[0] for d in defs])
    assert set(params) == set(expected)
    for name in expected:
        np.testing.assert_array_equal(params[name]["w"],
                                      expected[name]["w"])
        np.testing.assert_array_equal(params[name]["b"],
                                      expected[name]["b"])


def test_convert_missing_layer_raises(tmp_path):
    defs = cpm_lib._layer_defs(SMALL)
    ckpt = str(tmp_path / "model.ckpt")
    _write_tf1_ckpt(ckpt, defs[:-1], "slim")  # drop the last layer
    with pytest.raises(KeyError):
        tf_converter.convert_tf_checkpoint(ckpt, [d[0] for d in defs])


def test_converted_params_run_forward(tmp_path):
    """Converted params must drive the CPM forward directly."""
    import jax.numpy as jnp
    defs = cpm_lib._layer_defs(SMALL)
    ckpt = str(tmp_path / "model.ckpt")
    _write_tf1_ckpt(ckpt, defs, "slim")
    params = tf_converter.convert_tf_checkpoint(ckpt, [d[0] for d in defs])
    params = {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
              for k, v in params.items()}
    from tpu_pose.ops import preprocess as pre
    x = jnp.zeros((1, 64, 64, 3))
    cmap = jnp.broadcast_to(
        pre.gaussian_center_map(64, SMALL.center_sigma), (1, 64, 64, 1))
    beliefs = cpm_lib.cpm_forward(params, x, cmap, SMALL)
    assert beliefs[-1].shape == (1, 8, 8, 15)
