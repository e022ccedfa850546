"""Real-schema asset-loader tests (VERDICT round-2 item 3; SURVEY.md §2
row 6, §4.1): fabricate fixtures with the EXACT on-disk formats of the
license-gated real assets — SMPL pickle with a scipy-sparse J_regressor,
chumpy-style array wrappers and the 4294967295 kintree root sentinel, and
the SMPLify ``gmm_08.pkl`` layout — then prove the loaders reproduce the
directly-constructed model bit-for-bit through a forward pass, the same
way tests/test_tf_converter.py proves the checkpoint path."""

import pickle

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse

from tpu_pose.fitting import priors
from tpu_pose.models import smpl as smpl_lib
from tpu_pose.models import smpl_data


class _ChumpyLike:
    """Stand-in for chumpy.Ch: the real SMPL pickle wraps several tensors
    in chumpy arrays, whose dense payload lives on the ``.r`` attribute
    (which is what ``smpl_data._densify`` unwraps)."""

    def __init__(self, value):
        self.r = np.asarray(value)


def _real_schema_pickle(path, model: smpl_data.SMPLData,
                        extra_shape_basis: int = 0):
    """Write ``model``'s tensors in the standardized real-SMPL pickle
    schema: chumpy wrappers, scipy-sparse J_regressor, (2, 24) uint32
    kintree_table with the 4294967295 root sentinel, uint32 faces.

    ``extra_shape_basis`` pads shapedirs' last axis (SMPL 1.1 files ship
    300 shape components; loaders must slice the leading NUM_BETAS)."""
    shapedirs = np.asarray(model.shapedirs, np.float64)
    if extra_shape_basis:
        pad = np.zeros(shapedirs.shape[:2] + (extra_shape_basis,))
        shapedirs = np.concatenate([shapedirs, pad], axis=-1)
    parents = np.asarray(model.parents, np.int64).copy()
    kintree = np.stack([
        parents.astype(np.uint32),       # row 0: parents
        np.arange(len(parents), dtype=np.uint32),  # row 1: joint ids
    ])
    kintree[0, 0] = np.uint32(4294967295)  # root sentinel, as on disk
    dd = {
        "v_template": _ChumpyLike(np.asarray(model.v_template, np.float64)),
        "shapedirs": _ChumpyLike(shapedirs),
        "posedirs": _ChumpyLike(np.asarray(model.posedirs, np.float64)),
        "J_regressor": scipy.sparse.csc_matrix(
            np.asarray(model.J_regressor, np.float64)),
        "weights": _ChumpyLike(np.asarray(model.weights, np.float64)),
        "kintree_table": kintree,
        "f": np.asarray(model.faces, np.uint32),
        # Real pickles carry extra keys the loader must ignore.
        "bs_style": "lbs",
        "bs_type": "lrotmin",
        "J": np.zeros((len(parents), 3)),
    }
    with open(path, "wb") as f:
        pickle.dump(dd, f, protocol=2)  # py2-era protocol, as shipped


@pytest.fixture(scope="module")
def model():
    return smpl_data.synthetic_smpl(seed=3)


def _forward_close(a: smpl_data.SMPLData, b: smpl_data.SMPLData):
    beta = jnp.asarray(np.linspace(-1.5, 1.5, 10), jnp.float32)
    theta = jnp.asarray(
        0.3 * np.sin(np.arange(72, dtype=np.float32)), jnp.float32)
    oa = smpl_lib.smpl_forward(a, beta, theta)
    ob = smpl_lib.smpl_forward(b, beta, theta)
    np.testing.assert_allclose(np.asarray(oa.vertices),
                               np.asarray(ob.vertices), atol=1e-6)
    np.testing.assert_allclose(np.asarray(oa.joints),
                               np.asarray(ob.joints), atol=1e-6)


def test_load_smpl_pickle_real_schema(tmp_path, model):
    path = str(tmp_path / "smpl_real_schema.pkl")
    _real_schema_pickle(path, model)
    loaded = smpl_data.load_smpl_pickle(path)
    assert loaded.v_template.shape == (smpl_data.NUM_VERTS, 3)
    assert loaded.shapedirs.shape == (smpl_data.NUM_VERTS, 3,
                                      smpl_data.NUM_BETAS)
    assert loaded.posedirs.shape == (smpl_data.NUM_VERTS, 3,
                                     smpl_data.NUM_POSE_BASIS)
    assert loaded.J_regressor.shape == (smpl_data.NUM_JOINTS,
                                        smpl_data.NUM_VERTS)
    # The uint32 root sentinel must land as -1, the rest verbatim.
    assert loaded.parents[0] == -1
    np.testing.assert_array_equal(loaded.parents[1:],
                                  np.asarray(model.parents)[1:])
    assert loaded.faces.dtype == jnp.int32
    _forward_close(loaded, model)


def test_load_smpl_pickle_300_component_shapedirs(tmp_path, model):
    """SMPL 1.1-style files: 300 shape components; the loader slices the
    leading 10 so downstream shapes stay canonical."""
    path = str(tmp_path / "smpl_300.pkl")
    _real_schema_pickle(path, model, extra_shape_basis=290)
    loaded = smpl_data.load_smpl_pickle(path)
    assert loaded.shapedirs.shape[-1] == smpl_data.NUM_BETAS
    _forward_close(loaded, model)


def test_npz_cache_roundtrip(tmp_path, model):
    """save_npz → load_npz reproduces every tensor exactly (the fast-path
    cache users convert the pickle into once)."""
    path = str(tmp_path / "smpl_cache.npz")
    smpl_data.save_npz(path, model)
    loaded = smpl_data.load_npz(path)
    for name in ("v_template", "shapedirs", "posedirs", "J_regressor",
                 "weights", "faces"):
        np.testing.assert_array_equal(
            np.asarray(getattr(loaded, name)),
            np.asarray(getattr(model, name)), err_msg=name)
    np.testing.assert_array_equal(loaded.parents, model.parents)
    _forward_close(loaded, model)


def test_pickle_then_npz_cache(tmp_path, model):
    """The documented real-asset flow: pickle → load → npz cache → load."""
    pkl = str(tmp_path / "smpl.pkl")
    npz = str(tmp_path / "smpl.npz")
    _real_schema_pickle(pkl, model)
    smpl_data.save_npz(npz, smpl_data.load_smpl_pickle(pkl))
    _forward_close(smpl_data.load_npz(npz), model)


def test_load_gmm_pickle_real_schema(tmp_path):
    """SMPLify ``gmm_08.pkl`` layout: means (8,69), covars (8,69,69),
    weights (8,). The loaded prior must agree with make_gmm_prior on the
    same arrays, in both evaluation modes."""
    rng = np.random.RandomState(7)
    means = 0.2 * rng.randn(8, priors.BODY_POSE_DIM)
    covs = []
    for _ in range(8):
        a = 0.1 * rng.randn(priors.BODY_POSE_DIM, priors.BODY_POSE_DIM)
        covs.append(0.3 * np.eye(priors.BODY_POSE_DIM) + a @ a.T)
    covs = np.stack(covs)
    weights = rng.dirichlet(np.full(8, 2.0))
    path = str(tmp_path / "gmm_08.pkl")
    with open(path, "wb") as f:
        pickle.dump({"means": means, "covars": covs, "weights": weights},
                    f, protocol=2)

    loaded = priors.load_gmm_pickle(path)
    direct = priors.make_gmm_prior(means, covs, weights)
    pose = jnp.asarray(0.15 * rng.randn(priors.BODY_POSE_DIM), jnp.float32)
    for mode in ("max", "sum"):
        np.testing.assert_allclose(
            float(loaded.neg_log_prob(pose, mode=mode)),
            float(direct.neg_log_prob(pose, mode=mode)), rtol=1e-6)
    # Sanity: NLL grows away from the component means.
    far = pose + 10.0
    assert float(loaded.neg_log_prob(far)) > float(loaded.neg_log_prob(pose))


def test_gmm_pickle_latin1_bytes_keys(tmp_path):
    """Python-2-written pickles can surface byte keys under latin1
    decoding; the loader must accept them."""
    rng = np.random.RandomState(9)
    means = 0.1 * rng.randn(8, priors.BODY_POSE_DIM)
    covs = np.stack([np.eye(priors.BODY_POSE_DIM) * (1 + 0.1 * k)
                     for k in range(8)])
    weights = np.full(8, 1.0 / 8.0)
    path = str(tmp_path / "gmm_bytes.pkl")
    with open(path, "wb") as f:
        pickle.dump({b"means": means, b"covars": covs, b"weights": weights},
                    f, protocol=2)
    loaded = priors.load_gmm_pickle(path)
    assert loaded.means.shape == (8, priors.BODY_POSE_DIM)
