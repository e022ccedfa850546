"""Parity-harness tests (SURVEY.md §7 hard-parts #1; VERDICT r1 item 1):
the reference-style oracle pipeline, stagewise parity, the ≤1 mm
polish-chain certification, and the FitConfig auto-sweep."""

import numpy as np
import pytest

from tpu_pose.fitting import priors as priors_lib
from tpu_pose.models import smpl_data
from tpu_pose.parity import harness, oracle, sweep
from tpu_pose.utils.config import FitConfig

VERTS = 400  # small synthetic model keeps the TF oracle fast on CPU


@pytest.fixture(scope="module")
def model():
    return smpl_data.synthetic_smpl(seed=0, num_verts=VERTS)


@pytest.fixture(scope="module")
def prior():
    return priors_lib.synthetic_gmm_prior(0)


@pytest.fixture(scope="module")
def pipe(model, prior):
    gmm = {"means": np.asarray(prior.means),
           "precisions": np.asarray(prior.precisions),
           "log_consts": np.asarray(prior.log_consts)}
    return oracle.OraclePipeline(model._asdict(), gmm=gmm)


def test_stage_parity_numerical(model, prior, pipe):
    """Every closed-form stage agrees between tpu_pose and the TF oracle:
    SMPL forward, hard-argmax decode, projection, and — load-bearing —
    the ENERGY VALUE at identical parameters."""
    rep = harness.stage_parity(model, pipe, FitConfig(), prior=prior)
    assert rep["smpl_verts_max_m"] < 1e-5
    assert rep["smpl_joints_max_m"] < 1e-5
    assert rep["decode_max_px"] == 0.0
    assert rep["decode_conf_max"] < 1e-6
    assert rep["projection_max_px"] < 1e-3
    assert rep["energy_rel_err"] < 1e-5


def test_stage_parity_perspective(model, prior):
    """Projection + energy parity with the PERSPECTIVE camera: our
    normalized-frame fit energy must stay exactly proportional to the
    oracle's pixel-frame energy under the pixel-focal contract
    (FitConfig.focal in px; fitting/energy.perspective_kwargs)."""
    gmm = {"means": np.asarray(prior.means),
           "precisions": np.asarray(prior.precisions),
           "log_consts": np.asarray(prior.log_consts)}
    pipe = oracle.OraclePipeline(
        model._asdict(), gmm=gmm,
        cfg=oracle.OracleConfig(camera_model="perspective", focal=5000.0))
    cfg = FitConfig(camera_model="perspective", focal=5000.0)
    rep = harness.stage_parity(model, pipe, cfg, prior=prior, seed=1)
    assert rep["projection_max_px"] < 1e-2, rep
    assert rep["energy_rel_err"] < 1e-5, rep


def test_oracle_decode_matches_hard_argmax():
    rng = np.random.RandomState(0)
    hm = rng.rand(2, 8, 8, 15).astype(np.float32)
    j, c = oracle.decode_hard_argmax(hm, stride=8)
    assert j.shape == (2, 14, 2) and c.shape == (2, 14)
    # Spot-check one channel against a manual argmax.
    flat = hm[0, :, :, 3].ravel()
    idx = flat.argmax()
    assert j[0, 3, 0] == (idx % 8) * 8 and j[0, 3, 1] == (idx // 8) * 8


def test_oracle_fit_reduces_energy(model, prior, pipe):
    """The oracle's staged scipy fit must actually optimize: final energy
    far below the init energy on a clean observation."""
    j2d, conf, _ = harness.make_clean_observations(model, 1, 368, seed=3)
    import tensorflow as tf
    theta0, beta0, cam0 = pipe._init_params(j2d[0],
                                            np.asarray(conf[0], np.float64))
    lam = tf.constant([4.0, 5.0, 15.0], tf.float64)
    e0 = float(pipe._energy_tf(
        tf.constant(theta0, tf.float64), tf.constant(beta0, tf.float64),
        tf.constant(cam0, tf.float64),
        tf.constant(np.asarray(j2d[0], np.float64), tf.float64),
        tf.constant(np.asarray(conf[0], np.float64), tf.float64),
        lam).numpy())
    out = pipe.fit(j2d[0], conf[0])
    assert out["energy"] < 0.5 * e0, (out["energy"], e0)
    assert np.isfinite(out["joints3d"]).all()


def test_certify_under_1mm(model, prior):
    """The north-star certification (BASELINE.json parity axis): the
    polish chain — reference optimizer started at our solution — moves it
    less than 1 mm MPJPE on clean synthetic observations."""
    out = harness.certify(model, prior=prior, n_frames=2, seed=0)
    assert out["stage_parity"]["energy_rel_err"] < 1e-5
    assert out["certified"], out["fit_gap"]
    assert out["fit_gap"]["mpjpe_gap_mm_mean"] <= 1.0
    # Oracle quality sanity: the independent oracle fit is a real fit.
    assert out["gt_mpjpe_mm_oracle"] < 500.0


def test_sweep_recovers_mismatched_sigma(model, prior, pipe):
    """Auto-sweep (SURVEY §7 mitigation): with the oracle's gmof_sigma
    deliberately different from our default, the sweep must strictly
    reduce the output gap by moving our config toward the oracle's."""
    ocfg = oracle.OracleConfig(gmof_sigma=40.0)
    gmm = {"means": np.asarray(prior.means),
           "precisions": np.asarray(prior.precisions),
           "log_consts": np.asarray(prior.log_consts)}
    pipe40 = oracle.OraclePipeline(model._asdict(), gmm=gmm, cfg=ocfg)
    j2d, conf, _ = harness.make_clean_observations(model, 2, 368, seed=1)
    ref_out = pipe40.fit_batch(j2d, conf)

    axes = dict(sweep.default_axes())
    axes = {"gmof_sigma": axes["gmof_sigma"],
            "w_pose_scale": axes["w_pose_scale"]}
    report = sweep.auto_sweep(model, ref_out, j2d, conf, prior=prior,
                              axes=axes, passes=1)
    assert report["evals"] >= 3
    assert report["best_gap_mm"] <= report["trajectory_mm"][0] + 1e-9
    assert report["best_gap_mm"] < np.inf
    # The report is JSON-serializable (the CLI contract).
    import json
    json.dumps(report)


def test_scale_stages_helper():
    cfg = FitConfig()
    scaled = sweep._scale_stages(cfg.stages, iters=2.0, w_pose=0.5)
    assert scaled[0].iters == 2 * cfg.stages[0].iters
    assert scaled[1].w_pose_prior == 0.5 * cfg.stages[1].w_pose_prior
    assert scaled[1].lr == cfg.stages[1].lr
