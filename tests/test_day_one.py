"""Day-one reference playbook (VERDICT r2 next #5): the whole
convert → load → certify → eval chain must execute UNATTENDED against a
fabricated reference-like directory carrying the real on-disk schemas —
a TF1 checkpoint, a chumpy/scipy-sparse SMPL pickle, and a SMPLify GMM
pickle — emitting one JSON verdict."""

import json
import os
import pickle

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from tpu_pose.fitting import priors  # noqa: E402
from tpu_pose.models import cpm as cpm_lib  # noqa: E402
from tpu_pose.models import smpl_data  # noqa: E402
from tpu_pose.parity import day_one  # noqa: E402
from tpu_pose.utils.config import CPMConfig  # noqa: E402
from test_asset_loaders import _real_schema_pickle  # noqa: E402
from test_tf_converter import _write_tf1_ckpt  # noqa: E402

SMALL = CPMConfig(input_size=64, features=8, stage1_head_width=16,
                  refine_width=8, num_stages=2)


def _fabricate_reference(ref_dir, model):
    """A reference-like directory: TF1 ckpt + real-schema SMPL pickle +
    SMPLify gmm pickle, nested like a checkout would be."""
    os.makedirs(os.path.join(ref_dir, "models"), exist_ok=True)
    _write_tf1_ckpt(os.path.join(ref_dir, "models", "model.ckpt"),
                    cpm_lib._layer_defs(SMALL), "slim")
    _real_schema_pickle(
        os.path.join(ref_dir, "models", "basicModel_neutral.pkl"), model)
    rng = np.random.RandomState(3)
    means = 0.1 * rng.randn(8, priors.BODY_POSE_DIM)
    covs = np.stack([np.eye(priors.BODY_POSE_DIM) * (1.0 + 0.1 * k)
                     for k in range(8)])
    with open(os.path.join(ref_dir, "models", "gmm_08.pkl"), "wb") as f:
        pickle.dump({"means": means, "covars": covs,
                     "weights": np.full(8, 1 / 8)}, f, protocol=2)


def test_day_one_chain_runs_unattended(tmp_path):
    model = smpl_data.synthetic_smpl(seed=0, num_verts=400)
    ref = str(tmp_path / "reference")
    out = str(tmp_path / "out")
    _fabricate_reference(ref, model)

    assets = day_one.discover_assets(ref)
    assert assets["ckpt"].endswith("model.ckpt")
    assert assets["smpl_pkl"].endswith("basicModel_neutral.pkl")
    assert assets["gmm_pkl"].endswith("gmm_08.pkl")

    verdict = day_one.run_day_one(
        ref, out_dir=out, cpm_cfg=SMALL, frames=2,
        eval_frames=2, eval_batch=2, log=lambda *a: None)

    assert verdict["missing"] == []
    assert verdict["converted_layers"] == len(cpm_lib._layer_defs(SMALL))
    cert = verdict["certification"]
    assert cert["stage_parity"]["energy_rel_err"] < 1e-5
    assert cert["certified"], cert["fit_gap"]
    assert np.isfinite(verdict["smoke_eval"]["pa_mpjpe"])
    assert verdict["ok"] is True
    # The one-JSON-verdict contract: written, loadable, self-identical.
    with open(os.path.join(out, "day_one_verdict.json")) as f:
        on_disk = json.load(f)
    assert on_disk["ok"] is True
    assert on_disk["converted_layers"] == verdict["converted_layers"]


def test_day_one_reports_missing_assets(tmp_path):
    """An empty (or partial) mount yields an INCOMPLETE verdict naming
    exactly what's missing — never a crash (today's /root/reference)."""
    ref = str(tmp_path / "empty_ref")
    os.makedirs(ref)
    verdict = day_one.run_day_one(ref, out_dir=str(tmp_path / "o"),
                                  cpm_cfg=SMALL, log=lambda *a: None)
    assert verdict["ok"] is False
    assert set(verdict["missing"]) == {"smpl_pkl", "cpm_checkpoint"}
