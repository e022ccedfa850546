"""Reference-style oracle pipeline: the second implementation the parity
harness compares against (SURVEY.md §4.2; VERDICT r1 'Next round' #1).

Built the way the reference lineage builds it — NOT the way tpu_pose does:

- decode: host-side numpy hard argmax over session-output heatmaps
  (SURVEY.md §3.1 last line);
- SMPL: a TF graph of the batch_smpl/batch_lbs-lineage equations
  (float64, loop-composed kinematic chain), compiled with ``tf.function``;
- fit: scipy L-BFGS driving the TF graph's value+gradient from a HOST
  loop with per-stage variable subsets — the TF1
  ``ScipyOptimizerInterface`` idiom (SURVEY.md §3.3, §2 row 10);
- camera: weak-perspective or fixed-focal perspective, in raw pixels.

The energy definition mirrors fitting/energy.py's SMPLify form (GMoF
reprojection + GMM/L2 pose prior + angle prior + β L2) in PIXEL units;
with tpu_pose's ``normalize_obs`` the two energies are exactly
proportional (E_norm = (2/S)²·E_px), so their minimizers coincide.

Everything here is deliberately host/TF/scipy — zero imports from
tpu_pose's JAX compute modules — so agreement with tpu_pose is evidence,
not tautology.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

# CPM-14 → SMPL-24 correspondence (standard SMPLify-family table; duplicated
# here on purpose — the oracle must not import tpu_pose compute modules).
_CPM_TO_SMPL = np.array(
    [15, 12, 17, 19, 21, 16, 18, 20, 2, 5, 8, 1, 4, 7], dtype=np.int64)
# SMPLify angle-prior components/signs (knees/elbows), as in the papers.
_ANGLE_IDX = np.array([55, 58, 12, 15], dtype=np.int64)
_ANGLE_SIGN = np.array([1.0, -1.0, -1.0, -1.0])


def decode_hard_argmax(heatmaps: np.ndarray, stride: int = 8):
    """The reference's decode: per-channel spatial argmax × stride, on
    host numpy (background channel dropped). (B,H,W,P+1) → (B,P,2),(B,P)."""
    hm = np.asarray(heatmaps)[..., :-1]
    b, h, w, p = hm.shape
    flat = hm.reshape(b, h * w, p)
    idx = flat.argmax(axis=1)
    ys = (idx // w).astype(np.float64) * stride
    xs = (idx % w).astype(np.float64) * stride
    return np.stack([xs, ys], axis=-1), flat.max(axis=1)


@dataclasses.dataclass(frozen=True)
class OracleStage:
    """One phase of the oracle's staged schedule (variable-subset idiom)."""
    opt_pose: bool = True
    opt_global: bool = True
    opt_shape: bool = True
    opt_cam: bool = True
    w_pose_prior: float = 4.0
    w_shape_prior: float = 5.0
    w_angle_prior: float = 15.0
    maxiter: int = 100


@dataclasses.dataclass(frozen=True)
class OracleConfig:
    """The oracle pipeline's constants — the harness treats these as the
    unknown reference constants to be matched by sweeping FitConfig."""
    stages: Sequence[OracleStage] = (
        OracleStage(opt_pose=False, opt_shape=False, w_pose_prior=0.0,
                    w_shape_prior=0.0, w_angle_prior=0.0, maxiter=60),
        OracleStage(maxiter=200),
    )
    camera_model: str = "weak_perspective"   # | "perspective"
    focal: float = 5000.0
    img_size: int = 368
    gmof_sigma: float = 100.0                # pixels
    stride: int = 8


class OraclePipeline:
    """decode → (staged scipy-L-BFGS SMPLify fit over a TF graph).

    Args:
      model: dict of numpy SMPL tensors (v_template, shapedirs, posedirs,
        J_regressor, weights, parents) — e.g. ``SMPLData._asdict()``.
      gmm: optional dict(means (K,69), precisions (K,69,69),
        log_consts (K,)) for the MaxMixture pose prior; None → L2-to-zero.
      cfg: the oracle's constants.
    """

    def __init__(self, model: dict, gmm: Optional[dict] = None,
                 cfg: OracleConfig = OracleConfig()):
        import tensorflow as tf  # lazy: core tpu_pose never needs TF
        self._tf = tf
        self.cfg = cfg
        f64 = tf.float64
        m = {k: np.asarray(v) for k, v in model.items()}
        self._v_template = tf.constant(m["v_template"], f64)
        self._shapedirs = tf.constant(m["shapedirs"], f64)
        self._posedirs = tf.constant(m["posedirs"], f64)
        self._J_regressor = tf.constant(m["J_regressor"], f64)
        self._weights = tf.constant(m["weights"], f64)
        self._parents = np.asarray(m["parents"], np.int64)
        self._num_j = int(self._parents.shape[0])
        if gmm is not None:
            self._gmm = {
                "means": tf.constant(np.asarray(gmm["means"]), f64),
                "precisions": tf.constant(
                    np.asarray(gmm["precisions"]), f64),
                "log_consts": tf.constant(
                    np.asarray(gmm["log_consts"]), f64),
            }
        else:
            self._gmm = None
        # One compiled value+grad graph per stage-λ set (retraced only per
        # distinct λ triple, mirroring "build the graph once, sess.run in
        # a loop").
        self._vg = tf.function(self._energy_and_grad)

    # -- TF graph pieces (batch_smpl/batch_lbs-lineage math) ---------------

    def _smpl_tf(self, beta, theta):
        tf = self._tf
        f64 = tf.float64
        theta = tf.reshape(theta, (-1, 3))
        v_shaped = self._v_template + tf.einsum(
            "vcb,b->vc", self._shapedirs, beta)
        j_rest = tf.matmul(self._J_regressor, v_shaped)

        def rodrigues(r):
            angle = tf.norm(r) + 1e-16
            k = r / angle
            K = tf.stack([
                tf.stack([0.0 * k[0], -k[2], k[1]]),
                tf.stack([k[2], 0.0 * k[0], -k[0]]),
                tf.stack([-k[1], k[0], 0.0 * k[0]]),
            ])
            eye = tf.eye(3, dtype=f64)
            return (eye + tf.sin(angle) * K
                    + (1.0 - tf.cos(angle)) * tf.matmul(K, K))

        R = tf.stack([rodrigues(theta[k]) for k in range(self._num_j)])
        pose_feat = tf.reshape(R[1:] - tf.eye(3, dtype=f64), (-1,))
        v_posed = v_shaped + tf.einsum("vcp,p->vc", self._posedirs, pose_feat)

        def rigid(Rk, t):
            top = tf.concat([Rk, tf.reshape(t, (3, 1))], axis=1)
            bottom = tf.constant([[0.0, 0.0, 0.0, 1.0]], f64)
            return tf.concat([top, bottom], axis=0)

        world = [rigid(R[0], j_rest[0])]
        for k in range(1, self._num_j):
            t_local = j_rest[k] - j_rest[self._parents[k]]
            world.append(tf.matmul(world[self._parents[k]],
                                   rigid(R[k], t_local)))
        world = tf.stack(world)
        joints = world[:, :3, 3]

        j_h = tf.concat([j_rest, tf.zeros((self._num_j, 1), f64)], axis=1)
        corr = tf.einsum("jab,jb->ja", world, j_h)
        A = world - tf.pad(corr[:, :, None], [[0, 0], [0, 0], [3, 0]])
        T = tf.einsum("vj,jab->vab", self._weights, A)
        v_h = tf.concat(
            [v_posed, tf.ones((tf.shape(v_posed)[0], 1), f64)], axis=1)
        verts = tf.einsum("vab,vb->va", T, v_h)[:, :3]
        return verts, joints

    def _project(self, j3d, cam):
        tf = self._tf
        if self.cfg.camera_model == "weak_perspective":
            # px = (s·xy + t + 1) · S/2  — same normalized frame the
            # rebuild uses, expressed in pixels.
            norm = cam[0] * j3d[:, :2] + cam[1:3][None, :]
            return (norm + 1.0) * (self.cfg.img_size / 2.0)
        z = tf.maximum(j3d[:, 2:3] + cam[2], 1e-3)
        xy = (j3d[:, :2] + cam[None, :2])
        c = self.cfg.img_size / 2.0
        return self.cfg.focal * xy / z + c

    def _energy_tf(self, theta, beta, cam, j2d_obs, conf, lam):
        tf = self._tf
        _, joints = self._smpl_tf(beta, theta)
        j14 = tf.gather(joints, _CPM_TO_SMPL)
        pred = self._project(j14, cam)
        res = pred - j2d_obs
        s2 = self.cfg.gmof_sigma ** 2
        sq = res * res
        e = tf.reduce_sum(conf[:, None] * s2 * sq / (sq + s2))
        body = theta[3:]
        if self._gmm is not None:
            d = body[None, :] - self._gmm["means"]
            maha = 0.5 * tf.einsum(
                "kd,kde,ke->k", d, self._gmm["precisions"], d)
            nll = -tf.reduce_max(self._gmm["log_consts"] - maha)
        else:
            nll = 0.5 * tf.reduce_sum(body * body)
        e += lam[0] * nll
        comps = tf.gather(theta, _ANGLE_IDX) * _ANGLE_SIGN
        e += lam[2] * tf.reduce_sum(tf.exp(comps) ** 2)
        e += lam[1] * tf.reduce_sum(beta * beta)
        return e

    def _energy_and_grad(self, theta, beta, cam, j2d_obs, conf, lam):
        tf = self._tf
        with tf.GradientTape() as tape:
            tape.watch([theta, beta, cam])
            e = self._energy_tf(theta, beta, cam, j2d_obs, conf, lam)
        g = tape.gradient(e, [theta, beta, cam])
        return e, g[0], g[1], g[2]

    # -- host-side staged fit (ScipyOptimizerInterface idiom) --------------

    def _init_params(self, j2d_px: np.ndarray, conf: np.ndarray):
        """Extent/centroid camera init on the rest pose (the reference
        lineage's torso heuristic, all-joint form)."""
        j_rest = (np.asarray(self._J_regressor)
                  @ np.asarray(self._v_template))[_CPM_TO_SMPL]
        half = self.cfg.img_size / 2.0
        obs = (np.asarray(j2d_px, np.float64) - half) / half  # [-1,1]
        w = conf / (conf.sum() + 1e-8)
        mean2d = (w[:, None] * obs).sum(0)
        mean3d = (w[:, None] * j_rest[:, :2]).sum(0)
        var2d = (w * ((obs - mean2d) ** 2).sum(-1)).sum()
        var3d = (w * ((j_rest[:, :2] - mean3d) ** 2).sum(-1)).sum()
        if self.cfg.camera_model == "weak_perspective":
            s = np.sqrt(var2d / (var3d + 1e-8))
            cam0 = np.concatenate([[s], mean2d - s * mean3d])
        else:
            spread2d_px = np.sqrt(
                (w * ((np.asarray(j2d_px) - (mean2d + 1) * half) ** 2)
                 .sum(-1)).sum() + 1e-8)
            mean3d_full = (w[:, None] * j_rest).sum(0)
            spread3d = np.sqrt(
                (w * ((j_rest - mean3d_full) ** 2).sum(-1)).sum() + 1e-8)
            tz = self.cfg.focal * spread3d / spread2d_px
            px_mean = (w[:, None] * np.asarray(j2d_px, np.float64)).sum(0)
            txy = ((px_mean - half) * tz / self.cfg.focal
                   - mean3d_full[:2])
            cam0 = np.concatenate([txy, [tz]])
        return (np.zeros(self._num_j * 3), np.zeros(10), cam0)

    def fit(self, joints2d_px: np.ndarray, conf: np.ndarray,
            init: Optional[dict] = None,
            scipy_options: Optional[dict] = None) -> dict:
        """Staged SMPLify fit for ONE frame (host loop, scipy L-BFGS-B).

        ``scipy_options`` merge into each stage's L-BFGS-B options (e.g.
        ``{"ftol": 1e-14, "gtol": 1e-10, "maxiter": 2000}`` for a
        high-precision polish). Returns dict(theta, beta, cam,
        joints3d (24,3), vertices)."""
        import scipy.optimize
        tf = self._tf
        f64 = tf.float64

        j2d = tf.constant(np.asarray(joints2d_px, np.float64), f64)
        cf = tf.constant(np.asarray(conf, np.float64), f64)

        if init is None:
            theta, beta, cam = self._init_params(
                np.asarray(joints2d_px), np.asarray(conf, np.float64))
        else:
            theta = np.asarray(init["theta"], np.float64).copy()
            beta = np.asarray(init["beta"], np.float64).copy()
            cam = np.asarray(init["cam"], np.float64).copy()

        for stage in self.cfg.stages:
            lam = tf.constant([stage.w_pose_prior, stage.w_shape_prior,
                               stage.w_angle_prior], f64)
            # Active-coordinate mask = the TF1 per-stage variable subsets.
            m_theta = np.zeros(self._num_j * 3)
            if stage.opt_global:
                m_theta[:3] = 1.0
            if stage.opt_pose:
                m_theta[3:] = 1.0
            m_beta = np.full(10, 1.0 if stage.opt_shape else 0.0)
            m_cam = np.full(cam.shape, 1.0 if stage.opt_cam else 0.0)
            mask = np.concatenate([m_theta, m_beta, m_cam])
            x0 = np.concatenate([theta, beta, cam])
            base = x0.copy()

            def fun(x):
                xe = base * (1 - mask) + x * mask
                t = tf.constant(xe[: self._num_j * 3], f64)
                b = tf.constant(xe[self._num_j * 3: self._num_j * 3 + 10],
                                f64)
                c = tf.constant(xe[self._num_j * 3 + 10:], f64)
                e, gt, gb, gc = self._vg(t, b, c, j2d, cf, lam)
                g = np.concatenate([gt.numpy(), gb.numpy(), gc.numpy()])
                return float(e.numpy()), g * mask

            options = {"maxiter": stage.maxiter}
            options.update(scipy_options or {})
            res = scipy.optimize.minimize(
                fun, x0, jac=True, method="L-BFGS-B", options=options)
            x = base * (1 - mask) + res.x * mask
            theta = x[: self._num_j * 3]
            beta = x[self._num_j * 3: self._num_j * 3 + 10]
            cam = x[self._num_j * 3 + 10:]

        verts, joints = self._smpl_tf(tf.constant(beta, f64),
                                      tf.constant(theta, f64))
        last = self.cfg.stages[-1]
        lam_f = tf.constant([last.w_pose_prior, last.w_shape_prior,
                             last.w_angle_prior], f64)
        e_final = self._energy_tf(tf.constant(theta, f64),
                                  tf.constant(beta, f64),
                                  tf.constant(cam, f64), j2d, cf, lam_f)
        return {
            "theta": theta, "beta": beta, "cam": cam,
            "joints3d": np.asarray(joints), "vertices": np.asarray(verts),
            "energy": float(e_final.numpy()),
        }

    def fit_batch(self, joints2d_px: np.ndarray, conf: np.ndarray,
                  init: Optional[dict] = None,
                  scipy_options: Optional[dict] = None) -> dict:
        """Sequential per-frame loop — the reference's video idiom
        (SURVEY.md §3.5). Stacks the per-frame dicts."""
        outs = []
        for i in range(len(joints2d_px)):
            ini = (None if init is None else
                   {k: np.asarray(v[i]) for k, v in init.items()})
            outs.append(self.fit(joints2d_px[i], conf[i], init=ini,
                                 scipy_options=scipy_options))
        return {k: np.stack([o[k] for o in outs]) for k in outs[0]}
