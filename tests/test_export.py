"""AOT export / deployment artifact tests (tpu_pose/export.py).

The artifact contract: export writes a self-contained directory
(StableHLO program with params baked in + meta.json); `load` runs it
with NO estimator in scope; outputs match the live fused path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_pose import export as pexport
from tpu_pose.api import PoseEstimator
from tpu_pose.utils.config import CPMConfig, FitConfig, StageConfig

# f32 conv compute: bf16 convs re-optimized at artifact load time shift
# heatmaps enough to move the sharp soft-argmax ~0.2 px (measured), which
# would make the round-trip comparison flaky for reasons unrelated to the
# export machinery under test.
SMALL_CPM = CPMConfig(input_size=64, features=16, stage1_head_width=32,
                      refine_width=16, num_stages=2,
                      compute_dtype="float32")
SMALL_FIT = FitConfig(
    stages=(StageConfig(iters=10, lr=0.05, opt_pose=False, opt_shape=False,
                        w_pose_prior=0, w_shape_prior=0, w_angle_prior=0),
            StageConfig(iters=15, lr=0.02, w_pose_prior=0.5,
                        w_shape_prior=1.0)),
    img_size=64)


@pytest.fixture(scope="module")
def est():
    return PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=SMALL_CPM, fit_cfg=SMALL_FIT)


def _frames(b, seed=0):
    return np.random.RandomState(seed).randint(
        0, 255, (b, 64, 64, 3)).astype(np.uint8)


def test_export_fused_roundtrip(est, tmp_path):
    """Artifact output == live fused path. joints2d/conf are pre-fit and
    must match to float tolerance; the iterative fit amplifies XLA
    reduction-order differences, so θ/β/cam get a looser bound."""
    path = str(tmp_path / "fused")
    meta = pexport.export_estimator(est, path, fn="estimate_and_fit",
                                    batch=2, platforms=("cpu",))
    assert meta["fn"] == "estimate_and_fit"
    assert meta["decode_impl"] == "xla"
    assert set(meta["outputs"]) == {"joints2d", "conf", "theta", "beta",
                                    "cam", "vertices", "joints3d",
                                    "energy"}
    frames = _frames(2)
    prog = pexport.load(path)
    out = prog(frames)
    live = est.estimate_and_fit(jnp.asarray(frames))
    np.testing.assert_allclose(out["joints2d"],
                               np.asarray(live.joints2d), atol=1e-4)
    np.testing.assert_allclose(out["conf"], np.asarray(live.conf),
                               atol=1e-5)
    np.testing.assert_allclose(out["theta"], np.asarray(live.theta),
                               atol=2e-2)
    np.testing.assert_allclose(out["cam"], np.asarray(live.cam),
                               atol=2e-2)
    assert out["vertices"].shape == (2, 6890, 3)


def test_export_symbolic_batch(est, tmp_path):
    """batch=None → one artifact, any batch size."""
    path = str(tmp_path / "sym")
    meta = pexport.export_estimator(est, path, fn="estimate_2d",
                                    platforms=("cpu",))
    assert meta["input"]["shape"][0] == "b"
    prog = pexport.load(path)
    for b in (1, 3):
        out = prog(_frames(b, seed=b))
        assert out["joints2d"].shape == (b, 14, 2)
        assert out["conf"].shape == (b, 14)
    # 3-D single frame promotes to batch 1.
    out = prog(_frames(1)[0])
    assert out["joints2d"].shape == (1, 14, 2)


def test_export_estimate_2d_matches_live(est, tmp_path):
    path = str(tmp_path / "e2d")
    pexport.export_estimator(est, path, fn="estimate_2d", batch=2,
                             platforms=("cpu",))
    frames = _frames(2, seed=7)
    out = pexport.load(path)(frames)
    live = est.estimate_2d(jnp.asarray(frames))
    np.testing.assert_allclose(out["heatmaps"],
                               np.asarray(live.heatmaps), atol=1e-4)
    np.testing.assert_allclose(out["joints2d"],
                               np.asarray(live.joints2d), atol=1e-4)


def test_export_multi_person(est, tmp_path):
    path = str(tmp_path / "multi")
    meta = pexport.export_estimator(
        est, path, fn="estimate_and_fit_multi", batch=1,
        platforms=("cpu",), max_people=2)
    assert meta["fn_kwargs"]["max_people"] == 2
    out = pexport.load(path)(_frames(1, seed=3))
    assert out["joints2d"].shape == (1, 2, 14, 2)
    assert out["theta"].shape == (1, 2, 72)
    assert out["person_mask"].shape == (1, 2)


def test_export_input_validation(est, tmp_path):
    path = str(tmp_path / "val")
    pexport.export_estimator(est, path, fn="estimate_2d", batch=2,
                             platforms=("cpu",))
    prog = pexport.load(path)
    with pytest.raises(ValueError, match="static batch"):
        prog(_frames(3))
    with pytest.raises(ValueError, match="expected frames"):
        prog(np.zeros((2, 32, 64, 3), np.uint8))
    # float input is clipped+cast, not rejected.
    out = prog(_frames(2).astype(np.float32))
    assert out["joints2d"].shape == (2, 14, 2)


def test_export_video(est, tmp_path):
    """Video-path artifact: T is the leading dim; the smooth whole-
    sequence fit serializes (Viterbi scan + shared-beta coupling
    included) and matches the live fused video call."""
    path = str(tmp_path / "video")
    meta = pexport.export_estimator(est, path,
                                    fn="estimate_and_fit_video",
                                    batch=3, platforms=("cpu",),
                                    mode="smooth")
    assert meta["fn_kwargs"]["mode"] == "smooth"
    frames = _frames(3, seed=21)
    out = pexport.load(path)(frames)
    live = est.estimate_and_fit_video(jnp.asarray(frames), mode="smooth")
    assert out["beta"].shape == (3, 10)
    np.testing.assert_allclose(out["joints2d"],
                               np.asarray(live.joints2d), atol=1e-4)
    np.testing.assert_allclose(out["theta"], np.asarray(live.theta),
                               atol=2e-2)
    # Shared-beta coupling survived the round trip.
    assert np.ptp(out["beta"], axis=0).max() < 1e-5
    with pytest.raises(ValueError, match="video mode"):
        pexport.export_estimator(est, str(tmp_path / "vbad"),
                                 fn="estimate_and_fit_video", batch=2,
                                 platforms=("cpu",), mode="nope")


def test_export_fit_smpl(est, tmp_path):
    """Joints-only artifact: (joints2d, conf) → fit + mesh, matching the
    live fit_smpl path; symbolic batch; two-input validation."""
    path = str(tmp_path / "fit")
    meta = pexport.export_estimator(est, path, fn="fit_smpl",
                                    platforms=("cpu",))
    assert [i["name"] for i in meta["inputs"]] == ["joints2d", "conf"]
    prog = pexport.load(path)

    rng = np.random.RandomState(4)
    j2d = rng.uniform(8, 56, (2, 14, 2)).astype(np.float32)
    conf = np.ones((2, 14), np.float32)
    out = prog(j2d, conf)
    live = est.fit_smpl(jnp.asarray(j2d), jnp.asarray(conf))
    np.testing.assert_allclose(out["theta"], np.asarray(live.theta),
                               atol=2e-2)
    np.testing.assert_allclose(out["cam"], np.asarray(live.cam),
                               atol=2e-2)
    assert out["vertices"].shape == (2, 6890, 3)
    # Single-sample promotion + arg-count validation.
    one = prog(j2d[0], conf[0])
    assert one["theta"].shape == (1, 72)
    with pytest.raises(ValueError, match="2 input"):
        prog(j2d)
    with pytest.raises(ValueError, match="inconsistent batch"):
        prog(j2d, np.ones((3, 14), np.float32))


def test_serving_from_artifact(est, tmp_path):
    """Deployment story end-to-end: export → BatchingServer over the
    loaded artifact, no estimator on the serving host. Mixed-resolution
    requests letterbox at submit time against the artifact's recorded
    network frame, and fields= validates against the artifact's output
    spec."""
    from tpu_pose import serving
    path = str(tmp_path / "srv")
    pexport.export_estimator(est, path, fn="estimate_and_fit",
                             platforms=("cpu",))
    servable = pexport.ServableProgram(path)
    assert servable.symbolic_batch
    assert "theta" in servable.result_fields

    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (3, 64, 64, 3)).astype(np.uint8)
    direct = est.estimate_and_fit(jnp.asarray(frames))
    with serving.BatchingServer(servable, max_batch=4,
                                max_wait_ms=200.0,
                                fields=("theta", "joints2d")) as srv:
        big = rng.randint(0, 255, (96, 80, 3)).astype(np.uint8)
        futs = srv.submit_many(frames) + [srv.submit(big)]
        results = [f.result(timeout=300) for f in futs]
    for i in range(3):
        assert set(results[i]) == {"theta", "joints2d"}
        np.testing.assert_allclose(results[i]["theta"],
                                   np.asarray(direct.theta[i]),
                                   atol=2e-2)
    # The mixed-res request resolves in ITS source pixels.
    assert results[3]["joints2d"].shape == (14, 2)
    assert np.all(np.isfinite(results[3]["joints2d"]))

    with pytest.raises(ValueError, match="unknown result fields"):
        serving.BatchingServer(servable, max_batch=2, fields=("nope",))
    with pytest.raises(ValueError, match="fn='estimate_2d'"):
        p2 = str(tmp_path / "e2d_only")
        pexport.export_estimator(est, p2, fn="estimate_2d",
                                 platforms=("cpu",))
        pexport.ServableProgram(p2)


def test_export_sharded_multichip(est, tmp_path):
    """Multi-chip DP artifact: batch sharded over an 8-device ('data',)
    mesh (the suite's fake-device mesh), topology recorded in the
    program; the loader rebuilds the mesh, scatters inputs, and the
    result matches the single-device artifact path."""
    path = str(tmp_path / "dp8")
    meta = pexport.export_estimator(est, path, fn="estimate_2d",
                                    batch=8, n_devices=8,
                                    platforms=("cpu",))
    assert meta["sharding"] == {"n_devices": 8, "axis": "data"}
    frames = _frames(8, seed=13)
    prog = pexport.load(path)
    out = prog(frames)
    live = est.estimate_2d(jnp.asarray(frames))
    # Partitioned compilation reassociates reductions: ≤4e-4 px drift
    # measured vs the single-device trace; 1e-2 px is still conclusive.
    np.testing.assert_allclose(out["joints2d"],
                               np.asarray(live.joints2d), atol=1e-2)
    np.testing.assert_allclose(out["conf"], np.asarray(live.conf),
                               atol=1e-4)

    with pytest.raises(ValueError, match="static batch"):
        pexport.export_estimator(est, str(tmp_path / "x1"),
                                 fn="estimate_2d", n_devices=8,
                                 platforms=("cpu",))
    with pytest.raises(ValueError, match="not divisible"):
        pexport.export_estimator(est, str(tmp_path / "x2"),
                                 fn="estimate_2d", batch=6, n_devices=8,
                                 platforms=("cpu",))


def test_serving_from_sharded_artifact(est, tmp_path):
    """BatchingServer over a multi-chip artifact: requests pad to the
    static sharded batch, the loader scatters over the 8-device mesh,
    per-request results come back correct — the multi-chip serving pod
    story end-to-end."""
    from tpu_pose import serving
    path = str(tmp_path / "dp_srv")
    pexport.export_estimator(est, path, fn="estimate_and_fit", batch=8,
                             n_devices=8, platforms=("cpu",))
    servable = pexport.ServableProgram(path)
    assert servable.static_batch == 8
    frames = _frames(3, seed=17)
    direct = est.estimate_and_fit(jnp.asarray(frames))
    with serving.BatchingServer(servable, max_batch=8, buckets=(8,),
                                max_wait_ms=200.0,
                                fields=("theta", "joints2d")) as srv:
        results = [f.result(timeout=300)
                   for f in srv.submit_many(frames)]
    for i in range(3):
        np.testing.assert_allclose(results[i]["theta"],
                                   np.asarray(direct.theta[i]),
                                   atol=2e-2)


def test_video_multi_stream_artifact_matches_live(est, tmp_path):
    """The tracked-streaming artifact (two window programs + carried
    state) must reproduce the live streaming path: same windows, same
    identity assignment, same fits — run via ArtifactVideoSession with
    no estimator in scope."""
    path = str(tmp_path / "vms")
    meta = pexport.export_video_multi_stream(
        est, path, chunk=3, platforms=("cpu",), max_people=2)
    assert meta["fn"] == "video_multi_stream"
    assert meta["carry"]["carry_theta"]["shape"] == [2, 72]

    frames = np.random.RandomState(9).randint(
        0, 255, (7, 64, 64, 3)).astype(np.uint8)
    live = est.estimate_and_fit_video_multi_stream(
        jnp.asarray(frames), max_people=2, chunk=3)

    sess = pexport.ArtifactVideoSession(path)
    outs = []
    for lo, hi in ((0, 5), (5, 7)):
        r = sess.push(frames[lo:hi])
        if r is not None:
            outs.append(r)
    outs.append(sess.flush())
    theta = np.concatenate([o["theta"] for o in outs], axis=1)
    j2d = np.concatenate([o["joints2d"] for o in outs], axis=0)
    perm = np.concatenate([o["perm"] for o in outs], axis=0)
    np.testing.assert_array_equal(perm, np.asarray(live.perm))
    np.testing.assert_allclose(j2d, np.asarray(live.joints2d),
                               atol=1e-3)
    np.testing.assert_allclose(theta, np.asarray(live.theta), atol=2e-2)
    with pytest.raises(RuntimeError):
        sess.push(frames[:1])
    # Loading it as a plain single-program artifact fails clearly.
    with pytest.raises(FileNotFoundError):
        pexport.load(path)
    with pytest.raises(ValueError, match="video_multi_stream"):
        p2 = str(tmp_path / "plain")
        pexport.export_estimator(est, p2, fn="estimate_2d", batch=2,
                                 platforms=("cpu",))
        pexport.ArtifactVideoSession(p2)


def test_video_stream_artifact_matches_live_session(est, tmp_path):
    """Single-person streaming artifact == live VideoSession: same
    window programs, same anchor carry."""
    from tpu_pose.api import VideoSession
    path = str(tmp_path / "vs")
    meta = pexport.export_video_stream(est, path, chunk=3,
                                       platforms=("cpu",))
    assert meta["fn"] == "video_stream"
    assert meta["carry_keys"] == ["carry_theta", "carry_beta",
                                  "carry_cam"]
    frames = np.random.RandomState(8).randint(
        0, 255, (7, 64, 64, 3)).astype(np.uint8)

    live_sess = VideoSession(est, chunk=3)
    live_outs = [r for r in (live_sess.push(frames),
                             live_sess.flush()) if r is not None]
    theta_live = np.concatenate(
        [np.asarray(o.theta) for o in live_outs], axis=0)

    art = pexport.ArtifactVideoSession(path)
    outs = [r for r in (art.push(frames), art.flush())
            if r is not None]
    theta = np.concatenate([o["theta"] for o in outs], axis=0)
    j2d = np.concatenate([o["joints2d"] for o in outs], axis=0)
    assert theta.shape == (7, 72) and j2d.shape == (7, 14, 2)
    np.testing.assert_allclose(theta, theta_live, atol=1e-3)
    live_j2d = np.concatenate(
        [np.asarray(o.joints2d) for o in live_outs], axis=0)
    np.testing.assert_allclose(j2d, live_j2d, atol=1e-4)


def test_video_field_split_mirrors_api():
    """export.py duplicates api's result-field axis split so deployment
    hosts don't import the model stack — this pins them together."""
    from tpu_pose import api
    assert pexport._VIDEO_T_FIRST == api._VIDEO_MULTI_T_FIRST
    assert pexport._VIDEO_K_FIRST == api._VIDEO_MULTI_K_FIRST


def test_load_rejects_non_artifact(tmp_path):
    with pytest.raises(FileNotFoundError):
        pexport.load(str(tmp_path / "nope"))
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "meta.json").write_text('{"format_version": 99}')
    (bad / "program.bin").write_bytes(b"")
    with pytest.raises(ValueError, match="format"):
        pexport.load(str(bad))


def test_load_verifies_program_sha256(est, tmp_path):
    """meta.json records the program's sha256; a corrupted program.bin
    must fail the integrity check at load, not surface as an opaque
    deserialize error or silently wrong numerics."""
    import json
    path = str(tmp_path / "sha")
    meta = pexport.export_estimator(est, path, fn="estimate_2d",
                                    batch=1, platforms=("cpu",))
    assert len(meta["program_sha256"]) == 64
    on_disk = json.loads((tmp_path / "sha" / "meta.json").read_text())
    assert on_disk["program_sha256"] == meta["program_sha256"]
    pexport.load(path)  # intact artifact verifies fine
    prog_file = tmp_path / "sha" / "program.bin"
    blob = bytearray(prog_file.read_bytes())
    blob[len(blob) // 2] ^= 0xFF
    prog_file.write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="integrity"):
        pexport.load(path)


def test_stream_artifact_verifies_sha256(est, tmp_path):
    """Both streaming-session programs are hash-verified on open."""
    path = str(tmp_path / "shastream")
    meta = pexport.export_video_stream(est, path, chunk=2,
                                       platforms=("cpu",))
    assert set(meta["program_sha256"]) == {"program_first.bin",
                                           "program_anchored.bin"}
    pexport.ArtifactVideoSession(path)  # intact → opens
    prog_file = tmp_path / "shastream" / "program_anchored.bin"
    blob = bytearray(prog_file.read_bytes())
    blob[0] ^= 0xFF
    prog_file.write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="integrity"):
        pexport.ArtifactVideoSession(path)


def test_export_unknown_fn(est, tmp_path):
    with pytest.raises(ValueError, match="unknown fn"):
        pexport.export_estimator(est, str(tmp_path / "x"), fn="nope")


def test_export_letterbox_nonsquare_input(tmp_path):
    """input_shape + letterbox: the artifact takes non-square source
    frames and returns joints in SOURCE pixels, matching the live
    letterboxed estimator."""
    est_lb = PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=SMALL_CPM, fit_cfg=SMALL_FIT, letterbox=True)
    path = str(tmp_path / "lb")
    meta = pexport.export_estimator(est_lb, path, fn="estimate_2d",
                                    batch=2, input_shape=(96, 60),
                                    platforms=("cpu",))
    assert meta["input"]["shape"] == [2, 96, 60, 3]
    assert meta["estimator"]["letterbox"]
    frames = np.random.RandomState(2).randint(
        0, 255, (2, 96, 60, 3)).astype(np.uint8)
    out = pexport.load(path)(frames)
    live = est_lb.estimate_2d(jnp.asarray(frames))
    # Matching the live letterboxed estimator IS the source-pixel
    # contract (the live path's inverse affine is letterbox-tested);
    # random weights legitimately decode into the pad region, so no
    # in-bounds assertion here.
    np.testing.assert_allclose(out["joints2d"],
                               np.asarray(live.joints2d), atol=1e-3)


def test_export_quantized_params(tmp_path):
    """quantize=True estimators bake the batch-policy-selected weight
    set: int8 at/above int8_min_batch, bf16 below. Both artifacts must
    run and the int8 one must match the live int8 path."""
    est = PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=SMALL_CPM, fit_cfg=SMALL_FIT, quantize=True,
        int8_min_batch=4)
    p8 = str(tmp_path / "int8")
    meta8 = pexport.export_estimator(est, p8, fn="estimate_2d", batch=4,
                                     platforms=("cpu",))
    assert meta8["estimator"]["quantized_params"]
    frames = _frames(4, seed=11)
    out = pexport.load(p8)(frames)
    live = est.estimate_2d(jnp.asarray(frames))
    np.testing.assert_allclose(out["joints2d"],
                               np.asarray(live.joints2d), atol=1e-3)
    # Symbolic batch uses the params_batch_hint side of the policy.
    pb = str(tmp_path / "bf16")
    metab = pexport.export_estimator(est, pb, fn="estimate_2d",
                                     platforms=("cpu",),
                                     params_batch_hint=1)
    out1 = pexport.load(pb)(_frames(1))
    assert out1["joints2d"].shape == (1, 14, 2)


def test_cross_lowering_tpu_from_cpu_host(est, tmp_path):
    """A CPU host can build a TPU artifact — single-platform TPU keeps
    the Pallas fused decode; the program must lower + serialize (it can
    only RUN on a TPU, so execution is covered by the TPU selfcheck)."""
    path = str(tmp_path / "tpu")
    meta = pexport.export_estimator(est, path, fn="estimate_and_fit",
                                    batch=2, platforms=("tpu",))
    assert meta["decode_impl"] == "pallas"
    import os
    assert os.path.getsize(os.path.join(path, "program.bin")) > 1000
    # Loading parses the artifact even off-TPU (execution would need one).
    prog = pexport.load(path)
    assert prog.platforms == ("tpu",)


def test_inspect_artifact(est, tmp_path):
    """inspect_artifact summarizes without deserializing: ok=True on an
    intact artifact, per-program sizes + sha status; corruption and a
    missing blob flip ok to False; works on streaming artifacts' two
    programs too."""
    path = str(tmp_path / "insp")
    pexport.export_estimator(est, path, fn="estimate_2d", batch=2)
    info = pexport.inspect_artifact(path)
    assert info["ok"] and info["fn"] == "estimate_2d"
    assert info["programs"]["program.bin"]["bytes"] > 0
    assert info["programs"]["program.bin"]["sha256_ok"]
    assert info["estimator"]["scale_tta"] == []
    assert "joints2d" in info["outputs"]

    # Corrupt one byte → sha mismatch surfaces as ok=False (no raise:
    # inspection is a preflight, not a load).
    import os
    p = os.path.join(path, "program.bin")
    blob = bytearray(open(p, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    open(p, "wb").write(bytes(blob))
    info2 = pexport.inspect_artifact(path)
    assert not info2["ok"]
    assert not info2["programs"]["program.bin"]["sha256_ok"]

    os.remove(p)
    info3 = pexport.inspect_artifact(path)
    assert not info3["ok"]
    assert info3["programs"]["program.bin"]["bytes"] is None

    with pytest.raises(FileNotFoundError):
        pexport.inspect_artifact(str(tmp_path / "nope"))


def test_inspect_artifact_streaming_layout(tmp_path):
    """Streaming artifacts record a {blob: sha} dict over their two
    window programs; inspection is pure file I/O, so a fabricated
    layout exercises it without paying a stream export compile."""
    import hashlib
    import json as json_lib
    sp = tmp_path / "stream_like"
    sp.mkdir()
    blobs = {"program_first.bin": b"first-program",
             "program_anchored.bin": b"anchored-program"}
    for k, v in blobs.items():
        (sp / k).write_bytes(v)
    meta = {"format_version": pexport.FORMAT_VERSION,
            "fn": "video_stream",
            "program_sha256": {k: hashlib.sha256(v).hexdigest()
                               for k, v in blobs.items()},
            "outputs": {}}
    (sp / "meta.json").write_text(json_lib.dumps(meta))
    info = pexport.inspect_artifact(str(sp))
    assert info["ok"] and set(info["programs"]) == set(blobs)
    assert all(p["sha256_ok"] for p in info["programs"].values())
