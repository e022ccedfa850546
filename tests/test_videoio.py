"""Host-side video-file IO (utils/videoio.py): hermetic MJPG .avi
round-trips (the codec every cv2 build ships), RGB convention, stride/
limit/chunk semantics, and the dead-writer guard."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tpu_pose.utils import videoio  # noqa: E402


def _frames(n=10, h=48, w=64, seed=0):
    """Blocky high-contrast frames that survive MJPG compression: each
    frame is a solid RGB color keyed to its index."""
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0),
              (0, 255, 255)]
    out = np.zeros((n, h, w, 3), np.uint8)
    for i in range(n):
        out[i] = colors[i % len(colors)]
    return out


def test_write_read_roundtrip_rgb(tmp_path):
    p = str(tmp_path / "t.avi")
    frames = _frames(8)
    videoio.write_video(p, frames, fps=10)
    info = videoio.video_info(p)
    assert info["num_frames"] == 8
    assert (info["width"], info["height"]) == (64, 48)
    assert info["fps"] == pytest.approx(10, abs=0.5)
    back = videoio.read_video(p)
    assert back.shape == (8, 48, 64, 3) and back.dtype == np.uint8
    # RGB order preserved through the BGR conversions (MJPG is lossy —
    # solid frames come back within a few counts).
    for i in range(8):
        np.testing.assert_allclose(
            back[i].reshape(-1, 3).mean(0), frames[i, 0, 0], atol=12)


def test_stride_limit_and_chunking(tmp_path):
    p = str(tmp_path / "t.avi")
    videoio.write_video(p, _frames(10), fps=10)
    assert videoio.read_video(p, stride=3).shape[0] == 4   # 0,3,6,9
    assert videoio.read_video(p, limit=4).shape[0] == 4
    chunks = list(videoio.iter_video(p, chunk=4))
    assert [c.shape[0] for c in chunks] == [4, 4, 2]
    chunks = list(videoio.iter_video(p, chunk=4, stride=2, limit=5))
    assert [c.shape[0] for c in chunks] == [4, 1]
    with pytest.raises(ValueError, match="chunk"):
        next(videoio.iter_video(p, chunk=0))
    with pytest.raises(ValueError, match="stride"):
        next(videoio.iter_video(p, chunk=2, stride=0))


def test_is_video_path_and_errors(tmp_path):
    assert videoio.is_video_path("a.MP4") and videoio.is_video_path("b.avi")
    assert not videoio.is_video_path("c.png")
    with pytest.raises(FileNotFoundError):
        videoio.video_info(str(tmp_path / "missing.avi"))
    with pytest.raises(ValueError, match="zero frames"):
        videoio.write_video(str(tmp_path / "e.avi"), [])
    with pytest.raises(ValueError, match="RGB"):
        videoio.write_video(str(tmp_path / "e.avi"),
                            [np.zeros((4, 4), np.uint8)])
    with pytest.raises(ValueError, match="share one size"):
        videoio.write_video(str(tmp_path / "e.avi"),
                            [np.zeros((4, 6, 3), np.uint8),
                             np.zeros((6, 4, 3), np.uint8)])
    # Not a video: a text file with a video extension.
    bad = tmp_path / "bad.avi"
    bad.write_text("not a video")
    with pytest.raises(ValueError, match="could not open|no decodable"):
        videoio.read_video(str(bad))


def test_write_video_detects_dead_codec(tmp_path):
    """An unavailable fourcc must raise, not leave an unreadable file
    (observed: cv2 'opens' an mp4v .mp4 writer without FFmpeg and emits
    a 1 KB header-only file)."""
    try:
        videoio.write_video(str(tmp_path / "t.mp4"), _frames(3), fps=10)
    except ValueError as e:
        assert "unreadable" in str(e)
    else:
        # FFmpeg-enabled cv2 build: the mp4 must actually round-trip.
        assert videoio.read_video(str(tmp_path / "t.mp4")).shape[0] == 3
