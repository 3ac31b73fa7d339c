"""EuRoC stereo rectification (io/rectify.py + run_dataset wiring).

The reference's EuRoC driver builds cv2 rectification maps from the YAML
LEFT.*/RIGHT.* blocks before the first frame (stereo_EuRoC.cpp:35-90).
These tests prove (a) load_rectification straightens epipolar lines on a
synthetically distorted pair and reports the rectified intrinsics, and
(b) the stereo_euroc CLI path tracks a distorted synthetic sequence
end-to-end through the remap.
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


W, H = 320, 240
K = np.array([[260.0, 0, 160.0], [0, 260.0, 120.0], [0, 0, 1]])
D = np.array([-0.28, 0.07, 0.0002, -0.0001, 0.0])  # EuRoC-like radial
P_L = np.array([[240.0, 0, 160.0, 0], [0, 240.0, 120.0, 0], [0, 0, 1, 0]])
BASELINE = 0.11
P_R = P_L.copy()
P_R[0, 3] = -P_L[0, 0] * BASELINE


def _mat_yaml(name, m):
    m = np.asarray(m, float)
    data = ", ".join(f"{float(v):.10g}" for v in m.ravel())
    return (f"{name}: !!opencv-matrix\n   rows: {m.shape[0]}\n"
            f"   cols: {m.shape[1]}\n   dt: d\n   data: [{data}]\n")


def _write_settings(path):
    # cv2.FileStorage refuses dotted key names in write mode; the reference
    # EuRoC.yaml uses them, so emit the opencv-matrix blocks by hand in the
    # same format (readable by cv2.FileStorage READ, as io/rectify does).
    with open(path, "w") as f:
        f.write("%YAML:1.0\n")
        for side, P in (("LEFT", P_L), ("RIGHT", P_R)):
            f.write(f"{side}.height: {H}\n{side}.width: {W}\n")
            f.write(_mat_yaml(f"{side}.D", D.reshape(1, -1)))
            f.write(_mat_yaml(f"{side}.K", K))
            f.write(_mat_yaml(f"{side}.R", np.eye(3)))
            f.write(_mat_yaml(f"{side}.P", P))
        f.write(
            "Camera.fx: 240.0\nCamera.fy: 240.0\n"
            "Camera.cx: 160.0\nCamera.cy: 120.0\n"
            "Camera.k1: 0.0\nCamera.k2: 0.0\nCamera.p1: 0.0\nCamera.p2: 0.0\n"
            f"Camera.width: {W}\nCamera.height: {H}\n"
            f"Camera.fps: 20.0\nCamera.bf: {P_L[0,0]*BASELINE}\nCamera.RGB: 1\n"
            "ThDepth: 35.0\n"
            "ORBextractor.nFeatures: 600\nORBextractor.scaleFactor: 1.2\n"
            "ORBextractor.nLevels: 8\n"
            "ORBextractor.iniThFAST: 20\nORBextractor.minThFAST: 7\n")


def _distort(img_rect):
    """Re-distort a rectified-space image into raw camera space: for each
    raw pixel, sample the rectified image at its rectified coords."""
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    pts = np.stack([xs.ravel(), ys.ravel()], -1).reshape(-1, 1, 2)
    rect = cv2.undistortPoints(pts, K, D, R=np.eye(3), P=P_L[:3, :3])
    U = rect[:, 0, 0].reshape(H, W).astype(np.float32)
    V = rect[:, 0, 1].reshape(H, W).astype(np.float32)
    return cv2.remap(img_rect, U, V, cv2.INTER_LINEAR)


class TestLoadRectification:
    def test_straightens_epipolar_lines(self, tmp_path):
        yaml = tmp_path / "stereo.yaml"
        _write_settings(yaml)
        from orbslam2_tpu.io.rectify import load_rectification
        rect = load_rectification(yaml)
        assert rect is not None
        rect_l, rect_r, fx, fy, cx, cy, bf = rect
        assert (fx, fy, cx, cy) == (240.0, 240.0, 160.0, 120.0)
        assert bf == pytest.approx(P_L[0, 0] * BASELINE)

        # horizontal stripes in rectified space, re-distorted into raw space
        stripes = (255 * ((np.arange(H)[:, None] // 24) % 2)
                   * np.ones((1, W))).astype(np.uint8)
        raw = _distort(stripes)

        def edge_spread(img, lo, hi):
            """Sub-pixel row of the stripe boundary found in rows [lo, hi)
            per column; returns max-min across columns. A straight
            (epipolar-aligned) horizontal edge has ~0 spread."""
            rows_per_col = []
            f = img.astype(float)
            for c in range(8, W - 8):
                g = np.diff(f[:, c])
                r = int(np.argmax(np.abs(g[lo:hi]))) + lo
                w = np.abs(g[r - 2:r + 3])
                rr = np.arange(r - 2, r + 3)
                rows_per_col.append((w * rr).sum() / max(w.sum(), 1e-9))
            rows_per_col = np.array(rows_per_col)
            return float(rows_per_col.max() - rows_per_col.min())

        # the off-center boundary near row 48 is bent by tens of pixels in
        # the raw image and must come back straight (<1 px) after remap
        assert edge_spread(raw, 36, 60) > 10.0
        out = rect_l(raw)
        assert edge_spread(out, 36, 60) < 1.0
        # and the pattern lands where the ideal rectified image puts it
        inner = out[40:-40, 40:-40].astype(int)
        ideal = stripes[40:-40, 40:-40].astype(int)
        assert np.abs(inner - ideal).mean() < 15.0

    def test_returns_none_without_blocks(self, tmp_path):
        yaml = tmp_path / "plain.yaml"
        yaml.write_text("%YAML:1.0\nCamera.fx: 500.0\n")
        from orbslam2_tpu.io.rectify import load_rectification
        assert load_rectification(yaml) is None


@pytest.mark.slow
class TestStereoEurocCLI:
    def test_stereo_euroc_end_to_end_distorted(self, tmp_path):
        """Render a stereo synthetic-room sequence, re-distort both eyes,
        lay them out as EuRoC mav0, and run the stereo_euroc driver: the
        rectification wiring must recover the clean pair and track."""
        from orbslam2_tpu.io import synth

        N = 10
        scene = synth.make_room(seed=0, width=W, height=H,
                                fx=float(P_L[0, 0]), fy=float(P_L[1, 1]))
        gt = synth.orbit_trajectory(N)
        mav0 = tmp_path / "mav0"
        for cam in ("cam0", "cam1"):
            (mav0 / cam / "data").mkdir(parents=True)
        lines = ["#timestamp [ns],filename"]
        for i in range(N):
            ts_ns = int(i / 20.0 * 1e9)
            Tl = gt[i]
            # right camera: optical center displaced +b along the camera x
            # axis (Tcw convention: X_right = X_left_cam - [b, 0, 0])
            Tr = Tl.copy()
            Tr[:, 3] = Tl[:, 3] - np.array([BASELINE, 0, 0])
            left = np.clip(synth.render_room(scene, Tl, seed=i), 0, 255)
            right = np.clip(synth.render_room(scene, Tr, seed=i), 0, 255)
            name = f"{ts_ns}.png"
            cv2.imwrite(str(mav0 / "cam0" / "data" / name),
                        _distort(left.astype(np.uint8)))
            cv2.imwrite(str(mav0 / "cam1" / "data" / name),
                        _distort(right.astype(np.uint8)))
            lines.append(f"{ts_ns},{name}")
        for cam in ("cam0", "cam1"):
            (mav0 / cam / "data.csv").write_text("\n".join(lines) + "\n")

        yaml = tmp_path / "stereo.yaml"
        _write_settings(yaml)
        from orbslam2_tpu.run_dataset import main
        out = tmp_path / "out"
        rc = main(["stereo_euroc", str(yaml), str(mav0),
                   "--out-dir", str(out), "--platform", "cpu"])
        assert rc == 0
        traj = np.loadtxt(out / "CameraTrajectory.txt")
        assert traj.ndim == 2 and traj.shape[1] == 8 and len(traj) >= N - 4
