"""Dataset-CLI end-to-end: generate a TUM-format RGB-D dataset on disk from
the synthetic room, run the `run_dataset` driver against it, check outputs
(the reference's Examples/RGB-D/rgbd_tum.cc workflow, files and all)."""
import numpy as np
import pytest

from orbslam2_tpu.io import synth


@pytest.mark.slow
class TestRunDatasetCLI:
    def test_rgbd_tum_format_end_to_end(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        N = 12
        scene = synth.make_room(seed=0)
        gt = synth.orbit_trajectory(N)
        seq = tmp_path / "seq"
        (seq / "rgb").mkdir(parents=True)
        (seq / "depth").mkdir()
        assoc_lines, rgb_lines = [], []
        for i in range(N):
            ts = i / 30.0
            img = synth.render_room(scene, gt[i], seed=i).astype(np.uint8)
            depth = (synth.depth_room(scene, gt[i]) * 5000.0).astype(np.uint16)
            rgb_rel = f"rgb/{ts:.6f}.png"
            d_rel = f"depth/{ts:.6f}.png"
            cv2.imwrite(str(seq / rgb_rel), img)
            cv2.imwrite(str(seq / d_rel), depth)
            rgb_lines.append(f"{ts:.6f} {rgb_rel}")
            assoc_lines.append(f"{ts:.6f} {rgb_rel} {ts:.6f} {d_rel}")
        (seq / "rgb.txt").write_text("# ts file\n" + "\n".join(rgb_lines) + "\n")
        assoc = seq / "associations.txt"
        assoc.write_text("\n".join(assoc_lines) + "\n")

        settings = tmp_path / "settings.yaml"
        settings.write_text(
            "%YAML:1.0\n"
            "Camera.fx: 500.0\nCamera.fy: 500.0\n"
            "Camera.cx: 320.0\nCamera.cy: 240.0\n"
            "Camera.k1: 0.0\nCamera.k2: 0.0\nCamera.p1: 0.0\nCamera.p2: 0.0\n"
            "Camera.width: 640\nCamera.height: 480\n"
            "Camera.fps: 30.0\nCamera.bf: 250.0\nCamera.RGB: 1\n"
            "ThDepth: 25.0\nDepthMapFactor: 5000.0\n"
            "ORBextractor.nFeatures: 1000\nORBextractor.scaleFactor: 1.2\n"
            "ORBextractor.nLevels: 8\n"
            "ORBextractor.iniThFAST: 20\nORBextractor.minThFAST: 7\n")

        from orbslam2_tpu.run_dataset import main
        out = tmp_path / "out"
        rc = main(["rgbd_tum", str(settings), str(seq), str(assoc),
                   "--out-dir", str(out), "--platform", "cpu"])
        assert rc == 0
        traj = np.loadtxt(out / "CameraTrajectory.txt")
        assert traj.shape[1] == 8 and len(traj) >= N - 4
        # a gentle orbit with dense depth legitimately keeps few keyframes
        # under the reference's exact NeedNewKeyFrame rules (one init KF can
        # be enough); loadtxt squeezes a single row to 1-D
        kf = np.atleast_2d(np.loadtxt(out / "KeyFrameTrajectory.txt"))
        assert kf.shape[0] >= 1 and kf.shape[1] == 8
        # trajectory moves in +x like the ground truth
        assert traj[-1, 1] > traj[0, 1] + 0.1

    def test_stereo_kitti_end_to_end(self, tmp_path):
        """KITTI odometry layout on disk -> stereo_kitti driver
        (Examples/Stereo/stereo_kitti.cc workflow: image_0/image_1 pairs,
        times.txt, KITTI-format trajectory dump)."""
        cv2 = pytest.importorskip("cv2")
        N = 14
        scene = synth.make_room(seed=0)
        gt = synth.orbit_trajectory(N)
        baseline = 250.0 / 500.0  # bf / fx
        seq = tmp_path / "00"
        (seq / "image_0").mkdir(parents=True)
        (seq / "image_1").mkdir()
        for i in range(N):
            left = synth.render_room(scene, gt[i], seed=i).astype(np.uint8)
            T_r = gt[i].copy()
            T_r[:, 3] = T_r[:, 3] - np.array([baseline, 0, 0], np.float32)
            right = synth.render_room(scene, T_r,
                                      seed=10_000 + i).astype(np.uint8)
            cv2.imwrite(str(seq / "image_0" / f"{i:06d}.png"), left)
            cv2.imwrite(str(seq / "image_1" / f"{i:06d}.png"), right)
        (seq / "times.txt").write_text(
            "\n".join(f"{i / 10.0:.6e}" for i in range(N)) + "\n")
        settings = tmp_path / "settings.yaml"
        settings.write_text(
            "%YAML:1.0\n"
            "Camera.fx: 500.0\nCamera.fy: 500.0\n"
            "Camera.cx: 320.0\nCamera.cy: 240.0\n"
            "Camera.k1: 0.0\nCamera.k2: 0.0\nCamera.p1: 0.0\nCamera.p2: 0.0\n"
            "Camera.width: 640\nCamera.height: 480\n"
            "Camera.fps: 10.0\nCamera.bf: 250.0\nCamera.RGB: 1\n"
            "ThDepth: 25.0\n"
            "ORBextractor.nFeatures: 1000\nORBextractor.scaleFactor: 1.2\n"
            "ORBextractor.nLevels: 8\n"
            "ORBextractor.iniThFAST: 20\nORBextractor.minThFAST: 7\n")

        from orbslam2_tpu.run_dataset import main
        out = tmp_path / "out"
        rc = main(["stereo_kitti", str(settings), str(seq),
                   "--out-dir", str(out), "--platform", "cpu"])
        assert rc == 0
        traj = np.loadtxt(out / "CameraTrajectory.txt")
        # stereo initializes on the first frame: (almost) every frame tracks
        assert traj.ndim == 2 and traj.shape[1] == 8 and len(traj) >= N - 2
        assert np.all(np.isfinite(traj))
        kt = np.loadtxt(out / "CameraTrajectoryKITTI.txt")
        assert kt.ndim == 2 and kt.shape[1] == 12
        R = kt[-1].reshape(3, 4)[:, :3]
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-4)
        # metric scale from stereo: the orbit's +x translation is recovered
        assert traj[-1, 1] > traj[0, 1] + 0.1

    def test_mono_tum_end_to_end(self, tmp_path):
        """TUM monocular layout (rgb.txt only) -> mono_tum driver
        (Examples/Monocular/mono_tum.cc workflow)."""
        cv2 = pytest.importorskip("cv2")
        N = 22
        scene = synth.make_room(seed=0)
        gt = synth.orbit_trajectory(N)
        seq = tmp_path / "seq"
        (seq / "rgb").mkdir(parents=True)
        rgb_lines = []
        for i in range(N):
            ts = i / 30.0
            img = synth.render_room(scene, gt[i], seed=i).astype(np.uint8)
            rel = f"rgb/{ts:.6f}.png"
            cv2.imwrite(str(seq / rel), img)
            rgb_lines.append(f"{ts:.6f} {rel}")
        (seq / "rgb.txt").write_text(
            "# color images\n# ts file\n" + "\n".join(rgb_lines) + "\n")
        settings = tmp_path / "settings.yaml"
        settings.write_text(
            "%YAML:1.0\n"
            "Camera.fx: 500.0\nCamera.fy: 500.0\n"
            "Camera.cx: 320.0\nCamera.cy: 240.0\n"
            "Camera.k1: 0.0\nCamera.k2: 0.0\nCamera.p1: 0.0\nCamera.p2: 0.0\n"
            "Camera.width: 640\nCamera.height: 480\n"
            "Camera.fps: 30.0\nCamera.RGB: 1\n"
            "ORBextractor.nFeatures: 1000\nORBextractor.scaleFactor: 1.2\n"
            "ORBextractor.nLevels: 8\n"
            "ORBextractor.iniThFAST: 20\nORBextractor.minThFAST: 7\n")

        from orbslam2_tpu.run_dataset import main
        out = tmp_path / "out"
        rc = main(["mono_tum", str(settings), str(seq),
                   "--out-dir", str(out), "--platform", "cpu"])
        assert rc == 0
        traj = np.loadtxt(out / "CameraTrajectory.txt")
        # mono init consumes the first frames; the rest must track
        assert traj.ndim == 2 and traj.shape[1] == 8 and len(traj) >= N - 8
        assert np.all(np.isfinite(traj))
        kf = np.atleast_2d(np.loadtxt(out / "KeyFrameTrajectory.txt"))
        assert kf.shape[0] >= 2 and kf.shape[1] == 8
        # motion exists (mono scale arbitrary)
        assert np.linalg.norm(traj[-1, 1:4] - traj[0, 1:4]) > 1e-3
