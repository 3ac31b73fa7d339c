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
