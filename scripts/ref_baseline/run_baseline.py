"""Head-to-head baseline measurement against the REFERENCE binaries.

Implements BASELINE.md's measurement plan step 1: build the reference
(scripts/ref_baseline/CMakeLists.txt -> /tmp/refbuild), render a synthetic
TUM-format RGB-D sequence with exact ground truth, run the reference's
rgbd_tum/mono_tum AND this repo's run_dataset on the SAME files, and report
median tracking time + ATE for both.

The reference needs a DBoW2 vocabulary; none ships with the repo (only the
bin_vocabulary converter), so this script trains one from cv2-ORB
descriptors of held-out synthetic renders and writes it in the ORBvoc.txt
format (TemplatedVocabulary::loadFromTextFile, TemplatedVocabulary.h:1362).

Usage:
  cmake -S scripts/ref_baseline -B /tmp/refbuild -G Ninja && ninja -C /tmp/refbuild
  JAX_PLATFORM_NAME=cpu python scripts/ref_baseline/run_baseline.py [N_frames]
"""
import json
import re
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")

from orbslam2_tpu.io import synth  # noqa: E402
from orbslam2_tpu.io.vocabulary import train_vocabulary  # noqa: E402
from orbslam2_tpu.utils.evaluation import ate_rmse, camera_centers  # noqa: E402

BUILD = Path("/tmp/refbuild")
WORK = Path("/tmp/ref_baseline")


def write_orbvoc_text(voc, path):
    """Serialize a Vocabulary in the ORBvoc.txt format the reference loads:
    header `k L scoring weighting`, then per node
    `parent is_leaf b0..b31 weight` (nodes in parent-before-child order,
    ids implicitly 1..N-1 with 0 = root)."""
    N = voc.node_desc.shape[0]
    parent = np.zeros(N, np.int32)
    for nid in range(N):
        for ch in voc.node_children[nid]:
            if ch >= 0:
                parent[ch] = nid
    lines = [f"{voc.k} {voc.levels} 0 0"]  # L1_NORM, TF_IDF
    for nid in range(1, N):
        is_leaf = int(voc.node_word[nid] >= 0)
        w = float(voc.word_weight[voc.node_word[nid]]) if is_leaf else 0.0
        byts = voc.node_desc[nid].view(np.uint8)
        lines.append(f"{parent[nid]} {is_leaf} "
                     + " ".join(str(int(b)) for b in byts) + f" {w}")
    Path(path).write_text("\n".join(lines) + "\n")


def make_sequence(N, seed=0):
    import cv2
    scene = synth.make_room(seed=seed)
    gt = synth.orbit_trajectory(N)
    seq = WORK / "seq"
    (seq / "rgb").mkdir(parents=True, exist_ok=True)
    (seq / "depth").mkdir(exist_ok=True)
    assoc, rgb_lines, gt_lines = [], [], []
    for i in range(N):
        ts = i / 30.0
        img = synth.render_room(scene, gt[i], seed=i).astype(np.uint8)
        depth = (synth.depth_room(scene, gt[i]) * 5000.0).astype(np.uint16)
        cv2.imwrite(str(seq / f"rgb/{ts:.6f}.png"), img)
        cv2.imwrite(str(seq / f"depth/{ts:.6f}.png"), depth)
        rgb_lines.append(f"{ts:.6f} rgb/{ts:.6f}.png")
        assoc.append(f"{ts:.6f} rgb/{ts:.6f}.png {ts:.6f} depth/{ts:.6f}.png")
    (seq / "rgb.txt").write_text("# tum rgb\n" + "\n".join(rgb_lines) + "\n")
    (seq / "associations.txt").write_text("\n".join(assoc) + "\n")
    return scene, gt, seq


def make_mono_sequence(N, seed=0):
    """Mono-init-friendly sequence: ONE-WAY lateral sweep (0.07 m/frame)
    over the RICH-texture room with light noise — the measured recipe the
    reference binary both initializes on AND tracks end-to-end (its
    initializer accumulates parallax against the first frame; zig-zag
    reversals broke its constant-velocity model, and the plain blocky
    texture's descriptor ambiguity starved its 0.7-ratio SearchByBoW right
    after init — r2's '0 keyframes' result)."""
    import cv2
    import shutil
    scene = synth.make_room(seed=seed, texture="rich")
    gt = synth.sweep_trajectory(N)
    seq = WORK / "seq_mono"
    shutil.rmtree(seq, ignore_errors=True)
    (seq / "rgb").mkdir(parents=True, exist_ok=True)
    rgb_lines = []
    for i in range(N):
        ts = i / 30.0
        img = synth.render_room(scene, gt[i], noise=0.5, seed=i).astype(np.uint8)
        cv2.imwrite(str(seq / f"rgb/{ts:.6f}.png"), img)
        rgb_lines.append(f"{ts:.6f} rgb/{ts:.6f}.png")
    (seq / "rgb.txt").write_text("# tum rgb\n" + "\n".join(rgb_lines) + "\n")
    return scene, gt, seq


def make_kitti_sequence(N, seed=0, baseline=0.5):
    """Synthetic stereo sequence in KITTI odometry layout (image_0/,
    image_1/, times.txt — Examples/Stereo/stereo_kitti.cpp LoadImages).
    Right camera = left shifted +baseline along the camera x axis
    (rectified pair, same intrinsics)."""
    import cv2
    scene = synth.make_room(seed=seed)
    gt = synth.orbit_trajectory(N)
    seq = WORK / "seq_kitti"
    (seq / "image_0").mkdir(parents=True, exist_ok=True)
    (seq / "image_1").mkdir(exist_ok=True)
    times = []
    for i in range(N):
        left = synth.render_room(scene, gt[i], seed=i).astype(np.uint8)
        Tr = gt[i].copy()
        Tr[:, 3] = Tr[:, 3] - np.array([baseline, 0.0, 0.0], np.float32)
        right = synth.render_room(scene, Tr, seed=10_000 + i).astype(np.uint8)
        cv2.imwrite(str(seq / f"image_0/{i:06d}.png"), left)
        cv2.imwrite(str(seq / f"image_1/{i:06d}.png"), right)
        times.append(f"{i / 30.0:.6e}")
    (seq / "times.txt").write_text("\n".join(times) + "\n")
    return scene, gt, seq


def load_kitti_traj(path):
    """KITTI rows: 12 floats = row-major Rwc|twc (System::SaveTrajectoryKITTI,
    src/System.cpp:456-458). Returns [M,3] camera centers in save order."""
    rows = []
    for line in Path(path).read_text().splitlines():
        parts = line.split()
        if len(parts) == 12:
            rows.append([float(x) for x in parts])
    arr = np.array(rows)
    return arr[:, [3, 7, 11]] if len(arr) else np.zeros((0, 3))


def make_vocab():
    """cv2-ORB descriptors from held-out renders -> DBoW2-format vocab."""
    import cv2
    voc_path = WORK / "voc.txt"
    if voc_path.exists():
        return voc_path
    orb = cv2.ORB_create(nfeatures=1500)
    descs = []
    for seed in (7, 8):
        scene = synth.make_room(seed=seed)
        for Tcw in synth.loop_trajectory(24, radius=1.2):
            img = synth.render_room(scene, Tcw).astype(np.uint8)
            _, d = orb.detectAndCompute(img, None)
            if d is not None:
                descs.append(d)
    D = np.concatenate(descs).astype(np.uint8)
    print(f"training reference vocab on {len(D)} cv2-ORB descriptors")
    voc = train_vocabulary(np.ascontiguousarray(D).view("<u4"), k=10, levels=4)
    write_orbvoc_text(voc, voc_path)
    return voc_path


def write_settings():
    p = WORK / "settings.yaml"
    p.write_text(
        "%YAML:1.0\n"
        "Camera.fx: 500.0\nCamera.fy: 500.0\n"
        "Camera.cx: 320.0\nCamera.cy: 240.0\n"
        "Camera.k1: 0.0\nCamera.k2: 0.0\nCamera.p1: 0.0\nCamera.p2: 0.0\n"
        "Camera.width: 640\nCamera.height: 480\n"
        "Camera.fps: 30.0\nCamera.bf: 250.0\nCamera.RGB: 1\n"
        "ThDepth: 25.0\nDepthMapFactor: 5000.0\n"
        "ORBextractor.nFeatures: 1000\nORBextractor.scaleFactor: 1.2\n"
        "ORBextractor.nLevels: 8\n"
        "ORBextractor.iniThFAST: 20\nORBextractor.minThFAST: 7\n"
        # Viewer keys read by the (stubbed) drawers in some builds
        "Viewer.KeyFrameSize: 0.05\nViewer.KeyFrameLineWidth: 1\n"
        "Viewer.GraphLineWidth: 0.9\nViewer.PointSize: 2\n"
        "Viewer.CameraSize: 0.08\nViewer.CameraLineWidth: 3\n"
        "Viewer.ViewpointX: 0\nViewer.ViewpointY: -0.7\n"
        "Viewer.ViewpointZ: -1.8\nViewer.ViewpointF: 500\n")
    return p


def load_tum_traj(path):
    rows = []
    for line in Path(path).read_text().splitlines():
        parts = line.split()
        if len(parts) == 8:
            rows.append([float(x) for x in parts])
    return np.array(rows)


def traj_to_centers(traj):
    """TUM rows (ts tx ty tz qx qy qz qw) are Twc -> centers are t."""
    return traj[:, 0], traj[:, 1:4]


def gt_centers(gt, ts, fps=30.0):
    fids = np.clip(np.round(np.asarray(ts) * fps).astype(int), 0, len(gt) - 1)
    return camera_centers(gt[fids])


def run_reference(mode, voc, settings, seq):
    exe = BUILD / {"rgbd": "rgbd_tum", "mono": "mono_tum",
                   "stereo": "stereo_kitti"}[mode]
    args = [str(exe), str(voc), str(settings), str(seq)]
    if mode == "rgbd":
        args.append(str(seq / "associations.txt"))
    t0 = time.perf_counter()
    r = subprocess.run(args, cwd=WORK, capture_output=True, text=True,
                       timeout=1800)
    wall = time.perf_counter() - t0
    out = r.stdout + r.stderr
    med = None
    m = re.search(r"median tracking time[^\d]*([\d.]+)", out)
    if m:
        med = float(m.group(1))
    if mode == "stereo":
        traj_file = WORK / "CameraTrajectory.txt"
        traj = (load_kitti_traj(traj_file) if traj_file.exists()
                else np.zeros((0, 3)))
    else:
        traj_file = WORK / ("CameraTrajectory.txt" if mode == "rgbd"
                            else "KeyFrameTrajectory.txt")
        traj = (load_tum_traj(traj_file) if traj_file.exists()
                else np.zeros((0, 8)))
    return dict(median_track_s=med, wall_s=wall, traj=traj, rc=r.returncode,
                tail=out.strip().splitlines()[-8:])


def run_ours(mode, settings, seq, platform="cpu"):
    from orbslam2_tpu.run_dataset import main as run_main
    out = WORK / f"ours_{mode}"
    t0 = time.perf_counter()
    if mode == "rgbd":
        rc = run_main(["rgbd_tum", str(settings), str(seq),
                       str(seq / "associations.txt"), "--out-dir", str(out),
                       "--platform", platform])
    elif mode == "stereo":
        rc = run_main(["stereo_kitti", str(settings), str(seq),
                       "--out-dir", str(out), "--platform", platform])
    else:
        rc = run_main(["mono_tum", str(settings), str(seq),
                       "--out-dir", str(out), "--platform", platform])
    wall = time.perf_counter() - t0
    traj = load_tum_traj(out / "CameraTrajectory.txt")
    metrics = {}
    mfile = out / "metrics.json"
    if mfile.exists():
        metrics = json.loads(mfile.read_text())
    return dict(wall_s=wall, traj=traj, rc=rc, metrics=metrics)


def main(N=90, modes=("rgbd", "mono", "stereo")):
    WORK.mkdir(exist_ok=True)
    seqs = {}  # mode -> (gt, seq); render only what the run needs
    if "rgbd" in modes:
        _, gt, seq = make_sequence(N)
        seqs["rgbd"] = (gt, seq)
    if "stereo" in modes:
        _, gt_k, seq_k = make_kitti_sequence(N)
        seqs["stereo"] = (gt_k, seq_k)
    if "mono" in modes:
        _, gt_m, seq_m = make_mono_sequence(N)
        seqs["mono"] = (gt_m, seq_m)
    voc = make_vocab()
    settings = write_settings()
    results = {}
    for mode in modes:
        print(f"== reference {mode} ==")
        g, s = seqs[mode]
        ref = run_reference(mode, voc, settings, s)
        print("\n".join(ref["tail"]))
        ours = run_ours(mode, settings, s)
        with_scale = mode == "mono"
        row = {}
        for name, r in (("reference", ref), ("ours", ours)):
            traj = r["traj"]
            if name == "reference" and mode == "stereo":
                # KITTI rows carry no timestamps; rows are tracked frames
                # in order (lost frames skipped — compare only on a full run)
                if len(traj) == N:
                    ate = ate_rmse(traj, camera_centers(g), with_scale=False)
                else:
                    ate = float("nan")
                n_poses = len(traj)
            elif len(traj) >= 5:
                ts, C = traj_to_centers(traj)
                ate = ate_rmse(C, gt_centers(g, ts), with_scale=with_scale)
                n_poses = len(traj)
            else:
                ate, n_poses = float("nan"), len(traj)
            row[name] = dict(ate_m=float(ate), n_poses=n_poses,
                             wall_s=r["wall_s"],
                             median_track_s=r.get("median_track_s"))
        results[mode] = row
        print(json.dumps(row, indent=2))
    (WORK / "baseline_results.json").write_text(json.dumps(results, indent=2))
    print("\nwrote", WORK / "baseline_results.json")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    kw = {}
    for a in sys.argv[1:]:
        if a.startswith("--modes="):
            kw["modes"] = tuple(a.split("=", 1)[1].split(","))
    main(int(args[0]) if args else 90, **kw)
