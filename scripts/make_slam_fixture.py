"""Generate ORB-SLAM2-shaped SLAM result files with drift + a loop closure.

The reference consumes three files per scene (slam_dataset.py:382-576):
``orbslam2_c2w.json`` (per-frame pose history: at each frame, the current
estimate of every keyframe pose plus "cur"), ``orbslam2_pg.json`` (pose-graph
records ``{KF, LC, CV, WGT}`` emitted at keyframe-creation frames) and
``orbslam2_final.txt`` (final trajectory rows ``id x y z qx qy qz qw``).

This writes the same layout from a ground-truth trajectory with a synthetic
tracking-drift model: the online estimate accumulates translation drift up to
``max_drift`` at the loop-closure frame, where ORB-SLAM2-style global
correction snaps every keyframe pose back to ground truth, optionally culls
keyframes, and adds an LC edge closing the loop. Exercises the ingestion →
essential-graph → map-deformation chain (reference run_mapping.py:888-952) on
loop-closure-shaped data instead of the always-clean fixed_kf_freq path.

Pose vectors are OpenCV c2w (x y z qx qy qz qw), matching what the parsers
undo via the OpenGL flip (slam_dataset.py:626-645).
"""

import json
import pathlib
import sys

import numpy as np

_REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

from neural_graph_mapping_tpu.datasets.base import OGL2OCV  # noqa: E402


def _gl_c2w_to_pose_vector(gl_c2w: np.ndarray) -> list:
    from scipy.spatial.transform import Rotation

    m = np.asarray(gl_c2w, np.float64) @ OGL2OCV
    q = Rotation.from_matrix(m[:3, :3]).as_quat()  # qx qy qz qw
    return [*m[:3, 3].tolist(), *q.tolist()]


def write_slam_fixture(
    scene_dir,
    gt_c2ws,
    kf_freq: int = 5,
    lc_frame: int = None,
    max_drift: float = 0.4,
    drift_axis=(1.0, 0.0, 0.0),
    removed_kfs=(),
    cov_window: int = 3,
    cov_weight: float = 100.0,
):
    """Write the three SLAM files into ``scene_dir``; returns drift per frame.

    Frames ``0..lc_frame-1`` carry estimates drifted by ``t/lc_frame *
    max_drift`` along ``drift_axis`` (applied at allocation time, so a
    keyframe's stored pose drifts by its *creation-time* offset, like real
    accumulating odometry error). At ``lc_frame`` (must be a keyframe) all
    keyframe poses snap to ground truth, ``removed_kfs`` disappear from the
    pose-graph records, and an ``LC`` edge connects ``lc_frame`` with
    keyframe 0. Covisibility edges link each keyframe to its ``cov_window``
    temporal neighbors at ``cov_weight``.
    """
    scene_dir = pathlib.Path(scene_dir)
    gt_c2ws = np.asarray(gt_c2ws, np.float64)
    num = len(gt_c2ws)
    if lc_frame is None:
        lc_frame = (num * 3 // 4) // kf_freq * kf_freq
    assert lc_frame % kf_freq == 0, "loop closure must land on a keyframe"
    axis = np.asarray(drift_axis, np.float64)
    axis = axis / np.linalg.norm(axis)

    def drift(frame_id: int) -> np.ndarray:
        d = np.eye(4)
        d[:3, 3] = axis * max_drift * min(frame_id, lc_frame) / lc_frame
        return d

    def est(frame_id: int, at_frame_id: int) -> np.ndarray:
        if at_frame_id >= lc_frame:
            return gt_c2ws[frame_id]
        return drift(frame_id) @ gt_c2ws[frame_id]

    kf_ids = [f for f in range(num) if f % kf_freq == 0]
    live_per_frame = {}
    live = []
    for f in range(num):
        if f in kf_ids:
            live = [k for k in live if f < lc_frame or k not in removed_kfs]
            live.append(f)
        live_per_frame[f] = list(live)

    c2w_data = {}
    for f in range(num):
        entry = {"cur": _gl_c2w_to_pose_vector(est(f, f))}
        for k in live_per_frame[f]:
            entry[str(k)] = _gl_c2w_to_pose_vector(est(k, f))
        c2w_data[str(f)] = entry
    (scene_dir / "orbslam2_c2w.json").write_text(json.dumps(c2w_data))

    pg_data = {}
    for f in kf_ids:
        records = []
        lives = live_per_frame[f]
        for k in lives:
            neighbors = [o for o in lives if o != k]
            cov = sorted(neighbors, key=lambda o: abs(o - k))[:cov_window]
            rec = {
                "KF": k,
                "CV": cov,
                "WGT": [cov_weight] * len(cov),
                "LC": [],
            }
            if f >= lc_frame and k in (0, lc_frame):
                rec["LC"] = [lc_frame if k == 0 else 0]
            records.append(rec)
        pg_data[str(f)] = records
    (scene_dir / "orbslam2_pg.json").write_text(json.dumps(pg_data))

    rows = []
    for f in range(num):
        rows.append([f, *_gl_c2w_to_pose_vector(gt_c2ws[f])])
    np.savetxt(scene_dir / "orbslam2_final.txt", np.asarray(rows))
    return {"lc_frame": lc_frame, "kf_ids": kf_ids, "max_drift": max_drift}


def main():
    """Export the synthetic scene + drifted SLAM files to a directory tree."""
    out = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ngm_slam_fixture")
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    from scripts.refrun.export_synthetic_nrgbd import export

    scene_dir = export(out, frames)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from neural_graph_mapping_tpu.datasets.synthetic import SyntheticDataset

    ds = SyntheticDataset({"num_frames": frames, "width": 160, "height": 120,
                           "fx": 140.0, "fy": 140.0})
    info = write_slam_fixture(scene_dir, np.asarray(ds.gt_c2ws),
                              removed_kfs=(frames // 2 // 5 * 5,))
    print(f"wrote SLAM fixture to {scene_dir}: {info}")


if __name__ == "__main__":
    main()
