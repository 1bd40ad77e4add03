"""On-disk layout fixtures for the four real-dataset loaders.

Synthesizes minimal directory trees matching each reference layout
(slam_datasets/{nrgbd,replica,scannet,kintinuous}_dataset.py) — PNG/JPG
frames, pose files, intrinsics, and tiny ORB-SLAM2 c2w/pg/final exports —
then exercises parsing, unit conversions (mm->m, depth scale), camera
conventions (OpenCV->OpenGL flips, pixel_center), SLAM-result ingestion,
and caching. These are the classic sources of silent metric ruin
(VERDICT r1 "What's weak" #5).
"""

import json

import numpy as np
import PIL.Image
import pytest
from scipy.spatial.transform import Rotation

from neural_graph_mapping_tpu.datasets.base import OGL2OCV
from neural_graph_mapping_tpu.datasets.kintinuous import KintinuousDataset
from neural_graph_mapping_tpu.datasets.nrgbd import NRGBDDataset
from neural_graph_mapping_tpu.datasets.replica import ReplicaDataset
from neural_graph_mapping_tpu.datasets.scannet import ScanNetDataset

W, H = 16, 12
N_FRAMES = 4


def _write_rgb(path, value=128):
    arr = np.full((H, W, 3), value, np.uint8)
    arr[0, 0] = [255, 0, 0]  # corner marker
    PIL.Image.fromarray(arr).save(path)


def _write_depth_mm(path, mm=1500):
    arr = np.full((H, W), mm, np.uint16)
    img = PIL.Image.fromarray(arr)
    img.save(path)


def _gt_poses(n=N_FRAMES):
    """Simple translating trajectory, OpenGL c2w."""
    poses = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    poses[:, 0, 3] = 0.1 * np.arange(n)
    return poses


def _pose_vec(c2w_gl):
    """OpenGL c2w 4x4 -> ORB-SLAM2 export vector [x y z qx qy qz qw].

    Inverse of base.pose_vector_to_4x4 (the export stores the OpenCV-frame
    pose: m = R_t @ OGL2OCV, so R_t = m @ OGL2OCV^-1 = m @ OGL2OCV)."""
    m = np.asarray(c2w_gl, np.float64) @ OGL2OCV.astype(np.float64)
    q = Rotation.from_matrix(m[:3, :3]).as_quat()  # xyzw
    return [*m[:3, 3].tolist(), *q.tolist()]


def _write_slam_files(scene_dir, poses, kf_freq=2):
    """ORB-SLAM2-style c2w history JSON, pose-graph JSON, final-traj txt."""
    c2w_data = {}
    pg_data = {}
    kf_ids = []
    for at in range(len(poses)):
        entry = {"cur": _pose_vec(poses[at])}
        for kf in kf_ids:
            entry[str(kf)] = _pose_vec(poses[kf])
        c2w_data[str(at)] = entry
        if at % kf_freq == 0:
            kf_ids.append(at)
            records = []
            for kf in kf_ids:
                others = [o for o in kf_ids if o != kf]
                records.append(
                    {"KF": kf, "LC": [], "CV": others, "WGT": [100] * len(others)}
                )
            pg_data[str(at)] = records
    (scene_dir / "orbslam2_c2w.json").write_text(json.dumps(c2w_data))
    (scene_dir / "orbslam2_pg.json").write_text(json.dumps(pg_data))
    rows = [
        " ".join(str(v) for v in [i, *_pose_vec(poses[i])])
        for i in range(len(poses))
    ]
    (scene_dir / "orbslam2_final.txt").write_text("\n".join(rows))


_SLAM_CONFIG = dict(
    slam_c2w_file="orbslam2_c2w.json",
    slam_pg_file="orbslam2_pg.json",
    slam_final_file="orbslam2_final.txt",
)


# -- NRGBD ---------------------------------------------------------------------


@pytest.fixture
def nrgbd_root(tmp_path):
    scene = tmp_path / "nrgbd" / "whiteroom"
    (scene / "images").mkdir(parents=True)
    (scene / "depth_filtered").mkdir()
    for i in range(N_FRAMES):
        _write_rgb(scene / "images" / f"img{i}.png")
        _write_depth_mm(scene / "depth_filtered" / f"depth{i}.png")
    poses = _gt_poses()
    np.savetxt(scene / "poses.txt", poses.reshape(-1, 4))
    (scene / "gt_mesh.ply").write_bytes(b"")
    _write_slam_files(scene, poses)
    return tmp_path / "nrgbd"


def test_nrgbd_loader(nrgbd_root):
    ds = NRGBDDataset(
        dict(
            root_dir=str(nrgbd_root),
            scene="whiteroom",
            camera=dict(width=W, height=H, fx=10.0, fy=10.0, cx=8.0, cy=6.0),
            **_SLAM_CONFIG,
        )
    )
    assert NRGBDDataset.get_available_scenes(str(nrgbd_root)) == ["whiteroom"]
    assert len(ds) == N_FRAMES
    item = ds[1]
    assert item["rgbd"].shape == (H, W, 4)
    assert item["rgbd"].dtype == np.float32
    # 1500 mm -> 1.5 m, then the depth_filtered de-bias polynomial
    expected = 0.00123631 * 1.5**2 + (1 + 0.00073707) * 1.5
    np.testing.assert_allclose(item["rgbd"][..., 3], expected, atol=1e-5)
    np.testing.assert_allclose(item["rgbd"][0, 0, :3], [1.0, 0.0, 0.0], atol=1e-6)
    # poses.txt is already OpenGL: passthrough
    np.testing.assert_allclose(item["c2w"], _gt_poses()[1], atol=1e-6)
    assert ds.custom_scene_bounds is not None

    ds.load_slam_results()
    # c2w round trip through the pose-vector export
    np.testing.assert_allclose(
        ds.get_slam_c2ws(0, at_frame_id=2), _gt_poses()[0], atol=1e-5
    )
    assert ds.is_keyframe(2)
    assert not ds.is_keyframe(1)
    graph = ds.get_slam_essential_graph(3)
    assert set(graph.keys()) == {0, 2}
    assert graph[0] == {2}
    np.testing.assert_allclose(ds.slam_final_c2ws[3], _gt_poses()[3], atol=1e-5)
    # umeyama alignment of (identical) trajectories is the identity
    ds.gt_c2ws = _gt_poses().astype(np.float32)
    np.testing.assert_allclose(
        ds.gt_from_est_transform("umeyama"), np.eye(4), atol=1e-4
    )


def test_nrgbd_slam_cache(nrgbd_root):
    config = dict(
        root_dir=str(nrgbd_root),
        scene="whiteroom",
        camera=dict(width=W, height=H, fx=10.0, fy=10.0, cx=8.0, cy=6.0),
        **_SLAM_CONFIG,
    )
    ds = NRGBDDataset(config)
    ds.load_slam_results()
    scene = nrgbd_root / "whiteroom"
    assert (scene / "slam_c2w_dict.npz.pkl").is_file()
    assert (scene / "slam_pg_dict.pkl").is_file()
    # second load comes from cache and matches
    ds2 = NRGBDDataset(config)
    ds2.load_slam_results()
    np.testing.assert_allclose(
        ds2.get_slam_c2ws(2, at_frame_id=2), ds.get_slam_c2ws(2, at_frame_id=2)
    )
    assert ds2.get_slam_essential_graph(3) == ds.get_slam_essential_graph(3)


# -- Replica -------------------------------------------------------------------


@pytest.fixture
def replica_root(tmp_path):
    root = tmp_path / "replica"
    scene = root / "office0"
    (scene / "results").mkdir(parents=True)
    cam = dict(w=W, h=H, fx=10.0, fy=10.0, cx=8.0, cy=6.0, scale=6553.5)
    (root / "cam_params.json").write_text(json.dumps({"camera": cam}))
    for i in range(N_FRAMES):
        _write_rgb(scene / "results" / f"frame{i:06d}.jpg")
        _write_depth_mm(scene / "results" / f"depth{i:06d}.png", mm=6554)
    poses_ocv = _gt_poses() @ OGL2OCV.astype(np.float64)  # stored as OpenCV
    np.savetxt(scene / "traj.txt", poses_ocv.reshape(N_FRAMES, 16))
    (root / "office0_mesh.ply").write_bytes(b"")
    return root


def test_replica_loader(replica_root):
    ds = ReplicaDataset(dict(root_dir=str(replica_root), scene="office0"))
    assert ReplicaDataset.get_available_scenes(str(replica_root)) == ["office0"]
    assert len(ds) == N_FRAMES
    # pixel_center=0.0 convention: stored (normalized to 0.5) cx = 8.0 + 0.5
    assert ds.camera.cx == 8.5
    item = ds[0]
    assert item["rgbd"].shape == (H, W, 4)
    # depth png / cam scale: 6554 / 6553.5
    np.testing.assert_allclose(item["rgbd"][..., 3], 6554 / 6553.5, atol=1e-5)
    # OpenCV traj -> OpenGL c2w
    np.testing.assert_allclose(ds.gt_c2ws[2], _gt_poses()[2], atol=1e-6)
    assert ds.has_gt_mesh
    assert ds.custom_scene_bounds is not None


# -- ScanNet -------------------------------------------------------------------


@pytest.fixture
def scannet_root(tmp_path):
    root = tmp_path / "scannet"
    scene = root / "scene0000_00"
    for sub in ("color", "depth", "pose", "intrinsic"):
        (scene / sub).mkdir(parents=True)
    for i in range(N_FRAMES):
        # color at 2x depth resolution: exercises the Lanczos align cache
        arr = np.full((2 * H, 2 * W, 3), 100, np.uint8)
        PIL.Image.fromarray(arr).save(scene / "color" / f"{i}.jpg")
        _write_depth_mm(scene / "depth" / f"{i}.png", mm=2000)
    poses_ocv = _gt_poses() @ OGL2OCV.astype(np.float64)
    for i in range(N_FRAMES):
        np.savetxt(scene / "pose" / f"{i}.txt", poses_ocv[i])
    intr = np.eye(4)
    intr[0, 0] = intr[1, 1] = 10.0
    intr[0, 2], intr[1, 2] = 8.0, 6.0
    np.savetxt(scene / "intrinsic" / "intrinsic_depth.txt", intr)
    return root


def test_scannet_loader(scannet_root):
    ds = ScanNetDataset(dict(root_dir=str(scannet_root), scene="scene0000_00"))
    assert ScanNetDataset.get_available_scenes(str(scannet_root)) == [
        "scene0000_00"
    ]
    assert len(ds) == N_FRAMES
    # depth-resolution camera with ScanNet's pixel-center convention
    assert ds.camera.width == W and ds.camera.height == H
    # ScanNet pixel_center=1.0: stored (normalized to 0.5) cx = 8.0 - 0.5
    assert ds.camera.cx == 7.5
    # color aligned (resized) to depth resolution + cached
    assert (scannet_root / "scene0000_00" / "aligned_color_to_depth").is_dir()
    item = ds[3]
    assert item["rgbd"].shape == (H, W, 4)
    np.testing.assert_allclose(item["rgbd"][..., 3], 2.0, atol=1e-6)  # mm -> m
    np.testing.assert_allclose(ds.gt_c2ws[3], _gt_poses()[3], atol=1e-6)


def test_scannet_missing_pose_is_nan(scannet_root):
    (scannet_root / "scene0000_00" / "pose" / "2.txt").unlink()
    ds = ScanNetDataset(dict(root_dir=str(scannet_root), scene="scene0000_00"))
    assert np.isnan(ds.gt_c2ws[2]).all()
    assert np.isfinite(ds.gt_c2ws[1]).all()


# -- Kintinuous ----------------------------------------------------------------


@pytest.fixture
def kintinuous_root(tmp_path):
    root = tmp_path / "kintinuous"
    scene = root / "loop"
    (scene / "color").mkdir(parents=True)
    (scene / "depth").mkdir()
    for i in range(N_FRAMES):
        _write_rgb(scene / "color" / f"{i * 33333}.png")
        _write_depth_mm(scene / "depth" / f"{i * 33333}.png", mm=1000)
    poses = _gt_poses()
    _write_slam_files(scene, poses)
    return root


def test_kintinuous_loader(kintinuous_root):
    ds = KintinuousDataset(
        dict(
            root_dir=str(kintinuous_root),
            scene="loop",
            camera=dict(width=W, height=H, fx=10.0, fy=10.0, cx=8.0, cy=6.0),
            **_SLAM_CONFIG,
        )
    )
    assert KintinuousDataset.get_available_scenes(str(kintinuous_root)) == ["loop"]
    assert len(ds) == N_FRAMES
    # no GT: identity poses, no scene bounds
    np.testing.assert_allclose(ds.gt_c2ws[1], np.eye(4))
    assert ds.scene_bounds is None
    item = ds[0]
    np.testing.assert_allclose(item["rgbd"][..., 3], 1.0, atol=1e-6)
    # mapping runs purely from the SLAM result files
    ds.load_slam_results()
    np.testing.assert_allclose(
        ds.get_slam_c2ws(2, at_frame_id=2), _gt_poses()[2], atol=1e-5
    )
    assert ds.is_keyframe(0)


# -- ray mode ------------------------------------------------------------------


def test_ray_mode(nrgbd_root):
    """set_mode("ray") exposes per-ray items (slam_dataset.py:322-330)."""
    ds = NRGBDDataset(
        dict(
            root_dir=str(nrgbd_root),
            scene="whiteroom",
            camera=dict(width=W, height=H, fx=10.0, fy=10.0, cx=8.0, cy=6.0),
        )
    )
    assert len(ds) == N_FRAMES
    frame1 = ds[1]
    ds.set_mode("ray")
    assert len(ds) == N_FRAMES * H * W
    # ray (frame=1, i=2, j=3)
    idx = 1 * H * W + 2 * W + 3
    ray = ds[idx]
    np.testing.assert_allclose(ray["ij"], [2.0, 3.0])
    np.testing.assert_allclose(ray["rgbd"], frame1["rgbd"][2, 3])
    np.testing.assert_allclose(ray["c2w"], frame1["c2w"])
    ds.set_mode("sequence")
    assert len(ds) == N_FRAMES
    with pytest.raises(ValueError):
        ds.set_mode("pixel")


# -- pose-graph vertex-removal sync -------------------------------------------


def test_pg_removed_keyframe_synced(nrgbd_root):
    """A keyframe whose pose disappears from the c2w history must be dropped
    from the essential graph at that frame (slam_dataset.py:461-467)."""
    scene = nrgbd_root / "whiteroom"
    c2w_data = json.loads((scene / "orbslam2_c2w.json").read_text())
    del c2w_data["3"]["0"]  # keyframe 0 culled at frame 3
    (scene / "orbslam2_c2w.json").write_text(json.dumps(c2w_data))
    ds = NRGBDDataset(
        dict(
            root_dir=str(nrgbd_root),
            scene="whiteroom",
            camera=dict(width=W, height=H, fx=10.0, fy=10.0, cx=8.0, cy=6.0),
            **_SLAM_CONFIG,
        )
    )
    ds.load_slam_results()
    graph2 = ds.get_slam_essential_graph(2)
    assert 0 in graph2
    graph3 = ds.get_slam_essential_graph(3)
    assert 0 not in graph3
    assert all(0 not in edges for edges in graph3.values())


def test_prefetch_and_images_dir_alias(nrgbd_root):
    """The reference's dataset keys: `images_dir` names the color dir
    (nrgbd_dataset.yaml) and `prefetch: True` serves decoded frames from
    memory (nrgbd_dataset.py:60-61, :179)."""
    ds = NRGBDDataset(
        dict(
            root_dir=str(nrgbd_root),
            scene="whiteroom",
            images_dir="images",
            prefetch=True,
            camera=dict(width=W, height=H, fx=10.0, fy=10.0, cx=8.0, cy=6.0),
            **_SLAM_CONFIG,
        )
    )
    a = ds[1]
    b = ds[1]
    assert a["rgbd"] is b["rgbd"]  # second access is the cached object

    # legacy alias: image_dir takes precedence when both keys are present
    ds2 = NRGBDDataset(
        dict(
            root_dir=str(nrgbd_root),
            scene="whiteroom",
            image_dir="images",
            images_dir="nonexistent_dir",
            camera=dict(width=W, height=H, fx=10.0, fy=10.0, cx=8.0, cy=6.0),
            **_SLAM_CONFIG,
        )
    )
    assert ds2[1]["rgbd"].shape == (H, W, 4)


class TestSyntheticThinScene:
    """Golden-geometry checks for the 'thin' archetype (thin structures +
    concave corner — the NRGBD-style halo/mesh stress cases)."""

    def _ds(self):
        from neural_graph_mapping_tpu.datasets.synthetic import SyntheticDataset

        return SyntheticDataset(
            {"scene": "thin", "num_frames": 8, "width": 80, "height": 60,
             "fx": 70.0, "fy": 70.0}
        )

    def _look_at(self, eye, center):
        from neural_graph_mapping_tpu.datasets.synthetic import _look_at

        return _look_at(
            np.asarray(eye, np.float32), np.asarray(center, np.float32),
            np.array([0.0, 1.0, 0.0], np.float32),
        )

    def test_tabletop_depth_and_silhouette_gap(self):
        ds = self._ds()
        # oblique down onto the table center from above: top face at y=0.02
        eye = np.array([0.8, 1.5, 0.9])
        look = np.array([0.8, 0.0, 0.6])
        c2w = self._look_at(eye, look)
        rgbd = ds._raycast(c2w)
        fwd = (look - eye) / np.linalg.norm(look - eye)
        # z-depth of the y=0.02 plane along the (near-axial) center ray
        expected = (eye[1] - 0.02) / (-fwd[1])
        np.testing.assert_allclose(rgbd[30, 40, 3], expected, atol=0.02)

        # from the side at table height: the 4 cm slab edge is thin (few
        # pixels) and its silhouette jumps >1.5 m to the background
        c2w = self._look_at([0.8, 0.0, 2.4], [0.8, 0.0, 0.6])
        depth_col = ds._raycast(c2w)[:, 40, 3]
        near = depth_col < 1.6
        assert 0 < near.sum() <= 6  # thin: a handful of rows only
        gap = depth_col[~near].min() - depth_col[near].max()
        assert gap > 1.2

    def test_concave_corner_depths(self):
        ds = self._ds()
        # looking diagonally into the interior corner at (-1.2, *, -1.2):
        # the center ray must hit a wall panel (less than the distance to the
        # room wall behind it), not pass through the L
        eye = np.array([0.5, 0.0, 0.5])
        c2w = self._look_at(eye, [-1.175, 0.0, -1.175])
        rgbd = ds._raycast(c2w)
        d = rgbd[30, 40, 3]
        corner_dist = np.linalg.norm(eye[[0, 2]] - np.array([-1.15, -1.15]))
        assert 0.5 < d <= corner_dist + 0.05

    def test_pole_depth_and_thinness(self):
        ds = self._ds()
        # looking at the first pole (x=0.8, z=-0.5, r=0.04) from 1.5 m away
        eye = np.array([0.8, 0.0, 1.0])
        c2w = self._look_at(eye, [0.8, 0.0, -0.5])
        rgbd = ds._raycast(c2w)
        d_center = rgbd[30, 40, 3]
        np.testing.assert_allclose(d_center, 1.5 - 0.04, atol=5e-3)
        # the pole is a thin vertical stripe: row 30's near pixels span a
        # few columns; background behind it is the room wall meters away
        row = rgbd[30, :, 3]
        near = row < 1.6
        assert 0 < near.sum() <= 5

    def test_spheres_archetype_unchanged_by_default(self):
        from neural_graph_mapping_tpu.datasets.synthetic import SyntheticDataset

        a = SyntheticDataset({"num_frames": 4, "width": 40, "height": 30,
                              "fx": 35.0, "fy": 35.0})
        b = SyntheticDataset({"scene": "spheres", "num_frames": 4, "width": 40,
                              "height": 30, "fx": 35.0, "fy": 35.0})
        np.testing.assert_array_equal(a[0]["rgbd"], b[0]["rgbd"])
