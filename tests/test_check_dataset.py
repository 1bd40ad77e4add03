"""scripts/check_dataset.py against the on-disk layout fixtures — the
real-data readiness kit must pass on every known-good layout and flag a
broken one (VERDICT r2, next-round item 10)."""

import importlib.util
import pathlib

import numpy as np
import PIL.Image

# re-export the on-disk layout fixtures from the loader tests
from tests.test_dataset_loaders import (  # noqa: F401
    kintinuous_root,
    nrgbd_root,
    replica_root,
    scannet_root,
)

_SPEC = importlib.util.spec_from_file_location(
    "check_dataset",
    pathlib.Path(__file__).resolve().parents[1] / "scripts" / "check_dataset.py",
)
check_dataset = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(check_dataset)


def test_nrgbd_passes(nrgbd_root):
    assert check_dataset.main(["nrgbd", str(nrgbd_root), "whiteroom"]) == 0


def test_replica_passes(replica_root):
    assert check_dataset.main(["replica", str(replica_root), "office0"]) == 0


def test_scannet_passes(scannet_root):
    assert check_dataset.main(["scannet", str(scannet_root), "scene0000_00"]) == 0


def test_kintinuous_passes(kintinuous_root):
    assert check_dataset.main(["kintinuous", str(kintinuous_root), "loop"]) == 0


def test_bad_depth_scale_flagged(nrgbd_root):
    """Depth accidentally stored in meters (values ~2) instead of mm must
    trip the depth-scale sanity check."""
    scene = nrgbd_root / "whiteroom"
    for p in (scene / "depth_filtered").glob("*.png"):
        PIL.Image.fromarray(np.full((12, 16), 2, np.uint16)).save(p)
    assert check_dataset.main(["nrgbd", str(nrgbd_root), "whiteroom"]) == 1


def test_missing_poses_flagged(nrgbd_root):
    (nrgbd_root / "whiteroom" / "poses.txt").unlink()
    assert check_dataset.main(["nrgbd", str(nrgbd_root), "whiteroom"]) == 1


def test_unknown_layout_usage():
    assert check_dataset.main(["nonsense", "/tmp", "x"]) == 2
