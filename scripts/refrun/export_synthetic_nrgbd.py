"""Export the hermetic SyntheticDataset scene to NRGBD on-disk layout so the
*reference* implementation can consume it (quality cross-check, VERDICT r4
item 2).

Layout (reference slam_datasets/nrgbd_dataset.py): <root>/<scene>/images/
img<N>.png (RGB8), <root>/<scene>/depth/depth<N>.png (uint16 mm z-depth),
<root>/<scene>/poses.txt (stacked 4x4 OpenGL c2ws). We use depth dir "depth"
(not "depth_filtered") on both sides so the de-bias polynomial
(nrgbd_dataset.py:371-375) stays off for exact synthetic depth.

Usage: python scripts/refrun/export_synthetic_nrgbd.py [out_root] [frames] [w] [h] [fx]
"""

import pathlib
import sys

import numpy as np
from PIL import Image

_REPO = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(_REPO))


def export(out_root, num_frames=240, width=160, height=120, fx=140.0):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from neural_graph_mapping_tpu.datasets.synthetic import SyntheticDataset

    ds = SyntheticDataset(
        {
            "num_frames": num_frames,
            "width": width,
            "height": height,
            "fx": fx,
            "fy": fx,
        }
    )
    scene_dir = pathlib.Path(out_root) / "synthetic"
    img_dir = scene_dir / "images"
    depth_dir = scene_dir / "depth"
    img_dir.mkdir(parents=True, exist_ok=True)
    depth_dir.mkdir(parents=True, exist_ok=True)

    for i in range(num_frames):
        rgbd = np.asarray(ds[i]["rgbd"])
        rgb8 = np.clip(rgbd[..., :3] * 255.0 + 0.5, 0, 255).astype(np.uint8)
        depth_mm = np.clip(rgbd[..., 3] * 1000.0 + 0.5, 0, 65535).astype(np.uint16)
        Image.fromarray(rgb8).save(img_dir / f"img{i:04d}.png")
        Image.fromarray(depth_mm).save(depth_dir / f"depth{i:04d}.png")

    np.savetxt(scene_dir / "poses.txt", np.asarray(ds.gt_c2ws).reshape(-1, 4))
    cam = ds.camera
    print(
        f"exported {num_frames} frames {width}x{height} to {scene_dir}\n"
        f"camera: fx={cam.fx} fy={cam.fy} cx={cam.cx} cy={cam.cy} "
        f"(internal 0.5-center convention)"
    )
    return scene_dir


if __name__ == "__main__":
    args = sys.argv[1:]
    out = args[0] if args else "/tmp/ngm_nrgbd_export"
    nf = int(args[1]) if len(args) > 1 else 240
    w = int(args[2]) if len(args) > 2 else 160
    h = int(args[3]) if len(args) > 3 else 120
    fx = float(args[4]) if len(args) > 4 else 140.0
    export(out, nf, w, h, fx)
