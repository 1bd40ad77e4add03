"""Silhouette-halo analysis: why masked depth-L1 saturates ~6.5 cm on the
hermetic synthetic scene while per-pixel medians are ~1 cm.

Composites a PERFECT truncated-SDF field (g = clip(sdf/trunc, -1, 1), the
exact target of the reference's freespace+TSDF supervision,
run_mapping.py:1842-1852) through the nrgbd occupancy bell
(4*sigmoid(gf*g)*sigmoid(-gf*g), run_mapping.py:709-799) for rays that MISS a
1 m sphere laterally by c, with a wall 4 m behind it.

Result (run on CPU, seconds): rays grazing up to ~2.5-4 cm OUTSIDE the true
silhouette still composite to foreground-ish depth at every eval spacing —
the bell has nonzero occupancy through the whole truncation shell, and a
grazing ray's tangential path through that shell is ~sqrt(8*R*trunc) ~ 0.9 m
long.  The halo therefore has fixed WORLD width (indep. of image resolution;
measured 6.50 cm depth-L1 @160x120 vs 6.41 @320x240) and owns 73-83% of the
masked depth-L1 mass on this scene (edge-band decomposition, STATUS.md),
with 92-99% of >10 cm errors rendering CLOSER than GT (dilation).  A sharper
bell (geometry_factor 40) halves the analytic halo but costs 2.3 dB PSNR in
training (guided samples at 1.25 cm under-resolve the 0.55 cm bell) — both
measured, see STATUS.md round 3.
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from neural_graph_mapping_tpu.ops import quadrature


def main():
    R, trunc = 1.0, 0.1
    for gf in (20.0, 40.0):
        print(f"geometry_factor {gf}:")
        for h in (0.0125, 0.005, 0.0026):  # ref-derived, span-768 typical, fine
            S = int(8.0 / h)
            t = np.linspace(0.0, 8.0, S)
            row = []
            for c_mm in [0, 10, 20, 25, 30, 40, 50, 60]:
                px = R + c_mm / 1000.0
                pts_z = -2.0 + t
                sdf_s = np.sqrt(px**2 + pts_z**2) - R
                sdf_w = 4.0 - pts_z
                g = np.clip(np.minimum(sdf_s, sdf_w) / trunc, -1.0, 1.0)
                colors = np.zeros((1, S, 3), np.float32)
                q = quadrature.quadrature(
                    "nrgbd", jnp.asarray(colors), jnp.asarray(g[None]),
                    jnp.asarray(t[None]), jnp.asarray(t[None]),
                    geometry_factor=gf,
                )
                row.append(f"c={c_mm}mm:d={float(q.depths[0]):.2f}")
            print(f"  h={h * 1000:.1f}mm (true depth 6.0 for c>0): " + " ".join(row))


if __name__ == "__main__":
    main()
