"""Convert a reference-run checkpoint (.pt) into our npz checkpoint layout.

The cross-check in the other direction: the reference implementation trains a
model (on CPU via scripts/refrun/run_reference.py + shims), and this converts
its ``{map_dict, all_fields_params}`` into the arrays our engine loads
(run_mapping.load_model), so the SAME weights render through OUR eval
protocol. Separates training-dynamics differences from eval-protocol
differences: if the converted model scores what the reference's own eval
scored, the protocols are equivalent and any remaining gap is training.

Valid because the shimmed ``permutohedral_encoding`` is a port of our lattice
(same hash primes, same RandomState(0) per-level shifts, same elevation
scaling) — reference and repo share the encoding bit-for-bit in this setup.

Usage: python scripts/refrun/import_reference_ckpt.py ref.pt out.npz [capacity]
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent / "shims"))


def convert(pt_path, npz_path, capacity=256):
    import torch

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    md = ckpt["map_dict"]
    fp = ckpt["all_fields_params"]
    n = int(md["num"])
    cap = max(capacity, md["positions"].shape[0])

    def pad(a, fill=0.0):
        a = np.asarray(a)
        a = a.astype(
            np.float32 if np.issubdtype(a.dtype, np.floating) else np.int32
        )
        out = np.full((cap,) + a.shape[1:], fill, a.dtype)
        out[: a.shape[0]] = a
        return out

    table = fp["_encoding.lattice_values"].numpy()  # (N, L, T, F)
    w0 = fp["_linears.0.weight"].numpy()  # (N, out, in) torch layout
    w1 = fp["_linears.1.weight"].numpy()

    def pad_p(a):
        out = np.zeros((cap,) + a.shape[1:], np.float32)
        out[: a.shape[0]] = a
        return out

    data = {
        "params.enc.table": pad_p(table.transpose(0, 3, 1, 2)),  # (N, F, L, T)
        "params.w0": pad_p(w0.transpose(0, 2, 1)),  # (N, in, out)
        "params.b0": pad_p(fp["_linears.0.bias"].numpy()),
        "params.w1": pad_p(w1.transpose(0, 2, 1)),
        "params.b1": pad_p(fp["_linears.1.bias"].numpy()),
        "params.neus_sd": pad_p(fp["_neus_sd"].numpy()),
        "map.positions": pad(md["positions"].numpy()),
        "map.orientations": pad(md["orientations"].numpy()),
        "map.kf_ids": pad(md["kf_ids"].numpy().astype(np.int32)),
        "map.kf_slots": np.full((cap,), -1, np.int32),
        "map.training_iterations": pad(
            md["training_iterations"].numpy().astype(np.int32)
        ),
        "num_fields": np.asarray(n, np.int64),
    }
    np.savez(npz_path, **data)
    print(f"wrote {npz_path}: {n} fields (capacity {cap})")
    return npz_path


if __name__ == "__main__":
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    convert(sys.argv[1], sys.argv[2], cap)
