"""Host-side frame prefetch: decode ahead of the training loop.

The reference overlaps PNG/JPEG decode with GPU work via
``DataLoader(num_workers=32, pin_memory=True)`` (reference
run_mapping.py:1006). Here a single daemon thread decodes the upcoming
frames into a bounded queue while the device executes the current frame's
fused optimization program — during device execution the host is idle (the
blocking wait releases the GIL), so even on a one-CPU host the decode is
hidden behind compute instead of serialized in front of it.

One thread (not a pool) is deliberate: frames are consumed strictly in
order, decode of one 640x480 RGB-D pair is far cheaper than a 5-iteration
device step, and a second worker would only fight the training loop's own
host work for cores.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Sequence


class FramePrefetcher:
    """Iterates ``dataset[fid] for fid in frame_ids`` on a worker thread.

    ``get(fid)`` returns the decoded item for the next expected frame id and
    re-raises any worker exception at the call site. Out-of-order or unknown
    ids fall back to a synchronous ``dataset[fid]`` (correct, just not
    overlapped), so callers never deadlock on a mismatched schedule.
    """

    _SENTINEL = object()

    def __init__(
        self,
        dataset,
        frame_ids: Iterable[int],
        depth: int = 2,
        to_device: bool = False,
    ):
        self._dataset = dataset
        self._ids: Sequence[int] = list(frame_ids)
        self._queue: queue.Queue = queue.Queue(maxsize=max(1, int(depth)))
        self._pos = 0
        self._stop = threading.Event()
        self._to_device = bool(to_device)
        self._thread = threading.Thread(
            target=self._work, name="ngm-frame-prefetch", daemon=True
        )
        self._thread.start()

    def _work(self) -> None:
        try:
            for fid in self._ids:
                # checked before each decode so close() on an early abort
                # stops the worker after at most one in-flight item instead
                # of decoding the rest of the sequence (ADVICE r4)
                if self._stop.is_set():
                    break
                item = self._dataset[fid]
                if self._to_device:
                    # start the H2D transfer from the worker so it overlaps
                    # the device step of the PREVIOUS frame — measured r5: a
                    # 640x480 RGBD frame costs ~0.4 s of wall time per frame
                    # through this TPU's loopback relay when uploaded
                    # synchronously in the training loop (the largest single
                    # wall-clock term, above the 5-iteration device step).
                    # RGB ships as uint8 (exact: sensor sources are 8-bit
                    # PNGs, rgb == u8/255) + depth f32 — 1.5 MB instead of
                    # the 4.9 MB f32 RGBD; the consumer reassembles on device
                    import jax
                    import numpy as np

                    rgbd = np.asarray(item["rgbd"], dtype=np.float32)
                    rgb_u8 = np.clip(
                        np.rint(rgbd[..., :3] * 255.0), 0.0, 255.0
                    ).astype(np.uint8)
                    item = dict(item)
                    item["rgbd_dev"] = (
                        jax.device_put(rgb_u8),
                        jax.device_put(np.ascontiguousarray(rgbd[..., 3])),
                    )
                self._queue.put((fid, item, None))
        except BaseException as exc:  # noqa: BLE001 — re-raised in get()
            self._queue.put((None, None, exc))
        finally:
            self._queue.put(self._SENTINEL)

    def get(self, frame_id: int):
        if self._pos < len(self._ids) and self._ids[self._pos] == frame_id:
            self._pos += 1
            entry = self._queue.get()
            if entry is self._SENTINEL:
                raise RuntimeError("prefetch worker ended before the sequence")
            fid, item, exc = entry
            if exc is not None:
                raise exc
            assert fid == frame_id
            return item
        # schedule mismatch: serve synchronously rather than desync the queue
        return self._dataset[frame_id]

    def close(self) -> None:
        """Drain so the daemon thread exits promptly (tests, early abort)."""
        self._stop.set()
        while self._thread.is_alive() or not self._queue.empty():
            try:
                if self._queue.get(timeout=0.5) is self._SENTINEL:
                    break
            except queue.Empty:
                continue
        self._thread.join(timeout=5.0)
