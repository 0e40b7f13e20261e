#!/usr/bin/env python
"""Host ingest throughput: native C++ ClipPack loader vs NumPy fallback
vs per-image PIL decode (the reference's pattern).

The number that matters for TPU feeding: bytes/s of ready-to-ship uint8
batches. Prints one JSON line per loader.

Caveat on 1-core hosts (like the dev tunnel VM): a tight drain loop
measures raw memcpy only, where the single-threaded paths win; the
threaded ring's actual value — producing the next batch while the device
runs the current step, off the GIL — needs spare cores and a consumer
that does work between batches (i.e. real training on a TPU host).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tchvp_tpu.data import clippack

N_CLIPS = int(os.environ.get("LOADER_CLIPS", "64"))
FRAMES = int(os.environ.get("LOADER_FRAMES", "16"))
SIZE = int(os.environ.get("LOADER_SIZE", "224"))
BATCH = int(os.environ.get("LOADER_BATCH", "8"))
EPOCHS = int(os.environ.get("LOADER_EPOCHS", "3"))


def bench(ds, name: str, clip_bytes: int) -> None:
    # Warm one epoch (page-in), then measure.
    for _ in ds:
        pass
    t0 = time.perf_counter()
    nb = 0
    for _ in range(EPOCHS):
        for batch in ds:
            nb += 1
    dt = time.perf_counter() - t0
    gb = nb * BATCH * clip_bytes / 1e9
    print(json.dumps({
        "loader": name,
        "GB_per_s": round(gb / dt, 2),
        "batches_per_s": round(nb / dt, 1),
        "clips_per_s": round(nb * BATCH / dt, 1),
    }), flush=True)


def main() -> None:
    rng = np.random.default_rng(0)
    clips = rng.integers(0, 256, (N_CLIPS, FRAMES, SIZE, SIZE, 3), dtype=np.uint8)
    clip_bytes = clips[0].nbytes
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "clips.cpk")
        clippack.pack_clips(path, clips)

        if clippack.native_available():
            ds = clippack.ClipPackDataset(path, BATCH, num_threads=4)
            bench(ds, "native-4threads", clip_bytes)
            ds.close()
            ds = clippack.ClipPackDataset(path, BATCH, num_threads=1)
            bench(ds, "native-1thread", clip_bytes)
            ds.close()
        ds = clippack.ClipPackDataset(path, BATCH, prefer_native=False)
        bench(ds, "numpy-mmap", clip_bytes)

        # Reference-style loader: PIL decode per frame per epoch.
        try:
            from PIL import Image
        except ImportError:
            return
        img_dir = os.path.join(td, "frames")
        os.makedirs(img_dir)
        rows = []
        for ci in range(min(N_CLIPS, 16)):
            paths = []
            for fi in range(FRAMES):
                p = os.path.join(img_dir, f"c{ci}_f{fi}.png")
                Image.fromarray(clips[ci, fi]).save(p)
                paths.append(p)
            rows.append(",".join(paths))
        csv_path = os.path.join(td, "clips.csv")
        with open(csv_path, "w") as f:
            f.write("\n".join(rows) + "\n")
        from tchvp_tpu.data.manifest import ClipDataset, read_manifest

        # Reference pattern: single-thread PIL decode+resize of every
        # frame, every epoch (Dataloader.py:17-23) — no cache, no pool.
        class RefStyle:
            def __init__(self):
                self.rows = read_manifest(csv_path)
                self.nb = len(self.rows) // BATCH

            def __iter__(self):
                for bi in range(self.nb):
                    clips_ = []
                    for r in self.rows[bi * BATCH : (bi + 1) * BATCH]:
                        frames = []
                        for p in r:
                            with Image.open(p) as im:
                                im = im.convert("RGB").resize(
                                    (SIZE, SIZE), Image.BILINEAR
                                )
                                frames.append(np.asarray(im, dtype=np.uint8))
                        clips_.append(np.stack(frames))
                    yield np.stack(clips_)

        bench(RefStyle(), "pil-per-frame (reference pattern)", clip_bytes)

        # tchvp manifest path: thread-pool decode + RAM cache. Prefetch
        # measured separately — its overlap thread pays for itself only
        # when the consumer does device work between batches; a bare
        # drain loop on a 1-core host shows its GIL-handoff cost instead.
        ds = ClipDataset(csv_path, BATCH, image_size=SIZE)
        bench(ds, "manifest-fast (pool+cache)", clip_bytes)
        ds = ClipDataset(csv_path, BATCH, image_size=SIZE, prefetch=True)
        bench(ds, "manifest-fast +prefetch (1-core drain worst case)", clip_bytes)


if __name__ == "__main__":
    main()
