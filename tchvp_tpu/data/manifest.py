"""CSV-manifest datasets (survey layer L1).

One coherent data API covering all three reference loaders (the reference's
are signature-skewed across modules, survey §0.3):

* :class:`ImageDataset` — single-image rows (reference ``Dataloader.py:8-24``:
  pandas CSV of paths, PIL decode -> RGB, resize, [0,1] float).
* :class:`ImageMaskDataset` — "img,mask" rows with grayscale masks
  (recovered ``dataset.py`` L26-31 "supervised" mode).
* :class:`ClipDataset` — each row is an ordered list of frame paths = one
  video clip (recovered ``dataset.py`` L86-127, ``DataloaderSequential``).

Host work is file I/O + JPEG decode only; resize/normalize/augment run
on-device in the jitted preprocessing stage (:mod:`tchvp_tpu.data.pipeline`).
Batches are delivered as stacked numpy NHWC uint8 (raw) or float32.

The reference's header-row bug (``generateDataset.py:22`` writes a header,
recovered ``dataset.py`` L56-59 then reads it as a path) and its
``__len__ = N - N % batch`` truncation (L21-22) are fixed here with header
detection and proper drop-last batching (survey §7.5).
"""

from __future__ import annotations

import csv
import os
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def read_manifest(csv_file: str, data_fraction: float = 1.0) -> List[List[str]]:
    """Read a CSV manifest into rows of path strings, skipping a header row."""
    rows: List[List[str]] = []
    with open(csv_file, newline="") as f:
        for row in csv.reader(f):
            cells = [c.strip() for c in row if c.strip()]
            if cells:
                rows.append(cells)
    # Header detection: first row's first cell isn't an existing file and
    # looks like a column name ("path", "img", ...).
    if rows and not os.path.exists(rows[0][0]) and "." not in os.path.basename(rows[0][0]):
        rows = rows[1:]
    if data_fraction < 1.0:
        rows = rows[: max(1, int(len(rows) * data_fraction))]
    return rows


def _decode(path: str) -> np.ndarray:
    """JPEG/PNG decode to HWC uint8 RGB on the host."""
    if Image is None:
        raise RuntimeError("PIL unavailable for image decoding")
    with Image.open(path) as img:
        return np.asarray(img.convert("RGB"), dtype=np.uint8)


def _decode_gray(path: str) -> np.ndarray:
    """Grayscale decode (mask 'L' convert, recovered dataset.py L31)."""
    with Image.open(path) as img:
        return np.asarray(img.convert("L"), dtype=np.uint8)[..., None]


def _resize_uint8(img: np.ndarray, size: int) -> np.ndarray:
    """Host-side resize used only when images are ragged; fixed-size
    corpora skip this and resize on device."""
    pil = Image.fromarray(img.squeeze(-1) if img.shape[-1] == 1 else img)
    out = np.asarray(pil.resize((size, size), Image.BILINEAR), dtype=np.uint8)
    return out[..., None] if img.shape[-1] == 1 else out


class _Batcher:
    """Shuffling, drop-last batching over row indices."""

    def __init__(self, n: int, batch_size: int, shuffle: bool, seed: int):
        self.n = n
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return self.n // self.batch_size

    def batches(self) -> Iterator[np.ndarray]:
        idx = np.arange(self.n)
        if self.shuffle:
            self.rng.shuffle(idx)
        for i in range(len(self)):
            yield idx[i * self.batch_size : (i + 1) * self.batch_size]


class ImageDataset:
    """Unsupervised image dataset over a one-column CSV manifest."""

    def __init__(
        self,
        csv_file: str,
        batch_size: int,
        image_size: int = 256,
        shuffle: bool = True,
        seed: int = 0,
        data_fraction: float = 1.0,
    ):
        self.rows = read_manifest(csv_file, data_fraction)
        self.image_size = image_size
        self.batcher = _Batcher(len(self.rows), batch_size, shuffle, seed)

    def __len__(self) -> int:
        return len(self.batcher)

    def __iter__(self) -> Iterator[np.ndarray]:
        for idx in self.batcher.batches():
            imgs = [
                _resize_uint8(_decode(self.rows[i][0]), self.image_size)
                for i in idx
            ]
            yield np.stack(imgs)  # (B, H, W, 3) uint8


class ImageMaskDataset:
    """Supervised (image, mask) dataset over a two-column CSV manifest."""

    def __init__(
        self,
        csv_file: str,
        batch_size: int,
        image_size: int = 256,
        shuffle: bool = True,
        seed: int = 0,
        data_fraction: float = 1.0,
    ):
        self.rows = read_manifest(csv_file, data_fraction)
        self.image_size = image_size
        self.batcher = _Batcher(len(self.rows), batch_size, shuffle, seed)

    def __len__(self) -> int:
        return len(self.batcher)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        for idx in self.batcher.batches():
            imgs, masks = [], []
            for i in idx:
                img_path, mask_path = self.rows[i][0], self.rows[i][1]
                imgs.append(_resize_uint8(_decode(img_path), self.image_size))
                masks.append(_resize_uint8(_decode_gray(mask_path), self.image_size))
            yield np.stack(imgs), np.stack(masks)


class ClipDataset:
    """Video-clip dataset: each CSV row is an ordered list of frame paths
    (recovered ``dataset.py`` L86-127). Yields (B, T, H, W, 3) uint8."""

    def __init__(
        self,
        csv_file: str,
        batch_size: int,
        image_size: int = 256,
        clip_len: Optional[int] = None,
        shuffle: bool = True,
        seed: int = 0,
        data_fraction: float = 1.0,
    ):
        self.rows = read_manifest(csv_file, data_fraction)
        if clip_len is not None:
            self.rows = [r[:clip_len] for r in self.rows if len(r) >= clip_len]
        self.image_size = image_size
        self.batcher = _Batcher(len(self.rows), batch_size, shuffle, seed)

    def __len__(self) -> int:
        return len(self.batcher)

    def __iter__(self) -> Iterator[np.ndarray]:
        for idx in self.batcher.batches():
            clips = []
            for i in idx:
                frames = [
                    _resize_uint8(_decode(p), self.image_size) for p in self.rows[i]
                ]
                clips.append(np.stack(frames))
            yield np.stack(clips)  # (B, T, H, W, 3)


_IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def write_manifest(image_dir: str, out_csv: str, recursive: bool = True) -> int:
    """Walk a directory of images and write a one-column path manifest —
    the working equivalent of the reference's ``generateDataset.py``
    (which wrote a ``path`` header row that its own loader then read back
    as a file path, survey §7.5; no header is written here). Paths are
    sorted for determinism. Returns the number of rows."""
    rows = []
    if recursive:
        for root, _, files in sorted(os.walk(image_dir)):
            for f in sorted(files):
                if os.path.splitext(f)[1].lower() in _IMAGE_EXTS:
                    rows.append(os.path.join(root, f))
    else:
        for f in sorted(os.listdir(image_dir)):
            if os.path.splitext(f)[1].lower() in _IMAGE_EXTS:
                rows.append(os.path.join(image_dir, f))
    os.makedirs(os.path.dirname(os.path.abspath(out_csv)), exist_ok=True)
    with open(out_csv, "w", newline="") as fh:
        w = csv.writer(fh)
        for r in rows:
            w.writerow([r])
    return len(rows)


def write_clip_manifest(
    frame_dirs: Sequence[str], out_csv: str, clip_len: Optional[int] = None
) -> int:
    """One CSV row per directory = one clip of its (sorted) frame images.
    ``clip_len`` truncates/skips short clips. Returns clips written."""
    n = 0
    os.makedirs(os.path.dirname(os.path.abspath(out_csv)), exist_ok=True)
    with open(out_csv, "w", newline="") as fh:
        w = csv.writer(fh)
        for d in frame_dirs:
            frames = [
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if os.path.splitext(f)[1].lower() in _IMAGE_EXTS
            ]
            if clip_len is not None:
                if len(frames) < clip_len:
                    continue
                frames = frames[:clip_len]
            if frames:
                w.writerow(frames)
                n += 1
    return n


def make_loaders(
    train_csv: str,
    val_csv: Optional[str],
    test_csv: Optional[str],
    batch_size: int,
    image_size: int = 256,
    seed: int = 0,
) -> Tuple[ImageDataset, Optional[ImageDataset], Optional[ImageDataset]]:
    """The ``CustomDataLoader(batch).get_data()`` equivalent
    (reference ``Dataloader.py:33-46``): three shuffled image loaders."""
    mk = lambda p, s: ImageDataset(p, batch_size, image_size, True, seed + s) if p else None  # noqa: E731
    return mk(train_csv, 0), mk(val_csv, 1), mk(test_csv, 2)
