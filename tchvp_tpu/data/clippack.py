"""ClipPack: packed clip storage + native prefetching loader bindings.

The production ingest path for the video pipeline. Clips are decoded once
(offline, :func:`pack_clips` / :func:`pack_from_manifest`) into a single
mmap-able uint8 file; at train time the C++ runtime (``native/clippack.cc``)
assembles shuffled batches on worker threads into a bounded ring, off the
GIL, so host IO overlaps device compute. The reference instead re-decodes
every JPEG per epoch on the Python main thread (``Dataloader.py:17-23``,
recovered ``dataset.py`` L27-30).

`ClipPackDataset` yields ``(B, T, H, W, C)`` uint8 numpy batches — the same
contract as :class:`tchvp_tpu.data.manifest.ClipDataset` — and falls back
to a pure-NumPy mmap reader when no C++ toolchain is available, so the
format works everywhere and the native path is a strict speedup.

Deterministic: epoch ``e`` is shuffled with seed ``seed + e`` in both the
native and fallback paths (identical mt19937_64 Fisher-Yates), so batches
match bit-for-bit across implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

_MAGIC = 0x4B504C43  # 'CLPK'
_VERSION = 1
_HEADER_INTS = 8

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_SRC = os.path.join(_REPO_ROOT, "native", "clippack.cc")
_NATIVE_LIB = os.path.join(_REPO_ROOT, "native", "build", "libclippack.so")

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


def pack_clips(path: str, clips: np.ndarray) -> None:
    """Write (N, T, H, W, C) uint8 clips to a clippack file."""
    clips = np.ascontiguousarray(clips, dtype=np.uint8)
    if clips.ndim != 5:
        raise ValueError(f"expected (N, T, H, W, C), got {clips.shape}")
    header = np.array(
        [_MAGIC, _VERSION, *clips.shape, 0], dtype="<i8"
    )
    assert header.size == _HEADER_INTS
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(header.tobytes())
        f.write(clips.tobytes())


def pack_from_manifest(
    csv_file: str,
    out_path: str,
    image_size: int = 256,
    clip_len: Optional[int] = None,
) -> Tuple[int, int]:
    """Decode a clip CSV manifest (one row = one clip of frame paths) into
    a clippack file; returns (n_clips, clip_len). One-time offline cost."""
    from tchvp_tpu.data.manifest import ClipDataset

    ds = ClipDataset(
        csv_file, batch_size=1, image_size=image_size, clip_len=clip_len,
        shuffle=False,
    )
    clips = [batch[0] for batch in ds]
    if not clips:
        raise ValueError(f"no complete clips in {csv_file}")
    arr = np.stack(clips)
    pack_clips(out_path, arr)
    return arr.shape[0], arr.shape[1]


# ---------------------------------------------------------------------------
# Native library loading (compiled on demand, cached)
# ---------------------------------------------------------------------------


def _build_native() -> Optional[str]:
    """Compile native/clippack.cc -> libclippack.so if needed.

    Build lands in a per-PID temp file and is moved into place atomically,
    so concurrent processes (e.g. multi-host training on one machine)
    cannot observe a half-written library.
    """
    if not os.path.exists(_NATIVE_SRC):
        return None
    if os.path.exists(_NATIVE_LIB) and os.path.getmtime(
        _NATIVE_LIB
    ) >= os.path.getmtime(_NATIVE_SRC):
        return _NATIVE_LIB
    os.makedirs(os.path.dirname(_NATIVE_LIB), exist_ok=True)
    tmp = f"{_NATIVE_LIB}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        _NATIVE_SRC, "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _NATIVE_LIB)  # atomic on POSIX
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None
    return _NATIVE_LIB


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    so = _build_native()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.clippack_open.restype = ctypes.c_void_p
    lib.clippack_open.argtypes = [ctypes.c_char_p]
    lib.clippack_info.restype = ctypes.c_int
    lib.clippack_info.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.clippack_read.restype = ctypes.c_int
    lib.clippack_read.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.clippack_close.restype = None
    lib.clippack_close.argtypes = [ctypes.c_void_p]
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.loader_next.restype = ctypes.c_int64
    lib.loader_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
    lib.loader_destroy.restype = None
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


# ---------------------------------------------------------------------------
# Shuffle parity with the C++ runtime
# ---------------------------------------------------------------------------


class _MT19937_64:
    """Minimal std::mt19937_64 (for bit-exact shuffle parity with C++)."""

    N, M = 312, 156
    MATRIX_A = 0xB5026F5AA96619E9
    UPPER = 0xFFFFFFFF80000000
    LOWER = 0x7FFFFFFF

    def __init__(self, seed: int):
        self.mt = [0] * self.N
        self.mt[0] = seed & 0xFFFFFFFFFFFFFFFF
        for i in range(1, self.N):
            self.mt[i] = (
                6364136223846793005 * (self.mt[i - 1] ^ (self.mt[i - 1] >> 62)) + i
            ) & 0xFFFFFFFFFFFFFFFF
        self.mti = self.N

    def next(self) -> int:
        if self.mti >= self.N:
            for i in range(self.N):
                x = (self.mt[i] & self.UPPER) | (self.mt[(i + 1) % self.N] & self.LOWER)
                xa = (x >> 1) ^ (self.MATRIX_A if x & 1 else 0)
                self.mt[i] = self.mt[(i + self.M) % self.N] ^ xa
            self.mti = 0
        y = self.mt[self.mti]
        self.mti += 1
        y ^= (y >> 29) & 0x5555555555555555
        y ^= (y << 17) & 0x71D67FFFEDA60000
        y ^= (y << 37) & 0xFFF7EEE000000000
        y ^= y >> 43
        return y


def _uniform_int(rng: _MT19937_64, b: int) -> int:
    """libstdc++ std::uniform_int_distribution<int64>(0, b) draw."""
    # Range = b + 1; libstdc++ downscales a 64-bit draw by rejection.
    rng_range = 0xFFFFFFFFFFFFFFFF  # mt19937_64 max - min = 2^64 - 1
    urange = b
    if urange == rng_range:
        return rng.next()
    uerange = urange + 1
    scaling = rng_range // uerange
    limit = uerange * scaling
    while True:
        v = rng.next()
        if v < limit:
            return v // scaling


def epoch_permutation(n: int, seed: int, epoch: int, shuffle: bool) -> np.ndarray:
    """The exact permutation the C++ loader uses for ``epoch``."""
    perm = np.arange(n, dtype=np.int64)
    if shuffle:
        rng = _MT19937_64((seed + epoch) & 0xFFFFFFFFFFFFFFFF)
        for i in range(n - 1, 0, -1):
            j = _uniform_int(rng, i)
            perm[i], perm[j] = perm[j], perm[i]
    return perm


# ---------------------------------------------------------------------------
# Dataset
# ---------------------------------------------------------------------------


class ClipPackDataset:
    """Iterate shuffled (B, T, H, W, C) uint8 batches from a clippack file.

    Uses the native threaded loader when available; otherwise a NumPy mmap
    fallback producing identical batches. Iterating again continues to the
    next epoch (fresh shuffle), mirroring the epoch semantics of the
    Python loaders.

    Multi-host input sharding (``shard_id``/``num_shards``): every host
    shares (seed, shuffle) so all see the same epoch permutation; host i
    assembles only slice i of each *global* batch
    (``batch_size * num_shards`` clips). Concatenating the shards
    reproduces the single-host batch exactly.
    """

    def __init__(
        self,
        path: str,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_threads: int = 4,
        prefer_native: bool = True,
        shard_id: int = 0,
        num_shards: int = 1,
    ):
        self.path = path
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_threads = num_threads
        if not (0 <= shard_id < num_shards):
            raise ValueError(f"shard_id {shard_id} not in [0, {num_shards})")
        self.shard_id = shard_id
        self.num_shards = num_shards
        self._epoch = 0
        self._consumed = 0  # batches taken from the native ring this epoch
        self._seeked = False  # _consumed is a seek target, not abandonment
        self._native = prefer_native and native_available()

        if self._native:
            lib = _load_lib()
            self._reader = lib.clippack_open(path.encode())
            if not self._reader:
                raise OSError(f"not a clippack file: {path}")
            info = (ctypes.c_int64 * 5)()
            lib.clippack_info(self._reader, info)
            self.n, self.t, self.h, self.w, self.c = (int(v) for v in info)
            self._loader = lib.loader_create(
                self._reader, batch_size, int(shuffle), seed, num_threads, 0,
                shard_id, num_shards,
            )
            if not self._loader:
                raise ValueError(
                    f"global batch {batch_size * num_shards} > {self.n} clips"
                )
        else:
            header = np.fromfile(path, dtype="<i8", count=_HEADER_INTS)
            if header[0] != _MAGIC or header[1] != _VERSION:
                raise OSError(f"not a clippack file: {path}")
            self.n, self.t, self.h, self.w, self.c = (int(v) for v in header[2:7])
            self._mm = np.memmap(
                path,
                dtype=np.uint8,
                mode="r",
                offset=_HEADER_INTS * 8,
                shape=(self.n, self.t, self.h, self.w, self.c),
            )
        if batch_size * num_shards > self.n:
            raise ValueError(
                f"global batch {batch_size * num_shards} > {self.n} clips"
            )

    def _reset_native(self) -> None:
        """Recreate the native loader after a hard loader_next failure.

        The ring position is unknown after rc<0, so draining cannot
        recover. The C shuffle for epoch e is mt19937_64(seed + e), so a
        fresh loader seeded ``seed + e`` starts exactly at epoch e's
        permutation — bit-identical to the NumPy fallback's
        ``epoch_permutation`` stream. The broken epoch is abandoned: the
        next iteration serves the FOLLOWING epoch, the same place an
        abandoned-iterator drain would land."""
        lib = _load_lib()
        lib.loader_destroy(self._loader)
        self._epoch += 1
        self._consumed = 0
        self._loader = lib.loader_create(
            self._reader, self.batch_size, int(self.shuffle),
            self.seed + self._epoch, self.num_threads, 0,
            self.shard_id, self.num_shards,
        )
        if not self._loader:
            raise RuntimeError("clippack native loader recreation failed")

    def position(self) -> dict:
        """Checkpointable iteration position: the NEXT batch this dataset
        will serve is ``batch`` of (data-)epoch ``epoch``. Save it next to
        the model checkpoint and hand it to :meth:`seek` after a restore —
        preemption-tolerant training resumes mid-epoch without replaying
        or skipping batches (the reference restarts epochs from scratch:
        its resume rewires only the epoch counter, FCT.py:312)."""
        if self._consumed >= len(self):
            # Transient state during the final batch's consumer body
            # (the generator's finally-roll hasn't run yet): the next
            # batch is the first of the next epoch — normalize so a
            # checkpoint taken here seeks to a valid position.
            return {"epoch": self._epoch + 1, "batch": 0}
        return {"epoch": self._epoch, "batch": self._consumed}

    def seek(self, epoch: int, batch: int = 0) -> None:
        """Position the iterator at ``batch`` of (data-)epoch ``epoch``.

        Deterministic on both paths because epoch e's permutation is
        mt19937_64(seed + e) regardless of history (native C and NumPy
        fallback share the stream — ``epoch_permutation``). The native
        ring has no random access, so it is rebuilt at epoch e and
        drained ``batch`` batches (one-time mmap-copy cost per resume).
        """
        if not 0 <= batch < max(len(self), 1):
            raise ValueError(f"batch {batch} not in [0, {len(self)})")
        if epoch < 0:
            raise ValueError(f"epoch {epoch} < 0")
        if self._native:
            lib = _load_lib()
            lib.loader_destroy(self._loader)
            self._loader = lib.loader_create(
                self._reader, self.batch_size, int(self.shuffle),
                self.seed + epoch, self.num_threads, 0,
                self.shard_id, self.num_shards,
            )
            if not self._loader:
                raise RuntimeError("clippack native loader recreation failed")
            scratch = np.empty(
                (self.batch_size, self.t, self.h, self.w, self.c), np.uint8
            )
            for _ in range(batch):
                rc = lib.loader_next(
                    self._loader,
                    scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                )
                if rc < 0:
                    self._reset_native()
                    raise RuntimeError("clippack native loader failed in seek")
        self._epoch = epoch
        self._consumed = batch
        self._seeked = True

    @property
    def clip_shape(self) -> Tuple[int, int, int, int]:
        return (self.t, self.h, self.w, self.c)

    def __len__(self) -> int:
        return self.n // (self.batch_size * self.num_shards)

    def __iter__(self) -> Iterator[np.ndarray]:
        if self._native:
            lib = _load_lib()
            if self._seeked:
                # seek() already positioned the ring at (_epoch, _consumed):
                # serve the REMAINDER of that epoch (no abandonment drain).
                self._seeked = False
            elif self._consumed:
                # A previous iterator was abandoned mid-epoch. The native
                # ring has no seek, so drain to the epoch boundary — the
                # NumPy fallback always starts a fresh epoch, and the two
                # paths must stay bit-identical.
                scratch = np.empty(
                    (self.batch_size, self.t, self.h, self.w, self.c), np.uint8
                )
                for _ in range(len(self) - self._consumed):
                    rc = lib.loader_next(
                        self._loader,
                        scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    )
                    if rc < 0:
                        # Ring position unknown after a failure: rebuild
                        # the loader at this epoch instead of guessing.
                        self._reset_native()
                        raise RuntimeError("clippack native loader failed")
                self._consumed = 0
                self._epoch += 1
            try:
                for _ in range(self._consumed, len(self)):
                    # Fresh buffer per batch: the C ABI copies straight into
                    # it, and ownership passes to the caller (no defensive
                    # copy; train steps consume batches immediately anyway).
                    out = np.empty(
                        (self.batch_size, self.t, self.h, self.w, self.c), np.uint8
                    )
                    rc = lib.loader_next(
                        self._loader,
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    )
                    if rc < 0:
                        self._reset_native()  # position unknown: rebuild
                        raise RuntimeError("clippack native loader failed")
                    self._consumed += 1
                    yield out
            finally:
                if self._consumed == len(self):
                    self._consumed = 0
                    self._epoch += 1
        else:
            # Fallback accounting mirrors the native path batch-for-batch
            # (position() must be right mid-iteration on both): a seek
            # serves the remainder of its target epoch; an abandoned
            # mid-epoch iterator skips to the next epoch, same as the
            # native boundary drain.
            if self._consumed and not self._seeked:
                self._consumed = 0
                self._epoch += 1
            start = self._consumed
            self._seeked = False
            perm = epoch_permutation(self.n, self.seed, self._epoch, self.shuffle)
            gb = self.batch_size * self.num_shards
            try:
                for b in range(start, len(self)):
                    off = b * gb + self.shard_id * self.batch_size
                    idx = perm[off : off + self.batch_size]
                    self._consumed = b + 1
                    yield np.stack([self._mm[i] for i in idx])
            finally:
                if self._consumed == len(self):
                    self._consumed = 0
                    self._epoch += 1

    def close(self) -> None:
        if self._native and self._loader:
            lib = _load_lib()
            lib.loader_destroy(self._loader)
            lib.clippack_close(self._reader)
            self._loader = None
            self._reader = None

    def __del__(self):  # pragma: no cover - best effort
        try:
            self.close()
        except Exception:
            pass
