"""Host-side datasets and the device feed.

Re-designs the reference's torch Dataset/DataLoader stack
(`/root/reference/dataset/dataset_denoise.py`, `dataset_motiondeblur.py`):
numpy-native paired loaders with the same directory contract
(`<dir>/groundtruth` + `<dir>/input` PNG pairs), random aligned crops and
the 8 dihedral augmentations on the host, and a double-buffered prefetch
iterator that overlaps host IO with device compute.
"""

from __future__ import annotations

import glob
import os
import threading
import queue as queue_mod
from collections import OrderedDict
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

from uformer_tpu.eval.image_io import load_img

_IMG_EXTS = ("*.png", "*.PNG", "*.jpg", "*.JPG", "*.jpeg", "*.bmp")


def _list_images(d: str) -> list:
    out = []
    for e in _IMG_EXTS:
        out.extend(glob.glob(os.path.join(d, e)))
    return sorted(out)


def _apply_dihedral(img: np.ndarray, k: int) -> np.ndarray:
    """The 8 ops of reference Augment_RGB_torch (utils/dataset_utils.py:5-30),
    HWC numpy."""
    if k == 0:
        return img
    if k <= 3:
        return np.rot90(img, k, (0, 1))
    if k == 4:
        return img[::-1]
    return np.rot90(img, k - 4, (0, 1))[::-1]


class PairedTrainDataset:
    """Paired groundtruth/input patches with random crop + dihedral aug
    (reference DataLoaderTrain, dataset_denoise.py:20-73).

    `native='auto'` uses the C++ data-plane (uformer_tpu.data.native:
    fused crop+dihedral+normalize, multi-threaded) when the shared
    library builds; numpy otherwise.
    """

    def __init__(self, data_dir: str, patch_size: int = 128, seed: int = 1234,
                 native: object = "auto", decode_threads: int = 8,
                 cache_mb: Optional[int] = None):
        self.gt_files = _list_images(os.path.join(data_dir, "groundtruth"))
        self.in_files = _list_images(os.path.join(data_dir, "input"))
        assert len(self.gt_files) == len(self.in_files) and self.gt_files, \
            f"no paired data under {data_dir}"
        self.ps = patch_size
        # bounded LRU of decoded images, keyed by path: PNG inflate is
        # the serial floor of real loading (the C++ plane only fuses
        # crop+aug+normalize), so epoch 2+ should read RAM, not zlib.
        # Budget via arg or UFORMER_TPU_DECODE_CACHE_MB (0 disables).
        if cache_mb is None:
            cache_mb = int(os.environ.get("UFORMER_TPU_DECODE_CACHE_MB",
                                          "1024"))
        self._cache_budget = int(cache_mb) * 2**20
        self._cache = OrderedDict() if self._cache_budget > 0 else None
        self._cache_bytes = 0
        self._cache_lock = threading.Lock()
        self.rng = np.random.default_rng(seed)
        self.decode_threads = decode_threads
        self._decode_pool = None
        if native == "auto":
            from uformer_tpu.data.native import native_available

            self.use_native = native_available()
        else:
            self.use_native = bool(native)

    def _load_u8(self, path: str) -> np.ndarray:
        import cv2

        return cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)

    def _load_cached(self, path: str) -> np.ndarray:
        """Decode `path` through the LRU; cached arrays are never
        mutated downstream (crop/aug always materialize new buffers)."""
        c = self._cache
        if c is not None:
            with self._cache_lock:
                hit = c.get(path)
                if hit is not None:
                    c.move_to_end(path)
                    return hit
        img = (self._load_u8 if self.use_native else load_img)(path)
        if c is not None and img.nbytes <= self._cache_budget:
            with self._cache_lock:
                if path not in c:
                    c[path] = img
                    self._cache_bytes += img.nbytes
                    while self._cache_bytes > self._cache_budget:
                        _, old = c.popitem(last=False)
                        self._cache_bytes -= old.nbytes
        return img

    def _pool(self):
        # cv2.imread releases the GIL during PNG decode, so a thread pool
        # parallelizes the decode-dominated part of real data loading
        # (reference: 4 torch workers, train_denoise.py:128).
        if self._decode_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._decode_pool = ThreadPoolExecutor(
                max_workers=self.decode_threads)
        return self._decode_pool

    def close(self):
        """Shut down the decode pool (idempotent)."""
        if self._decode_pool is not None:
            self._decode_pool.shutdown(wait=False)
            self._decode_pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def get_batch(self, indices) -> Tuple[np.ndarray, np.ndarray]:
        """Batched fused path: threaded decode, then crop/aug/normalize
        via the C++ plane when available, numpy otherwise.

        Crop/augment draws happen SERIALLY in index order after the
        threaded decode (both paths, identical draw sequence) — drawing
        inside pool workers would make the augmentation depend on thread
        interleaving (and race on the non-thread-safe Generator)."""
        ps = self.ps
        paths = [self.gt_files[i] for i in indices] + \
            [self.in_files[i] for i in indices]
        imgs = list(self._pool().map(self._load_cached, paths))
        gts, nys, rows, cols, ks = [], [], [], [], []
        for j in range(len(indices)):
            g, n = imgs[j], imgs[len(indices) + j]
            H, W = g.shape[:2]
            if H < ps or W < ps:
                g = np.pad(g, ((0, max(0, ps - H)), (0, max(0, ps - W)),
                               (0, 0)), mode="reflect")
                n = np.pad(n, ((0, max(0, ps - H)), (0, max(0, ps - W)),
                               (0, 0)), mode="reflect")
                H, W = g.shape[:2]
            gts.append(g)
            nys.append(n)
            rows.append(int(self.rng.integers(0, H - ps + 1)))
            cols.append(int(self.rng.integers(0, W - ps + 1)))
            ks.append(int(self.rng.integers(0, 8)))
        if self.use_native:
            from uformer_tpu.data.native import augment_pair_batch

            return augment_pair_batch(gts, nys, ps, np.asarray(rows),
                                      np.asarray(cols), np.asarray(ks))
        gt_out = np.stack([
            np.ascontiguousarray(_apply_dihedral(g[r:r + ps, c:c + ps], k))
            for g, r, c, k in zip(gts, rows, cols, ks)])
        ny_out = np.stack([
            np.ascontiguousarray(_apply_dihedral(n[r:r + ps, c:c + ps], k))
            for n, r, c, k in zip(nys, rows, cols, ks)])
        return gt_out, ny_out

    def __len__(self):
        return len(self.gt_files)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        gt = load_img(self.gt_files[idx])
        noisy = load_img(self.in_files[idx])
        H, W = gt.shape[:2]
        ps = self.ps
        if H < ps or W < ps:  # edge-pad small images (reference assumes >=ps)
            gt = np.pad(gt, ((0, max(0, ps - H)), (0, max(0, ps - W)), (0, 0)),
                        mode="reflect")
            noisy = np.pad(noisy,
                           ((0, max(0, ps - H)), (0, max(0, ps - W)), (0, 0)),
                           mode="reflect")
            H, W = gt.shape[:2]
        r = int(self.rng.integers(0, H - ps + 1))
        c = int(self.rng.integers(0, W - ps + 1))
        k = int(self.rng.integers(0, 8))
        gt = _apply_dihedral(gt[r:r + ps, c:c + ps], k)
        noisy = _apply_dihedral(noisy[r:r + ps, c:c + ps], k)
        return np.ascontiguousarray(gt), np.ascontiguousarray(noisy)


class PairedValDataset:
    """Full-image paired val loader (reference DataLoaderVal); optional
    center crop to val_ps (the deblur variant,
    dataset_motiondeblur.py:143-145)."""

    def __init__(self, data_dir: str, center_crop: Optional[int] = None):
        self.gt_files = _list_images(os.path.join(data_dir, "groundtruth"))
        self.in_files = _list_images(os.path.join(data_dir, "input"))
        assert len(self.gt_files) == len(self.in_files) and self.gt_files, \
            f"no paired data under {data_dir}"
        self.center_crop = center_crop

    def __len__(self):
        return len(self.gt_files)

    def __getitem__(self, idx: int):
        gt = load_img(self.gt_files[idx])
        noisy = load_img(self.in_files[idx])
        if self.center_crop:
            ps = self.center_crop
            H, W = gt.shape[:2]
            r, c = (H - ps) // 2, (W - ps) // 2
            gt = gt[r:r + ps, c:c + ps]
            noisy = noisy[r:r + ps, c:c + ps]
        name = os.path.splitext(os.path.basename(self.in_files[idx]))[0]
        return gt, noisy, name


class InputOnlyDataset:
    """Input-only loader for benchmark submissions (reference
    DataLoaderTest, dataset_denoise.py:116-136)."""

    def __init__(self, data_dir: str):
        self.files = _list_images(data_dir)

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int):
        name = os.path.splitext(os.path.basename(self.files[idx]))[0]
        return load_img(self.files[idx]), name


# Factory functions mirroring the reference API
# (dataset_denoise.py:139-150, dataset_motiondeblur.py:179-190)

def get_training_data(data_dir: str, img_options: dict):
    return PairedTrainDataset(data_dir, img_options.get("patch_size", 128))


def get_validation_data(data_dir: str):
    return PairedValDataset(data_dir)


def get_validation_deblur_data(data_dir: str, img_options: Optional[dict] = None):
    cc = (img_options or {}).get("patch_size")
    return PairedValDataset(data_dir, center_crop=cc)


def get_test_data(data_dir: str):
    return InputOnlyDataset(data_dir)


def batch_iterator(dataset, batch_size: int, shuffle: bool = True,
                   drop_last: bool = True, seed: int = 0,
                   num_threads: int = 4,
                   local_range: Optional[Tuple[int, int]] = None,
                   ) -> Iterator[dict]:
    """Yield {'target','input'} NHWC float32 batches, loading samples with a
    thread pool (reference uses 4 torch workers, train_denoise.py:128).

    `local_range=(start, size)`: multi-host data plane — every host draws
    the SAME global shuffle (seeded), but this process loads only rows
    [start, start+size) of each global batch (its shard under the batch
    sharding; see parallel.multihost.local_batch_range)."""
    from concurrent.futures import ThreadPoolExecutor

    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    if local_range is not None and not drop_last:
        # a short final batch would give per-host row slices inconsistent
        # with the global batch (make_array_from_process_local_data shape
        # mismatch) — multi-host requires drop_last
        raise ValueError("local_range (multi-host) requires drop_last=True")
    r0, rsz = local_range if local_range is not None else (0, batch_size)
    # datasets with a batched path thread their own decode and draw
    # crop/aug RNG serially — pool-mapping __getitem__ would make the
    # augmentation depend on thread interleaving
    if hasattr(dataset, "get_batch"):
        for i0 in range(0, n, batch_size):
            idx = order[i0:i0 + batch_size]
            if len(idx) < batch_size and drop_last:
                return
            gt, noisy = dataset.get_batch(idx[r0:r0 + rsz])
            yield {"target": gt, "input": noisy}
        return
    with ThreadPoolExecutor(max_workers=num_threads) as pool:
        for i0 in range(0, n, batch_size):
            idx = order[i0:i0 + batch_size]
            if len(idx) < batch_size and drop_last:
                return
            samples = list(pool.map(dataset.__getitem__, idx[r0:r0 + rsz]))
            gt = np.stack([s[0] for s in samples])
            noisy = np.stack([s[1] for s in samples])
            yield {"target": gt, "input": noisy}


def prefetch_to_device(it: Iterator[dict], size: int = 2,
                       sharding=None,
                       global_batch: Optional[int] = None) -> Iterator[dict]:
    """Double-buffered host->device prefetch: the next batch transfers
    while the current one computes (replaces torch pin_memory+workers).

    `global_batch`: multi-host mode — each incoming batch holds only this
    process's rows; assemble the cross-host global array from them
    (requires `sharding`)."""
    import jax

    q: queue_mod.Queue = queue_mod.Queue(maxsize=size)
    stop = object()
    multihost = global_batch is not None and jax.process_count() > 1
    if global_batch is not None and sharding is None:
        raise ValueError("global_batch (multi-host) requires a sharding")

    def producer():
        try:
            for batch in it:
                if multihost:
                    from uformer_tpu.parallel.multihost import (
                        make_global_batch,
                    )

                    sh = (sharding if not isinstance(sharding, dict)
                          else next(iter(sharding.values())))
                    batch = make_global_batch(batch, sh, global_batch)
                elif sharding is not None:
                    batch = jax.device_put(batch, sharding)
                else:
                    batch = jax.device_put(batch)
                q.put(batch)
        finally:
            q.put(stop)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        b = q.get()
        if b is stop:
            return
        yield b
