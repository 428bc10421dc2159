"""Datasets and input pipeline.

Re-designs the reference data layer (``src/data/*.py``) for JAX:

- samples are dicts ``{"image": (H,W,3) float32 in [-1,1] NHWC, "caption":
  str, "name": str}`` (ref trainset.py:43-47 emits the same triple, CHW)
- ``ImageFolderDataset`` = ref ``ImageOnlyDataset`` (any folder of
  jpg/png, eval)
- ``SimpleImageText`` = ref image+caption pairs
- ``CommonCanvasDataset`` reads HF parquet/arrow shards via ``datasets``
  with a shard cap (ref common_canvas_set.py ``loading_length``)
- ``ResizeIfSmall`` guard + random resize/crop multi-resolution transform
  (ref trainset.py / train_sd15_codec_stage1.py:146-161)

Loading is host-side numpy/PIL; batches feed jit as NHWC arrays. The
multiprocess production loader is ``make_grain_loader`` (google/grain —
the TPU-native input pipeline); the plain ``DataLoader`` iterator covers
tests and small evals without extra processes.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def load_image(path, to_float: bool = True) -> np.ndarray:
    """Read an image file -> (H,W,3) float32 in [-1,1] (or uint8)."""
    img = Image.open(path).convert("RGB")
    arr = np.asarray(img)
    if to_float:
        arr = arr.astype(np.float32) / 127.5 - 1.0
    return arr


def save_image(arr: np.ndarray, path) -> None:
    """(H,W,3) [-1,1] float -> PNG."""
    arr = np.clip((arr + 1.0) * 127.5 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


# ---------------------------------------------------------------------------
# transforms (numpy, host-side)
# ---------------------------------------------------------------------------

def resize(arr: np.ndarray, size_hw) -> np.ndarray:
    h, w = size_hw
    img = Image.fromarray(
        np.clip((arr + 1.0) * 127.5 + 0.5, 0, 255).astype(np.uint8))
    img = img.resize((w, h), Image.BILINEAR)
    return np.asarray(img).astype(np.float32) / 127.5 - 1.0


def resize_if_small(arr: np.ndarray, min_size: int) -> np.ndarray:
    """Upscale so min(H,W) >= min_size, keeping aspect (ref ResizeIfSmall)."""
    h, w = arr.shape[:2]
    if min(h, w) >= min_size:
        return arr
    scale = min_size / min(h, w)
    return resize(arr, (max(min_size, int(round(h * scale))),
                        max(min_size, int(round(w * scale)))))


def random_crop(arr: np.ndarray, size: int, rng: np.random.Generator):
    h, w = arr.shape[:2]
    if h < size or w < size:
        arr = resize_if_small(arr, size)
        h, w = arr.shape[:2]
    top = int(rng.integers(0, h - size + 1))
    left = int(rng.integers(0, w - size + 1))
    return arr[top:top + size, left:left + size]


def center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    arr = resize_if_small(arr, size)
    h, w = arr.shape[:2]
    top, left = (h - size) // 2, (w - size) // 2
    return arr[top:top + size, left:left + size]


class MultiResolutionCrop:
    """Per-step random (resolution, batch_scale) choice from a config list.

    The reference picks a transform index on rank 0 and broadcasts it so
    all DDP ranks agree (train_sd15_codec_stage1.py:279-290). With JAX's
    single-controller model every host samples from the same seeded stream,
    so no broadcast is needed — same index everywhere by construction.
    """

    def __init__(self, resolutions: Sequence[int],
                 batch_scales: Optional[Sequence[float]] = None,
                 seed: int = 0):
        self.resolutions = list(resolutions)
        self.batch_scales = list(batch_scales or [1.0] * len(resolutions))
        assert len(self.batch_scales) == len(self.resolutions)
        self.rng = np.random.default_rng(seed)

    def pick(self, step: int):
        """Deterministic in `step`: all hosts agree without communication."""
        rng = np.random.default_rng((step << 16) ^ 0x9E3779B9)
        idx = int(rng.integers(0, len(self.resolutions)))
        return self.resolutions[idx], self.batch_scales[idx]


# ---------------------------------------------------------------------------
# datasets
# ---------------------------------------------------------------------------

class ImageFolderDataset:
    """Any folder of images; eval-style (ref ImageOnlyDataset)."""

    def __init__(self, root, transform: Optional[Callable] = None,
                 sort: bool = True):
        root = Path(root)
        self.paths: List[Path] = [
            p for p in root.rglob("*") if p.suffix.lower() in IMG_EXTS]
        if sort:
            self.paths.sort()
        self.transform = transform

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i: int) -> Dict[str, Any]:
        arr = load_image(self.paths[i])
        if self.transform:
            arr = self.transform(arr)
        return {"image": arr, "caption": "", "name": self.paths[i].stem}


class SimpleImageText:
    """Parallel image/caption lists (ref SimpleImageText)."""

    def __init__(self, image_paths: Sequence, captions: Sequence[str],
                 transform: Optional[Callable] = None):
        assert len(image_paths) == len(captions)
        self.image_paths = list(image_paths)
        self.captions = list(captions)
        self.transform = transform

    def __len__(self):
        return len(self.image_paths)

    def __getitem__(self, i: int) -> Dict[str, Any]:
        arr = load_image(self.image_paths[i])
        if self.transform:
            arr = self.transform(arr)
        return {"image": arr, "caption": self.captions[i],
                "name": Path(self.image_paths[i]).stem}


class CommonCanvasDataset:
    """CommonCanvas CC shards via HF `datasets`, with a shard/length cap
    (ref common_canvas_set.py:7-33). Requires the dataset on local disk
    (zero-egress environment)."""

    def __init__(self, path, split: str = "train",
                 loading_length: Optional[int] = None,
                 transform: Optional[Callable] = None,
                 image_key: str = "jpg", caption_key: str = "blip2_caption"):
        import datasets as hf_datasets
        self.ds = hf_datasets.load_from_disk(str(path)) if os.path.isdir(
            str(path)) else hf_datasets.Dataset.from_file(str(path))
        if loading_length is not None:
            self.ds = self.ds.select(range(min(loading_length, len(self.ds))))
        self.transform = transform
        self.image_key = image_key
        self.caption_key = caption_key

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i: int) -> Dict[str, Any]:
        row = self.ds[int(i)]
        img = row[self.image_key]
        arr = (np.asarray(img.convert("RGB")).astype(np.float32) / 127.5
               - 1.0) if Image is not None and hasattr(img, "convert") else (
            np.asarray(img, np.float32) / 127.5 - 1.0)
        if self.transform:
            arr = self.transform(arr)
        return {"image": arr, "caption": str(row.get(self.caption_key, "")),
                "name": str(i)}


class ConcatDataset:
    """Multi-dataset concat (ref base.py instantiate_datasets)."""

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self.offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self.offsets[-1])

    def __getitem__(self, i: int):
        k = int(np.searchsorted(self.offsets, i, side="right") - 1)
        return self.datasets[k][i - int(self.offsets[k])]


# ---------------------------------------------------------------------------
# loaders
# ---------------------------------------------------------------------------

class DataLoader:
    """Minimal host loader: shuffle, batch, stack to NHWC numpy."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0
        self._skip_batches = 0  # consumed once by the next __iter__

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (
            (n + self.batch_size - 1) // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
        self._epoch += 1
        bs = self.batch_size
        stop = n - n % bs if self.drop_last else n
        skip, self._skip_batches = self._skip_batches, 0
        for start in range(skip * bs, stop, bs):
            items = [self.dataset[int(i)] for i in order[start:start + bs]]
            yield {
                "image": np.stack([it["image"] for it in items]),
                "caption": [it["caption"] for it in items],
                "name": [it["name"] for it in items],
            }


def cycle(loader, skip: int = 0) -> Iterator:
    """Infinite epoch-cycling iterator (ref dmd/utils.py cycle).

    ``skip`` fast-forwards that many batches WITHOUT loading any data
    (resume: the stream continues exactly where a preempted run stopped
    — epoch shuffles stay aligned because only the epoch counter and an
    in-epoch offset advance, never the dataset reads)."""
    if skip:
        per = len(loader)
        loader._epoch += skip // per
        loader._skip_batches = skip % per
    while True:
        for batch in loader:
            yield batch


def make_grain_loader(dataset, batch_size: int, *, shuffle: bool = True,
                      seed: int = 0, num_workers: int = 8,
                      num_epochs: Optional[int] = None):
    """Production input pipeline on google/grain: multiprocess decode,
    deterministic global shuffle, per-process sharding for multi-host.

    Returns an iterator of batches shaped like ``DataLoader``'s.
    """
    import grain.python as grain
    import jax

    class _Source(grain.RandomAccessDataSource):
        def __len__(self):
            return len(dataset)

        def __getitem__(self, i):
            it = dataset[int(i)]
            return {"image": it["image"], "caption": it["caption"],
                    "name": it["name"]}

        def __repr__(self):
            # grain validates restored iterator state against
            # repr(data_source); the default repr embeds the object
            # address, which would reject every cross-process resume
            return (f"OneDCGrainSource({type(dataset).__name__}, "
                    f"n={len(dataset)})")

    sampler = grain.IndexSampler(
        num_records=len(dataset),
        shuffle=shuffle,
        seed=seed,
        num_epochs=num_epochs,
        shard_options=grain.ShardOptions(
            shard_index=jax.process_index(),
            shard_count=jax.process_count(),
            drop_remainder=True),
    )
    loader = grain.DataLoader(
        data_source=_Source(),
        sampler=sampler,
        operations=[grain.Batch(batch_size, drop_remainder=True)],
        worker_count=num_workers,
    )
    return iter(loader)
