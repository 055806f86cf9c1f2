"""Host-side data loading: image folders + `metadata.jsonl` captions.

Replaces the reference's torch DataLoader (`latent_wm_pretrain.py:58-94`)
and HF-datasets imagefolder pipeline (`ppft_train.py:789-887`): PIL decode
-> bicubic resize -> [-1,1] float NHWC, shuffled epochs, drop_last, and
per-host sharding for multi-process TPU training (each host loads only its
shard — the TPU-native replacement for DistributedSampler).

A synthetic dataset backs tests/benchmarks when no image folder exists.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np

try:
    from PIL import Image
    _HAVE_PIL = True
except ImportError:          # pragma: no cover
    _HAVE_PIL = False


def _transform_pil(img, resolution: int, center_crop: bool = False,
                   random_flip: bool = False,
                   rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """PIL image -> [-1,1] float HWC with the reference's CenterCrop/
    RandomFlip semantics (ppft_train.py:836-846); shared by the folder
    and HF-datasets paths so the two pipelines cannot drift."""
    if img.mode != "RGB":
        img = img.convert("RGB")
    if center_crop:
        s = min(img.size)
        left = (img.width - s) // 2
        top = (img.height - s) // 2
        img = img.crop((left, top, left + s, top + s))
    img = img.resize((resolution, resolution), resample=Image.Resampling.BICUBIC)
    arr = np.asarray(img, np.uint8).astype(np.float32) / 127.5 - 1.0
    if random_flip and rng is not None and rng.random() < 0.5:
        arr = arr[:, ::-1]
    return arr                                            # HWC in [-1, 1]


def _load_image(path: str, resolution: int, center_crop: bool = False,
                random_flip: bool = False, rng: Optional[np.random.Generator] = None
                ) -> np.ndarray:
    if not _HAVE_PIL:                     # pragma: no cover
        raise ImportError(
            f"cannot decode {path}: PIL is not installed and the native "
            "loader is unavailable (build aqualora_tpu/native)")
    return _transform_pil(Image.open(path), resolution, center_crop,
                          random_flip, rng)


def _shard_len(n: int, process_index: int, process_count: int) -> int:
    return len(range(process_index, n, process_count))


def _check_shard(n_shard: int, batch_size: int, what: str) -> None:
    """Drop-last with a shard smaller than one batch yields NOTHING: the
    epochs=None training loop would then spin forever without a single
    batch (a silent hang at the consumer's q.get()).  Fail loudly."""
    if n_shard < batch_size:
        raise ValueError(
            f"{what}: host shard has {n_shard} samples < batch_size "
            f"{batch_size} — drop-last iteration would never yield a "
            "batch; lower the batch size or provide more data")


@dataclass
class ImageFolderDataset:
    """Images (+ optional captions from metadata.jsonl) under a root dir."""

    root: str
    resolution: int = 512
    center_crop: bool = False
    random_flip: bool = False
    caption_column: str = "text"
    num_threads: int = 0          # native decoder threads (0 = auto)

    def __post_init__(self):
        meta = os.path.join(self.root, "metadata.jsonl")
        self.captions: Optional[List[str]] = None
        if os.path.exists(meta):
            files, caps = [], []
            with open(meta) as f:
                for line in f:
                    row = json.loads(line)
                    files.append(os.path.join(self.root, row["file_name"]))
                    caps.append(row.get(self.caption_column, ""))
            self.files, self.captions = files, caps
        else:
            # case-insensitive: camera exports commonly ship .JPG/.JPEG
            self.files = sorted(
                os.path.join(self.root, f) for f in os.listdir(self.root)
                if f.lower().endswith((".png", ".jpg", ".jpeg")))
        if not self.files:
            raise FileNotFoundError(f"no images under {self.root}")

    def __len__(self):
        return len(self.files)

    def _load_batch(self, idx, rng) -> np.ndarray:
        paths = [self.files[j] for j in idx]
        if not self.center_crop:
            # native C++ threaded decode+bicubic (core/native_loader.py)
            from aqualora_tpu.core import native_loader
            imgs = native_loader.decode_batch(paths, self.resolution,
                                              nthreads=self.num_threads)
            if imgs is not None:
                if self.random_flip:
                    flips = rng.random(len(imgs)) < 0.5
                    imgs[flips] = imgs[flips, :, ::-1]
                return imgs
        return np.stack([
            _load_image(p, self.resolution, self.center_crop,
                        self.random_flip, rng) for p in paths])

    def batches(self, batch_size: int, seed: int = 0,
                process_index: int = 0, process_count: int = 1,
                epochs: Optional[int] = None, drop_last: bool = True
                ) -> Iterator[Tuple[np.ndarray, Optional[List[str]]]]:
        """Shuffled, host-sharded epochs of (images, captions); drop-last
        by default (static training shapes), drop_last=False yields the
        tail as a smaller final batch (cache-building covers every
        sample)."""
        if drop_last:
            _check_shard(_shard_len(len(self.files), process_index,
                                    process_count), batch_size, self.root)
        rng = np.random.default_rng(seed + process_index)
        epoch = 0
        while epochs is None or epoch < epochs:
            order = np.random.default_rng(seed + epoch).permutation(len(self.files))
            shard = order[process_index::process_count]
            stop = (len(shard) - batch_size + 1) if drop_last else len(shard)
            for i in range(0, stop, batch_size):
                idx = shard[i:i + batch_size]
                imgs = self._load_batch(idx, rng)
                caps = ([self.captions[j] for j in idx]
                        if self.captions is not None else None)
                yield imgs, caps
            epoch += 1


@dataclass
class SyntheticDataset:
    """Deterministic random images + captions (tests/benchmarks)."""

    resolution: int = 512
    size: int = 256

    def __len__(self):
        return self.size

    def batches(self, batch_size: int, seed: int = 0, process_index: int = 0,
                process_count: int = 1, epochs: Optional[int] = None,
                drop_last: bool = True):
        shard_n = max(1, self.size // process_count)
        if drop_last:           # generated data: always at least one batch
            sizes = [batch_size] * max(1, shard_n // batch_size)
        else:                   # cover exactly the nominal shard size
            sizes = [batch_size] * (shard_n // batch_size)
            if shard_n % batch_size:
                sizes.append(shard_n % batch_size)
        epoch = 0
        while epochs is None or epoch < epochs:
            rng = np.random.default_rng(seed + 1000 * epoch + process_index)
            for n in sizes:
                imgs = rng.uniform(-1, 1, (n, self.resolution,
                                           self.resolution, 3)).astype(np.float32)
                caps = [f"synthetic caption {int(x)}"
                        for x in rng.integers(0, 1000, n)]
                yield imgs, caps
            epoch += 1


@dataclass
class HFDataset:
    """HF `datasets` wrapper (the reference's load_dataset path,
    ppft_train.py:792-800); local-only in this egress-less environment."""

    name: str
    resolution: int = 512
    config_name: Optional[str] = None
    data_dir: Optional[str] = None
    caption_column: str = "text"
    image_column: str = "image"
    max_samples: Optional[int] = None
    center_crop: bool = False
    random_flip: bool = False

    def __post_init__(self):
        import datasets
        ds = datasets.load_dataset(self.name, self.config_name,
                                   data_dir=self.data_dir)
        self.ds = ds["train"] if "train" in ds else next(iter(ds.values()))
        if self.max_samples:
            self.ds = self.ds.select(range(min(self.max_samples,
                                               len(self.ds))))

    def __len__(self):
        return len(self.ds)

    def batches(self, batch_size: int, seed: int = 0, process_index: int = 0,
                process_count: int = 1, epochs: Optional[int] = None,
                drop_last: bool = True):
        if drop_last:
            _check_shard(_shard_len(len(self.ds), process_index,
                                    process_count), batch_size, self.name)
        rng = np.random.default_rng(seed + process_index)
        epoch = 0
        while epochs is None or epoch < epochs:
            order = np.random.default_rng(seed + epoch).permutation(len(self.ds))
            shard = order[process_index::process_count]
            stop = (len(shard) - batch_size + 1) if drop_last else len(shard)
            for i in range(0, stop, batch_size):
                rows = self.ds.select(shard[i:i + batch_size].tolist())
                imgs, caps = [], []
                for r in rows:
                    imgs.append(_transform_pil(
                        r[self.image_column], self.resolution,
                        self.center_crop, self.random_flip, rng))
                    caps.append(r.get(self.caption_column, ""))
                yield np.stack(imgs), caps
            epoch += 1


@dataclass
class CachedMomentsDataset:
    """kohya-style `--cache_latents`: one pass VAE-encodes every sample to
    posterior moments (mean || clipped logvar) held as a float16 host
    array; afterwards `batches()` yields moments batches instead of
    pixels (consumed by `make_loss_fn(cache_latents=True)`).

    Exact reference semantics: the VAE encoder is deterministic, so
    caching its output changes nothing; the posterior *sampling* (fresh
    noise per visit) stays in the train step.  Requires
    `random_flip=False` — the cache is keyed per sample, so kohya
    likewise forbids flip augmentation with cache_latents.

    The cache holds only THIS host's shard (built through the base
    dataset's sharded iterator); `batches()` then reshuffles within the
    shard each epoch.  (The reference's DistributedSampler reshuffles
    globally each epoch; per-host-shard shuffling is the standard cached
    input-pipeline trade and keeps the cache local.)
    """

    moments: np.ndarray                  # [N, h, w, 2C] float16
    captions: Optional[List[str]]
    process_index: int = 0

    @classmethod
    def build(cls, base, encode_fn, batch_size: int, seed: int = 0,
              process_index: int = 0, process_count: int = 1
              ) -> "CachedMomentsDataset":
        """encode_fn: pixels [B,H,W,3] -> moments [B,h,w,2C] (jitted VAE
        encode_moments, mean||logvar concatenated on channels).

        Streams the shard in batch_size chunks WITHOUT drop-last (the
        loaders' drop_last=False mode), zero-padding the tail chunk to
        the one static encode shape — so the cache covers EVERY sample
        (kohya caches all latents; a drop-last pass would permanently
        exclude up to batch_size-1 tail images from all epochs) while
        each chunk still rides the threaded native decoder at full
        batch width."""
        mlist: List[np.ndarray] = []
        clist: List[Optional[str]] = []
        for imgs, caps in base.batches(batch_size, seed=seed,
                                       process_index=process_index,
                                       process_count=process_count,
                                       epochs=1, drop_last=False):
            n = len(imgs)
            if n < batch_size:           # pad: one static encode shape
                imgs = np.concatenate(
                    [imgs, np.zeros((batch_size - n,) + imgs.shape[1:],
                                    imgs.dtype)])
            mlist.append(np.asarray(encode_fn(imgs), np.float16)[:n])
            clist.extend(list(caps)[:n] if caps is not None else [None] * n)
        if not mlist:
            raise ValueError(
                f"cache_latents: host shard {process_index}/{process_count} "
                f"of {base!r} yielded no samples")
        caps_out: Optional[List[str]] = None
        if any(c is not None for c in clist):
            caps_out = ["" if c is None else c for c in clist]
        return cls(np.concatenate(mlist), caps_out, process_index)

    def __len__(self):
        return len(self.moments)

    def batches(self, batch_size: int, seed: int = 0, process_index: int = 0,
                process_count: int = 1, epochs: Optional[int] = None
                ) -> Iterator[Tuple[np.ndarray, Optional[List[str]]]]:
        # process sharding was applied at build time; the args are accepted
        # for interface compatibility and ignored
        del process_index, process_count
        n = len(self.moments)
        _check_shard(n, batch_size, "cached latents")
        epoch = 0
        while epochs is None or epoch < epochs:
            order = np.random.default_rng(
                seed + epoch + 1000 * self.process_index).permutation(n)
            for i in range(0, n - batch_size + 1, batch_size):
                idx = order[i:i + batch_size]
                caps = ([self.captions[j] for j in idx]
                        if self.captions is not None else None)
                yield self.moments[idx].astype(np.float32), caps
            epoch += 1


def _fields_of(cls, kw):
    import dataclasses
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in kw.items() if k in names and v is not None}


def make_dataset(path: Optional[str], resolution: int,
                 dataset_name: Optional[str] = None,
                 max_samples: Optional[int] = None, **kw):
    """Dataset factory; extra kwargs are forwarded to whichever dataset
    class has a matching field (caption_column/image_column/config_name/
    center_crop/random_flip/num_threads), so `--caption_column` etc.
    reach both the imagefolder and the HF-datasets paths."""
    if dataset_name:
        return HFDataset(dataset_name, resolution, data_dir=path,
                         max_samples=max_samples, **_fields_of(HFDataset, kw))
    if path:
        if not os.path.isdir(path):
            # never silently train a long run on synthetic noise because
            # of a typo'd --train_data_dir
            raise FileNotFoundError(
                f"train data dir {path!r} is not a directory")
        ds = ImageFolderDataset(path, resolution,
                                **_fields_of(ImageFolderDataset, kw))
        if max_samples:
            ds.files = ds.files[:max_samples]
            if ds.captions:
                ds.captions = ds.captions[:max_samples]
        return ds
    return SyntheticDataset(resolution)


def prefetch(iterator, depth: int = 2):
    """Run `iterator` in a background thread, keeping up to `depth`
    batches decoded ahead (the role of the reference's DataLoader worker
    processes, `latent_wm_pretrain.py:87-94` / `ppft_train.py:885`).
    Exceptions re-raise in the consumer."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()
    stop = threading.Event()

    def _put(item) -> bool:
        # bounded put so the worker notices an abandoned consumer (early
        # break/exception in the training loop) instead of blocking on a
        # full queue forever and leaking the thread + open iterator
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if not _put(item):
                    return
            _put(_END)
        except BaseException as e:       # surfaced on the consumer side
            _put(e)
        finally:
            close = getattr(iterator, "close", None)
            if close is not None:        # generator cleanup (finally blocks)
                try:
                    close()
                except Exception:
                    pass

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()                       # GeneratorExit / break / exception
