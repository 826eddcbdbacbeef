"""Samplers & batched data loaders.

Counterpart of ``detectron2/data/build.py`` (build_batch_data_loader :294,
build_detection_{train,test}_loader :489,:584), ``samplers/
distributed_sampler.py`` (TrainingSampler :15, InferenceSampler :129,
RepeatFactorTrainingSampler :245) and ``common.py`` (MapDataset retry :84,
AspectRatioGroupedDataset :302).

TPU design: the sampler shards an infinite shuffled index stream per host;
the mapper produces bucket-padded fixed-size examples; batching groups
same-bucket examples (the static-shape analogue of aspect-ratio grouping);
a thread pool prefetches ahead of the device.
"""
from __future__ import annotations

import itertools
import logging
import queue
import threading
from collections import defaultdict
from typing import Callable, Dict, Iterable, Iterator, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


class TrainingSampler:
    """Infinite shuffled index stream, sharded across hosts
    (ref distributed_sampler.py:15)."""

    def __init__(self, size: int, shuffle: bool = True, seed: int = 0,
                 rank: int = 0, world_size: int = 1):
        assert size > 0
        self.size = size
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world_size = world_size

    def __iter__(self) -> Iterator[int]:
        g = np.random.RandomState(self.seed)
        while True:
            order = g.permutation(self.size) if self.shuffle else np.arange(self.size)
            yield from order[self.rank::self.world_size].tolist()


class RepeatFactorTrainingSampler(TrainingSampler):
    """Class-balanced resampling (ref distributed_sampler.py:245): images
    containing rare categories are repeated with factor
    max(1, sqrt(t / f_c)) where f_c is category frequency."""

    def __init__(self, dataset_dicts: List[dict], repeat_thresh: float,
                 shuffle: bool = True, seed: int = 0, rank: int = 0,
                 world_size: int = 1):
        freq: Dict[int, int] = defaultdict(int)
        n = len(dataset_dicts)
        for d in dataset_dicts:
            for cid in {a["category_id"] for a in d.get("annotations", [])}:
                freq[cid] += 1
        cat_repeat = {
            cid: max(1.0, np.sqrt(repeat_thresh / (c / n)))
            for cid, c in freq.items()
        }
        self._repeats = []
        for d in dataset_dicts:
            cats = {a["category_id"] for a in d.get("annotations", [])}
            rf = max([cat_repeat.get(c, 1.0) for c in cats], default=1.0)
            self._repeats.append(rf)
        super().__init__(n, shuffle, seed, rank, world_size)

    def __iter__(self) -> Iterator[int]:
        g = np.random.RandomState(self.seed)
        while True:
            # stochastic rounding of per-image repeat factors
            rands = g.rand(self.size)
            indices = []
            for i, rf in enumerate(self._repeats):
                rep = int(rf) + (1 if rands[i] < (rf - int(rf)) else 0)
                indices.extend([i] * rep)
            order = g.permutation(len(indices)) if self.shuffle else np.arange(len(indices))
            sel = [indices[j] for j in order]
            yield from sel[self.rank::self.world_size]


class InferenceSampler:
    """Balanced one-pass shards (ref distributed_sampler.py:129)."""

    def __init__(self, size: int, rank: int = 0, world_size: int = 1):
        self.size = size
        shard_sizes = [
            size // world_size + int(r < size % world_size)
            for r in range(world_size)
        ]
        begin = sum(shard_sizes[:rank])
        self._local = list(range(begin, begin + shard_sizes[rank]))

    def __iter__(self):
        return iter(self._local)

    def __len__(self):
        return len(self._local)


def _stack_batch(examples: List[dict]) -> dict:
    out = {}
    for k in examples[0]:
        if k == "bucket":
            continue
        vals = [e[k] for e in examples]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals)
        else:
            out[k] = np.asarray(vals)
    return out


def build_detection_train_loader(
    dataset_dicts: List[dict],
    mapper: Callable[[dict, np.random.RandomState], Optional[dict]],
    total_batch_size: int,
    seed: int = 0,
    rank: int = 0,
    world_size: int = 1,
    sampler: Optional[Iterable[int]] = None,
    prefetch: int = 2,
    num_workers: int = 4,
) -> Iterator[dict]:
    """Infinite batched stream of same-bucket batches.

    ``total_batch_size`` is the per-HOST batch (the driver shards it across
    local devices). Same-bucket grouping mirrors the reference's
    AspectRatioGroupedDataset (common.py:302) with static shapes.
    """
    if sampler is None:
        sampler = TrainingSampler(
            len(dataset_dicts), seed=seed, rank=rank, world_size=world_size
        )

    def generate() -> Iterator[dict]:
        rng = np.random.RandomState(seed * 1000 + rank)
        buffers: Dict[tuple, List[dict]] = defaultdict(list)
        for idx in sampler:
            ex = mapper(dataset_dicts[idx], rng)
            if ex is None:
                continue
            b = buffers[ex["bucket"]]
            b.append(ex)
            if len(b) == total_batch_size:
                yield _stack_batch(b)
                buffers[ex["bucket"]] = []

    if num_workers <= 0:
        return generate()
    return _threaded_prefetch(generate, max(prefetch, 1), num_workers,
                              dataset_dicts, mapper, sampler, seed, rank,
                              total_batch_size)


def _threaded_prefetch(generate, prefetch, num_workers, dataset_dicts, mapper,
                       sampler, seed, rank, total_batch_size) -> Iterator[dict]:
    """Thread-pool mapping + bounded prefetch queue (replaces torch
    DataLoader worker processes; numpy/cv2 release the GIL)."""
    from concurrent.futures import ThreadPoolExecutor

    out_q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def producer():
        rng_global = np.random.RandomState(seed * 1000 + rank)
        pool = ThreadPoolExecutor(max_workers=num_workers)
        buffers: Dict[tuple, List[dict]] = defaultdict(list)
        it = iter(sampler)
        inflight: "queue.Queue" = queue.Queue()
        try:
            # keep a window of mapper futures in flight
            for _ in range(num_workers * 2):
                idx = next(it)
                seed_i = int(rng_global.randint(2 ** 31))
                inflight.put(pool.submit(
                    mapper, dataset_dicts[idx], np.random.RandomState(seed_i)
                ))
            while not stop.is_set():
                fut = inflight.get()
                idx = next(it)
                seed_i = int(rng_global.randint(2 ** 31))
                inflight.put(pool.submit(
                    mapper, dataset_dicts[idx], np.random.RandomState(seed_i)
                ))
                ex = fut.result()
                if ex is None:
                    continue
                b = buffers[ex["bucket"]]
                b.append(ex)
                if len(b) == total_batch_size:
                    out_q.put(_stack_batch(b))
                    buffers[ex["bucket"]] = []
        except StopIteration:
            pass
        finally:
            pool.shutdown(wait=False, cancel_futures=True)
            out_q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    def consume():
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()

    return consume()


def build_detection_test_loader(
    dataset_dicts: List[dict],
    mapper: Callable,
    batch_size: int = 1,
    rank: int = 0,
    world_size: int = 1,
) -> Iterator[List[dict]]:
    """One pass, in order, padding the final partial batch by repeating the
    last example (flagged with ``is_padding``) so shapes stay static."""
    sampler = InferenceSampler(len(dataset_dicts), rank, world_size)
    rng = np.random.RandomState(0)
    batch: List[dict] = []
    for idx in sampler:
        ex = mapper(dataset_dicts[idx], rng)
        if ex is None:
            continue
        ex["is_padding"] = False
        batch.append(ex)
        if len(batch) == batch_size:
            yield batch
            batch = []
    if batch:
        while len(batch) < batch_size:
            pad = dict(batch[-1])
            pad["is_padding"] = True
            batch.append(pad)
        yield batch


def filter_images_with_only_crowd_annotations(dataset_dicts: List[dict]) -> List[dict]:
    """ref data/build.py:46."""
    def ok(d):
        return any(a.get("iscrowd", 0) == 0 for a in d.get("annotations", []))

    out = [d for d in dataset_dicts if ok(d)]
    logger.info(
        "Removed %d images with no usable annotations. %d images left.",
        len(dataset_dicts) - len(out), len(out),
    )
    return out
