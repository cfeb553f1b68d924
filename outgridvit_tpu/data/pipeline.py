"""Host-side input pipeline: a deterministic, threaded array loader + a
device prefetcher.

TPU-first replacement for the reference's torch DataLoader
(`load_cifrar100.py:121-137`): same contract (len(), per-epoch iteration,
``set_epoch`` for shuffling — the duck-typed hook the reference trainer calls,
`train_full_model.py:152-156`), but yields numpy NHWC batches and overlaps
augmentation with device compute via a thread pool + lookahead queue, and the
``Prefetcher`` keeps the next batch already transferred to device HBM while
the current step runs (host->device never sits on the step's critical path).

Determinism: batch order is a seeded permutation of (seed, epoch); each
image's augmentations use an rng derived from (seed, epoch, global index) —
stronger reproducibility than the reference's per-worker reseeding.
"""

from __future__ import annotations

import itertools
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional, Tuple

import numpy as np


def peek_loader(loader):
    """Peek the first batch without losing it.

    Returns ``(first_batch, iterable)`` where ``iterable`` is what callers
    should iterate afterwards: the loader itself when it is re-iterable
    (``iter(loader)`` returns a fresh iterator, e.g. ``ArrayDataLoader``),
    or the peeked batch chained back in front when the loader is a one-shot
    iterator (``iter(loader) is iter(loader)``), so no batch is silently
    dropped. Shape probes in entry points must use this instead of
    ``next(iter(loader))`` (the contract `tests/test_training_smoke.py`
    pins for the train loop)."""
    it = iter(loader)
    first = next(it)
    if iter(loader) is it:  # one-shot iterator: re-queue the peeked batch
        return first, itertools.chain([first], it)
    return first, loader


class ArrayDataLoader:
    """Batches an in-memory (or lazily-indexed) dataset with optional
    per-image transform.

    Args:
      images: array-like [N, H, W, C] uint8, or an object with __getitem__
        returning a single HWC uint8 image.
      labels: int array [N].
      transform: callable (img_uint8_hwc, np.random.Generator) -> float32 HWC.
      num_threads: transform worker threads (PIL/numpy release the GIL).
    """

    def __init__(
        self,
        images,
        labels: np.ndarray,
        batch_size: int,
        shuffle: bool = False,
        transform: Optional[Callable] = None,
        seed: int = 0,
        drop_last: bool = False,
        num_threads: int = 8,
        lookahead: int = 4,
        process_id: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.images = images
        self.labels = np.asarray(labels)
        self.n = len(self.labels)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.transform = transform
        self.seed = int(seed)
        self.drop_last = drop_last
        self.num_threads = num_threads
        self.lookahead = lookahead
        self.epoch = 0
        self._pool = None  # persistent transform pool, created lazily
        # Multi-process mode (SURVEY §5 "per-host input pipelines"):
        # `batch_size` stays the GLOBAL batch; every process walks the SAME
        # seeded global permutation and materializes only its own rows of
        # each global batch — the row block matching
        # make_array_from_process_local_data's assembly order
        # (parallel/distributed.py:local_row_slice). A ragged global tail
        # is dropped (it cannot shard evenly over a cross-process mesh).
        self.process_count = int(process_count) if process_count else 1
        self.process_id = int(process_id) if process_id is not None else 0
        if self.process_count > 1:
            if self.batch_size % self.process_count != 0:
                raise ValueError(
                    f"global batch {self.batch_size} not divisible by "
                    f"{self.process_count} processes")
            if not (0 <= self.process_id < self.process_count):
                raise ValueError(
                    f"process_id {self.process_id} out of range "
                    f"[0, {self.process_count})")
            self.drop_last = True
        if self.n == 0:
            raise ValueError("empty dataset")

    def __del__(self):  # pragma: no cover
        try:
            if getattr(self, "_pool", None) is not None:
                self._pool.shutdown(wait=False, cancel_futures=True)
        except Exception:
            pass  # interpreter teardown: module globals may be gone

    # reference trainer duck-types sampler.set_epoch (train_full_model.py:152)
    class _Sampler:
        def __init__(self, outer):
            self._outer = outer

        def set_epoch(self, epoch: int):
            self._outer.epoch = int(epoch)

    @property
    def sampler(self):
        return ArrayDataLoader._Sampler(self)

    def set_epoch(self, epoch: int):
        self.epoch = int(epoch)

    def __len__(self) -> int:
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    def _order(self) -> np.ndarray:
        if not self.shuffle:
            return np.arange(self.n)
        rng = np.random.default_rng((self.seed, self.epoch))
        return rng.permutation(self.n)

    def _make_batch(self, idxs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        ys = self.labels[idxs].astype(np.int32)
        if self.transform is None:
            xs = np.stack([np.asarray(self.images[i]) for i in idxs])
            return xs, ys

        def one(i):
            rng = np.random.default_rng((self.seed, self.epoch, int(i)))
            return self.transform(np.asarray(self.images[i]), rng)

        if self.num_threads > 1 and len(idxs) > 1:
            if self._pool is None:
                self._pool = ThreadPoolExecutor(self.num_threads)
            xs = list(self._pool.map(one, idxs))
        else:
            xs = [one(i) for i in idxs]
        return np.stack(xs), ys

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = self._order()
        nb = len(self)
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(nb)
        ]
        if self.process_count > 1:
            # this process's rows of every (full, drop_last) global batch
            loc = self.batch_size // self.process_count
            lo = self.process_id * loc
            batches = [b[lo : lo + loc] for b in batches]
        if self.lookahead <= 1:
            for b in batches:
                yield self._make_batch(b)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.lookahead)
        stop = threading.Event()

        def producer():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    q.put(self._make_batch(b))
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


class Prefetcher:
    """Wraps a batch iterator, keeping ``depth`` batches already on device
    (sharded if a sharding is given) ahead of the consumer.

    ``sharding`` may be a Sharding or a callable ``array -> Sharding`` (used
    when the stream mixes [B, ...] batches and [K, B, ...] superbatches).

    ``transfer_workers > 1`` issues that many H2D ``device_put`` calls
    concurrently (order preserved via futures): on a tunneled/remote device
    the transfer is LATENCY-bound, not bandwidth-bound, and overlapping the
    round trips is what closes the eval transfer gap
    (docs/PERFORMANCE.md)."""

    def __init__(self, it, sharding=None, depth: int = 2,
                 transfer_workers: int = 1):
        import jax

        self._jax = jax
        self.it = iter(it)
        self.sharding = sharding
        self.depth = depth
        self.transfer_workers = max(1, int(transfer_workers))

    def __iter__(self):
        import queue
        import threading

        def put_one(a):
            s = self.sharding(a) if callable(self.sharding) else self.sharding
            if s is not None:
                if self._jax.process_count() > 1:
                    # multi-process: `a` is this process's rows; assemble
                    # the global array (SURVEY §5). No unsharded fallback —
                    # a process-local array cannot feed a global SPMD
                    # program (the loader already drops ragged tails).
                    return self._jax.make_array_from_process_local_data(s, a)
                try:
                    return self._jax.device_put(a, s)
                except ValueError:
                    # ragged last batch not divisible by the data axis:
                    # fall back to an unsharded put (GSPMD reshards inside
                    # jit; only the final partial eval batch hits this)
                    pass
            return self._jax.device_put(a)

        # the host->device transfer runs on its own thread (device_put
        # releases the GIL) so it overlaps with the consumer's dispatch —
        # on a tunneled/dev device the synchronous put was serializing
        # ~30 ms/superstep against the train loop
        q: "queue.Queue" = queue.Queue(maxsize=max(1, self.depth))
        done = object()
        stop = threading.Event()

        def safe_put(item) -> bool:
            # never block forever: if the consumer abandoned iteration
            # (exception/GeneratorExit sets `stop`), give up and exit the
            # thread instead of leaking it + its device-resident batches
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        if self.transfer_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(self.transfer_workers)

            def stage(xy):
                x, y = xy
                return put_one(x), put_one(y)

            def worker():
                try:
                    # futures flow through the queue in order, so up to
                    # `depth` transfers are in flight while the consumer
                    # holds the head of the line
                    for b in self.it:
                        if stop.is_set():
                            return
                        if not safe_put(pool.submit(stage, b)):
                            return
                    safe_put(done)
                except BaseException as e:
                    safe_put(e)
                finally:
                    pool.shutdown(wait=False)
        else:
            def worker():
                try:
                    for x, y in self.it:
                        if stop.is_set():
                            return
                        if not safe_put((put_one(x), put_one(y))):
                            return
                    safe_put(done)
                except BaseException as e:  # surface in the consumer
                    safe_put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is done:
                    break
                if isinstance(item, BaseException):
                    raise item
                if hasattr(item, "result"):  # staged transfer future
                    item = item.result()
                yield item
        finally:
            stop.set()
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
