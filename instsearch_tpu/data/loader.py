"""Prefetching input pipeline (SURVEY.md N1): overlap host decode with
device compute so the chip never starves (SURVEY.md §7 hard part 4).

Two implementations behind one API:
  * ``PrefetchLoader`` — a background-thread pipeline over
    ``frontend.batch_paths`` (which itself uses the native C++ threaded
    decoder): decode batch i+depth while the device runs batch i.
  * ``grain_dataset`` — the same decode as a ``grain`` MapDataset for
    integration with grain-based training loops (grain is the supported
    JAX data stack).
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Sequence

import numpy as np

from . import frontend


class PrefetchLoader:
    """Iterate (uint8 [B,S,S,3], indices [B]) with background prefetch.

    ``device_put=True`` additionally pushes each decoded batch to the
    default device FROM THE PRODUCER THREAD, so the host->device transfer
    of batch i+1 overlaps with the device compute + readback of batch i
    (the transfer is the e2e bottleneck behind a slow interconnect).
    """

    def __init__(self, paths: Sequence[str], size: int, batch: int,
                 depth: int = 2, quarantine: list | None = None,
                 device_put: bool = False):
        self.paths = paths
        self.size = size
        self.batch = batch
        self.depth = depth
        self.quarantine = quarantine
        self.device_put = device_put

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        DONE = object()
        err: list[BaseException] = []
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that gives up when the consumer went away —
            # otherwise an abandoned iteration (break / exception in the
            # consumer loop) leaves this thread blocked forever, pinning
            # depth+1 decoded batches or device buffers (review r2)
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for batch, idxs in frontend.batch_paths(
                        self.paths, self.size, self.batch, self.quarantine):
                    if self.device_put:
                        import jax
                        batch = jax.device_put(batch)
                    if not put((batch, idxs)):
                        return
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                put(DONE)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        completed = False
        try:
            while True:
                item = q.get()
                if item is DONE:
                    break
                yield item
            completed = True
        finally:
            stop.set()               # unblock the producer on early exit
            while True:              # drain so its pending put() returns
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join()
            if completed and err:    # abandoned iteration: swallow, the
                raise err[0]         # consumer already moved on


def iter_batches(paths: Sequence[str], size: int, batch: int,
                 quarantine: list | None = None, depth: int = 2,
                 device_put: bool = False):
    """The production input pipeline: prefetch-overlapped decode batches.

    One shared entry point so every build path (Extractor.extract_paths,
    ResumableBuilder) gets decode/compute overlap; falls back to the
    synchronous iterator for trivially small path lists where thread
    startup would dominate.
    """
    if len(paths) <= batch:
        return frontend.batch_paths(paths, size, batch, quarantine)
    return iter(PrefetchLoader(paths, size, batch, depth=depth,
                               quarantine=quarantine, device_put=device_put))


def grain_dataset(paths: Sequence[str], size: int, batch: int,
                  num_workers: int = 0):
    """Build a ``grain`` MapDataset pipeline: decode -> batch.

    Failed decodes yield zero images with index -1 (callers filter), since
    grain map stages cannot drop elements.
    """
    import grain.python as grain

    class Decode(grain.MapTransform):
        def map(self, i: int):
            img = frontend.load_square(paths[i], size)
            if img is None:
                return np.zeros((size, size, 3), np.uint8), np.int64(-1)
            return img, np.int64(i)

    ds = grain.MapDataset.range(len(paths)).map(Decode())
    ds = ds.batch(batch_size=batch, drop_remainder=False)
    if num_workers:
        ds = ds.to_iter_dataset().mp_prefetch(
            grain.multiprocessing.MultiprocessingOptions(num_workers=num_workers))
    return ds
