"""Background batch prefetch — the training-side IO/compute overlap.

The reference overlaps batch assembly with the optimizer step through
``torch.utils.data.DataLoader(num_workers=…)`` worker processes
(``/root/reference/waveglow/train.py:76-80``, ``train.py:190``); here the
same overlap is a bounded-queue producer THREAD wrapping the dataset's
epoch iterator.  Threads (not processes) are the right tool on this stack:
per-batch host work is wav decode in the native C++ layer
(``native/wavio.cc``) + numpy collation — both release the GIL — and the
batched mel extraction is a jax device call, so the producer can decode,
pad and DISPATCH the next batch's device work while the main thread blocks
on the current train step.

Order and values are bit-identical to consuming the iterator inline (one
producer, FIFO queue); determinism/resume guarantees of
``TextMelDataset.epoch`` carry through untouched.  Exceptions in the
producer re-raise at the consumer's next pull; abandoning the generator
(early ``break``, interrupt-save) stops the producer promptly.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator


class _Raised:
    def __init__(self, exc: BaseException):
        self.exc = exc


_DONE = object()


def prefetch(it: Iterable, depth: int = 2) -> Iterator:
    """Yield from ``it``, assembling up to ``depth`` items ahead in a
    background thread.  ``depth=0`` degenerates to inline iteration."""
    if depth <= 0:
        yield from it
        return

    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def _put(x) -> bool:
        while not stop.is_set():
            try:
                q.put(x, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _run():
        try:
            for x in it:
                if not _put(x):
                    return
            _put(_DONE)
        except BaseException as e:  # re-raised at the consumer
            _put(_Raised(e))

    t = threading.Thread(target=_run, name="batch-prefetch", daemon=True)
    t.start()
    try:
        while True:
            x = q.get()
            if x is _DONE:
                return
            if isinstance(x, _Raised):
                raise x.exc
            yield x
    finally:
        stop.set()
