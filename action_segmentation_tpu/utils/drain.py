"""Deferred label drain: the dispatch/fetch discipline for decode loops.

Every dispatch->fetch round trip through the remote-TPU tunnel costs
~0.5 s regardless of size (CLAUDE.md round-trip rule), so decode loops
must dispatch every batch asynchronously, keep the label arrays ON
DEVICE, and fetch once at the end — with one tiny backpressure scalar
every N batches so queued input buffers stay bounded. Both serving
(`api.Segmenter.segment_many`) and `SemiMarkovModel.predict`'s
streaming path follow this discipline; this helper is the ONE copy of
it, so a future change to the cadence or the stacked-fetch padding
cannot silently leave one path with the old round-trip behavior.
"""

import jax.numpy as jnp
import numpy as np


class DeferredLabelDrain:
    """Collects per-batch device label arrays; fetches them all at once.

    add(meta, labels_dev, n_rows): register one dispatched batch. `meta`
    is opaque caller context (video names, indices, lengths); `n_rows`
    trims padded rows (defaults to all rows). Every `backpressure_every`
    adds, ONE scalar of the oldest in-window batch is fetched, which
    blocks until that batch's program ran — bounding how many undecoded
    input buffers the device queue holds without per-batch syncs.

    drain(): pads every batch's labels to the common max T, concatenates
    on device, fetches the stack in ONE transfer, and yields
    (meta, labels (n_rows, t_max) np.ndarray) in add() order.
    """

    def __init__(self, backpressure_every=16):
        self._items = []  # (meta, labels_dev, n_rows)
        self._every = int(backpressure_every)

    def add(self, meta, labels_dev, n_rows=None):
        n = int(n_rows) if n_rows is not None else int(labels_dev.shape[0])
        self._items.append((meta, labels_dev, n))
        # backpressure_every <= 0 disables backpressure entirely
        if self._every > 0 and len(self._items) % self._every == 0:
            np.asarray(self._items[-self._every][1][0, 0])  # backpressure

    def drain(self):
        if not self._items:
            return
        t_max = max(lab.shape[1] for _, lab, _ in self._items)
        stacked = jnp.concatenate(
            [
                jnp.pad(lab[:n], ((0, 0), (0, t_max - lab.shape[1])))
                for _, lab, n in self._items
            ],
            axis=0,
        )
        all_labels = np.asarray(stacked)  # the single fetch
        row = 0
        for meta, _, n in self._items:
            yield meta, all_labels[row : row + n]
            row += n
        self._items = []
