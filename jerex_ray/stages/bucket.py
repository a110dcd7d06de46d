"""Length-bucketed batching before model inference (SURVEY §4 skew row).

The reference hides per-document size skew behind ``batch_size=1``
(``configs.py:82,115-117``); a batched GPU scorer instead pads every
document in a batch to the longest member, so mixing a 700-sub-word
conversation with 20-sub-word ones wastes most of the pad. Sorting each
block by ``n_subwords`` before the scorer makes every ``batch_size``
window near-homogeneous in length (bounded pad waste) without any
global sort — a per-block vectorized ``take``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _sort_block_by_length(t: pa.Table) -> pa.Table:
    if t.num_rows <= 1:
        return t
    order = np.argsort(t["n_subwords"].to_numpy(zero_copy_only=False),
                       kind="stable")
    return t.take(pa.array(order))


def length_bucket(tokenized_ds):
    """Sort each tokenized-doc block by sub-word length (local, cheap)."""
    return tokenized_ds.map_batches(_sort_block_by_length,
                                    batch_format="pyarrow",
                                    batch_size=None, zero_copy_batch=True)
