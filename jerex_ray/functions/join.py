"""Join strategies.

* ``broadcast_join`` — the small-side pattern (ray_guide §Joins): put
  the dimension table in the object store once, merge per batch inside
  ``map_batches``. No shuffle, no join actors; right whenever one side
  fits in worker memory (dimension tables, vocabularies, blocklists).
* Large-large joins use ``Dataset.join`` (hash-partitioned) — see
  ``jerex_ray.eval.scoring.evaluate_triples_distributed`` for a usage.
* ``broadcast_semi_join`` / ``broadcast_anti_join`` — key-set membership
  filters (semi/anti) via a broadcast set.
"""

from __future__ import annotations

import pandas as pd
import ray


def broadcast_join(big_ds, small_df: pd.DataFrame, *, left_on: str,
                   right_on: str, how: str = "inner",
                   batch_size: int = 65536):
    ref = ray.put(small_df)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        small = ray.get(ref)
        out = batch.merge(small, how=how, left_on=left_on, right_on=right_on)
        if left_on != right_on and right_on in out.columns:
            out = out.drop(columns=[right_on])
        return out

    return big_ds.map_batches(merge, batch_format="pandas",
                              batch_size=batch_size)


def broadcast_semi_join(big_ds, keys: set, *, on: str,
                        batch_size: int = 65536):
    ref = ray.put(keys)

    def semi(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch[on].isin(ray.get(ref))]

    return big_ds.map_batches(semi, batch_format="pandas",
                              batch_size=batch_size)


def broadcast_anti_join(big_ds, keys: set, *, on: str,
                        batch_size: int = 65536):
    ref = ray.put(keys)

    def anti(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[~batch[on].isin(ray.get(ref))]

    return big_ds.map_batches(anti, batch_format="pandas",
                              batch_size=batch_size)
