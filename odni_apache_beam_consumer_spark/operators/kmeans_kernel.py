"""Arrow-native Lloyd assignment/statistics kernel for kmeans_lloyd.

Guide §4.2: the per-round argmin over the broadcast centroid array was an
interpreted Catalyst higher-order-function fold — ~|corpus| x k x dim
interpreted expression steps per round (the r13 round's documented #1
deferred item).  This kernel moves that arithmetic into numpy inside
``mapInArrow`` while reproducing the fold's IEEE semantics EXACTLY, so the
trajectory (and the DuckDB oracle hash) is bit-identical:

* the score is ``dot(c, c) - 2 * dot(v, c)`` where ``dot`` is the repo's
  left-to-right fold ``((0.0 + x1*y1) + x2*y2) + ...``.  Sequential
  accumulation over the dimension axis (``acc += v[:, i] * c[i]``) performs
  the same float64 additions in the same order — numpy's elementwise ``+``
  is plain IEEE binary64 addition, not a reassociating reduction like
  ``np.sum`` — so every score matches the Catalyst fold to the last ulp.
* the argmin keeps the first minimum in ascending-cid order, which equals
  the fold's ``(score, cid)`` lexicographic tie-break (``np.argmin``
  returns the first occurrence of the minimum).
* the per-member statistics are exact integers (``floor(val * 1e6)`` as
  int64), so per-batch partial sums + the downstream ``groupBy(cid).sum``
  are order-independent — no float summation crosses the boundary at all.

The equivalence is additionally pinned by an exhaustive fixture comparison
against the retained HOF reference in tests/test_r14_optimizations.py.
"""

from __future__ import annotations

from typing import Callable, Iterator


def assign_stats_kernel(
    cids: list[int], cvecs: list[list[float]], dim: int, scale: int
) -> Callable[[Iterator], Iterator]:
    """Build a ``mapInArrow`` function: batches of (vec: array<double>) ->
    per-batch partial rows (cid, s0..s{dim-1}, cnt) with exact int64 sums
    of floor(vec[i] * scale) over the batch's members of each centroid.

    ``cids``/``cvecs`` must be sorted by ascending cid (the tie-break
    order).  The closure is pickled by value, so the centroid matrix rides
    along to the executors like a broadcast literal.
    """
    import numpy as np

    order = np.argsort(np.asarray(cids, dtype=np.int64), kind="stable")
    cid_arr = np.asarray(cids, dtype=np.int64)[order]
    cmat = np.asarray(cvecs, dtype=np.float64)[order]  # k x dim
    k = cmat.shape[0]
    # dot(c, c) as the same left-to-right fold the Catalyst side uses.
    cdd = np.zeros(k, dtype=np.float64)
    for i in range(dim):
        cdd += cmat[:, i] * cmat[:, i]
    fscale = float(scale)

    def fn(batches: Iterator) -> Iterator:
        import pyarrow as pa

        out_fields = (
            [pa.field("cid", pa.int64())]
            + [pa.field(f"s{i}", pa.int64()) for i in range(dim)]
            + [pa.field("cnt", pa.int64())]
        )
        schema = pa.schema(out_fields)
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            col = batch.column(0)
            vecs = np.asarray(col.flatten(), dtype=np.float64).reshape(n, dim)
            # Left-to-right dot fold, vectorized across rows/centroids:
            # acc starts at 0.0 and adds one dimension's product per step —
            # the identical sequence of IEEE float64 additions as
            # aggregate(zip_with(v, c, (x, y) -> x*y), 0.0, (a, p) -> a+p).
            acc = np.zeros((n, k), dtype=np.float64)
            for i in range(dim):
                acc += vecs[:, i : i + 1] * cmat[None, :, i]
            scores = cdd[None, :] - 2.0 * acc
            # First minimum in ascending-cid column order == the fold's
            # (score, cid) lexicographic tie-break.
            j = np.argmin(scores, axis=1)
            fl = np.floor(vecs * fscale).astype(np.int64)
            sums = np.zeros((k, dim), dtype=np.int64)
            np.add.at(sums, j, fl)
            cnts = np.bincount(j, minlength=k).astype(np.int64)
            nz = np.flatnonzero(cnts)
            arrays = [pa.array(cid_arr[nz])]
            arrays += [pa.array(sums[nz, i]) for i in range(dim)]
            arrays += [pa.array(cnts[nz])]
            yield pa.RecordBatch.from_arrays(arrays, schema=schema)

    return fn
