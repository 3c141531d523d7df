"""Blocked upper-triangle pair enumeration — the ONE spelling of the
index math shared by the bucket-local kernels (similarity pair scoring
and MinHash candidate enumeration). A bucket of k members has k(k-1)/2
pairs; enumerating them whole would allocate O(k²) at once on a skewed
bucket, so blocks bound the live window to ~``pair_block`` elements
whatever k is (ADVICE r3; round-4 review unified the two copies)."""

from __future__ import annotations

PAIR_BLOCK_ELEMS = 1 << 22   # ~32 MB of float64 live per block


def block_triangles(k: int, pair_block: int):
    """Yield (s, e, tri) per row block for the pairs (i, j), i < j, over
    k members: rows [s, e) of the k×k grid and the boolean mask ``tri``
    of shape (e-s, k) selecting j > i. Callers turn ``tri`` (optionally
    AND-ed with their own keep predicate) into indices via np.nonzero;
    row indices come back block-local (add s for the global row)."""
    import numpy as np

    if k < 2:           # no pairs (and k=0 must not divide below) —
        return          # production buckets are size>=2-filtered anyway
    jj = np.arange(k)
    bs = max(16, pair_block // k)
    for s in range(0, k, bs):
        e = min(s + bs, k)
        yield s, e, jj[None, :] > np.arange(s, e)[:, None]
