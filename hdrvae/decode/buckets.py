"""Shape-bucket policy for arbitrary-resolution serving.

XLA compiles one program per input shape; a serving workload with free
resolutions triggers a recompilation storm (SURVEY.md section 7
hard-parts).  `hdr_decode(shape_bucket=N)` bounds shapes to multiples of
N; this module adds the policy layer on top: choose a SMALL set of
bucket edges fitted to an observed/expected size distribution (dynamic
programming over the pooled edge marginal, minimizing total padded
pixels), then snap every request to its bucket.  The padded region is
excluded from all statistics via PadMask, so bucketed decodes stay EXACT
(`tests/test_pipeline.py` bucketing tests).
"""

from __future__ import annotations

import bisect
import dataclasses
from typing import Dict, Iterable, Sequence, Tuple

import numpy as np

__all__ = ["BucketPolicy", "plan_buckets"]


@dataclasses.dataclass(frozen=True)
class BucketPolicy:
    """Ascending latent-edge bucket sizes.  ``snap`` rounds a size up to
    its bucket; sizes beyond the largest bucket round up to a multiple
    of ``overflow_multiple`` (a fresh compile, but bounded in count)."""

    edges: Tuple[int, ...]
    overflow_multiple: int = 64

    def __post_init__(self):
        if not self.edges or list(self.edges) != sorted(set(self.edges)):
            raise ValueError(f"edges must be ascending+unique: "
                             f"{self.edges}")

    def snap(self, n: int) -> int:
        i = bisect.bisect_left(self.edges, n)
        if i < len(self.edges):
            return self.edges[i]
        m = self.overflow_multiple
        return -(-n // m) * m

    def snap_hw(self, h: int, w: int) -> Tuple[int, int]:
        return self.snap(h), self.snap(w)

    @property
    def max_compiled_shapes(self) -> int:
        return len(self.edges) ** 2


def plan_buckets(sizes: Iterable[Tuple[int, int]], max_buckets: int = 4,
                 multiple: int = 8) -> BucketPolicy:
    """Fit a :class:`BucketPolicy` to a workload.

    sizes: observed/expected latent (h, w) pairs.  Both edges pool into
    one 1-D marginal (buckets apply per axis, so the compiled-shape
    count is at most ``max_buckets**2``); a DP partition over the
    distinct candidate edges (rounded up to ``multiple`` — conv/window
    alignment) picks at most ``max_buckets`` bucket tops minimizing the
    total padded-pixel sum ``count * (bucket - size)``.
    """
    flat = [s for hw in sizes for s in hw]
    if not flat:
        raise ValueError("no sizes given")
    counts: Dict[int, int] = {}
    for s in flat:
        r = -(-s // multiple) * multiple
        counts[r] = counts.get(r, 0) + 1
    vals = sorted(counts)
    k = min(max_buckets, len(vals))
    n = len(vals)
    cnt = np.asarray([counts[v] for v in vals], np.int64)
    varr = np.asarray(vals, np.int64)

    # cost[i][j]: all sizes in vals[i..j] served by bucket vals[j]
    cost = np.zeros((n, n), np.int64)
    for i in range(n):
        for j in range(i, n):
            cost[i, j] = int((cnt[i:j + 1] * (varr[j]
                                              - varr[i:j + 1])).sum())

    INF = np.iinfo(np.int64).max
    dp = np.full((k + 1, n), INF, np.int64)
    choice = np.zeros((k + 1, n), np.int32)
    for j in range(n):
        dp[1, j] = cost[0, j]
    for kk in range(2, k + 1):
        for j in range(kk - 1, n):
            for i in range(kk - 2, j):
                c = dp[kk - 1, i] + cost[i + 1, j]
                if c < dp[kk, j]:
                    dp[kk, j] = c
                    choice[kk, j] = i
    # best bucket count <= k ending at the max value (the largest size
    # must be covered)
    best_k = min(range(1, k + 1), key=lambda kk: dp[kk, n - 1])
    edges = []
    j = n - 1
    for kk in range(best_k, 0, -1):
        edges.append(int(varr[j]))
        j = int(choice[kk, j])
    return BucketPolicy(edges=tuple(sorted(edges)),
                        overflow_multiple=multiple * 8)
