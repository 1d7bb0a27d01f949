"""Corpus-size-derived index/sketch parameters.

The ANN and sketch workload rows are oracle-checked on *invariant
booleans* (recall >= floor, estimate inside envelope). Pinning their
index parameters to constants makes those booleans brittle: a fixture
regeneration at a different scale can flip a boolean even though
nothing is broken — the constants were simply tuned for another corpus
size. This module derives the parameters from ``count()`` magnitude so
recall degrades gracefully instead of cliff-dropping:

- **nlist ~ sqrt(n)** — the standard IVF sizing (cells of ~sqrt(n)
  vectors balance coarse-quantizer cost against cell-scan cost; FAISS
  guidance is C*sqrt(n)). Growing nlist with n keeps per-cell work flat
  as the corpus scales.
- **nprobe = ceil(0.75 * nlist)** for oracle-audited rows — a wide
  probe whose recall is insensitive to corpus density. Production
  configurations (the x04p/d14p twin family) use narrow probes and are
  benchmarked, not boolean-gated.
- **ksub in [16, 256] ~ n/16** — PQ codebooks need enough centroids
  per subspace to keep quantization error below the rerank window at
  the corpus' density (the sf0.1 soak showed ksub=16 collapsing to
  recall 0 at 2000 vectors) but can never exceed one-byte codes (256)
  or the training-point count.
- **sketch envelopes**: 3-sigma of the HLL standard error
  (1.04/sqrt(2^lgK)) plus an absolute 2-count slack for tiny groups,
  where binomial noise dominates the relative bound.

Every derivation is a pure function of integers, so the same values
are reproducible driver-side and in tests; the perturbation suite
(tests/test_tuning.py) regenerates the corpus at 0.5x and 2x and
asserts the oracle booleans hold.
"""

from __future__ import annotations

import math


def ivf_params(n: int) -> dict[str, int]:
    """IVF coarse-quantizer sizing for an ``n``-vector corpus."""
    n = max(1, int(n))
    nlist = min(4096, max(4, round(math.sqrt(n))))
    nprobe = max(1, math.ceil(0.75 * nlist))
    return {"nlist": nlist, "nprobe": nprobe}


def pq_params(n: int, dim: int, *, m: int | None = None) -> dict[str, int]:
    """PQ codebook sizing: ``m`` subspaces (largest divisor of ``dim``
    that is <= 8 unless given), ``ksub`` centroids per subspace scaled
    with corpus density, and a rerank window that covers the extra
    candidates coarser codes admit."""
    n = max(1, int(n))
    if m is None:
        m = next(d for d in (8, 4, 2, 1) if dim % d == 0)
    ksub = min(256, min(n, max(16, n // 16)))
    # smaller codebooks (low n) quantize coarser -> widen the exact
    # re-rank shortlist to compensate; bounded so the shortlist stays
    # k-proportional, never corpus-proportional
    rerank_factor = min(50, max(10, 4096 // ksub))
    return {"m": m, "ksub": ksub, "rerank_factor": rerank_factor}


#: Spark's hll_sketch_agg default lgConfigK
HLL_DEFAULT_LG_K = 12


def hll_rel_tol(lg_k: int = HLL_DEFAULT_LG_K, sigmas: float = 3.0) -> float:
    """3-sigma relative-error envelope for an HLL sketch of 2^lg_k
    registers (standard error 1.04/sqrt(2^lgK))."""
    return sigmas * 1.04 / math.sqrt(2.0**lg_k)
