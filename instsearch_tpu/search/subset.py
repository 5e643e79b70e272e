"""ID-subset (filtered) search — the FAISS ``IDSelector`` analog,
TPU-native.

Production serving restricts queries to a caller-defined row subset (a
user's collection, a tenant, an access-control list). The classic CPU
form tests a predicate per scanned row (FAISS ``IDSelector``, reference
analog: SURVEY.md §2.1 C11's scan loop); under XLA/Pallas a per-row
dynamic branch is exactly the pattern that cannot compile — instead the
subset is a STATIC-SHAPE device-resident byte mask over padded row
positions, folded into the same -inf masking every tier already applies
to padding rows (CLAUDE.md convention: id -1 → -inf before any top-k):

* **exact tiers** (bf16/int8/int4 Pallas kernels + XLA oracle): the mask
  streams as a ``[1, N]`` int8 operand blocked alongside the row tiles —
  1 byte per row, 1/1024 of the bf16 row bytes at D=512 — and ANDs into
  the kernels' existing position-validity predicate
  (kernels/topk_matmul.py). Filtered selection is EXACT over the subset
  and costs one extra compare per tile.
* **IVF**: probed-bucket candidates carry row positions; the mask
  gathers by position and folds into the padding -inf mask before the
  merged top-k (search/ivf.py). Exact within probed buckets — the same
  recall model as unfiltered IVF.
* **PQ / IVF-PQ cascades**: the mask applies at ADC *selection*
  (kernels/pq_scan.py, search/ivfpq._adc_select), not after the exact
  re-score, so the whole depth budget is spent on allowed rows — a
  selective filter does not collapse the candidate pool.

Semantics: returned ids are always subset members; when the subset holds
fewer than k rows the tail comes back ``(-inf, -1)`` exactly like
padding. Rows added after the filter was built are NOT members (the mask
covers their positions with 0). ``Index.remove()`` moves row positions,
so it invalidates every existing filter — ``Index.search`` rejects stale
filters by generation instead of silently filtering the wrong rows;
rebuild with :meth:`Index.make_subset` (serve mode rebuilds registered
subsets from their member names automatically).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np


@dataclass(frozen=True)
class SubsetFilter:
    """Device-resident allow-list over index row positions.

    Build via :meth:`Index.make_subset`; pass to ``Index.search(...,
    subset=...)`` / ``Index.query(..., subset=...)`` /
    ``Index.query_images(..., subset=...)``. Reusable across queries —
    building one costs a host O(N) pass plus one small host→device
    transfer, so serving keeps filters cached per collection.
    """

    mask: jax.Array                      # [1, N_pad] int8; 1 = allowed
    count: int                           # number of allowed rows
    layout_gen: int                      # Index._layout_gen at build time
    n_pad: int                           # padded row count at build time
    names: Optional[tuple] = None        # member names (serve rebuilds)

    def __repr__(self) -> str:           # the mask array is noise
        return (f"SubsetFilter(count={self.count}, n_pad={self.n_pad}, "
                f"layout_gen={self.layout_gen})")


def build_position_mask(index, names: Optional[Sequence[str]] = None,
                        ids: Optional[Sequence[int]] = None,
                        mask: "Optional[np.ndarray]" = None) -> np.ndarray:
    """Host-side resolution of a subset spec into a ``[N_pad]`` bool
    position mask. Exactly one of ``names`` / ``ids`` / ``mask``:

    - ``names``: image names (positions via the names list — position-
      aligned by construction, see ``Index.remove``'s compaction).
    - ``ids``: dataset ids (the values ``search`` returns).
    - ``mask``: a ``[N_pad]`` bool/int array over row positions directly
      (advanced callers that track positions themselves).

    Unknown names/ids raise ``KeyError`` — a filter that silently drops
    members would serve confidently wrong results.
    """
    n_pad = index.descriptors.shape[0]
    nspec = sum(x is not None for x in (names, ids, mask))
    if nspec != 1:
        raise ValueError("pass exactly one of names=, ids=, mask=")
    if mask is not None:
        m = np.asarray(mask)
        if m.shape != (n_pad,):
            raise ValueError(f"mask must be [{n_pad}] over padded row "
                             f"positions, got {m.shape}")
        m = m.astype(bool) & (np.asarray(index.ids) >= 0)
        return m
    m = np.zeros((n_pad,), bool)
    if names is not None:
        pos_by_name = {nm: p for p, nm in enumerate(index.names)}
        missing = [nm for nm in names if nm not in pos_by_name]
        if missing:
            raise KeyError(f"{len(missing)} subset names not in the index "
                           f"(e.g. {missing[:3]})")
        m[[pos_by_name[nm] for nm in names]] = True
    else:
        ids_np = np.asarray(index.ids)[:index.num_valid]
        pos_by_id = {int(v): p for p, v in enumerate(ids_np)}
        want = [int(i) for i in ids]
        missing = [i for i in want if i not in pos_by_id]
        if missing:
            raise KeyError(f"{len(missing)} subset ids not in the index "
                           f"(e.g. {missing[:3]})")
        m[[pos_by_id[i] for i in want]] = True
    return m
