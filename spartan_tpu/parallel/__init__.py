"""Explicit parallelism: shard_map collectives, halo rings, re-tiling.

Parallelism-strategy coverage vs the reference (SURVEY.md §2.3):
DP/TP/SP are the implicit path (NamedSharding + XLA collectives, all of
``spartan_tpu.expr``); this package carries the *explicit* primitives —
ppermute halo rings (the CP/ring pattern applied to stencils) and
all_to_all re-tiling (the Ulysses pattern).  PP/EP have no analogue in an
array library (no layered-model concept) and are intentionally absent,
as in the reference.
"""

from spartan_tpu.parallel.collectives import (all_to_all_retile,
                                              halo_exchange, map_tiles,
                                              psum_across, reshard,
                                              ring_shift, stencil1d_halo)
from spartan_tpu.parallel.sample_sort import (rank_values,
                                              sample_sort_traced)
