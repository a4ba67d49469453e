"""DTW pseudotime package (reference ``dynaclr/pseudotime/``).

Modules: :mod:`.dtw_core` (native-DP DTW + DBA), :mod:`.alignment`
(lineage-aware t_perturb assignment), :mod:`.dtw_alignment` (template
building + track alignment), :mod:`.signals` (annotation / prediction /
embedding-distance signals), :mod:`.metrics` (population aggregation +
onset/peak timing + statistical tests), :mod:`.io` (template zarr
persistence), :mod:`.evaluation` (pseudotime-vs-annotation scores).

The round-1 quick API (``dtw_align``, ``compute_pseudotime``) stays
re-exported for the existing CLI subcommands.
"""

from viscy_tpu.apps.dynaclr.pseudotime._legacy import (  # noqa: F401
    compute_pseudotime,
    dtw_align,
)
from viscy_tpu.apps.dynaclr.pseudotime.dtw_core import (  # noqa: F401
    dba,
    dtw_align_pair,
    dtw_distance,
    subsequence_align,
)
