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
from viscy_tpu.apps.dynaclr.pseudotime.dtw_alignment import (  # noqa: F401
    DEFAULT_POSITIVE_CLASSES,
    AlignmentResult,
    TemplateResult,
    alignment_results_to_dataframe,
    build_template,
    classify_response_groups,
    dtw_align_tracks,
    extract_dtw_pseudotime,
    resample_template_to_frame_interval,
)
from viscy_tpu.apps.dynaclr.pseudotime.io import (  # noqa: F401
    compute_tau_event_band,
    date_prefix_from_dataset_id,
    find_embedding_zarr,
    get_dynaclr_versions,
    load_template_flavor,
    read_tau_event_band,
    read_template_attrs,
    read_time_calibration,
    save_template_zarr,
)
