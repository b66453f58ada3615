from crawler_core_spark.sources.denylist import Denylist, load_denylist  # noqa: F401
from crawler_core_spark.sources.targets import (  # noqa: F401
    crux_targets,
    mx_expanded_targets,
    target_file_df,
    tranco_targets,
)
