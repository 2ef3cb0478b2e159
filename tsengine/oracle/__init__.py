from tsengine.oracle.frags import (  # noqa: F401
    SUP_METRICS_CTE,
    UNSUP_METRICS_CTE,
    WINDOW_PREDS_CTE,
    with_ctes,
)
