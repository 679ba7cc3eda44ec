from .window_agg import (  # noqa: F401
    trailing_window_features,
    trailing_window_features_exact,
    agg_features_query,
)
from .ratios import with_ratio_features, with_guarded_inference_ratios  # noqa: F401
from .latest_per_key import latest_per_key  # noqa: F401
