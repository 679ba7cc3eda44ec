from .feature_group import FeatureGroup  # noqa: F401
from .point_in_time import point_in_time_features  # noqa: F401
