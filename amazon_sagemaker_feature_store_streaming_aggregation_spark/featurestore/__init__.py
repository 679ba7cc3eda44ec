from .feature_group import FeatureGroup  # noqa: F401
