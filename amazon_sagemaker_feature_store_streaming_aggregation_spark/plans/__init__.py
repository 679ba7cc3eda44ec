from .batch_ingest import batch_feature_records, run_batch_ingest  # noqa: F401
from .train_prep import train_prep  # noqa: F401
